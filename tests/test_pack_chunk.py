"""Round-5 operators: token-window chunking, vocabulary, rarity scoring,
greedy sequence packing, SCD2 change history."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from end_to_end_ml_spark.operators import pack, text
from end_to_end_ml_spark.operators.timeseries import change_history


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDocuments:
    def test_short_doc_single_chunk(self, spark):
        out = text.chunk_documents(
            _docs(spark, [(1, "a b c")]), "doc_id", "text", size=4, overlap=1
        ).collect()
        assert len(out) == 1
        assert out[0]["chunk_id"] == 0
        assert out[0]["chunk_text"] == "a b c"
        assert out[0]["n_chunk_tokens"] == 3

    def test_overlap_and_coverage(self, spark):
        words = [f"w{i}" for i in range(10)]
        out = (
            text.chunk_documents(
                _docs(spark, [(1, " ".join(words))]), "doc_id", "text", size=4, overlap=2
            )
            .orderBy("chunk_id")
            .collect()
        )
        chunks = [r["chunk_text"].split(" ") for r in out]
        # stride 2: chunks start at 0,2,4,6 -> 4 chunks, last is w6..w9
        assert [c[0] for c in chunks] == ["w0", "w2", "w4", "w6"]
        # consecutive chunks share `overlap` tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2]
        # every token covered, in order
        seen = []
        for c in chunks:
            for w in c:
                if not seen or seen[-1] != w:
                    if w not in seen:
                        seen.append(w)
        assert seen == words

    def test_exact_boundary_no_empty_chunk(self, spark):
        # n == size + stride -> exactly 2 chunks, no empty third
        words = [f"w{i}" for i in range(6)]
        out = text.chunk_documents(
            _docs(spark, [(1, " ".join(words))]), "doc_id", "text", size=4, overlap=2
        ).collect()
        assert len(out) == 2
        assert all(r["n_chunk_tokens"] > 0 for r in out)

    def test_overlap_ge_size_raises(self, spark):
        with pytest.raises(ValueError):
            text.chunk_documents(_docs(spark, [(1, "a")]), "doc_id", "text", size=4, overlap=4)


class TestVocabularyRarity:
    def test_vocabulary_counts(self, spark):
        df = _docs(spark, [(1, "The the cat"), (2, "the dog")])
        out = {r["token"]: r for r in text.vocabulary(df, "doc_id", "text").collect()}
        assert out["the"]["tf"] == 3
        assert out["the"]["df"] == 2
        assert out["cat"]["tf"] == 1 and out["cat"]["df"] == 1

    def test_top_k_orders_by_tf_then_token(self, spark):
        df = _docs(spark, [(1, "b b a a c")])
        out = text.vocabulary(df, "doc_id", "text", top_k=2).collect()
        assert [r["token"] for r in out] == ["a", "b"]

    def test_rarity_scores(self, spark):
        df = _docs(spark, [(1, "x x x y"), (2, "x z")])
        out = {
            r["doc_id"]: r
            for r in text.token_rarity_scores(
                df, "doc_id", "text", rare_max_tf=1
            ).collect()
        }
        # corpus tf: x=4, y=1, z=1
        assert out[1]["n_tokens"] == 4
        assert out[1]["tf_sum"] == 4 * 3 + 1
        assert out[1]["rare_frac"] == 0.25
        assert out[2]["tf_sum"] == 5
        assert out[2]["rare_frac"] == 0.5


class TestPackGreedy:
    def _packed(self, spark, counts, budget, n_shards=1):
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], ["doc_id", "n_tokens"]
        )
        return (
            pack.pack_greedy(df, "doc_id", "n_tokens", budget=budget, n_shards=n_shards)
            .orderBy("doc_id")
            .collect()
        )

    def test_greedy_reset_on_overflow(self, spark):
        rows = self._packed(spark, [100, 100, 100, 60, 200], budget=256)
        assert [r["bin_id"] for r in rows] == [0, 0, 1, 1, 2]

    def test_oversized_doc_gets_own_bin(self, spark):
        rows = self._packed(spark, [300, 10, 10], budget=256)
        assert [r["bin_id"] for r in rows] == [0, 1, 1]

    def test_bins_never_exceed_budget_unless_single_doc(self, spark):
        import random

        rng = random.Random(7)
        counts = [rng.randint(10, 300) for _ in range(200)]
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], ["doc_id", "n_tokens"]
        )
        packed = pack.pack_greedy(df, "doc_id", "n_tokens", budget=256, n_shards=4)
        summary = pack.pack_bin_summary(packed, budget=256).collect()
        for r in summary:
            assert r["n_tokens"] <= 256 or r["n_docs"] == 1
        # every doc assigned exactly once
        assert sum(r["n_docs"] for r in summary) == 200

    def test_shard_is_deterministic_mod(self, spark):
        rows = self._packed(spark, [1, 1, 1, 1], budget=10, n_shards=2)
        assert [r["shard"] for r in rows] == [0, 1, 0, 1]

    def test_bad_budget_raises(self, spark):
        df = spark.createDataFrame([(1, 1)], ["doc_id", "n_tokens"])
        with pytest.raises(ValueError):
            pack.pack_greedy(df, "doc_id", "n_tokens", budget=0)


class TestChangeHistory:
    def test_islands_and_validity(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, "a", t0, 1),
            (1, "a", t0 + dt.timedelta(hours=1), 2),
            (1, "b", t0 + dt.timedelta(hours=2), 3),
            (1, "a", t0 + dt.timedelta(hours=3), 4),
            (2, "c", t0, 5),
        ]
        df = spark.createDataFrame(rows, ["user_id", "attr", "ts", "event_id"])
        out = (
            change_history(df, "user_id", "attr", "ts", "event_id")
            .orderBy("user_id", "valid_from")
            .collect()
        )
        u1 = [r for r in out if r["user_id"] == 1]
        assert [r["attr"] for r in u1] == ["a", "b", "a"]
        assert [r["n_events"] for r in u1] == [2, 1, 1]
        assert u1[0]["valid_to"] == u1[1]["valid_from"]
        assert u1[2]["valid_to"] is None and u1[2]["is_current"]
        assert not u1[0]["is_current"]
        u2 = [r for r in out if r["user_id"] == 2]
        assert len(u2) == 1 and u2[0]["is_current"]

    def test_equal_ts_tiebreak_by_event_id(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, "b", t0, 2), (1, "a", t0, 1)]
        df = spark.createDataFrame(rows, ["user_id", "attr", "ts", "event_id"])
        out = (
            change_history(df, "user_id", "attr", "ts", "event_id")
            .orderBy("valid_from", "attr")
            .collect()
        )
        # event_id order: a (id 1) then b (id 2) -> two islands, a first
        assert len(out) == 2
        current = [r for r in out if r["is_current"]]
        assert len(current) == 1 and current[0]["attr"] == "b"


class TestTimeWindowPairs:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, ["user_id", "event_id", "ts"]).select(
            "user_id", "event_id", F.col("ts").cast("timestamp")
        )

    def test_matches_naive(self, spark):
        from end_to_end_ml_spark.operators.rangejoin import time_window_pairs
        import datetime as dt
        import random

        rng = random.Random(3)
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (rng.randint(1, 5), i, t0 + dt.timedelta(seconds=rng.randint(0, 5000)))
            for i in range(120)
        ]
        w = 600
        naive = set()
        for u1, i1, t1 in rows:
            for u2, i2, t2 in rows:
                if u1 == u2 and (t2 > t1 or (t2 == t1 and i2 > i1)):
                    if int(t2.timestamp()) - int(t1.timestamp()) <= w:
                        naive.add((u1, i1, i2))
        got = {
            (r["user_id"], r["id_a"], r["id_b"])
            for r in time_window_pairs(
                self._df(spark, rows), "user_id", "ts", "event_id", w
            ).collect()
        }
        assert got == naive

    def test_cross_bin_boundary_pair_found_once(self, spark):
        from end_to_end_ml_spark.operators.rangejoin import time_window_pairs
        import datetime as dt

        # epochs 599 and 601: different 600s-bins, gap 2 <= 600
        rows = [
            (1, 1, dt.datetime.fromtimestamp(599, dt.timezone.utc).replace(tzinfo=None)),
            (1, 2, dt.datetime.fromtimestamp(601, dt.timezone.utc).replace(tzinfo=None)),
        ]
        out = time_window_pairs(
            self._df(spark, rows), "user_id", "ts", "event_id", 600
        ).collect()
        assert len(out) == 1
        assert out[0]["gap_seconds"] == 2

    def test_bad_window_raises(self, spark):
        from end_to_end_ml_spark.operators.rangejoin import time_window_pairs

        with pytest.raises(ValueError):
            time_window_pairs(
                self._df(spark, []), "user_id", "ts", "event_id", 0
            )


class TestKfold:
    def test_fold_range_and_determinism(self, spark):
        from end_to_end_ml_spark.operators.split import kfold_assign

        df = spark.range(0, 500).select(F.col("id").alias("pk"))
        a = {r["pk"]: r["fold"] for r in kfold_assign(df, "pk", k=5).collect()}
        b = {r["pk"]: r["fold"] for r in kfold_assign(df, "pk", k=5).collect()}
        assert a == b
        assert set(a.values()) == {0, 1, 2, 3, 4}
        # roughly balanced (hash-uniform): each fold within 3x of expectation
        from collections import Counter

        c = Counter(a.values())
        assert all(30 <= v <= 300 for v in c.values())

    def test_k_lt_2_raises(self, spark):
        from end_to_end_ml_spark.operators.split import kfold_assign

        with pytest.raises(ValueError):
            kfold_assign(spark.range(1), "id", k=1)


class TestRandomProjection:
    def test_projection_matches_python(self, spark):
        from end_to_end_ml_spark.operators.similarity import (
            _rp_signs,
            random_projection,
        )

        dim, n_out = 6, 3
        vec = [0.5, -0.25, 1.0, 0.0015, -0.0004, 2.0]
        q = [500, -250, 1000, 2, 0, 2000]  # half-away milli quantization
        signs = _rp_signs(dim, n_out, seed=13)
        expected = [sum(qi * s for qi, s in zip(q, row)) for row in signs]
        df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"]).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        out = random_projection(
            df, "vec_id", "embedding", n_out=n_out, dim=dim, seed=13
        ).collect()[0]
        assert [out[f"p{j}"] for j in range(n_out)] == expected

    def test_centroids_are_means(self, spark):
        from end_to_end_ml_spark.operators.similarity import (
            label_centroids_projected,
            random_projection,
        )

        rows = [(i, [float(i)] * 4, i % 2) for i in range(6)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
        )
        proj = {
            r["vec_id"]: r
            for r in random_projection(
                df, "vec_id", "embedding", n_out=2, dim=4, seed=13
            ).collect()
        }
        cents = {
            r["label"]: r
            for r in label_centroids_projected(
                df, "vec_id", "embedding", "label", n_out=2, dim=4, seed=13
            ).collect()
        }
        for lbl in (0, 1):
            ids = [i for i in range(6) if i % 2 == lbl]
            for j in range(2):
                exp = sum(proj[i][f"p{j}"] for i in ids) / len(ids)
                assert cents[lbl][f"c{j}"] == exp


class TestDupNgramFraction:
    def test_shared_and_unique_grams(self, spark):
        # docs 1 and 2 share their whole text (same 3-grams); doc 3 unique
        df = _docs(
            spark,
            [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        )
        out = {
            r["doc_id"]: r
            for r in text.duplicated_ngram_fraction(
                df, "doc_id", "text", n=3
            ).collect()
        }
        assert out[1]["n_grams"] == 2 and out[1]["dup_gram_frac"] == 1.0
        assert out[2]["dup_gram_frac"] == 1.0
        assert out[3]["n_dup_grams"] == 0 and out[3]["dup_gram_frac"] == 0.0

    def test_short_doc_whole_gram(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "a b")])
        out = {
            r["doc_id"]: r
            for r in text.duplicated_ngram_fraction(
                df, "doc_id", "text", n=8
            ).collect()
        }
        assert out[1]["n_grams"] == 1 and out[1]["dup_gram_frac"] == 1.0


def test_change_history_null_attr_is_own_state(spark):
    """NULL attribute values form their own islands (null-safe compare) —
    and a run of NULLs is ONE island, not many."""
    rows = [
        (1, "a", dt.datetime(2024, 1, 1, h), h) for h in range(2)
    ] + [
        (1, None, dt.datetime(2024, 1, 1, 2 + h), 10 + h) for h in range(2)
    ] + [(1, "a", dt.datetime(2024, 1, 1, 5), 20)]
    df = spark.createDataFrame(rows, "user_id INT, attr STRING, ts TIMESTAMP, event_id INT")
    out = (
        change_history(df, "user_id", "attr", "ts", "event_id")
        .orderBy("valid_from")
        .collect()
    )
    assert [r["attr"] for r in out] == ["a", None, "a"]
    assert [r["n_events"] for r in out] == [2, 2, 1]


def test_pack_greedy_null_counts_raise(spark):
    df = spark.createDataFrame([(1, 10), (2, None)], "doc_id INT, n_tokens INT")
    with pytest.raises(Exception, match="null token counts"):
        pack.pack_greedy(df, "doc_id", "n_tokens", budget=100).collect()


def test_ewma_matches_recursion(spark):
    from end_to_end_ml_spark.operators.timeseries import ewma

    t0 = dt.datetime(2024, 1, 1)
    vals = [4.0, 2.0, 8.0, 1.0]
    rows = [(1, t0 + dt.timedelta(hours=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, event_id INT, value DOUBLE")
    out = (
        ewma(df, "user_id", "ts", "value", "event_id", alpha=0.5)
        .orderBy("ts")
        .collect()
    )
    e, expected = None, []
    for v in vals:
        e = v if e is None else 0.5 * v + 0.5 * e
        expected.append(e)
    assert [r["ewma"] for r in out] == expected


def test_weighted_sample_deterministic_and_monotone(spark):
    """Same keys+weights -> same keep set; raising every weight only ever
    ADDS rows (the uniform draw per key is fixed)."""
    from end_to_end_ml_spark.operators.split import weighted_deterministic_sample

    df = spark.createDataFrame(
        [(i, (i % 10) / 10.0) for i in range(300)], "pk INT, w DOUBLE"
    )
    k1 = {r["pk"] for r in weighted_deterministic_sample(df, "pk", "w").collect()}
    k2 = {r["pk"] for r in weighted_deterministic_sample(df, "pk", "w").collect()}
    assert k1 == k2
    boosted = df.withColumn("w", F.least(F.col("w") * 2, F.lit(1.0)))
    k3 = {r["pk"] for r in weighted_deterministic_sample(boosted, "pk", "w").collect()}
    assert k1 <= k3
    # weight 0 keeps nothing; weight 1 keeps everything
    assert not {r["pk"] for r in weighted_deterministic_sample(
        df.withColumn("w", F.lit(0.0)), "pk", "w").collect()}
    assert len({r["pk"] for r in weighted_deterministic_sample(
        df.withColumn("w", F.lit(1.0)), "pk", "w").collect()}) == 300


class TestBandedIntervalJoin:
    def test_matches_naive_two_frames(self, spark):
        """Two-frame banded interval join == the naive O(n·m) inequality
        join, including same-second pairs (gap 0) and exact-window-edge
        pairs; each in-window pair appears exactly once (no bin-probe
        duplicate)."""
        import datetime as dt
        import random

        from end_to_end_ml_spark.operators.rangejoin import banded_interval_join

        rng = random.Random(7)
        t0 = dt.datetime(2024, 1, 1)
        lrows = [
            (rng.randint(1, 4), i, t0 + dt.timedelta(seconds=rng.randint(0, 4000)), f"ch{i % 3}")
            for i in range(80)
        ]
        rrows = [
            (rng.randint(1, 4), 1000 + i, t0 + dt.timedelta(seconds=rng.randint(0, 4000)))
            for i in range(60)
        ]
        w = 600
        left = spark.createDataFrame(lrows, ["user_id", "tid", "ts", "channel"]).select(
            "user_id", "tid", F.col("ts").cast("timestamp"), "channel"
        )
        right = spark.createDataFrame(rrows, ["user_id", "cid", "ts"]).select(
            "user_id", "cid", F.col("ts").cast("timestamp")
        )
        naive = {}
        for u1, i1, t1, _ in lrows:
            for u2, i2, t2 in rrows:
                g = int(t2.timestamp()) - int(t1.timestamp())
                if u1 == u2 and 0 <= g <= w:
                    naive[(u1, i1, i2)] = g
        out = banded_interval_join(
            left, right, "user_id", "tid", "cid", "ts", w, left_payload=("channel",)
        ).collect()
        got = {(r["user_id"], r["tid"], r["cid"]): r["gap_seconds"] for r in out}
        assert len(out) == len(got)  # exactly-once
        assert got == naive
        # payload survives with the _l suffix
        assert all(r["channel_l"].startswith("ch") for r in out)

    def test_rejects_nonpositive_window(self, spark):
        from end_to_end_ml_spark.operators.rangejoin import banded_interval_join

        df = spark.createDataFrame(
            [(1, 1, "2024-01-01 00:00:00")], ["user_id", "tid", "ts"]
        ).select("user_id", "tid", F.col("ts").cast("timestamp"))
        import pytest as _pt

        with _pt.raises(ValueError):
            banded_interval_join(df, df, "user_id", "tid", "tid", "ts", 0)


class TestShardShuffle:
    def test_permutation_and_dense_positions(self, spark, tmp_path):
        df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], ["doc_id", "text"])
        out = pack.shard_shuffle(df, "doc_id", n_shards=4).collect()
        assert sorted(r["doc_id"] for r in out) == list(range(200))  # permutation
        by_shard = {}
        for r in out:
            assert 0 <= r["shard"] < 4
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss)))  # dense 0-based

    def test_deterministic_and_salt_sensitive(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
        a = {(r["doc_id"], r["shard"], r["pos"]) for r in pack.shard_shuffle(df, "doc_id", 4).collect()}
        b = {(r["doc_id"], r["shard"], r["pos"]) for r in pack.shard_shuffle(df, "doc_id", 4).collect()}
        c = {(r["doc_id"], r["shard"], r["pos"]) for r in pack.shard_shuffle(df, "doc_id", 4, salt="other").collect()}
        assert a == b
        assert a != c

    def test_scatters_adjacent_rows(self, spark):
        # consecutive ids should not stay consecutive in training order
        df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
        out = pack.shard_shuffle(df, "doc_id", n_shards=1).orderBy("pos").collect()
        order = [r["doc_id"] for r in out]
        adjacent = sum(1 for x, y in zip(order, order[1:]) if y == x + 1)
        assert adjacent < 20  # ~1/1000 expected under a random permutation

    def test_write_shuffled_shards_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame([(i, f"t{i}") for i in range(120)], ["doc_id", "text"])
        path = str(tmp_path / "shards")
        pack.write_shuffled_shards(df, path, "doc_id", n_shards=3)
        back = spark.read.parquet(path)
        assert back.count() == 120
        assert back.select("doc_id").distinct().count() == 120
        assert set(back.select("shard").distinct().toPandas()["shard"]) <= {0, 1, 2}

    def test_rejects_bad_shard_count(self, spark):
        df = spark.createDataFrame([(1,)], ["doc_id"])
        with pytest.raises(ValueError):
            pack.shard_shuffle(df, "doc_id", n_shards=0)


def test_curation_pipeline_e2e(spark, tmp_path):
    """tools/run_curation_pipeline.curate: the pipe10 chain + shard
    assignment materializes curated shards whose stats reconcile — kept
    tokens never exceed the per-source allocation's implied admit volume,
    shard/pos coordinates are unique, and a re-run is byte-identical
    (deterministic md5 machinery end-to-end)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate

    curated, stats = curate(spark, "/root/testdata/sf0.001", budget_tokens=5000)
    c = curated.collect()
    s = {r["source"]: r for r in stats.collect()}
    assert len(c) > 0
    # (shard, pos) is a unique coordinate
    coords = [(r["shard"], r["pos"]) for r in c]
    assert len(coords) == len(set(coords))
    # stats reconcile with the materialized rows
    from collections import Counter
    per_src = Counter(r["source"] for r in c)
    for src, row in s.items():
        assert per_src[src] == row["n_docs_kept"]
        assert row["n_tokens_kept"] <= row["n_tokens"]  # can't keep more than exists
    # deterministic: re-run reproduces the identical layout
    curated2, _ = curate(spark, "/root/testdata/sf0.001", budget_tokens=5000)
    assert sorted(map(tuple, c)) == sorted(map(tuple, curated2.collect()))


def test_curation_full_mode_matches_pipe10(spark):
    """round-9 ADVICE: full-mode curate() must use the SAME keeper
    selection as the oracled pipe10 form — the NULL-source filter runs
    AFTER the fingerprint keep-min window, so a NULL-source doc that is
    the min-doc_id keeper of a fingerprint still suppresses its non-NULL
    duplicates. Pinned by exact per-source stats parity at pipe10's
    budget (50 000 tokens)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate

    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    _, stats = curate(spark, sf, budget_tokens=50_000)
    pipe10 = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"], r["admit_ppm"])
        for r in REGISTRY["pipe10_budget_curation"][0](spark, sf).collect()
    }
    got = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"], int(r["admit_ppm"]))
        for r in stats.collect()
    }
    assert got == pipe10


def test_curation_pipeline_incremental_e2e(spark, tmp_path):
    """--incremental (pipe11 operationally): batch-only curation against
    the history fingerprint store with the survivor frame persisted
    once. Stats must MATCH the declarative pipe11 registry query (same
    chain, materialized vs recomputed), coordinates unique, re-run
    byte-identical, and no curated doc may collide with a history
    prefix-8 fingerprint."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate_incremental

    from end_to_end_ml_spark.plans.entry_queries import REGISTRY
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    curated, stats = curate_incremental(spark, sf, budget_tokens=3000)
    c = curated.collect()
    assert len(c) > 0
    assert all(r["doc_id"] % 4 == 0 for r in c)  # batch only
    coords = [(r["shard"], r["pos"]) for r in c]
    assert len(coords) == len(set(coords))
    # parity with the declarative pipe11 form: same kept counts per source
    pipe11 = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"])
        for r in REGISTRY["pipe11_incremental_curation"][0](spark, sf).collect()
    }
    got = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"])
        for r in stats.collect()
    }
    assert got == pipe11
    # no curated fingerprint exists in history
    from end_to_end_ml_spark.sources import load_table

    docs = load_table(spark, sf, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8))
    )
    hist_fps = {
        r["fp"]
        for r in docs.filter(F.col("doc_id") % 4 != 0).select(fp.alias("fp")).collect()
    }
    kept_ids = {r["doc_id"] for r in c}
    kept_fps = {
        r["fp"]
        for r in docs.filter(F.col("doc_id").isin(*kept_ids))
        .select(fp.alias("fp"))
        .collect()
    }
    assert kept_fps.isdisjoint(hist_fps)
    # deterministic re-run
    curated2, _ = curate_incremental(spark, sf, budget_tokens=3000)
    assert sorted(map(tuple, c)) == sorted(map(tuple, curated2.collect()))


def test_curation_multi_epoch_invariants(spark, tmp_path):
    """round-9 verdict #5 — the COMPOSED incremental loop: chain
    curate_epoch across 3 synthetic 'nights' (doc_id % 3 slices) carrying
    the versioned fingerprint store, and assert the cross-epoch
    invariants end-to-end: (1) no fingerprint admitted twice across
    epochs; (2) the final store equals the union of admitted
    fingerprints; (3) per-epoch stats reconcile exactly with the
    materialized curated frames; (4) every admitted doc belongs to the
    gate-surviving population of the ONE-SHOT run on the union (an epoch
    can never admit what the batch run would have gated out). The
    corpus genuinely has fingerprints spanning multiple %3 slices (16 at
    sf0.001), so invariant (1) is non-vacuous."""
    import os
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import fingerprint_expr, run_epochs

    from end_to_end_ml_spark.operators import text
    from end_to_end_ml_spark.sources import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "nights")
    per_epoch, store = run_epochs(spark, sf, budget_tokens=2000, n_epochs=3, out_dir=out)
    assert len(per_epoch) == 3

    docs = load_table(spark, sf, "documents")
    fp_by_id = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fingerprint_expr().alias("fp")).collect()
    }
    epoch_rows = [c.collect() for c, _ in per_epoch]
    assert any(len(rows) > 0 for rows in epoch_rows)
    # (1) no fingerprint admitted twice — within or across epochs
    all_fps = [fp_by_id[r["doc_id"]] for rows in epoch_rows for r in rows]
    dup = [f for f, n in Counter(all_fps).items() if n > 1]
    assert dup == []
    # each doc lands in its own night's slice
    for e, rows in enumerate(epoch_rows):
        assert all(r["doc_id"] % 3 == e for r in rows)
    # (2) store == union of admitted fingerprints, and the on-disk v2
    # version is the same set
    store_fps = {r["fp"] for r in store.collect()}
    assert store_fps == set(all_fps)
    v2 = {
        r["fp"]
        for r in spark.read.parquet(os.path.join(out, "fp_store", "v2")).collect()
    }
    assert v2 == store_fps
    # (3) stats reconcile with the materialized frames
    for rows, (_, stats) in zip(epoch_rows, per_epoch):
        per_src_docs = Counter(r["source"] for r in rows)
        per_src_tokens = Counter()
        for r in rows:
            per_src_tokens[r["source"]] += r["n_words"]
        for s in stats.collect():
            assert per_src_docs[s["source"]] == s["n_docs_kept"]
            assert per_src_tokens[s["source"]] == s["n_tokens_kept"]
    # (4) every admitted doc is in the one-shot gate-surviving population
    gate_fps = {
        r["fp"]
        for r in docs.select(
            "source",
            fingerprint_expr().alias("fp"),
            *text.gopher_evidence_columns("text"),
        )
        .select("source", "fp", *text.gopher_rule_columns())
        .filter(F.col("keep") & F.col("source").isNotNull())
        .collect()
    }
    assert set(all_fps) <= gate_fps


def test_curation_cli_incremental_flag_and_sidecar(spark, tmp_path, monkeypatch):
    """The CLI paths (argv parsing incl. --incremental) were untested:
    run main() in-process (get_spark -> getOrCreate reuses the session)
    and assert the partitioned parquet + stats sidecar land with the
    mode recorded."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation_pipeline as rcp

    out = str(tmp_path / "run")
    monkeypatch.setattr(
        sys, "argv",
        ["run_curation_pipeline.py", "/root/testdata/sf0.001", out, "3000",
         "--incremental"],
    )
    rcp.main()
    stats = json.load(open(os.path.join(out, "curation_stats.json")))
    assert stats["mode"] == "incremental"
    assert stats["budget_tokens"] == 3000
    assert stats["total_docs_kept"] > 0
    shards = [d for d in os.listdir(os.path.join(out, "curated")) if d.startswith("shard=")]
    assert shards


def test_ann_maintenance_cli_writes_pairs_and_stats(spark, tmp_path, monkeypatch):
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_ann_maintenance as ram

    out = str(tmp_path / "ann")
    monkeypatch.setattr(
        sys, "argv",
        ["run_ann_maintenance.py", "/root/testdata/sf0.001", out, "0.4"],
    )
    ram.main()
    stats = json.load(open(os.path.join(out, "ann_stats.json")))
    assert stats["mode"] == "approx" and stats["n_pairs"] > 0
    pairs = spark.read.parquet(os.path.join(out, "pairs"))
    assert pairs.count() == stats["n_pairs"]


def test_curation_dsir_stage(spark):
    """--dsir-frac: the DSIR selection stage between dedup and budget
    allocation. At budget 50k on sf0.001 every survivor is admitted
    (corpus tokens < budget ⇒ admit_ppm = 1e6), so curate()'s output IS
    the survivor set — which lets the test cross-check the stage against
    an independent text.dsir_select over the baseline output:
    frac=1.0 must be the identity (every pool doc here has ≥2 alnum
    tokens), and frac=0.5 must keep target-source docs untouched while
    the pool shrinks to exactly the library's top-ceil(0.5·|pool|)."""
    import math
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import DSIR_TARGET_SOURCES, curate

    from end_to_end_ml_spark.operators import text

    sf = "/root/testdata/sf0.001"
    base_c, _ = curate(spark, sf, budget_tokens=50_000)
    base = base_c.collect()
    tgt = set(DSIR_TARGET_SOURCES)
    base_pool = [r for r in base if r["source"] not in tgt]
    base_tgt_ids = sorted(r["doc_id"] for r in base if r["source"] in tgt)
    assert base_pool and base_tgt_ids  # non-vacuous split

    full_c, _ = curate(spark, sf, budget_tokens=50_000, dsir_frac=1.0)
    assert sorted(map(tuple, base)) == sorted(map(tuple, full_c.collect()))

    half_c, _ = curate(spark, sf, budget_tokens=50_000, dsir_frac=0.5)
    half = half_c.collect()
    assert sorted(
        r["doc_id"] for r in half if r["source"] in tgt
    ) == base_tgt_ids
    k = int(math.ceil(0.5 * len(base_pool)))
    # independent replay: select top-k from the baseline output frames
    tgt_df = base_c.filter(F.col("source").isin(*tgt)).select("doc_id", "text")
    pool_df = base_c.filter(~F.col("source").isin(*tgt)).select(
        "doc_id", "text"
    )
    expect = sorted(
        r["doc_id"]
        for r in text.dsir_select(tgt_df, pool_df, "doc_id", "text", k=k)
        .select("doc_id")
        .collect()
    )
    got = sorted(r["doc_id"] for r in half if r["source"] not in tgt)
    assert got == expect


def test_curation_cli_dsir_frac_validation(spark, tmp_path, monkeypatch):
    """--dsir-frac argv validation (round-10 ADVICE): a trailing flag
    with no value, a non-numeric value, and out-of-range values (0
    empties the pool; >1 is a no-op that still pays the DSIR jobs) must
    all refuse with a SystemExit message, matching the loudness of the
    old --incremental guard — never an unhandled IndexError/ValueError
    or a silent degenerate run."""
    import os
    import sys

    import pytest as _pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation_pipeline as rcp

    base = ["run_curation_pipeline.py", "/root/testdata/sf0.001",
            str(tmp_path / "x"), "3000"]
    for extra, pat in [
        (["--dsir-frac"], "requires a value"),
        (["--dsir-frac", "pi"], "must be a number"),
        (["--dsir-frac", "0"], r"in \(0, 1\]"),
        (["--dsir-frac", "1.5"], r"in \(0, 1\]"),
        (["--dsir-frac", "-0.5"], r"in \(0, 1\]"),
        (["--incremental", "--operational-loop"], "standalone mode"),
    ]:
        monkeypatch.setattr(sys, "argv", base + extra)
        with _pytest.raises(SystemExit, match=pat):
            rcp.main()


def test_curation_cli_incremental_dsir_runs(spark, tmp_path, monkeypatch):
    """--dsir-frac WITH --incremental is now a supported composition
    (round-10 verdict #4 — it was a loud refusal while the epoch path
    had no DSIR stage): the nightly batch is scored against bucket
    counts reflecting history. The sidecar must record both, and the
    kept set must be a strict subset of the non-DSIR incremental run
    (frac=0.5 can only shrink the pool; target sources untouched)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import run_curation_pipeline as rcp

    out = str(tmp_path / "run_dsir")
    monkeypatch.setattr(
        sys, "argv",
        ["run_curation_pipeline.py", "/root/testdata/sf0.001", out, "50000",
         "--incremental", "--dsir-frac", "0.5"],
    )
    rcp.main()
    stats = json.load(open(os.path.join(out, "curation_stats.json")))
    assert stats["mode"] == "incremental"
    assert stats["dsir_frac"] == 0.5
    assert stats["total_docs_kept"] > 0

    # reference: same run without DSIR — at budget 50k every survivor is
    # admitted (admit_ppm = 1e6), so kept sets compare the DSIR stage
    base_c, base_stats = rcp.curate_incremental(
        spark, "/root/testdata/sf0.001", budget_tokens=50_000
    )
    dsir_c, _ = rcp.curate_incremental(
        spark, "/root/testdata/sf0.001", budget_tokens=50_000, dsir_frac=0.5
    )
    base_rows = {r["doc_id"]: r["source"] for r in base_c.collect()}
    dsir_rows = {r["doc_id"]: r["source"] for r in dsir_c.collect()}
    tgt = set(rcp.DSIR_TARGET_SOURCES)
    assert set(dsir_rows) < set(base_rows)  # strict subset
    # target-source docs pass the DSIR stage unconditionally
    assert {d for d, s in base_rows.items() if s in tgt} == {
        d for d, s in dsir_rows.items() if s in tgt
    }
    base_pool = [d for d, s in base_rows.items() if s not in tgt]
    dsir_pool = [d for d, s in dsir_rows.items() if s not in tgt]
    import math

    # every pool survivor here has >= 2 alnum tokens (Gopher gate), so
    # the scored frame is the whole pool and the cut is exactly ceil(n/2)
    assert len(dsir_pool) == math.ceil(0.5 * len(base_pool))


def test_curation_epoch_dsir_parity_with_full_mode(spark):
    """round-10 verdict #4 'done' criterion — stats parity vs full mode
    on a single epoch: curate_epoch over the WHOLE corpus as one batch,
    with the full-text fingerprint and the full-mode draw salt, must
    reproduce curate(dsir_frac=0.5)'s per-source stats EXACTLY (same
    gate, same keeper, merged counts over an empty store == the
    single-scan flag weights, same k over the scored frame, same
    draws). The fingerprint/draw_salt knobs exist precisely so this
    parity is by construction, not gate-dependent."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate, curate_epoch

    from end_to_end_ml_spark.operators import text
    from end_to_end_ml_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    _, full_stats = curate(spark, sf, budget_tokens=5_000, dsir_frac=0.5)
    docs = load_table(spark, sf, "documents")
    _, epoch_stats, _, counts = curate_epoch(
        spark,
        docs,
        None,
        budget_tokens=5_000,
        draw_salt="bud1",
        fingerprint=text.fingerprint_column("text"),
        dsir_frac=0.5,
    )
    key = lambda rows: {  # noqa: E731
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"], int(r["admit_ppm"]))
        for r in rows
    }
    assert key(epoch_stats.collect()) == key(full_stats.collect())
    # the returned counts ARE the survivor flag counts (merging into an
    # empty store is the identity) — replayed with curate_epoch's own
    # survivor semantics (keep + non-NULL source BEFORE the keeper
    # window, row_number keep-first)
    from run_curation_pipeline import DSIR_TARGET_SOURCES

    from pyspark.sql import Window, functions as F

    surv_replay = (
        docs.select(
            "doc_id", "source", "text",
            text.fingerprint_column("text").alias("fp"),
            *text.gopher_evidence_columns("text"),
        )
        .select("*", *text.gopher_rule_columns())
        .filter(F.col("keep") & F.col("source").isNotNull())
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("__rn") == 1)
    )
    flag_counts = text.dsir_bucket_counts_from_flag(
        surv_replay, F.col("source").isin(*DSIR_TARGET_SOURCES), "text"
    )
    got = sorted(map(tuple, counts.collect()))
    want = sorted(map(tuple, flag_counts.collect()))
    assert got == want


def test_pipe13_matches_runner_dsir_mode(spark):
    """pipe13_dsir_curation is the DECLARATIVE twin of
    run_curation_pipeline.curate(dsir_frac=0.5): same gate, same keeper
    order, same half-pool integer cut (2·rank ≤ n+1 == ceil(n/2) == the
    runner's math.ceil(0.5·n) top-k), same 'bud1' draws — per-source
    (n_docs_kept, n_tokens_kept, admit_ppm) must match exactly at the
    same budget."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate

    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    _, stats = curate(spark, sf, budget_tokens=5_000, dsir_frac=0.5)
    runner = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"], int(r["admit_ppm"]))
        for r in stats.collect()
    }
    declarative = {
        r["source"]: (r["n_docs_kept"], r["n_tokens_kept"], int(r["admit_ppm"]))
        for r in REGISTRY["pipe13_dsir_curation"][0](spark, sf).collect()
    }
    assert declarative == runner


def test_curation_multi_epoch_dsir_invariants(spark, tmp_path):
    """round-10 verdict #4 — the multi-epoch DSIR composition: run_epochs
    with dsir_frac carries a VERSIONED bucket-count store alongside the
    fingerprint store (same (bucket, t_count, r_count) shape the
    streaming ingest sink maintains). Invariants, each replayed with
    library pieces against the on-disk stores:
    (1) dsir_store/v{e} equals the SUM-merge of survivor counts through
        night e (merge-FIRST semantics: tonight's docs are part of the
        distribution they are scored against, so the inner weights join
        drops nothing by construction);
    (2) counts are monotone across versions (counters only ever add);
    (3) every admitted NON-target doc of night e is inside the top
        ceil(frac·|scored|) of the replayed night-e pool scored against
        the v{e} weights — selection is honest per epoch, against
        weights reflecting all history, with NO historical rescans;
    (4) the base cross-epoch invariants still hold under DSIR (no
        fingerprint admitted twice; every doc in its own night's
        slice)."""
    import math
    import os
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import (
        DSIR_TARGET_SOURCES,
        fingerprint_expr,
        run_epochs,
    )

    from end_to_end_ml_spark.operators import text
    from end_to_end_ml_spark.sources import load_table
    from pyspark.sql import Window, functions as F

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "nights_dsir")
    per_epoch, _ = run_epochs(
        spark, sf, budget_tokens=2000, n_epochs=3, out_dir=out, dsir_frac=0.5
    )
    epoch_rows = [c.collect() for c, _ in per_epoch]
    assert any(len(rows) > 0 for rows in epoch_rows)

    docs = load_table(spark, sf, "documents")
    tgt = set(DSIR_TARGET_SOURCES)
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    prev_counts = None
    prev_version = None
    for e in range(3):
        # replay night e's survivors with library pieces
        surv = (
            docs.filter(F.col("doc_id") % 3 == e)
            .select(
                "doc_id", "source", "text",
                fingerprint_expr().alias("fp"),
                *text.gopher_evidence_columns("text"),
            )
            .select("*", *text.gopher_rule_columns())
            .filter(F.col("keep") & F.col("source").isNotNull())
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("fp").orderBy("doc_id")
                ),
            )
            .filter(F.col("__rn") == 1)
        )
        if e > 0:
            hist = spark.read.parquet(
                os.path.join(out, "fp_store", f"v{e - 1}")
            )
            surv = surv.join(hist, "fp", "left_anti")
        surv = surv.select("doc_id", "source", "text", "n_words").persist()
        counts_replay = text.dsir_merge_counts(
            prev_counts, text.dsir_bucket_counts_from_flag(surv, is_target, "text")
        ).persist()
        on_disk = spark.read.parquet(os.path.join(out, "dsir_store", f"v{e}"))
        # (1) on-disk version e == replayed merge through night e
        assert sorted(map(tuple, on_disk.collect())) == sorted(
            map(tuple, counts_replay.collect())
        )
        # (2) monotone vs the previous version
        if prev_version is not None:
            cur = {r["bucket"]: (r["t_count"], r["r_count"]) for r in on_disk.collect()}
            for b, (t0, r0) in prev_version.items():
                t1, r1 = cur.get(b, (0, 0))
                assert t1 >= t0 and r1 >= r0
        prev_version = {
            r["bucket"]: (r["t_count"], r["r_count"]) for r in on_disk.collect()
        }
        # (3) admitted pool docs ⊆ top-ceil(frac·|scored|) vs v{e} weights
        weights = text.dsir_weights_from_counts(on_disk)
        scored = text.dsir_scores(
            surv.filter(~is_target), "doc_id", "text", weights
        )
        n_scored = scored.count()
        k = int(math.ceil(0.5 * n_scored))
        top_ids = {
            r["doc_id"]
            for r in scored.orderBy(
                F.col("dsir_score_q").desc(), "doc_id"
            ).limit(k).collect()
        }
        admitted_pool = {
            r["doc_id"] for r in epoch_rows[e] if r["source"] not in tgt
        }
        assert admitted_pool <= top_ids
        prev_counts = counts_replay
    # (4) base cross-epoch invariants under DSIR
    fp_by_id = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fingerprint_expr().alias("fp")).collect()
    }
    all_fps = [fp_by_id[r["doc_id"]] for rows in epoch_rows for r in rows]
    assert [f for f, n in Counter(all_fps).items() if n > 1] == []
    for e, rows in enumerate(epoch_rows):
        assert all(r["doc_id"] % 3 == e for r in rows)


def test_operational_loop_composes_four_systems(spark, tmp_path):
    """round-11 verdict #4 + round-12 verdict #5 — the full production
    loop in ONE session: run_operational_loop drives (1) streaming DSIR
    store maintenance (stream_dsir_counts_ingest over each night's
    survivor feed), (2) nightly epoch curation CONSUMING that store
    (night 0 self-merge bootstrap; nights 1-2 score against
    dsir_weights_from_store with the metadata-derived unseen floor),
    (3) the ANN probe-then-add maintenance loop, and (4) MinHash
    near-dup maintenance (raw batch probes the persisted survivor LSH
    index, O(batch) index adds) — then cross-system invariants are
    replayed from the on-disk artifacts with library pieces:

    (1) STORE PARITY: the streaming store's latest version equals the
        SUM-merge of batch-operator counts over each night's replayed
        survivors (gate + within-night dedup + anti join vs the
        versioned fp store) — the sink and the batch operator agree on
        the same feed;
    (2) NO FINGERPRINT READMITTED: curated fps distinct across nights,
        and the fp store versions only ever grow;
    (3) SELECTION CONSUMED THE STREAM'S STORE: night e's admitted pool
        docs are inside the top-ceil(frac*|scored|) of night e's pool
        scored against store version e-1 with floor_unseen=True —
        replayed from dsir_store/v{e-1} on disk;
    (4) ANN TRAJECTORY: one stats row per night with a sane
        pruned_fraction/mode, pairs written per epoch;
    (5) MINHASH PROBE == cross-split slice of the FULL pair set over
        (night-e raw batch ∪ prior-night survivors) — the pipe8
        equivalence, replayed from the on-disk pairs artifacts — and
        the index store grew by exactly one per-night append whose ids
        are exactly the survivors."""
    import math
    import os
    import sys
    from collections import Counter

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import (
        DSIR_TARGET_SOURCES,
        fingerprint_expr,
        run_operational_loop,
    )

    from end_to_end_ml_spark.operators import text
    from end_to_end_ml_spark.sources import load_table
    from end_to_end_ml_spark.streaming import events as SE
    from pyspark.sql import Window, functions as F

    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "oploop")
    out = run_operational_loop(spark, sf, work, budget_tokens=2000, n_epochs=3)
    assert len(out["nights"]) == 3

    # r12 ADVICE #3: night<->store-version alignment depends on a fresh
    # work_dir (one new feed file == one micro-batch == one version); a
    # re-run against existing loop state must REFUSE loudly, not silently
    # shift the version numbering
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="already holds loop state"):
        run_operational_loop(spark, sf, work, budget_tokens=2000, n_epochs=3)

    docs = load_table(spark, sf, "documents")
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    tgt = set(DSIR_TARGET_SOURCES)

    # replay each night's survivors with library pieces + on-disk fp stores
    surv_by_night = []
    for e in range(3):
        surv = (
            docs.filter(F.col("doc_id") % 3 == e)
            .select(
                "doc_id", "source", "text",
                fingerprint_expr().alias("fp"),
                *text.gopher_evidence_columns("text"),
            )
            .select("*", *text.gopher_rule_columns())
            .filter(F.col("keep") & F.col("source").isNotNull())
            .withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .filter(F.col("__rn") == 1)
        )
        if e > 0:
            hist = spark.read.parquet(os.path.join(work, "fp_store", f"v{e-1}"))
            surv = surv.join(hist, "fp", "left_anti")
        surv_by_night.append(
            surv.select("doc_id", "source", "text", "n_words").persist()
        )

    # (1) streaming store latest == batch-operator merge over the replays
    stream_latest = sorted(
        map(tuple, SE.read_latest_snapshot(spark, out["dsir_store"]).collect())
    )
    batch_replay = sorted(
        map(
            tuple,
            text.dsir_merge_counts(
                *[
                    text.dsir_bucket_counts_from_flag(s, is_target, "text")
                    for s in surv_by_night
                ]
            ).collect(),
        )
    )
    assert stream_latest == batch_replay and stream_latest

    # (2) no fingerprint readmitted across nights; fp store monotone
    curated_rows = [
        spark.read.parquet(os.path.join(work, "curated", f"epoch={e}")).collect()
        for e in range(3)
    ]
    assert any(rows for rows in curated_rows)
    fp_by_id = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", fingerprint_expr().alias("fp")).collect()
    }
    all_fps = [fp_by_id[r["doc_id"]] for rows in curated_rows for r in rows]
    assert [f for f, n in Counter(all_fps).items() if n > 1] == []
    prev = set()
    for e in range(3):
        cur = {
            r["fp"]
            for r in spark.read.parquet(
                os.path.join(work, "fp_store", f"v{e}")
            ).collect()
        }
        assert prev <= cur
        prev = cur

    # (3) nights 1-2 selected against the STREAM's store version e-1
    floor_engaged = False
    for e in (1, 2):
        store_prev = spark.read.parquet(
            os.path.join(out["dsir_store"], f"v={e-1}")
        )
        weights = text.dsir_weights_from_counts(store_prev)
        pool = surv_by_night[e].filter(~is_target)
        scored = text.dsir_scores(
            pool, "doc_id", "text", weights, floor_unseen=True
        )
        n_scored = scored.count()
        k = int(math.ceil(0.5 * n_scored))
        top_ids = {
            r["doc_id"]
            for r in scored.orderBy(F.col("dsir_score_q").desc(), "doc_id")
            .limit(k)
            .collect()
        }
        admitted_pool = {
            r["doc_id"] for r in curated_rows[e] if r["source"] not in tgt
        }
        assert admitted_pool <= top_ids
        # floor engagement: any pool bigram bucket absent from the weight
        # table (unseen by the store, or target-only so r_count == 0)?
        w_buckets = {r["bucket"] for r in weights.collect()}
        pool_buckets = {
            r["b"]
            for r in pool.select(
                F.explode(text.hashed_bigram_buckets("text")).alias("b")
            ).collect()
        }
        if pool_buckets - w_buckets:
            floor_engaged = True
    assert floor_engaged, (
        "no unseen bucket in any night's pool — the floor path was never "
        "exercised; shrink n_buckets in the loop or the invariant is vacuous"
    )

    # (4) ANN trajectory: one row per night, sane values, pairs on disk
    ann = out["ann"]
    assert len(ann["epochs"]) == 3
    for row in ann["epochs"]:
        assert row["mode"] in ("exact", "approx")
        assert 0.0 <= row["pruned_fraction"] <= 1.0
        assert row["n_pairs"] >= 0
        assert os.path.isdir(
            os.path.join(work, "ann", "pairs", f"epoch={row['epoch']}")
        )
    assert ann["index_rows"] > 0

    # (5) MinHash probe pairs == cross-split slice of the full pair set
    # over (night-e raw batch ∪ prior-night survivors). Identical hash
    # family/seed/banding on both paths, so this is EXACT equality (the
    # pinned test_minhash_probe_matches_full_pairs argument), replayed
    # from the pairs parquet the loop wrote.
    from end_to_end_ml_spark.operators import dedup

    total_probe_pairs = 0
    for e in (1, 2):
        got = {
            (r["new_id"], r["hist_id"], round(r["jaccard_sim"], 9))
            for r in spark.read.parquet(
                os.path.join(out["minhash_pairs"], f"epoch={e}")
            ).collect()
        }
        batch_e = docs.filter(F.col("doc_id") % 3 == e).select("doc_id", "text")
        hist = surv_by_night[0].select("doc_id", "text")
        for h in range(1, e):
            hist = hist.unionByName(surv_by_night[h].select("doc_id", "text"))
        hist_ids = {r["doc_id"] for r in hist.select("doc_id").collect()}
        full = dedup.minhash_dedup_pairs(
            batch_e.unionByName(hist), "doc_id", "text",
            threshold=0.5, shingle_size=5,
        )
        want = set()
        for r in full.collect():
            a, b = r["id_a"], r["id_b"]
            j = round(r["jaccard_sim"], 9)
            if a % 3 == e and b in hist_ids:
                want.add((a, b, j))
            elif b % 3 == e and a in hist_ids:
                want.add((b, a, j))
        assert got == want
        assert out["nights"][e]["minhash_pairs"] == len(got)
        total_probe_pairs += len(got)
    assert total_probe_pairs > 0, (
        "no cross-night near-dup probe pair at sf0.001 — invariant vacuous"
    )
    # index adds: exactly one per-night append, ids == the survivor set
    for sub in ("sig", "bands"):
        subdirs = sorted(
            d
            for d in os.listdir(os.path.join(out["minhash_index"], sub))
            if d.startswith("epoch=")
        )
        assert subdirs == ["epoch=0", "epoch=1", "epoch=2"]
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(os.path.join(out["minhash_index"], "sig"))
        .select("id")
        .collect()
    }
    surv_ids = {
        r["doc_id"] for s in surv_by_night for r in s.select("doc_id").collect()
    }
    assert idx_ids == surv_ids

    for s in surv_by_night:
        s.unpersist()


def test_curate_epoch_store_mode_guards(spark):
    """curate_epoch's two DSIR store modes are mutually exclusive and the
    external-weights mode requires a frac — both misuses raise loudly
    instead of silently preferring one store."""
    import os
    import sys

    import pytest as _pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from run_curation_pipeline import curate_epoch

    docs = spark.createDataFrame(
        [(1, "src0", "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, source string, text string",
    )
    fake = spark.createDataFrame([(0, 1)], "bucket int, weight long")
    fake_counts = spark.createDataFrame(
        [(0, 1, 1)], "bucket int, t_count long, r_count long"
    )
    with _pytest.raises(ValueError, match="not both"):
        curate_epoch(
            spark, docs, None, 1000,
            dsir_frac=0.5, dsir_counts=fake_counts, dsir_weights=fake,
        )
    with _pytest.raises(ValueError, match="no effect"):
        curate_epoch(spark, docs, None, 1000, dsir_weights=fake)
