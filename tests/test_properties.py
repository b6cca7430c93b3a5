"""Property-based tests (hypothesis) for the custom operators whose
correctness is invariant-shaped rather than example-shaped: splits partition
the input, metrics match a pure-python oracle on arbitrary data, jaccard
matches set algebra."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from end_to_end_ml_spark.functions import metrics as M
from end_to_end_ml_spark.operators import split

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

labeled_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 1)),
    min_size=20,
    max_size=120,
    unique_by=lambda t: t[0],
)


@given(rows=labeled_rows, train_size=st.sampled_from([0.3, 0.5, 0.8]))
@settings(**SETTINGS)
def test_stratified_split_partitions_input(spark, rows, train_size):
    # need both classes present
    rows = rows + [(100_001, 0), (100_002, 1), (100_003, 0), (100_004, 1)]
    df = spark.createDataFrame(rows, ["pk", "y"])
    train, test = split.stratified_split(df, "y", "pk", train_size)
    t = {r["pk"] for r in train.collect()}
    v = {r["pk"] for r in test.collect()}
    assert t.isdisjoint(v)
    assert t | v == {pk for pk, _ in rows}
    # per-class train fraction is the floor/ceil neighborhood of train_size
    for cls in (0, 1):
        n_cls = sum(1 for _, y in rows if y == cls)
        n_train = sum(1 for pk, y in rows if y == cls and pk in t)
        assert abs(n_train - train_size * n_cls) <= 1


@given(
    data=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 15)), min_size=5, max_size=80
    )
)
@settings(**SETTINGS)
def test_roc_auc_matches_python_oracle(spark, data):
    # ensure both classes exist
    data = data + [(0, 3), (1, 9)]
    df = spark.createDataFrame(
        [(y, s / 16.0) for y, s in data], ["label", "score"]
    )
    got = M.roc_auc(df, "label", "score").collect()[0]["roc_auc"]
    # pure-python Mann-Whitney with average ranks
    pos = sorted(s for y, s in data if y == 1)
    neg = sorted(s for y, s in data if y == 0)
    u = 0.0
    for p in pos:
        below = sum(1 for n in neg if n < p)
        ties = sum(1 for n in neg if n == p)
        u += below + ties / 2
    expected = u / (len(pos) * len(neg))
    assert abs(got - expected) < 1e-12


@given(
    data=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 1)), min_size=4, max_size=60
    )
)
@settings(**SETTINGS)
def test_binary_metrics_match_counts(spark, data):
    data = data + [(0, 0), (0, 1), (1, 0), (1, 1)]
    df = spark.createDataFrame(data, ["y", "p"])
    row = M.binary_metrics(df, "y", "p").collect()[0]
    tp = sum(1 for y, p in data if y == 1 and p == 1)
    fp = sum(1 for y, p in data if y == 0 and p == 1)
    fn = sum(1 for y, p in data if y == 1 and p == 0)
    tn = sum(1 for y, p in data if y == 0 and p == 0)
    assert row["accuracy"] == (tp + tn) / len(data)
    assert row["precision"] == tp / (tp + fp)
    assert row["recall"] == tp / (tp + fn)


@given(
    a=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=3), max_size=12),
    b=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=3), max_size=12),
)
@settings(**SETTINGS)
def test_jaccard_matches_set_algebra(spark, a, b):
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.operators.dedup import jaccard

    if not a and not b:
        a = {"x"}
    df = spark.createDataFrame(
        [(sorted(a), sorted(b))], "a array<string>, b array<string>"
    )
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"]
    expected = len(a & b) / len(a | b)
    assert got == expected


edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=80,
)


@given(edges=edge_lists)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_match_union_find(spark, edges):
    """Random graphs: distributed min-label CC == a pure-python union-find.
    Guards the round structure (fused seed, folded convergence probe,
    pointer jumping) against chain/star/clique topologies alike."""
    from end_to_end_ml_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    nodes = sorted(parent)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(members) for members in comp.values() for n in members}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["group_id"] for r in connected_components(df).collect()}
    assert got == expected


chunk_params = st.tuples(
    st.integers(1, 60),   # n tokens
    st.integers(2, 12),   # size
    st.integers(0, 10),   # overlap (clamped below size)
)


@given(params=chunk_params)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunk_documents_cover_and_reconstruct(spark, params):
    """Chunks tile the document: strides reconstruct the exact token
    sequence, every chunk is non-empty and <= size, consecutive chunks
    overlap by exactly `overlap` (except a short final chunk)."""
    from end_to_end_ml_spark.operators.text import chunk_documents

    n, size, overlap = params
    overlap = min(overlap, size - 1)
    stride = size - overlap
    words = [f"w{i}" for i in range(n)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    out = sorted(
        chunk_documents(df, "doc_id", "text", size=size, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    chunks = [r["chunk_text"].split(" ") for r in out]
    assert all(0 < len(c) <= size for c in chunks)
    # reconstruct: first chunk whole, then the non-overlapped tail of each
    rebuilt = list(chunks[0])
    for c in chunks[1:]:
        rebuilt.extend(c[overlap:])
    assert rebuilt == words
    # chunk starts advance by exactly stride
    for k, c in enumerate(chunks):
        assert c[0] == words[k * stride]


pack_params = st.lists(st.integers(1, 400), min_size=1, max_size=60)


@given(counts=pack_params, budget=st.sampled_from([64, 256, 1000]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_greedy_matches_python_scan(spark, counts, budget):
    """Distributed packing == the sequential greedy scan, per shard."""
    from end_to_end_ml_spark.operators.pack import pack_greedy

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: (r["shard"], r["bin_id"])
        for r in pack_greedy(df, "doc_id", "n_tokens", budget=budget, n_shards=3).collect()
    }
    expected = {}
    for shard in range(3):
        fill, b = 0, 0
        for i, c in enumerate(counts):
            if i % 3 != shard:
                continue
            if fill > 0 and fill + c > budget:
                b, fill = b + 1, 0
            expected[i] = (shard, b)
            fill += c
    assert got == expected


@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=120,
    )
)
@settings(**SETTINGS)
def test_global_ordinal_matches_sorted_rank(spark, keys):
    """global_ordinal == row_number over (key, pk) - 1 for arbitrary keys
    (duplicates, negatives, huge magnitudes), any bucket count."""
    from end_to_end_ml_spark.operators.ordinal import global_ordinal

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["pk", "key"])
    out = global_ordinal(df, "key", "pk", n_buckets=5).collect()
    expected = {
        pk: rank
        for rank, (k, pk) in enumerate(sorted((k, pk) for pk, k in rows))
    }
    assert {r["pk"]: r["ordinal"] for r in out} == expected


@given(
    st.sets(
        st.integers(min_value=-(10**12), max_value=10**12), min_size=2, max_size=80
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_shard_shuffle_is_permutation(spark, ids, n_shards):
    """shard_shuffle: output ids = input ids exactly once; pos dense per
    shard; shard in range — for arbitrary unique int64 keys."""
    from end_to_end_ml_spark.operators.pack import shard_shuffle

    df = spark.createDataFrame([(i,) for i in ids], ["pk"])
    out = shard_shuffle(df, "pk", n_shards=n_shards).collect()
    assert sorted(r["pk"] for r in out) == sorted(ids)
    per = {}
    for r in out:
        assert 0 <= r["shard"] < n_shards
        per.setdefault(r["shard"], []).append(r["pos"])
    assert all(sorted(v) == list(range(len(v))) for v in per.values())


@given(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=4, max_size=100
    ).filter(lambda xs: len(set(xs)) >= 2)
)
@settings(**SETTINGS)
def test_temperature_sample_invariants(spark, groups):
    """temperature_sample: output ⊆ input; at least one smallest group is
    kept whole (its keep fraction is exactly 1)."""
    from collections import Counter

    from end_to_end_ml_spark.operators.split import temperature_sample

    rows = [(i, g) for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, ["pk", "grp"])
    kept = temperature_sample(df, "pk", "grp").collect()
    kept_pks = {r["pk"] for r in kept}
    assert kept_pks <= {pk for pk, _ in rows}
    counts = Counter(groups)
    nmin = min(counts.values())
    kept_counts = Counter(r["grp"] for r in kept)
    smallest = [g for g, c in counts.items() if c == nmin]
    assert any(kept_counts[g] == counts[g] for g in smallest)


@given(
    m=st.integers(min_value=0, max_value=5000),
    frac=st.floats(min_value=0.01, max_value=0.99, allow_nan=False),
)
@settings(**{k: v for k, v in SETTINGS.items() if k != "suppress_health_check"},
          suppress_health_check=list(HealthCheck))
def test_kept_count_matches_bruteforce(m, frac):
    """The carve cutoff's 5-candidate boundary scan must equal the O(m)
    brute force of the operator's float comparison for ANY (m, frac) —
    including boundary cases where (r-1)/(m-1) rounds across frac."""
    from end_to_end_ml_spark.operators.split import _kept_count

    brute = m if m <= 1 else sum(1 for r in range(1, m + 1) if (r - 1) / (m - 1) < frac)
    assert _kept_count(m, frac) == brute


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False, width=32),
        min_size=1,
        max_size=120,
    ),
)
@settings(**SETTINGS)
def test_histogram_quantile_edges_bound_exact_quantiles(spark, vals):
    """For ANY value list, every reported qth edge is >= the exact qth
    order statistic and overshoots it by at most one bin width (the
    sketch's stated error contract)."""
    import datetime as dt

    from end_to_end_ml_spark.operators import timeseries as TS

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), float(v), i)
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(rows, ["g", "ts", "value", "i"])
    h = TS.histogram_sketch(ev, "ts", "g", "value", bin_width=10.0)
    out = TS.histogram_quantiles(h, ["g"]).collect()[0]
    svals = sorted(vals)
    n = len(svals)
    for q in (50, 90, 99):
        # exact q-th order statistic under the cum*100 >= q*total rule
        k = -(-q * n // 100)  # ceil(q*n/100)
        exact = svals[k - 1]
        edge = out[f"p{q}_edge_x100"] / 100.0
        assert edge > exact or edge == exact  # upper bound
        assert edge - exact <= 10.0  # within one bin width
    assert out["n_events"] == n


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=25,
    ),
    t100=st.sampled_from([50, 60, 80]),
    ngram=st.sampled_from([1, 2]),
)
@settings(**SETTINGS)
def test_prefix_filter_jaccard_equals_bruteforce(spark, texts, t100, ngram):
    """Prefix filtering over ARBITRARY small corpora (tiny vocab — the
    adversarial case) emits exactly the brute-force pair set at any
    threshold and token granularity."""
    from end_to_end_ml_spark.operators import dedup

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["union_sz"])
        for r in dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", threshold_x100=t100, ngram=ngram
        ).collect()
    }

    def toks(t):
        w = t.split()
        if ngram == 1:
            return set(w)
        return {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}

    sets = {i: toks(t) for i, t in enumerate(texts)}
    want = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if 100 * inter >= t100 * uni:
                    want[(i, j)] = (inter, uni)
    assert got == want


@given(
    epochs=st.lists(
        st.integers(1_700_000_000, 1_700_900_000), min_size=2, max_size=80
    ),
    n_slices=st.sampled_from([2, 4, 7]),
)
@settings(**SETTINGS)
def test_rolling_origin_partitions_and_orders(spark, epochs, n_slices):
    """Every row gets a slice in [0, n); slices partition the input; max
    ts of slice k < min ts of slice k+1 for every occupied adjacent
    pair (the no-leakage invariant), on arbitrary timestamp multisets."""
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.operators.split import rolling_origin_assign

    df = spark.createDataFrame(
        [(i, e) for i, e in enumerate(epochs)], ["i", "e"]
    ).select("i", F.timestamp_seconds(F.col("e")).alias("ts"))
    out = rolling_origin_assign(df, "ts", n_slices=n_slices).collect()
    assert len(out) == len(epochs)
    by_slice = {}
    for r in out:
        assert 0 <= r["slice"] < n_slices
        by_slice.setdefault(r["slice"], []).append(r["ts"])
    occupied = sorted(by_slice)
    for a, b in zip(occupied, occupied[1:]):
        assert max(by_slice[a]) < min(by_slice[b])


budget_groups = st.lists(
    st.tuples(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(1, 5000),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(groups=budget_groups, budget=st.integers(1, 50_000),
       meps=st.sampled_from([512, 1024, 2048]))
@settings(**SETTINGS)
def test_waterfill_exhausts_budget_or_hits_all_caps(spark, groups, budget, meps):
    """The water-filling closed form on arbitrary inputs: Σ alloc ==
    min(budget, Σ caps); no group exceeds its cap; clipped == at-cap;
    and the allocation dominates the single-pass form group-wise
    whenever nothing clips there."""
    rows = [(g, n) for g, n in groups]
    df = spark.createDataFrame(rows, ["source", "n_tokens"])
    out = split.token_budget_waterfill(
        df, "source", "n_tokens", budget, max_epochs_x1024=meps
    ).collect()
    caps = {g: (meps * n) // 1024 for g, n in groups}
    total = sum(r["alloc_tokens"] for r in out)
    assert total == min(budget, sum(caps.values()))
    for r in out:
        assert 0 <= r["alloc_tokens"] <= caps[r["source"]]
        if r["clipped"]:
            assert r["alloc_tokens"] == caps[r["source"]]


WATERFILL_CTE_TEMPLATE = r"""
WITH RECURSIVE
g(name, weight_q, cap_tokens) AS (VALUES {values}),
step(iter, frozen, budget_left, shares, done) AS (
  SELECT 0, CAST([] AS VARCHAR[]), CAST({budget} AS BIGINT),
         CAST([] AS STRUCT(b VARCHAR, cap BIGINT, share BIGINT)[]), false
  UNION ALL
  SELECT iter + 1,
         list_concat(frozen, list_transform(over_l, o -> o.b)),
         budget_left - coalesce(CAST(list_sum(list_transform(over_l, o -> o.cap)) AS BIGINT), 0),
         shares_l,
         len(over_l) = 0
  FROM (
    SELECT *, list_filter(shares_l, a -> a.share > a.cap) AS over_l
    FROM (
      SELECT *,
        list_transform(act, a -> struct_pack(
          b := a.b, cap := a.cap,
          share := CAST((CAST(budget_left AS HUGEINT) * a.w) // wtot AS BIGINT)
            + CASE WHEN
                len(list_filter(act, z ->
                  (CAST(budget_left AS HUGEINT) * z.w) % wtot > (CAST(budget_left AS HUGEINT) * a.w) % wtot
                  OR ((CAST(budget_left AS HUGEINT) * z.w) % wtot = (CAST(budget_left AS HUGEINT) * a.w) % wtot
                      AND z.b < a.b))) + 1
                <= budget_left - CAST(list_sum(list_transform(act, z ->
                     CAST((CAST(budget_left AS HUGEINT) * z.w) // wtot AS BIGINT))) AS BIGINT)
              THEN 1 ELSE 0 END)) AS shares_l
      FROM (
        SELECT iter, frozen, budget_left, act,
               CAST(list_sum(list_transform(act, a -> a.w)) AS HUGEINT) AS wtot
        FROM (
          SELECT s.iter, s.frozen, s.budget_left,
                 (SELECT coalesce(list(struct_pack(b := x.name, w := x.weight_q, cap := x.cap_tokens)
                                       ORDER BY x.name), [])
                  FROM g x WHERE NOT list_contains(s.frozen, x.name)) AS act
          FROM step s WHERE NOT s.done AND s.budget_left > 0
        ) WHERE len(act) > 0
      )
    )
  )
),
last AS (SELECT * FROM step ORDER BY iter DESC LIMIT 1)
SELECT g.name,
  CASE WHEN list_contains(l.frozen, g.name) THEN g.cap_tokens
       WHEN l.done THEN list_filter(l.shares, a -> a.b = g.name)[1].share
       ELSE 0 END AS alloc_tokens,
  list_contains(l.frozen, g.name) AS clipped
FROM g CROSS JOIN last l
ORDER BY g.name
"""

waterfill_groups = st.lists(
    st.tuples(
        st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=6),
        st.integers(1, 10**9),      # weight_q
        st.integers(0, 10**9),      # cap_tokens
    ),
    min_size=1,
    max_size=7,
    unique_by=lambda t: t[0],
)


@given(groups=waterfill_groups, budget=st.integers(0, 4 * 10**9))
@settings(max_examples=200, deadline=None)  # pure DuckDB + Python — no
# Spark session in the loop, so this law can afford 13x the house budget
def test_waterfill_cte_replays_production_loop(groups, budget):
    """mix4's DuckDB recursive-CTE oracle template must replay
    operators/split.waterfill_integer_loop EXACTLY on arbitrary inputs —
    same allocations, same frozen set — not just on the three SF data
    points the registry row pins. Covers: budget 0, infeasible budgets
    (Σ caps < budget → everyone at cap), zero caps, mod ties broken by
    key string order, multi-round cascades, and HUGEINT-scale products
    (budget·weight up to ~4e18·1e9)."""
    import duckdb

    from end_to_end_ml_spark.operators.split import waterfill_integer_loop

    g = [{"g": name, "w": w, "cap": cap} for name, w, cap in groups]
    alloc, frozen = waterfill_integer_loop(g, budget)
    values = ", ".join(
        f"('{name}', CAST({w} AS BIGINT), CAST({cap} AS BIGINT))"
        for name, w, cap in groups
    )
    sql = WATERFILL_CTE_TEMPLATE.format(values=values, budget=budget)
    got = {
        name: (a, c) for name, a, c in duckdb.connect().execute(sql).fetchall()
    }
    want = {name: (alloc[name], name in frozen) for name, _, _ in groups}
    assert got == want


doc_corpus = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=20).map(" ".join),
    min_size=1,
    max_size=25,
)


@given(texts=doc_corpus, tw=st.sampled_from([1, 2, 4]))
@settings(**SETTINGS)
def test_tile_dedup_rewrite_preserves_distinct_tiles(spark, texts, tw):
    """d17 invariants on arbitrary corpora: (a) kept-tile count equals the
    number of DISTINCT tiles in the corpus; (b) each doc's rewritten text
    is the in-order concatenation of the first-occurrence subset of its
    own tiles (python replay)."""
    from end_to_end_ml_spark.operators.dedup import tile_dedup_rewrite

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in tile_dedup_rewrite(df, "doc_id", "text", tw).collect()}
    seen: set = set()
    expect: dict = {}
    for i, t in rows:
        w = t.split()
        kept = []
        for s in range(0, len(w), tw):
            tile = " ".join(w[s : s + tw])
            if tile not in seen:
                seen.add(tile)
                kept.append(tile)
        if kept:
            expect[i] = (" ".join(kept), len(kept))
    assert set(out) == set(expect)
    for i, (txt, n) in expect.items():
        assert out[i]["rewritten_text"] == txt
        assert out[i]["n_tiles_kept"] == n
    assert sum(r["n_tiles_kept"] for r in out.values()) == len(seen)


recode_rows = st.lists(st.sampled_from(["1", "2", "3", "9", None]), min_size=1, max_size=30)
recode_map = st.dictionaries(
    st.sampled_from(["1", "2", "3"]), st.sampled_from(["A", "B", "C"]), max_size=3
)


@given(vals=recode_rows, mapping=recode_map)
@settings(**SETTINGS)
def test_recode_values_matches_python_replace(spark, vals, mapping):
    """P9 parity law: chained CASE WHEN == pandas Series.replace on
    arbitrary values/mappings — unmapped (incl. NULL) pass through."""
    from end_to_end_ml_spark.operators import prep

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, g string"
    )
    out = {r["i"]: r["g"] for r in prep.recode_values(df, "g", mapping).collect()}
    for i, v in enumerate(vals):
        assert out[i] == (mapping.get(v, v) if v is not None else None)


_dsir_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omie", "tau", "x9", "q"]
)
_dsir_doc = st.lists(_dsir_word, min_size=0, max_size=12).map(" ".join)


@given(
    target=st.lists(_dsir_doc, min_size=1, max_size=6),
    pool=st.lists(_dsir_doc, min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_dsir_scores_match_python_replay(spark, target, pool):
    """DSIR integer law on arbitrary corpora: for every scorable pool doc,
    dsir_score == Σ_bigrams ((t_b+1)*65536) // (r_b+1) computed by a pure
    python replay (md5 buckets, add-one smoothing, integer div), and
    dsir_score_q == dsir_score // n_bigrams; zero-bigram docs are absent."""
    import hashlib

    from end_to_end_ml_spark.operators import text

    def buckets(doc):
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in doc.lower()
        ).split() if t]
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % 256
            for bg in bgs
        ]

    t_counts: dict[int, int] = {}
    for d in target:
        for b in buckets(d):
            t_counts[b] = t_counts.get(b, 0) + 1
    r_counts: dict[int, int] = {}
    for d in pool:
        for b in buckets(d):
            r_counts[b] = r_counts.get(b, 0) + 1
    weights = {
        b: ((t_counts.get(b, 0) + 1) * 65536) // (rc + 1)
        for b, rc in r_counts.items()
    }
    expect = {}
    for i, d in enumerate(pool):
        bs = buckets(d)
        if bs:
            score = sum(weights[b] for b in bs)
            expect[i] = (len(bs), score, score // len(bs))

    tgt_df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(target)], "doc_id long, text string"
    )
    pool_df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(pool)], "doc_id long, text string"
    )
    w = text.dsir_bucket_weights(tgt_df, pool_df, "text")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_score"], r["dsir_score_q"])
        for r in text.dsir_scores(pool_df, "doc_id", "text", w).collect()
    }
    assert got == expect


# --- pipe13's two-level distributed rank (r11 rewrite) --------------------

half_cut_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 12)),
    min_size=1,
    max_size=80,
    unique_by=lambda t: t[0],
)


@given(rows=half_cut_rows)
@example(rows=[(i, 7) for i in range(40)])  # ALL scores equal: one hot
# score partition — the r12 degeneracy case. The order-preserving range
# bucket must keep the doc_id tie-break EXACT here (a hash salt would
# keep a hash-dependent half instead of the smallest ceil(n/2) doc_ids).
@example(rows=[(i * 1000 + 3, i % 2) for i in range(60)])  # sparse ids, hot scores
@example(rows=[(i - 30, 5) for i in range(50)])  # negative ids, one hot score
@settings(**SETTINGS)
def test_two_level_half_cut_equals_rank_window(spark, rows):
    """pipe13's half-pool cut was rewritten (r11) from a single global
    rank window to the two-level distributed rank, and (r12) the shared
    helper metrics.two_level_rank gained the order-preserving id-range
    bucket that splits hot score partitions. Metamorphic pin: on
    ARBITRARY (id, score) frames — including heavy score ties, the case
    where rank() vs row_number() could diverge if the tie-break were
    wrong, and all-equal-scores, where a non-order-preserving salt would
    change WHICH docs survive the cut — the production helper's
    selection must equal BOTH (a) the old global-window formulation and
    (b) a pure-python replay of 'keep rank r where 2r <= n+1 under
    (score desc, id asc)'. Runs the REAL helper (pipe13's and a13's code
    path), not a test-local copy, with n_buckets=4 so even the 80-row
    cases actually span multiple range buckets."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.functions import metrics as M

    df = spark.createDataFrame(rows, ["doc_id", "s"])
    # (a) the old global-window form
    w_rank = Window.orderBy(F.col("s").desc(), "doc_id")
    old = {
        r["doc_id"]
        for r in df.select(
            "doc_id",
            F.rank().over(w_rank).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
        )
        .filter(F.col("rk") * 2 <= F.col("np") + 1)
        .collect()
    }
    # (b) pure-python replay
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    n = len(ordered)
    expect = {doc for i, (doc, _) in enumerate(ordered) if 2 * (i + 1) <= n + 1}
    assert old == expect
    # the production two-level form (pipe13's and a13's shared helper)
    got = {
        r["doc_id"]
        for r in M.two_level_rank(df, "s", "doc_id", n_buckets=4)
        .filter(F.col("pos") * 2 <= F.col("n_total") + 1)
        .collect()
    }
    assert got == expect
    # and the exact positions, not just the cut: pos == rank()
    pos_got = {
        r["doc_id"]: r["pos"]
        for r in M.two_level_rank(df, "s", "doc_id", n_buckets=4).collect()
    }
    pos_expect = {doc: i + 1 for i, (doc, _) in enumerate(ordered)}
    assert pos_got == pos_expect


def test_two_level_rank_null_tiebreak_raises_not_drops(spark):
    """r12 ADVICE #1: a NULL tiebreak in the integral path used to yield a
    NULL __bkt — the row was counted into the cell frame and n_total but
    never matched the (score, __bkt) equi-join, so it VANISHED silently
    while n_total still included it. The PK contract makes this misuse,
    but misuse must RAISE (assert_true), not drop rows."""
    import pytest as _pytest

    from end_to_end_ml_spark.functions import metrics as M

    # match on the message, not a concrete exception class: a single-stage
    # failure surfaces as SparkRuntimeException, but AQE can merge several
    # failing stage materializations into a wrapping SparkException
    df = spark.createDataFrame(
        [(1, 5), (None, 5), (3, 2)], "doc_id bigint, s bigint"
    )
    with _pytest.raises(Exception, match="NULL in tiebreak column"):
        M.two_level_rank(df, "s", "doc_id", n_buckets=4).collect()
    # same class, same loudness for a NULL SCORE (found by self-review:
    # a NULL score never matches the (score, __bkt) equi-join either) —
    # in BOTH the integral and the non-integral tiebreak paths
    df2 = spark.createDataFrame(
        [(1, 5), (2, None), (3, 2)], "doc_id bigint, s bigint"
    )
    with _pytest.raises(Exception, match="NULL in score column"):
        M.two_level_rank(df2, "s", "doc_id", n_buckets=4).collect()
    df3 = spark.createDataFrame(
        [("a", 5), ("b", None), ("c", 2)], "k string, s bigint"
    )
    with _pytest.raises(Exception, match="NULL in score column"):
        M.two_level_rank(df3, "s", "k", n_buckets=4).collect()
    # non-null frames are untouched by the guard
    ok = spark.createDataFrame([(1, 5), (2, 5), (3, 2)], "doc_id bigint, s bigint")
    got = {
        r["doc_id"]: r["pos"]
        for r in M.two_level_rank(ok, "s", "doc_id", n_buckets=4).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


@given(
    basket=st.lists(st.integers(0, 50), min_size=0, max_size=14),
)
@settings(**SETTINGS)
def test_basket_pairs_expr_equals_nested_loop(spark, basket):
    """_basket_pairs_expr (q23/q24's in-array replacement for the
    l_orderkey self-join) must emit exactly the i<j combinations of the
    sorted-distinct basket — the pair multiset the old
    distinct + self-join + (part_a < part_b) shape produced."""
    from end_to_end_ml_spark.plans.entry_queries import _basket_pairs_expr

    df = spark.createDataFrame([(1, basket)], "id int, raw array<bigint>")
    from pyspark.sql import functions as F

    # build "parts" the same way the queries do
    got = (
        df.select(
            F.array_sort(F.array_distinct("raw")).alias("parts")
        )
        .select(F.explode(_basket_pairs_expr("parts")).alias("p"))
        .select("p.part_a", "p.part_b")
        .collect()
    )
    got_pairs = sorted((r["part_a"], r["part_b"]) for r in got)
    uniq = sorted(set(basket))
    want = [
        (uniq[i], uniq[j])
        for i in range(len(uniq))
        for j in range(i + 1, len(uniq))
    ]
    assert got_pairs == want
    assert all(a < b for a, b in got_pairs)
