"""Scale-machinery tests: salting preserves semantics; bucketing removes the
join shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_ml_spark.operators import skew
from end_to_end_ml_spark.sources.io import write_bucketed


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)],
        ["id", "key", "v"],
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], ["key", "attr"])
    salted = skew.salted_join(fact, dim, "key", salt_buckets=4)
    plain = fact.join(dim, "key")
    assert salted.count() == plain.count() == 1000
    s = salted.groupBy("key", "attr").agg(F.sum("v").alias("sv")).collect()
    p = plain.groupBy("key", "attr").agg(F.sum("v").alias("sv")).collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, p))


def test_salted_join_left_rows_not_duplicated(spark):
    fact = spark.createDataFrame([(i, "k") for i in range(100)], ["id", "key"])
    dim = spark.createDataFrame([("k", 9)], ["key", "attr"])
    out = skew.salted_join(fact, dim, "key", salt_buckets=8)
    assert out.select("id").distinct().count() == 100
    assert out.count() == 100


def test_salted_collect_list_sorted_exact(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(5)], ["k", "v"]
    )
    out = {r["k"]: r["vs"] for r in skew.salted_collect_list(df, ["k"], "v", 4).collect()}
    assert out["a"] == list(range(50))
    assert out["b"] == list(range(5))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bleft", ["k"], num_buckets=4, sort_cols=["k"])
    write_bucketed(right, "t_bright", ["k"], num_buckets=4, sort_cols=["k"])
    try:
        joined = (
            spark.table("t_bleft")
            .hint("merge")
            .join(spark.table("t_bright").hint("merge"), "k")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    from end_to_end_ml_spark.sources.io import write_parquet

    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "parted")
    write_parquet(df, path, partition_by=["bucket"])
    back = spark.read.parquet(path).filter(F.col("bucket") == "2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "(bucket = 2)" in plan or "bucket#" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == 250


def test_salted_join_rejects_outer_joins(spark):
    import pytest as _pytest

    fact = spark.createDataFrame([(1, "a")], ["key", "x"])
    dim = spark.createDataFrame([(1, "d")], ["key", "y"])
    for how in ("right", "full", "outer", "left_anti"):
        with _pytest.raises(ValueError):
            skew.salted_join(fact, dim, "key", how=how)


def test_online_store_export_roundtrip(spark, tmp_path):
    """S2-variant (Feast-materialize stand-in): latest row per key, written
    bucketed by key hash; a point lookup reads one bucket directory."""
    from end_to_end_ml_spark.sources.io import export_online_store

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-03 00:00:00", 3.0),   # latest for key 1
        (2, "2024-01-02 00:00:00", 2.0),
        (1, "2024-01-02 00:00:00", 9.9),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).selectExpr(
        "k", "cast(ts as timestamp) ts", "v"
    )
    path = str(tmp_path / "online")
    out = export_online_store(df, ["k"], "ts", path, num_buckets=8)
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 3.0, 2: 2.0}
    back = spark.read.parquet(path)
    assert {r["k"]: r["v"] for r in back.collect()} == got
    assert "__bucket" in back.columns  # partition column = addressable bucket
    import os

    buckets = [d for d in os.listdir(path) if d.startswith("__bucket=")]
    assert 1 <= len(buckets) <= 8


def test_register_views_full_sql_surface(spark):
    """register_views exposes every table to spark.sql with the same
    normalization as load_table — a SQL join must equal its DataFrame
    twin, including the events.ts timestamp handling."""
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.sources.io import load_table, register_views

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    sql_out = spark.sql(
        "SELECT e.event_type, count(*) AS n, min(e.ts) AS first_ts "
        "FROM events e GROUP BY e.event_type ORDER BY e.event_type"
    ).collect()
    ev = load_table(spark, sf, "events")
    df_out = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("first_ts"))
        .orderBy("event_type")
        .collect()
    )
    assert sql_out == df_out
    assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0


def test_load_table_memoizes_per_session_and_dir(spark):
    """Repeated load_table calls reuse one analyzed scan (driver-side
    file-listing/footer RPCs are 20-40% of a sub-second query's wall time);
    different dirs or tables never share cache entries."""
    from end_to_end_ml_spark.sources.io import load_table

    a = load_table(spark, "/root/testdata/sf0.001", "orders")
    b = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert a is b
    c = load_table(spark, "/root/testdata/sf0.01", "orders")
    assert c is not a
    d = load_table(spark, "/root/testdata/sf0.001", "customer")
    assert d is not a
    # the cached frame is still a plain lazy scan — fresh queries compose
    assert a.filter("o_orderkey = 1").count() <= 1


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source/sink parity: values survive the round trip and filters
    reach the ORC scan (PushedFilters), same as the parquet path."""
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.sources.io import load_table, write_orc

    df = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(df, path)
    back = spark.read.orc(path)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)
    a = df.agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("s")).collect()
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("s")).collect()
    assert a == b
    plan = (
        back.filter(F.col("o_orderkey") == 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EqualTo(o_orderkey,5)" in plan, plan


def test_write_parquet_observed_single_pass_stats(spark, tmp_path):
    """The observed sink's stats must equal a direct recount — without the
    recount scan (Observation piggybacks on the write tasks).

    Runs in a child session (`newSession`): Spark 4.1's Observation leaves
    the owning session's ObservationManager captured in later closure
    serialization (NotSerializableException in unrelated MLlib fits) — a
    session-state leak the operator's docstring warns about; the shared
    SparkContext is unaffected."""
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.sources.io import write_parquet_observed

    spark = spark.newSession()
    df = spark.range(1000).select(
        "id", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v")
    )
    stats = write_parquet_observed(df, str(tmp_path / "obs"), count_null_cols=["v"])
    assert stats["n_rows"] == 1000
    assert stats["null_v"] == 100
    back = spark.read.parquet(str(tmp_path / "obs"))
    assert back.count() == 1000


def test_guarded_persist_skips_already_cached_plan(spark):
    """dedup._persist must not re-persist a plan the CacheManager already
    holds — with memoized scans a repeated operator call rebuilds an
    IDENTICAL logical plan, and a bare persist() there logs `Asked to
    cache already cached data` and risks sibling-cache eviction."""
    from pyspark.storagelevel import StorageLevel

    from end_to_end_ml_spark.operators.dedup import _persist

    a = spark.range(1234).withColumn("v", F.col("id") % 5)
    try:
        _persist(a).count()  # materialize the cache
        # a SEPARATE DataFrame object with the identical logical plan:
        # storageLevel consults the CacheManager by plan, not by object
        b = spark.range(1234).withColumn("v", F.col("id") % 5)
        assert b.storageLevel != StorageLevel.NONE
        assert _persist(b) is b  # guard short-circuits: no second persist
    finally:
        a.unpersist()
    fresh = spark.range(4321).withColumn("v", F.col("id") % 5)
    try:
        assert fresh.storageLevel == StorageLevel.NONE
        assert _persist(fresh) is not fresh or fresh.storageLevel != StorageLevel.NONE
    finally:
        fresh.unpersist()


def test_dedup_operators_do_not_stack_cache_entries(spark):
    """Calling a fingerprint-persisting operator twice over the memoized
    scan leaves ONE cache entry per persisted intermediate, not two — the
    bench-tail `CacheManager` warning regression guard."""
    from end_to_end_ml_spark.operators import dedup
    from end_to_end_ml_spark.sources.io import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    jcm = spark._jsparkSession.sharedState().cacheManager()
    try:
        dedup.minhash_dedup_pairs(docs, "doc_id", "text").count()
        first = jcm.numCachedEntries() if hasattr(jcm, "numCachedEntries") else None
        dedup.minhash_dedup_pairs(docs, "doc_id", "text").count()
        if first is not None:
            assert jcm.numCachedEntries() == first
    finally:
        spark.catalog.clearCache()


def test_scan_cache_invalidated_on_write(spark, tmp_path):
    """A sink writing into a memoized table directory must drop the stale
    scan entries: the cached relation pins its file listing, so without
    invalidation later reads return the OLD files."""
    from end_to_end_ml_spark.sources import io as sio

    d = str(tmp_path)
    sio.write_parquet(spark.range(10).withColumn("v", F.lit(1)), f"{d}/tbl.parquet")
    first = sio.load_table(spark, d, "tbl")
    assert first.count() == 10
    assert sio.load_table(spark, d, "tbl") is first  # memoized
    # rewrite through the engine's own sink → cache entry must drop
    sio.write_parquet(spark.range(25).withColumn("v", F.lit(2)), f"{d}/tbl.parquet")
    second = sio.load_table(spark, d, "tbl")
    assert second is not first
    assert second.count() == 25
    assert sio.invalidate_scan_cache(f"{d}/tbl.parquet") == 1  # drops what we re-cached


def test_merge_schema_read_surfaces_evolved_columns(spark, tmp_path):
    """Schema evolution: a column added in later batches must surface (as
    NULL for old rows) — and reconcile_columns then pins the serving set."""
    from end_to_end_ml_spark.operators.prep import reconcile_columns
    from end_to_end_ml_spark.sources.io import read_parquet_evolved

    p = str(tmp_path / "evolving")
    spark.range(0, 10).selectExpr("id", "id * 2 AS a").write.parquet(p + "/batch=1")
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS a", "id * 3 AS b"
    ).write.parquet(p + "/batch=2")
    back = read_parquet_evolved(spark, p)
    assert set(back.columns) >= {"id", "a", "b"}
    assert back.count() == 20
    assert back.filter(F.col("b").isNull()).count() == 10
    pinned = reconcile_columns(back, ["id", "b", "missing_col"])
    assert pinned.columns == ["id", "b"]


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from end_to_end_ml_spark.sources.io import compact_small_files
    import os

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(0, 20000).repartition(64).write.parquet(src)
    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src >= 32
    n = compact_small_files(spark, src, dst, target_file_mb=128)
    n_dst = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n == 1 and n_dst == 1  # tiny dataset -> one target-size file
    assert spark.read.parquet(dst).count() == 20000


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """Z-ordered files must each cover a small rectangle of the 2-D value
    space: the summed per-file min-max coverage on EACH dimension is far
    below the unclustered layout's (where every file spans ~the whole
    domain) — the property parquet min/max pruning exploits."""
    from end_to_end_ml_spark.sources.io import write_zordered

    df = spark.range(40_000).select(
        (F.col("id") % 200).alias("a"),
        ((F.col("id") * 7919) % 200).alias("b"),
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zordered(df, zpath, "a", "b", n_files=16)
    df.repartition(16).write.parquet(rpath)

    def mean_coverage(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(((F.max(col) - F.min(col)) / F.lit(199.0)).alias("cov"))
        )
        rows = per_file.collect()
        return sum(r["cov"] for r in rows) / len(rows)

    for c in ("a", "b"):
        z, r = mean_coverage(zpath, c), mean_coverage(rpath, c)
        assert z < 0.55 * r, f"dim {c}: z-order coverage {z} not << random {r}"
    # layout-only: the data itself is unchanged
    assert spark.read.parquet(zpath).count() == 40_000
    zsum = spark.read.parquet(zpath).agg(F.sum("a"), F.sum("b")).collect()[0]
    rsum = df.agg(F.sum("a"), F.sum("b")).collect()[0]
    assert tuple(zsum) == tuple(rsum)


def test_schema_evolution_merge_read(spark, tmp_path):
    """Ingest-side schema evolution: a dataset written in two epochs (the
    second adds a column) must read back under one merged schema with
    NULLs for the pre-evolution rows — the mergeSchema contract a
    long-lived 100 TB dataset depends on when producers add fields."""
    p = str(tmp_path / "evolving")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p + "/epoch=1")
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS v", "'b' AS channel"
    ).write.parquet(p + "/epoch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "channel", "epoch"}
    assert merged.count() == 20
    old_rows = merged.filter(F.col("epoch") == 1)
    assert old_rows.filter(F.col("channel").isNull()).count() == 10
    new_rows = merged.filter(F.col("epoch") == 2)
    assert new_rows.filter(F.col("channel") == "b").count() == 10


def test_approx_percentile_rank_error_bounded(spark):
    """percentile_approx is THE quantile path at 100 TB (exact percentile
    needs a full sort); its GK sketch guarantees rank error <= 1/accuracy.
    Verify the contract: each approximate percentile's TRUE rank is within
    n/accuracy of the requested rank."""
    from end_to_end_ml_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    n = li.count()
    accuracy = 1000
    ps = [0.01, 0.25, 0.5, 0.75, 0.99]
    approx = li.agg(
        F.percentile_approx("l_extendedprice", ps, accuracy).alias("q")
    ).collect()[0]["q"]
    for p, v in zip(ps, approx):
        true_rank = li.filter(F.col("l_extendedprice") <= v).count()
        assert abs(true_rank - p * n) <= n / accuracy + 1, (p, v, true_rank, n)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from end_to_end_ml_spark.sources.io import compact_parquet, parquet_file_stats

    src = str(tmp_path / "frag")
    # 64 tiny files
    spark.range(0, 10000).withColumn("v", F.col("id") * 3).repartition(64).write.parquet(src)
    assert parquet_file_stats(src)["n_files"] == 64

    dst = str(tmp_path / "compact")
    report = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert report["after"]["n_files"] < report["before"]["n_files"]
    assert report["after"]["n_files"] == report["n_target"] == 1

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert b.count() == 10000
    # content identical (layout-only operation)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_parquet_empty_source_raises(spark, tmp_path):
    import pytest as _pytest

    from end_to_end_ml_spark.sources.io import compact_parquet

    empty = tmp_path / "none"
    empty.mkdir()
    with _pytest.raises(ValueError):
        compact_parquet(spark, str(empty), str(tmp_path / "out"))


def test_read_text_corpus_content_ids(spark, tmp_path):
    from end_to_end_ml_spark.sources.io import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("hello world\n\nsecond doc\n")
    (d / "b.txt").write_text("hello world\nthird doc\n")
    out = read_text_corpus(spark, str(d)).collect()
    assert len(out) == 4  # empty line dropped
    ids = {}
    for r in out:
        ids.setdefault(r["text"], set()).add(r["doc_id"])
    # identical content -> identical id (by contract), distinct otherwise
    assert len(ids["hello world"]) == 1
    assert len({list(v)[0] for v in ids.values()}) == 3
    assert all(r["file"].endswith((".txt",)) for r in out)


def test_read_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    from end_to_end_ml_spark.sources.io import read_jsonl_quarantine

    f = tmp_path / "in.jsonl"
    f.write_text(
        '{"id": 1, "v": "ok"}\n'
        '{"id": 2, "v": "also ok"}\n'
        "{broken json!!\n"
        '{"id": "not-an-int", "v": 3}\n'
    )
    good, bad = read_jsonl_quarantine(spark, str(f), "id BIGINT, v STRING")
    g = good.orderBy("id").collect()
    assert [r["id"] for r in g if r["id"] is not None] == [1, 2]
    b = bad.collect()
    assert any("broken json" in r["raw_line"] for r in b)


def test_compact_parquet_rejects_remote_uri(spark, tmp_path):
    """os.walk sizing is local-only: a remote URI must fail loudly, not
    report n_files=0 (r6 advisory)."""
    import pytest

    from end_to_end_ml_spark.sources.io import parquet_file_stats

    with pytest.raises(ValueError, match="non-local path"):
        parquet_file_stats("s3://bucket/table")
    with pytest.raises(ValueError, match="non-local path"):
        parquet_file_stats("file://remotehost/tmp/t")  # non-local file URI
    # local file URIs resolve — both slash forms Hadoop accepts
    local = tmp_path / "t"
    spark.range(10).write.parquet(str(local))
    assert parquet_file_stats(f"file://{local}")["n_files"] >= 1
    assert parquet_file_stats(f"file:{local}")["n_files"] >= 1  # single-slash
    assert parquet_file_stats(f"file://localhost{local}")["n_files"] >= 1
    # a legal local directory whose first segment contains a colon is NOT
    # a URI (round-7 ADVICE: 'data:v2/table' was rejected as remote)
    colon = tmp_path / "data:v2" / "t"
    spark.range(5).write.parquet(str(colon))
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert parquet_file_stats("data:v2/t")["n_files"] >= 1
        # round-8 ADVICE: the URI test must be SYNTACTIC, not
        # filesystem-state-dependent — a local directory literally named
        # 'hdfs:' must not turn a remote URI into a silent local walk
        (tmp_path / "hdfs:" / "nn" / "warehouse" / "t").mkdir(parents=True)
        with pytest.raises(ValueError, match="non-local path"):
            parquet_file_stats("hdfs://nn/warehouse/t")
    finally:
        os.chdir(cwd)


def test_write_csv_roundtrip_adversarial_content(spark, tmp_path):
    """The CSV sink must round-trip content that stresses the format:
    embedded commas, double quotes, newlines, NULLs, unicode, and
    doubles needing full precision — read back with the explicit schema
    (default Spark CSV quoting/escaping both ways)."""
    from end_to_end_ml_spark.sources.io import write_csv

    rows = [
        (1, "plain", 1.5),
        (2, "comma, inside", -0.1),
        (3, 'quote " inside', 3.141592653589793),
        (4, "new\nline", 1e-300),
        (5, None, None),
        (6, "unicodé ✓ 中文", 0.1 + 0.2),
    ]
    df = spark.createDataFrame(rows, ["id", "s", "x"])
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = (
        spark.read.schema(df.schema)
        .option("header", "true")
        .option("multiLine", "true")  # embedded newlines span physical lines
        .csv(path)
    )
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(rows)
    assert got == want


def test_minhash_probe_empty_batch(spark):
    """An empty ingest batch probes to an empty result (no job failure) —
    the idle-tick case of the incremental near-dup pipeline."""
    from end_to_end_ml_spark.operators.dedup import minhash_probe_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    empty = docs.filter("doc_id < 0")
    out = minhash_probe_pairs(empty, docs, "doc_id", "text", threshold=0.5)
    assert out.count() == 0
