"""Property-based tests (hypothesis) for the custom operators whose
correctness is invariant-shaped rather than example-shaped: splits partition
the input, metrics match a pure-python oracle on arbitrary data, jaccard
matches set algebra."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
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
