"""plans/lint.py — the plan linter must catch deliberately-hazardous plans
and pass every flagship registry query."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_ml_spark.plans.entry_queries import REGISTRY
from end_to_end_ml_spark.plans.lint import audit_plan

SF = "/root/testdata/sf0.001"


def test_flags_cartesian_product(spark):
    # sides above the broadcast threshold → true CartesianProduct. (A
    # broadcast-small side becomes a conditioned BroadcastNestedLoopJoin,
    # which the engine itself uses for 1-row scalar broadcasts — allowed.)
    a = spark.range(5_000_000)
    b = spark.range(5_000_000).withColumnRenamed("id", "id2")
    hazards = audit_plan(a.crossJoin(b).filter("id + id2 > 5"))
    assert any(h.startswith("cartesian-product") for h in hazards), hazards


def test_flags_python_row_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "bigint")
    hazards = audit_plan(spark.range(100).select(slow("id").alias("y")))
    assert any(h.startswith("python-row-udf") for h in hazards), hazards


def test_flags_global_window_over_raw_input(spark):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    ranked = df.withColumn("r", F.rank().over(Window.orderBy("v")))
    hazards = audit_plan(ranked)
    assert any(h.startswith("global-window") for h in hazards), hazards


def test_accepts_global_window_over_aggregate(spark):
    agg = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    ranked = agg.withColumn("r", F.rank().over(Window.orderBy("count")))
    assert audit_plan(ranked) == []


def test_flags_global_window_behind_fact_join(spark):
    """The bounded-input walk must stop at a join whose OTHER side is the
    unbounded fact: hugeFact ⋈ tinyAggregatedDim is still fact-sized, so a
    global window over the join output is a hazard (the old any-descendant
    walk let the dim-side Aggregate bless it — a CI-gate hole)."""
    fact = spark.range(100_000).withColumn("k", F.col("id") % 7)
    dim = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    joined = fact.join(dim, "k")
    ranked = joined.withColumn("r", F.rank().over(Window.orderBy("id")))
    hazards = audit_plan(ranked)
    assert any(h.startswith("global-window") for h in hazards), hazards


def test_accepts_global_window_over_join_of_aggregates(spark):
    """aggA ⋈ aggB is bounded (output ≤ product of two aggregate outputs) —
    the drift_bins/ks_stat shape must stay accepted, and with include_info
    the accepted window carries the info tag so logs can distinguish it
    from a real scale-killer."""
    from end_to_end_ml_spark.plans.lint import INFO_BOUNDED_WINDOW

    a = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    b = (
        spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    joined = a.join(b, "k", "full_outer")
    cum = joined.withColumn(
        "c",
        F.sum("count").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert audit_plan(cum) == []
    tagged = audit_plan(cum, include_info=True)
    assert any(h.startswith(INFO_BOUNDED_WINDOW) for h in tagged), tagged


def test_accepts_global_window_over_stack_of_aggregate(spark):
    """A constant-arity stack(k, ...) unpivot of a 1-row aggregate stays
    bounded (ml1b's wide-agg → 3-row leaderboard shape); a data-dependent
    explode of the same aggregate must STILL be flagged."""
    wide = spark.range(1000).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("s"),
        F.max("id").alias("m"),
    )
    stacked = wide.selectExpr(
        "stack(3, 'n', n, 's', s, 'm', m) AS (metric, value)"
    ).withColumn("r", F.rank().over(Window.orderBy("value")))
    assert audit_plan(stacked) == []
    exploded = (
        spark.range(1000)
        .agg(F.collect_list("id").alias("xs"))
        .select(F.explode("xs").alias("x"))
        .withColumn("r", F.rank().over(Window.orderBy("x")))
    )
    hazards = audit_plan(exploded)
    assert any(h.startswith("global-window") for h in hazards), hazards


def test_flags_midplan_global_sort(spark):
    # Catalyst's EliminateSorts removes orderings nothing consumes, so a
    # surviving mid-plan global sort needs an order-sensitive consumer
    # (mapInPandas) between the sort and the aggregation.
    def ident(it):
        yield from it

    df = (
        spark.range(1000)
        .withColumn("v", F.col("id") * 2)
        .orderBy("v")
        .mapInPandas(ident, "id long, v long")
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )
    hazards = audit_plan(df)
    assert any(h.startswith("global-sort-mid-plan") for h in hazards), hazards


def test_accepts_final_sort_and_topk(spark):
    assert audit_plan(spark.range(1000).orderBy(F.col("id").desc())) == []
    assert audit_plan(spark.range(1000).orderBy(F.col("id").desc()).limit(5)) == []


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_supplier_volume",
        "q9_product_profit",
        "q21_sole_failing_supplier",
        "w1_top_parts",
        "s3_pit_join",
        "a6_roc_auc",
        "a13_lift_gains",
        "d1_exact_dup_groups",
        "pipe1_clean_corpus",
        "pipe3_pretrain_corpus",
        # r11: half-pool cut is now the a13 two-level distributed rank —
        # the only unpartitioned window runs over the distinct-score
        # aggregate (bounded), never the per-doc scored frame; also still
        # exercises ReusedExchange resolution (the scored aggregate
        # exchange is consumed by both the ranked side and the counts)
        "pipe13_dsir_curation",
        "ts5_rolling_distinct_users",
        "x8_winnow_fingerprints",
    ],
)
def test_flagship_queries_are_clean(spark, name):
    df = REGISTRY[name][0](spark, SF)
    assert audit_plan(df) == [], name


def test_entire_registry_is_lint_clean(spark):
    """Every registry query's physical plan passes the scale linter —
    the CI gate form (`assert not audit_plan(df)`)."""
    dirty = {}
    for name, (fn, _) in REGISTRY.items():
        hazards = audit_plan(fn(spark, SF))
        if hazards:
            dirty[name] = hazards
    assert dirty == {}, dirty


def test_registry_keys_never_shadowed():
    """A late REGISTRY["name"] = ... assignment silently replaces an
    existing entry (dicts don't complain) — the bug that once swallowed
    the lineitem rollup query. Source-level tripwire: every late
    registration name is unique and absent from the initial literal."""
    import re

    import end_to_end_ml_spark.plans.entry_queries as eq

    src = open(eq.__file__.replace(".pyc", ".py")).read()
    late = re.findall(r'^REGISTRY\["([A-Za-z0-9_]+)"\] = ', src, re.M)
    assert len(late) == len(set(late)), sorted(
        {n for n in late if late.count(n) > 1}
    )
    literal = re.findall(r'^    "([A-Za-z0-9_]+)": \(', src, re.M)
    shadowed = set(late) & set(literal)
    assert not shadowed, sorted(shadowed)


def test_registry_count_claims():
    """Registry-count claims drifted repeatedly in r6 (185 vs 201 in
    comments/README). One source of truth: README's stated totals must
    equal the live registry; the DRIVER_WINDOW must be exactly the first
    50 registry entries and all-oracled."""
    import re

    import __spark_entry__ as entry_mod
    from end_to_end_ml_spark.plans.entry_queries import DRIVER_WINDOW

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    readme = open("README.md").read()
    claims = re.findall(r"(\d+)-query registry|(\d+) registry queries", readme)
    totals = {int(a or b) for a, b in claims}
    assert totals, "README must state the registry size"
    assert totals == {len(q)}, f"README claims {totals}, registry has {len(q)}"
    m = re.search(r"(\d+) carry an ANSI-SQL oracle", readme)
    assert m, "README must state the oracled count"
    assert int(m.group(1)) == len(o), f"README says {m.group(1)}, oracled {len(o)}"
    assert list(q)[:50] == DRIVER_WINDOW
    assert all(n in o for n in DRIVER_WINDOW), "window must be all-oracled"


def test_driver_window_is_pick_window_output():
    """The DRIVER_WINDOW literal must be EXACTLY tools/pick_window.py's
    output for the current round (latest committed CORRECTNESS artifact
    + 1) — the 'verbatim tool output' claim, locked in CI. Registering a
    query without re-running the pick fails here, which is the intended
    discipline."""
    import glob
    import os
    import re
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import pick_window

    from end_to_end_ml_spark.plans.entry_queries import DRIVER_WINDOW

    rounds = [
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    current_round = max(rounds) + 1
    assert pick_window.pick(current_round) == DRIVER_WINDOW


def test_cohort2_is_disjoint_deterministic_and_skips_slow_oracles():
    """pick_window.cohort2 (round-9 verdict #7's second sf0.1 sweep):
    50 oracled names, disjoint from the driver window, deterministic for
    a fixed round, and excluding every query whose DuckDB oracle ran
    > 5 s at sf0.01 in the latest committed full-registry artifact (the
    quadratic brute-force oracles that cost ~100x at sf0.1)."""
    import glob
    import json
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import pick_window

    c2 = pick_window.cohort2(10)
    assert len(c2) == 50 and len(set(c2)) == 50
    assert c2 == pick_window.cohort2(10)  # deterministic
    assert not set(c2) & set(pick_window.pick(10))
    locals_ = sorted(glob.glob(os.path.join(root, "CHECK_ORACLE_LOCAL_r*.json")))
    res = json.load(open(locals_[-1])).get("results", {})
    slow = {n for n, r in res.items() if (r.get("duck_s") or 0) > 5}
    assert not set(c2) & slow


def test_cohorts_partition_the_oracled_tail():
    """The generalized --cohort N slices (round-10): consecutive cohorts
    are pairwise disjoint, preserve the N=2 behavior verbatim, and their
    union with the driver window covers every oracled query except the
    slow-oracle exclusions — the basis for the 'full sf0.1 evidence'
    claim in the round close."""
    import glob
    import json
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    sys.path.insert(0, root)
    import pick_window

    import __spark_entry__ as entry

    assert pick_window.cohort2(10) == pick_window.cohort2(10, 2)
    cohorts = [pick_window.cohort2(10, n) for n in (2, 3, 4, 5)]
    seen: set = set(pick_window.pick(10))
    for c in cohorts:
        assert not set(c) & seen  # disjoint from window and prior cohorts
        seen |= set(c)
    locals_ = sorted(glob.glob(os.path.join(root, "CHECK_ORACLE_LOCAL_r*.json")))
    res = json.load(open(locals_[-1])).get("results", {})
    slow = {n for n, r in res.items() if (r.get("duck_s") or 0) > 5}
    assert seen | slow >= set(entry.oracle_sql())


def test_bench_and_plandump_lists_reference_live_queries():
    """Round-9 retired two registry names (ts4, ml1) — a stale name left
    in bench.py or tools/dump_plans.py would only surface as a runtime
    KeyError in the driver's bench run. Pin every list statically."""
    import os
    import re
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod

    live = set(entry_mod.queries())
    for path in ("bench.py", os.path.join("tools", "dump_plans.py")):
        src = open(os.path.join(root, path)).read()
        names = set()
        for block in re.findall(r"^\w+ = \[(.*?)^\]", src, re.S | re.M):
            names |= set(re.findall(r'"([a-z][a-z0-9_]+)"', block))
        stale = names - live
        assert not stale, f"{path} references non-registry queries: {sorted(stale)}"


def test_no_raw_tokenizer_inside_hof_lambda():
    """Source-level guard for the O(words²) lambda re-split class (third
    occurrence was d16, r12 VERDICT finding #1): Catalyst does not hoist
    subexpressions through higher-order-function lambdas, so a raw
    tokenizer expression (split / regexp_extract_all / sentences) inlined
    into a SQL-string lambda body re-runs once per ELEMENT. The rule
    (operators/text.py word_ngrams_from_tokens docstring): bind the token
    array to a real column one select earlier, then reference the bound
    attribute inside the lambda.

    Two detectors over every non-test source file — the package, tools/,
    bench.py, __spark_entry__.py — (docstrings skipped):
    1. any string literal (incl. f-string templates destined for F.expr)
       containing a SQL lambda arrow ``->`` with a tokenizer call inside
       the lambda BODY (arrow → enclosing-paren close / same-depth comma);
    2. any Python ``lambda`` passed to an HOF builder (F.transform /
       aggregate / filter / exists / forall / zip_with / reduce) whose
       body calls F.split / F.regexp_extract_all / F.sentences directly.
    DuckDB oracle SQL is naturally exempt: its list lambdas operate on
    bound aliases, and body-scoping keeps argument-position tokenizers
    (e.g. list_transform(split(...), c -> ...)) from false-positive.
    """
    import ast
    import pathlib
    import re

    src_root = pathlib.Path(__file__).resolve().parents[1] / "end_to_end_ml_spark"
    tokenizers = ("split(", "regexp_extract_all(", "sentences(")
    sql_lambda = re.compile(r"\w+\s*->")
    hof_names = {"transform", "aggregate", "filter", "exists", "forall",
                 "zip_with", "reduce"}
    offenders: list[str] = []

    def _lambda_body(s: str, start: int) -> str:
        depth = 0
        for i in range(start, len(s)):
            c = s[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    return s[start:i]
            elif c == "," and depth == 0:
                return s[start:i]
        return s[start:]

    def _string_offends(s: str) -> bool:
        return any(
            t in _lambda_body(s, m.end())
            for m in sql_lambda.finditer(s)
            for t in tokenizers
        )

    class V(ast.NodeVisitor):
        def __init__(self, path: str):
            self.path = path

        def visit_Constant(self, node: ast.Constant):
            if isinstance(node.value, str) and _string_offends(node.value):
                offenders.append(f"{self.path}:{node.lineno} (string literal)")

        def visit_JoinedStr(self, node: ast.JoinedStr):
            text = "".join(
                v.value for v in node.values
                if isinstance(v, ast.Constant) and isinstance(v.value, str)
            )
            if _string_offends(text):
                offenders.append(f"{self.path}:{node.lineno} (f-string)")
            # don't recurse: inner constants already concatenated

        def visit_Call(self, node: ast.Call):
            fname = None
            if isinstance(node.func, ast.Attribute):
                fname = node.func.attr
            elif isinstance(node.func, ast.Name):
                fname = node.func.id
            if fname in hof_names:
                for arg in list(node.args) + [k.value for k in node.keywords]:
                    if isinstance(arg, ast.Lambda):
                        for sub in ast.walk(arg.body):
                            if (
                                isinstance(sub, ast.Call)
                                and isinstance(sub.func, (ast.Attribute, ast.Name))
                                and (
                                    sub.func.attr
                                    if isinstance(sub.func, ast.Attribute)
                                    else sub.func.id
                                )
                                in {"split", "regexp_extract_all", "sentences"}
                            ):
                                offenders.append(
                                    f"{self.path}:{node.lineno} (Python HOF lambda)"
                                )
            self.generic_visit(node)

    repo_root = src_root.parent
    extra = [repo_root / "bench.py", repo_root / "__spark_entry__.py"]
    files = (
        sorted(src_root.rglob("*.py"))
        + sorted((repo_root / "tools").glob("*.py"))
        + [p for p in extra if p.exists()]
    )
    for py in files:
        tree = ast.parse(py.read_text(), filename=str(py))
        # skip docstrings: blank the leading Expr-constant of every scope
        for scope in ast.walk(tree):
            if isinstance(
                scope, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ) and scope.body:
                first = scope.body[0]
                if (
                    isinstance(first, ast.Expr)
                    and isinstance(first.value, ast.Constant)
                    and isinstance(first.value.value, str)
                ):
                    first.value.value = ""
        V(str(py.relative_to(repo_root))).visit(tree)

    assert not offenders, (
        "raw tokenizer expression inside an HOF lambda (O(words²) re-split "
        "class — bind the token array to a column first, see "
        "text.word_ngrams_from_tokens): " + "; ".join(offenders)
    )


def test_driver_java_options_fixed_heap_merge():
    """The session factory pins a fixed-size driver heap (-Xms == driver
    memory — the policy Spark applies to executor JVMs) and merges rather
    than replaces caller extraJavaOptions, so a caller adding e.g. a
    code-cache flag cannot silently drop the heap floor. The floor exists
    because heap commit/uncommit churn around the bench's per-query GC
    nudge was measured collapsing into all-core kernel-time storms
    (OPTIMIZATION_r13.md, session 3)."""
    from end_to_end_ml_spark.session import merge_driver_java_options as m

    assert m("20g", None).startswith("-Xms20g ")
    assert m("20g", "-XX:ReservedCodeCacheSize=512m") == (
        "-Xms20g -XX:ReservedCodeCacheSize=512m"
    )
    # a caller that sets its own heap floor wins it, but keeps the
    # code-cache default (r13 ADVICE: the old merge dropped
    # ReservedCodeCacheSize whenever the caller set -Xms)
    assert m("20g", "-Xms4g -XX:+UseG1GC") == (
        "-XX:ReservedCodeCacheSize=512m -Xms4g -XX:+UseG1GC"
    )
    # unrelated caller flags keep BOTH defaults, prepended so the caller's
    # occurrence would win a conflict (JVM last-flag-wins)
    assert m("20g", "-XX:+UseZGC") == (
        "-Xms20g -XX:ReservedCodeCacheSize=512m -XX:+UseZGC"
    )


def test_driver_mem_extra_conf_precedence():
    """get_spark derives the -Xms floor from extra_conf's
    spark.driver.memory when the caller overrides it, so the floor can
    never exceed -Xmx (r13 ADVICE medium: driver.memory=8g via extra_conf
    used to still get -Xms20g and the JVM would refuse to start)."""
    from end_to_end_ml_spark.session import (
        merge_driver_java_options,
        resolve_driver_memory,
    )

    assert resolve_driver_memory({"spark.driver.memory": "8g"}) == "8g"
    assert resolve_driver_memory({}) == resolve_driver_memory(None)
    assert merge_driver_java_options(
        resolve_driver_memory({"spark.driver.memory": "8g"}), None
    ).startswith("-Xms8g ")
