"""Registry-wide multi-scan census (r13 verdict item 4).

x20 (6 redundant scans) was found by reading PLANS.md, not the bench —
so enumerate EVERY registry query's main physical plan and flag the ones
whose shape suggests redundant work:

  - the same parquet table scanned more than 2x in one plan, or
  - more than 12 Exchange nodes.

Each hit must then be either rewritten (plan diff + A/B, the
x20/x17/pipe10/pipe11 treatment) or justified in OPTIMIZATION_r14.md.

Caveat the census cannot see: localCheckpoint()ed subtrees appear as
`Scan ExistingRDD` in the MAIN plan while their build cost (including
parquet scans) runs in separate jobs — so a low main-plan scan count is
necessary, not sufficient. The bench rows carry that cost either way.

Usage: python tools/census_plans.py [out_md]
Writes a markdown table (default plans/r14/CENSUS.md) sorted by
(max same-table scans, exchange count) descending.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_ml_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def census_plan(plan: str) -> tuple[Counter, int, int]:
    """(per-table parquet scan counts, n_exchange, n_reused_exchange)
    from one explainString(formatted) dump. ReusedExchange nodes are
    counted separately — a reused exchange is the planner DEDUPLICATING
    a subtree, not re-running it."""
    tables = Counter(
        os.path.basename(m.rstrip("]").rstrip("/"))
        for m in re.findall(r"Location: \S+ \[[^\]]*?([^\s,\]]+\.parquet)", plan)
    )
    n_exchange = len(re.findall(r"^\s*(?:[:+\s-]*)?Exchange \(\d+\)", plan, re.M))
    n_reused = len(re.findall(r"ReusedExchange", plan))
    return tables, n_exchange, n_reused


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14", "CENSUS.md",
    )
    spark = get_spark("plan-census", master="local[8]", shuffle_partitions=8)
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    rows = []
    errs = []
    for name, (fn, _sql) in REGISTRY.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — census records, never dies
            errs.append((name, repr(exc)[:120]))
            continue
        tables, n_ex, n_reused = census_plan(plan)
        max_scans = max(tables.values(), default=0)
        rows.append((name, tables, max_scans, n_ex, n_reused))

    rows.sort(key=lambda r: (-r[2], -r[3], r[0]))
    flagged = [r for r in rows if r[2] > 2 or r[3] > 12]

    lines = [
        "# Registry-wide plan census (tools/census_plans.py)",
        "",
        f"Scale dir: `{SF_DIR}`. {len(rows)} queries planned, "
        f"{len(flagged)} flagged (same-table scans > 2 or exchanges > 12).",
        "",
        "| query | scans by table | max same-table scans | exchanges | reused |",
        "|---|---|---|---|---|",
    ]
    for name, tables, max_scans, n_ex, n_reused in rows:
        flag = " **FLAG**" if (max_scans > 2 or n_ex > 12) else ""
        tbl = ", ".join(f"{t}:{c}" for t, c in sorted(tables.items())) or "-"
        lines.append(f"| {name}{flag} | {tbl} | {max_scans} | {n_ex} | {n_reused} |")
    if errs:
        lines += ["", "## Census errors", ""]
        lines += [f"- {n}: {e}" for n, e in errs]
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(rows)} planned, {len(flagged)} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
