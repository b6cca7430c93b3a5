"""CI tripwire for the oracle-representation red class (r4 skew2, r5 a16,
r6 s13/x13/fn_map): every oracle SQL's DuckDB output column types must be
canonical, so no HUGEINT (DuckDB's 128-bit integer sum() result, which
pandas renders as float64 while Spark emits int64 -> hash mismatch) and no
list types (DuckDB lists and Spark arrays stringify differently in the
driver's value compare) can reach the driver window.

Pure SQL over sf0.001 — no SparkSession — so the whole registry types in
seconds. This guards the DuckDB side; tests/test_plan_lint.py guards the
Spark side.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TYPECHECK_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DATE is canonical by evidence: DATE-output queries have been driver
# hash-green (ts5_rolling_distinct_users r5+r6, ev2_retention_cohorts r5) —
# datetime.date canonicalizes identically on both sides.
CANONICAL_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "TIMESTAMP",
    "BOOLEAN",
    "DATE",
}


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} not present")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_output_type_is_canonical(con):
    oracles = entry_mod.oracle_sql()
    assert len(oracles) >= 180, "oracle registry unexpectedly small"
    offenders = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in CANONICAL_TYPES:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "non-canonical DuckDB oracle output types (cast integer sums to "
        "BIGINT; flatten arrays with array_to_string):\n" + "\n".join(offenders)
    )
