"""Deterministic md5 sub-sample of an sf dir's documents table — the
sampled-corpus oracle harness for the four quadratic-oracle exclusions
(d3_minhash_lsh_pairs / d7_near_dup_groups / d8_canonical_docs /
pipe8_incremental_near_dup, round-10 verdict #5).

Their SPARK sides are sublinear (banded/bucketed candidates) and run at
sf0.1 in the bench, but their DuckDB oracle sides are brute-force O(n²)
over documents — at sf0.1's 5000 docs that is ~100× the (verified)
sf0.01 cost, hours of wall. A deterministic doc sample drawn FROM the
sf0.1 corpus bounds those four at sf0.1-derived data instead of leaving
them sf0.01-only: keep doc_id where the first 8 hex chars of
md5(doc_id) ≡ 0 (mod ``mod``) — engine-independent (the filter is
applied once, HERE; both engines then read the same sampled parquet),
reproducible, and no rank/order bias (md5 is uniform in doc_id).

Every other table is copied byte-identical so the sampled dir is a
drop-in sf dir for tools/check_oracle.py:

    python tools/sample_corpus.py /root/testdata/sf0.1 /tmp/sf01_sampled 8
    python tools/check_oracle.py /tmp/sf01_sampled \
        d3_minhash_lsh_pairs d7_near_dup_groups d8_canonical_docs \
        pipe8_incremental_near_dup --json CHECK_ORACLE_SF01_SAMPLED_rN.json

No Spark needed — DuckDB rewrites documents.parquet; shutil copies the
rest (events.parquet's TIMESTAMP(NANOS) passes through untouched).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def sample(sf_dir: str, out_dir: str, mod: int = 8) -> int:
    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(out_dir, "documents.parquet")
    con = duckdb.connect()
    # paths are SQL string literals — escape single quotes (COPY ... TO
    # takes no parameter binding; round-11 ADVICE #3)
    src_q, dst_q = src.replace("'", "''"), dst.replace("'", "''")
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src_q}')
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % {int(mod)} = 0
          ORDER BY doc_id
        ) TO '{dst_q}' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        "SELECT count(*) FROM read_parquet(?)", [dst]
    ).fetchone()[0]
    for t in TABLES:
        if t == "documents":
            continue
        s = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(s):
            shutil.copyfile(s, os.path.join(out_dir, f"{t}.parquet"))
    return int(n)


def main() -> None:
    if not 2 <= len(sys.argv) - 1 <= 3:
        raise SystemExit(
            "usage: sample_corpus.py <sf_dir> <out_dir> [mod (default 8)]"
        )
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if mod < 1:
        raise SystemExit(f"mod must be >= 1, got {mod}")
    n = sample(sf_dir, out_dir, mod)
    print(f"sampled documents: {n} rows -> {out_dir} (md5 mod {mod})")


if __name__ == "__main__":
    main()
