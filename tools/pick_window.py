"""Deterministic driver-window rotation policy (round-7 verdict #2).

The driver's correctness snapshot covers the FIRST 50 registry entries
(= DRIVER_WINDOW). This tool makes the per-round re-pick a PURE FUNCTION
of (round number, committed CORRECTNESS_r*.json artifacts,
DRIVER_LEDGER.json, the live registry), so every oracled query gets
driver exposure within a bounded number of rounds and the pick is
auditable after the fact:

1. FORCED: queries with a red row (rows/schema/hash false, or err) in
   the latest committed artifact stay in the window until proven green.
2. Priority tiers over the remaining oracled queries:
     T1  never driver-exposed, newest registration round first
         (a query enters the ledger the round it is registered)
     T2  previously exposed, by (exposure count asc, last round asc)
   Ties inside a tier break by md5(f"r{N}:{name}") — a per-round
   deterministic shuffle, so tail names cannot starve behind a fixed
   lexicographic order.
3. Greedy fill to 50 in tier order, with a family-coverage guard:
   when free slots == number of still-uncovered families (family =
   leading alphabetic prefix of the first name segment, e.g. ts4b -> ts,
   fn_map_suite -> fn), only queries from uncovered families are
   accepted. Every operator family appears in every window.

Latency bound: with F families and W=50 slots, each round exposes at
least W - F never-checked queries while any remain, so a query waits at
most ceil(|never-checked| / (W - F)) rounds for its first driver row.

Usage:
  python tools/pick_window.py --round 8             # print the 50-name window
  python tools/pick_window.py --round 8 --update-ledger  # stamp new names
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "DRIVER_LEDGER.json")
WINDOW_SIZE = 50


def family(name: str) -> str:
    return re.match(r"^[a-z]+", name.split("_")[0]).group()


def load_ledger() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return json.load(f)
    return {}


def artifact_exposures() -> tuple[dict[str, list[int]], dict[str, int]]:
    """name -> sorted rounds with a driver row; name -> latest-round
    red flag (1 if the newest artifact containing the name was red)."""
    exposures: dict[str, list[int]] = {}
    latest_red: dict[str, int] = {}
    latest_round = 0
    arts = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            arts[rnd] = json.load(f)
        latest_round = max(latest_round, rnd)
    for rnd, art in arts.items():
        for name, row in art.items():
            exposures.setdefault(name, []).append(rnd)
    for name in exposures:
        exposures[name].sort()
    if latest_round:
        for name, row in arts[latest_round].items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            latest_red[name] = 0 if ok else 1
    return exposures, latest_red


def pick(round_n: int, update_ledger: bool = False) -> list[str]:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry  # noqa: E402

    oracled = list(entry.oracle_sql())
    ledger = load_ledger()
    changed = False
    for name in entry.queries():
        if name not in ledger:
            ledger[name] = {"first_seen_round": round_n}
            changed = True
    if update_ledger and changed:
        with open(LEDGER, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    exposures, latest_red = artifact_exposures()

    forced = [n for n in oracled if latest_red.get(n)]

    def tiebreak(name: str) -> str:
        return hashlib.md5(f"r{round_n}:{name}".encode()).hexdigest()

    rest = [n for n in oracled if n not in forced]
    t1 = [n for n in rest if n not in exposures]
    t2 = [n for n in rest if n in exposures]
    t1.sort(key=lambda n: (-ledger.get(n, {}).get("first_seen_round", 0), tiebreak(n)))
    t2.sort(key=lambda n: (len(exposures[n]), exposures[n][-1], tiebreak(n)))

    all_families = {family(n) for n in oracled}
    window: list[str] = list(forced)[:WINDOW_SIZE]
    covered = {family(n) for n in window}
    queue = t1 + t2
    skipped: list[str] = []
    for n in queue:
        free = WINDOW_SIZE - len(window)
        if free <= 0:
            break
        uncovered = all_families - covered
        if free <= len(uncovered) and family(n) in covered:
            skipped.append(n)
            continue
        window.append(n)
        covered.add(family(n))
    # fill any remaining slots (possible only if uncovered families ran
    # out of members — cannot happen with family derived from names)
    for n in skipped:
        if len(window) >= WINDOW_SIZE:
            break
        window.append(n)
    assert len(window) == WINDOW_SIZE, len(window)
    assert {family(n) for n in window} == all_families
    return window


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--update-ledger", action="store_true")
    args = ap.parse_args()
    window = pick(args.round, update_ledger=args.update_ledger)
    exposures, _ = artifact_exposures()
    fresh = sum(1 for n in window if n not in exposures)
    print(f"# round {args.round} window: {fresh} first-exposure / {WINDOW_SIZE}")
    for n in window:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
