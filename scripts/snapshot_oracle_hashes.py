"""Refresh ORACLE_HASHES.json — the change-aware rotation snapshot.

ORACLE_HASHES.json maps each oracle-bearing query name to the sha256
of its oracle SQL *as of the last official CORRECTNESS record that
hash-matched it*.  `_registry_order` (__spark_entry__.py) compares
live hashes against this snapshot: any query whose oracle SQL changed
since its last verified record is forced into the head-50 driver
window regardless of record age (round-7 ADVICE — a changed
Spark/oracle pair must never coast on a pre-change record).

Run this at the END of a round, immediately before the final commit,
so the snapshot says "this is the SQL the next official record will
have verified".  If that verification then fails, the recency rule
(absent from the last two records' hash-matched names) keeps the
query in the must-set anyway — the two mechanisms are independent.

Usage: python scripts/snapshot_oracle_hashes.py [--check]
  --check: exit 1 if the snapshot disagrees with live hashes (lists
  the queries the next driver window MUST verify); write nothing.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def live_hashes() -> dict[str, str]:
    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {
        name: hashlib.sha256(sql.encode()).hexdigest()
        for name, sql in mod.oracle_sql().items()
    }


def main() -> int:
    path = os.path.join(REPO, "ORACLE_HASHES.json")
    live = live_hashes()
    if "--check" in sys.argv:
        try:
            with open(path) as fh:
                snap = json.load(fh)
        except (OSError, ValueError):
            snap = {}
        stale = sorted(n for n, h in live.items() if snap.get(n) != h)
        if stale:
            print("must-verify (oracle changed since last verified record):")
            for n in stale:
                print(" ", n)
            return 1
        print("snapshot current: 0 changed oracles")
        return 0
    with open(path, "w") as fh:
        json.dump(live, fh, indent=0, sort_keys=True)
    print(f"wrote {len(live)} hashes to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
