"""Maintain ORACLE_HASHES.json — the change-aware rotation snapshot.

ORACLE_HASHES.json maps each oracle-bearing query name to the sha256
of its oracle SQL *as of the last official CORRECTNESS record that
hash-matched it*.  `_registry_order` (__spark_entry__.py) compares
live hashes against this snapshot: any query whose oracle SQL changed
since its last verified record is forced into the head-50 driver
window regardless of record age (round-7 ADVICE — a changed
Spark/oracle pair must never coast on a pre-change record).

PROTOCOL (round-8 correction — the original "refresh at end of
round" guidance was a trap: a blanket refresh AFTER changing oracles
but BEFORE the driver's record lands erases the must-verify flags the
driver window is about to act on, which is exactly the hazard the
snapshot exists to prevent):

* START of round N+1, before touching any oracle:
  ``python scripts/snapshot_oracle_hashes.py --absorb CORRECTNESS_r{N}.json``
  — updates ONLY the names that record hash-matched (live SQL at that
  moment is the SQL the record verified, since nothing changed yet).
  Changed-but-not-yet-verified names keep their stale hash and stay
  pinned at the window head until a record actually verifies them.
* Any time: ``--check`` exits 1 and lists the queries the next driver
  window MUST verify (live hash != snapshot); writes nothing.
* ``--force`` is the old blanket refresh (every live hash, verified
  or not).  Only correct on a tree whose oracles are ALL covered by
  hash-matched records — e.g. right after a full
  scripts/check_oracle.py sweep of the exact committed SQL.

Usage: python scripts/snapshot_oracle_hashes.py (--check | --absorb REC.json | --force)
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


def absorb(snap: dict[str, str], live: dict[str, str], record: dict) -> list[str]:
    """Update ``snap`` in place: names the record hash-matched take
    their live hash; everything else is untouched.  Returns the
    updated names."""
    verified = sorted(
        n
        for n, row in record.items()
        if isinstance(row, dict) and row.get("hash_match") and n in live
    )
    for n in verified:
        snap[n] = live[n]
    return verified


def main() -> int:
    path = os.path.join(REPO, "ORACLE_HASHES.json")
    live = live_hashes()
    try:
        with open(path) as fh:
            snap = json.load(fh)
    except (OSError, ValueError):
        snap = {}

    if "--check" in sys.argv:
        stale = sorted(n for n, h in live.items() if snap.get(n) != h)
        if stale:
            print("must-verify (oracle changed since last verified record):")
            for n in stale:
                print(" ", n)
            return 1
        print("snapshot current: 0 changed oracles")
        return 0

    if "--absorb" in sys.argv:
        rec_path = sys.argv[sys.argv.index("--absorb") + 1]
        with open(os.path.join(REPO, rec_path)) as fh:
            record = json.load(fh)
        verified = absorb(snap, live, record)
        with open(path, "w") as fh:
            json.dump(snap, fh, indent=0, sort_keys=True)
        still = sorted(n for n, h in live.items() if snap.get(n) != h)
        print(f"absorbed {len(verified)} verified names from {rec_path}")
        if still:
            print("still must-verify:", ", ".join(still))
        return 0

    if "--force" in sys.argv:
        with open(path, "w") as fh:
            json.dump(live, fh, indent=0, sort_keys=True)
        print(f"wrote {len(live)} hashes to {path}")
        return 0

    print(__doc__.split("Usage:")[1].strip())
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
