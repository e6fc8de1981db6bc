"""ONE-COMMAND decade-scale gate (round-7 verdict #2): regenerate the
sf1-equivalent data, sweep every registered query Spark-vs-DuckDB at
that scale, route the three structurally-infeasible DuckDB oracles
through the third-engine verifier, and write the results table into
BASELINE.md between the DECADE_GATE sentinels — so the per-round
sweep is reproducible, recorded, and diffable instead of hand-driven.

Pipeline (each stage reuses the standing script as its single source
of truth, via subprocess):

  1. scripts/gen_scaled_testdata.py 10   (skipped if the dir exists)
  2. scripts/check_oracle.py <scaled>    minus the three oracle walls
     (q_pagerank / q_connected_components / q_scc: DuckDB-side spill
     / OOM / timeout at decade scale — round-7 BASELINE; the Spark
     sides complete in seconds)
  3. scripts/verify_graph_scale.py <scaled> for exactly those three

Usage: python scripts/decade_gate.py [--round N] [--skip-gen]
Exit 0 only if stage 2 ends ALL OK and stage 3 verifies 3/3.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, ".scratch", "sf10x0.1")
ORACLE_WALLS = ("q_pagerank", "q_connected_components", "q_scc")
BEGIN = "<!-- DECADE_GATE:BEGIN (maintained by scripts/decade_gate.py) -->"
END = "<!-- DECADE_GATE:END -->"


def _round_arg() -> int:
    if "--round" in sys.argv:
        return int(sys.argv[sys.argv.index("--round") + 1])
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    rnd = _round_arg()
    t_all = time.time()

    if not os.path.isdir(SCALED) and "--skip-gen" not in sys.argv:
        print(f"== stage 1: generating {SCALED}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "gen_scaled_testdata.py"), "10"],
            check=True,
        )
    else:
        print(f"== stage 1: {SCALED} present, skipping gen", flush=True)

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    names = [n for n in entrymod.queries() if n not in ORACLE_WALLS]
    print(f"== stage 2: oracle sweep, {len(names)} queries at decade scale", flush=True)
    t0 = time.time()
    p2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"), SCALED, *names],
        capture_output=True,
        text=True,
    )
    sweep_secs = time.time() - t0
    oks = len(re.findall(r"\bok\s+q_\w+:", p2.stdout))
    fails = re.findall(r"^FAIL .*$", p2.stdout, re.M)
    sweep_green = p2.returncode == 0 and "ALL OK" in p2.stdout
    for line in fails:
        print(line)
    print(f"   sweep: {oks} ok, {len(fails)} fail, {sweep_secs:.0f}s", flush=True)

    print("== stage 3: third-engine verification (oracle-wall trio)", flush=True)
    t0 = time.time()
    p3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_graph_scale.py"), SCALED],
        capture_output=True,
        text=True,
    )
    trio_secs = time.time() - t0
    trio_ok = sum(
        1 for w in ORACLE_WALLS if re.search(rf"\bok\s+{w}\b", p3.stdout)
    )
    trio_green = p3.returncode == 0 and trio_ok == len(ORACLE_WALLS)
    print(p3.stdout.strip()[-600:], flush=True)

    green = sweep_green and trio_green
    row = (
        f"| r{rnd} | {oks + trio_ok}/{len(names) + len(ORACLE_WALLS)} "
        f"({oks} oracle + {trio_ok} third-engine) | "
        f"{len(fails)} | {sweep_secs / 60:.0f} + {trio_secs / 60:.0f} min | "
        f"{'GREEN' if green else 'RED'} |"
    )
    _update_baseline(row, rnd)
    print(f"== decade gate {'GREEN' if green else 'RED'} "
          f"({time.time() - t_all:.0f}s total); BASELINE.md row updated")
    return 0 if green else 1


def _update_baseline(row: str, rnd: int) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as fh:
        text = fh.read()
    if BEGIN not in text:
        block = f"""

## Decade-scale gate (sf1-equivalent, regenerated per round)

One command: ``python scripts/decade_gate.py``.  Sweeps every
registered query Spark-vs-DuckDB at 10x sf0.1 (key-shifted
replication, referential integrity preserved), except the three
DuckDB-oracle resource walls (q_pagerank spill / q_connected_components
OOM / q_scc timeout — engine-side, not Spark-side; round-7 BASELINE),
which are closed by scripts/verify_graph_scale.py's independent
numpy/union-find/Tarjan implementations compared exactly.

{BEGIN}
| round | verified | fails | sweep + trio wall | gate |
|---|---|---|---|---|
{row}
{END}
"""
        text = text.rstrip() + block
    else:
        head, rest = text.split(BEGIN, 1)
        table, tail = rest.split(END, 1)
        lines = [ln for ln in table.strip().splitlines() if ln.strip()]
        lines = [ln for ln in lines if not ln.startswith(f"| r{rnd} ")]
        lines.append(row)
        text = head + BEGIN + "\n" + "\n".join(lines) + "\n" + END + tail
    with open(path, "w") as fh:
        fh.write(text)


if __name__ == "__main__":
    raise SystemExit(main())
