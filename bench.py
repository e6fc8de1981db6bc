"""Benchmark harness: run the declared query set at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is fully materialized (count of collected rows) so the
timing covers the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import get_spark

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM, codegen, and the parquet footers once so the first
    # timed query doesn't absorb session spin-up; queries are still
    # timed cold with respect to their own plans (nothing is cached).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("region", "nation", "customer", "orders", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).limit(1).collect()

    # Best of 2 runs per query (3 when the first two disagree by >1.5x
    # — one of them hit one-off Janino/JIT compilation or a GC pause):
    # the min reflects the steady-state cost a real workload sees.
    # Nothing is cached between runs (each call rebuilds the DataFrame
    # from the scan).  The per-query gc.collect() releases py4j
    # DataFrame handles promptly so the ContextCleaner can reclaim the
    # previous query's checkpoint/broadcast blocks instead of letting
    # them crowd the block manager.
    import gc

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        runs: list[float] = []
        n = -1
        for i in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
            del df
            gc.collect()
            if i == 1 and max(runs) <= 1.5 * min(runs):
                break
        timings[name] = min(runs)
        print(f"# {name}: {n} rows in {timings[name]}s {runs}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_set_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )

if __name__ == "__main__":
    main()
