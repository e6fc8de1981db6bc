"""Planted-skew JOIN A/B (round-7 verdict #4): measure the four ways
to run a fact-dim join when one key carries ~half the fact table —
the evidence behind SCALE.md's skew decision rule.

Fixture: events x REP (default 40 -> 4M rows) with user_id rewritten
so key 0 absorbs every even-hashed row (a ~100x-vs-median hot key),
joined to the 15k-row customer dim, aggregated to nation counts.
All four strategies must produce identical results (asserted).

Strategies:
  broadcast      default planner (dim < 10 MB -> BHJ; skew is a
                 non-event because the fact never shuffles)
  smj_aqe_skew   sort-merge forced (broadcast threshold -1), AQE
                 skew-join ON with test-scale thresholds
  smj_noskew     sort-merge forced, AQE skew-join OFF -> the wall:
                 the hot key's partition serializes one reducer
  salted         partitioning.salted_join (32 salts), skew OFF ->
                 the static fallback for engines/joins AQE can't split

Run: python scripts/skew_join_ab.py [sf_dir] [REP]
Prints one line per strategy; numbers land in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.partitioning import salted_join
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.session import get_spark

SKEW_CONF = {
    # test-scale AQE skew thresholds (defaults are sized for 256 MB
    # production partitions; the planted fact is ~tens of MB)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("skew-join-ab")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    fact = (
        ev.crossJoin(spark.range(rep).select(F.col("id").alias("_rep")))
        .select(
            F.when(F.xxhash64("event_id", "_rep") % 2 == 0, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            F.col("value"),
        )
        .persist()
    )
    n = fact.count()
    hot = fact.where(F.col("user_id") == 0).count()
    print(f"fact: {n} rows, hot key 0 carries {hot} ({100.0 * hot / n:.0f}%)", flush=True)
    dim = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
        .persist()
    )
    dim.count()

    def agg(j):
        return (
            j.groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        )

    def run(label, conf, joiner):
        prev = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            rows = agg(joiner())
            dt = time.time() - t0
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        key = sorted((r["c_nationkey"], r["n"], round(float(r["s"]), 2)) for r in rows)
        print(f"{label}: {dt:.2f}s ({len(rows)} groups)", flush=True)
        return dt, key

    plain = lambda: fact.join(dim, "user_id")  # noqa: E731
    no_bhj = {"spark.sql.autoBroadcastJoinThreshold": "-1"}

    results = {}
    results["broadcast"] = run("broadcast (default planner)", {}, plain)
    results["smj_aqe_skew"] = run(
        "SMJ + AQE skew-join ON", {**no_bhj, **SKEW_CONF}, plain
    )
    results["smj_noskew"] = run(
        "SMJ, skew handling OFF",
        {**no_bhj, "spark.sql.adaptive.skewJoin.enabled": "false"},
        plain,
    )
    results["salted"] = run(
        "salted_join (32 salts), skew OFF",
        {**no_bhj, "spark.sql.adaptive.skewJoin.enabled": "false"},
        lambda: salted_join(fact, dim, "user_id", salts=32),
    )
    keys = {k: v[1] for k, v in results.items()}
    assert len({repr(v) for v in keys.values()}) == 1, "strategies disagree!"
    print("all four strategies agree on the result", flush=True)

    # ---- part 2: join-MULTIPLICITY skew (the real wall) ----------
    # Hot key on BOTH sides of a self-ish join: the hot cell's output
    # is |L_hot| x |R_hot| pairs enumerated in ONE reduce task.  AQE
    # cannot see this (skew detection is INPUT bytes; the hot input
    # partition is a few hundred KB), so only static salting cures it.
    hot_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15000
    L = (
        ev.select("user_id", F.col("value").alias("vl"))
        .unionAll(
            spark.range(hot_n).select(
                F.lit(0).cast("long").alias("user_id"), F.rand(7).alias("vl")
            )
        )
        .persist()
    )
    R = (
        ev.select("user_id", F.col("value").alias("vr"))
        .unionAll(
            spark.range(hot_n).select(
                F.lit(0).cast("long").alias("user_id"), F.rand(11).alias("vr")
            )
        )
        .persist()
    )
    nl, nr = L.count(), R.count()
    print(
        f"\nmultiplicity fixture: {nl} x {nr} rows, hot cell "
        f"{hot_n} x {hot_n} = {hot_n * hot_n / 1e6:.0f}M output pairs in one task",
        flush=True,
    )

    def agg2(j):
        return j.groupBy().agg(
            F.count("*").alias("n"), F.sum(F.col("vl") * F.col("vr")).alias("s")
        ).collect()

    def run2(label, conf, joiner):
        prev = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            rows = agg2(joiner())
            dt = time.time() - t0
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        print(f"{label}: {dt:.2f}s (n={rows[0]['n']})", flush=True)
        return dt, rows[0]["n"]

    plain2 = lambda: L.join(R, "user_id")  # noqa: E731
    r_wall = run2(
        "explosion, SMJ skew OFF (the wall)",
        {**no_bhj, "spark.sql.adaptive.skewJoin.enabled": "false"},
        plain2,
    )
    r_aqe = run2(
        "explosion, SMJ + AQE skew ON (no rescue expected)",
        {**no_bhj, **SKEW_CONF},
        plain2,
    )
    r_salt = run2(
        "explosion, salted_join (32 salts)",
        {**no_bhj, "spark.sql.adaptive.skewJoin.enabled": "false"},
        lambda: salted_join(L, R, "user_id", salts=32),
    )
    assert r_wall[1] == r_aqe[1] == r_salt[1], "row counts disagree!"
    print("explosion row counts agree across strategies", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
