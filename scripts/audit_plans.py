"""Physical-plan audit over every declared query: one row per query
with the plan facts the engine's scale posture is judged on — join
strategies, exchange count, whether scan pushdown engaged, and any
anti-pattern markers (CartesianProduct / row-at-a-time Python UDF).

Run:  python scripts/audit_plans.py [sf_dir] > PLANS.md

The four eagerly-driven streaming queries are audited via their batch
twins (the same policy as the plan-lint test: the returned memory-sink
table's plan is a vacuous LocalTableScan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.plans.audit import (  # noqa: E402
    global_windows,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(name: str, plan: str) -> dict:
    gws = global_windows(plan)
    return {
        "gwin": len(gws),
        "gwin_bounded": sum(1 for g in gws if g["bounded"]),
        "BAD_unbounded_gwin": sum(1 for g in gws if not g["bounded"]),
        "query": name,
        "exchanges": plan.count("Exchange hashpartitioning"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "topk": "TakeOrderedAndProject" in plan,
        # Compare stripped-to-stripped (round-5 ADVICE: the spaced
        # "PushedFilters: []" literal could never match the stripped
        # plan, so the empty-list guard was vacuously true): pushdown
        # is reported engaged iff a PushedFilters list is present and
        # NO scan's list is empty.
        "pushed": "PushedFilters:[" in plan.replace(" ", "")
        and "PushedFilters:[]" not in plan.replace(" ", ""),
        "arrow": ("MapInPandas" in plan)
        or ("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan),
        "BAD_cartesian": "CartesianProduct" in plan,
        "BAD_row_udf": "BatchEvalPython" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Batch twins for the eagerly-driven streaming queries (same
    # policy and same constructions as test_plans.py's lint).
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dispatch import (
        format_reply,
        run_requests,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        interval_join,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.graphs import (
        derived_tree_edges,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources.tables import (
        load_table,
    )
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.streaming.ingest import (
        corpus_stats_stream,
        event_rollup_stream,
        sessionize_stream,
    )

    def attrib_twin():
        ev = load_table(spark, sf_dir, "events")
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        return interval_join(clicks, purchases, keys=["user_id"])

    def requests_twin():
        edges = derived_tree_edges(spark, sf_dir, symmetric=True)
        nation = load_table(spark, sf_dir, "nation")
        reqs = nation.select(
            (F.col("n_nationkey") + 1).cast("int").alias("seq_no"),
            F.when(F.col("n_nationkey") % 2 == 0, 4)
            .otherwise(3)
            .cast("int")
            .alias("op_no"),
            F.lit("G1.txt").alias("graph_name"),
            (F.col("n_nationkey") + 100).cast("int").alias("start_vertex"),
        )
        return format_reply(run_requests(reqs, edges))

    twins = {
        "q_stream_rollup": lambda: event_rollup_stream(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ),
        "q_stream_corpus": lambda: corpus_stats_stream(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        ),
        "q_stream_sessions": lambda: sessionize_stream(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")).withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        ),
        "q_stream_attrib": attrib_twin,
        "q_stream_requests": requests_twin,
        "q_stream_dedup": lambda: (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .withColumn("text_hash", F.md5(F.col("text")))
            .dropDuplicates(["text_hash"])
            .select("text_hash")
        ),
        "q_stream_edges": lambda: __import__(
            "distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.catalog",
            fromlist=["add_graph"],
        ).add_graph(
            derived_tree_edges(spark, sf_dir, symmetric=False).select("src", "dst"),
            graph_id=1,
        ),
    }

    rows = []
    for name, fn in entry.queries().items():
        try:
            df = twins[name]() if name in twins else fn(spark, sf_dir)
            rows.append(audit(name, plan_of(df)))
        except Exception as ex:  # noqa: BLE001 — audit must cover all
            rows.append({"query": name, "error": str(ex)[:120]})

    print(f"# PLANS — physical-plan audit at {sf_dir}\n")
    print("Generated by scripts/audit_plans.py; streaming queries are")
    print("audited via their batch twins (test_plans.py lint policy).")
    print("pushdown 'y' = EVERY scan in the plan carries non-empty")
    print("PushedFilters (strict, round-6 semantics after the round-5")
    print("advice fix); blank = at least one scan reads unfiltered —")
    print("expected for full-corpus operators (dedup, features, decode)")
    print("whose semantics consume every row by design.  gwin 'n/b' =")
    print("n GLOBAL (empty-partition-spec) windows, b judged bounded by")
    print("their child subtree (limit/top-k/agg/local relation — r11")
    print("verdict #6); an unbounded global window (n > b) is an")
    print("anti-pattern hit.\n")
    print("| query | exchanges | BHJ | SMJ | SHJ | top-k | pushdown | arrow | gwin | anti-patterns |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['query']} | ERROR: {r['error']} | | | | | | | | |")
            continue
        bad = ", ".join(
            k[4:]
            for k in ("BAD_cartesian", "BAD_row_udf", "BAD_unbounded_gwin")
            if r[k]
        ) or "—"
        # gwin column: "n/b" = n global windows, b of them judged
        # bounded by their child subtree (r11 verdict #6); blank = none.
        gwin = f"{r['gwin']}/{r['gwin_bounded']}" if r["gwin"] else ""
        print(
            f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['smj']} "
            f"| {r['shj']} | {'y' if r['topk'] else ''} "
            f"| {'y' if r['pushed'] else ''} | {'y' if r['arrow'] else ''} "
            f"| {gwin} | {bad} |"
        )
    n_bad = sum(
        1
        for r in rows
        if r.get("BAD_cartesian") or r.get("BAD_row_udf") or r.get("BAD_unbounded_gwin")
    )
    n_err = sum(1 for r in rows if "error" in r)
    print(f"\n{len(rows)} queries audited; {n_bad} anti-pattern hits; {n_err} errors.")


if __name__ == "__main__":
    main()
