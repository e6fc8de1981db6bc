"""Guard: the driver entry module must always import and be internally
consistent.

Round 2's entire correctness/bench record was blanked by a single
IndentationError in ``__spark_entry__.py`` (a ``def`` dedented out of
``queries()``).  This test makes that class of failure impossible to
commit silently: it imports the module (parse check), and asserts the
registry invariants the driver relies on — unique names, callables,
and every ``oracle_sql()`` key backed by a declared query.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def test_module_parses_and_exposes_api():
    assert callable(entry.entry)
    assert callable(entry.queries)
    assert callable(entry.oracle_sql)


def test_queries_registry_consistent():
    qs = entry.queries()
    assert isinstance(qs, dict)
    assert len(qs) >= 90  # round-4 floor; grows as queries are added
    # unique names, all callable
    assert len(qs) == len(set(qs))
    for name, fn in qs.items():
        assert name.startswith("q_"), name
        assert callable(fn), name


def test_every_oracle_has_a_query():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert isinstance(os_, dict)
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracle_sql keys without queries: {sorted(orphans)}"
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_registry_order_covers_the_driver_window():
    """Rotation policy, machine-enforced: the driver's oracle gate only
    checks the FIRST 50 registry entries per round, so official
    coverage decays unless the window rotates.  The must-verify set
    (every query absent from the TWO most recent CORRECTNESS_r*.json
    records) must occupy EXACTLY the head of the registry: the driver
    verifies the first 50 of them this round and the overflow —
    allowed only when the must-set outgrows one window, and capped at
    a second window — is queued immediately behind, guaranteed to head
    next round's window.  No query's official record can silently age:
    it is either recently verified, in this round's window, or
    machine-queued first-in-line for the next.

    Round-8 (per round-7 ADVICE): the must-set additionally contains
    every query whose live oracle-SQL hash differs from
    ORACLE_HASHES.json — a changed Spark/oracle pair must re-verify
    regardless of how fresh its record is."""
    import glob
    import hashlib
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(
        (
            p
            for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
            if re.search(r"_r(\d+)", os.path.basename(p))
        ),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    recently_checked = set()
    for path in records[-2:]:
        with open(path) as fh:
            rec = json.load(fh)
        recently_checked |= {
            name
            for name, row in rec.items()
            if isinstance(row, dict) and row.get("hash_match")
        }
    with open(os.path.join(root, "ORACLE_HASHES.json")) as fh:
        snap = json.load(fh)
    changed = {
        name
        for name, sql in entry.oracle_sql().items()
        if snap.get(name) != hashlib.sha256(sql.encode()).hexdigest()
    }
    order = list(entry.queries())
    must = (set(order) - recently_checked) | (changed & set(order))
    # The two-window cap bounds registry growth; queries FORCED back in
    # by an oracle change sit on top of it by design.
    assert len(must) <= 100 + len(changed & recently_checked), (
        f"must-verify set ({len(must)}) exceeds two driver windows — "
        "query growth has outrun the rotation; verify more per round"
    )
    head = set(order[: len(must)])
    misplaced = sorted(must - head)
    assert head == must, (
        f"must-verify queries not contiguous at the registry head — "
        f"misplaced: {misplaced}; head extras: {sorted(head - must)}"
    )


def test_no_query_lacks_an_oracle():
    """Every declared query should have a value oracle.  If a genuinely
    non-SQL-expressible op is added later, list it here explicitly so the
    exemption is a reviewed decision, not an accident."""
    exempt = set()  # keep empty: every registered query carries an oracle
    qs = entry.queries()
    os_ = entry.oracle_sql()
    missing = set(qs) - set(os_) - exempt
    assert not missing, f"queries without oracle_sql entries: {sorted(missing)}"


def test_survey_inventory_lists_every_query():
    """SURVEY.md §2.3 is the judge's coverage checklist — every
    registered query must have an inventory row."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    listed = set(re.findall(r"`(q_\w+)`", open(os.path.join(root, "SURVEY.md")).read()))
    missing = set(entry.queries()) - listed
    assert not missing, f"queries missing from SURVEY.md: {sorted(missing)}"


def test_evict_other_sf_releases_previous_sweep():
    """Session caches are keyed (applicationId, sf_dir); switching
    sf_dir must drop AND unpersist the previous scale's entries
    (round-3 ADVICE made this load-bearing for long driver sessions).
    Sweep sf0.001 then sf0.01 and assert no sf0.001 cache entry — and
    no lingering persisted edge table — survives the switch.

    Runs against the process's active session (getOrCreate — in a
    full-suite run this IS the shared conftest session, which mirrors
    the long-lived driver session the eviction exists for; the caches
    it sweeps are keyed by this applicationId either way)."""
    import pytest
    from pyspark.sql import SparkSession

    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    if not (os.path.isdir(sf_a) and os.path.isdir(sf_b)):
        pytest.skip("driver testdata not present")

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.sources import (
        graphs,
    )

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    qs = entry.queries()
    qs["q_bfs_levels"](spark, sf_a).count()
    assert any(k[1] == sf_a for k in entry._TREE_LEVELS_CACHE)
    edges_a = next(v for k, v in graphs._EDGE_CACHE.items() if k[1] == sf_a)
    assert edges_a.storageLevel.useMemory  # persisted while current

    qs["q_bfs_levels"](spark, sf_b).count()
    all_caches = (
        entry._TREE_LEVELS_CACHE,
        entry._RECALL_PAIRS_CACHE,
        entry._PAGERANK_GRAPH_CACHE,
        entry._KMEANS_CACHE,
        entry._COMMUNITIES_CACHE,
        entry._APPROX_RESULT_CACHE,
        graphs._EDGE_CACHE,
    )
    stale = [k for cache in all_caches for k in cache if k[1] == sf_a]
    assert not stale, f"sf0.001 cache entries survived the sf switch: {stale}"
    # The previous scale's persisted edge table must be UNPERSISTED
    # (storage level NONE), not merely dropped from the dict — that is
    # what actually releases executor memory.  (The BFS loop's
    # localCheckpoint blocks are released asynchronously by the
    # ContextCleaner once the popped references die; persisted tables
    # are the synchronous, assertable part.)
    assert not edges_a.storageLevel.useMemory
    assert not edges_a.storageLevel.useDisk


def test_evict_other_sf_drops_bucketed_table_and_dir():
    """Round-5 advice: bucketed-table cache entries must be fully
    reclaimed on sf switch — DROP TABLE (metastore) AND rmtree (the
    mkdtemp parquet dir), not just popped from the dict."""
    import pytest
    from pyspark.sql import SparkSession

    sf_a, sf_b = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    if not (os.path.isdir(sf_a) and os.path.isdir(sf_b)):
        pytest.skip("driver testdata not present")

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    entry.queries()["q_bucketed_table"](spark, sf_a).count()
    key_a = next(k for k in entry._BUCKETED_TABLE_CACHE if k[1] == sf_a)
    name_a, dir_a = entry._BUCKETED_TABLE_CACHE[key_a]
    assert spark.catalog.tableExists(name_a)
    assert os.path.isdir(dir_a)

    entry.queries()["q_bucketed_table"](spark, sf_b).count()
    assert not any(k[1] == sf_a for k in entry._BUCKETED_TABLE_CACHE)
    assert not spark.catalog.tableExists(name_a)
    assert not os.path.isdir(dir_a)


def test_bench_compact_line_fits_tail():
    """The driver records only a 2000-char stdout tail; rounds 4 and 5
    shipped unparseable official bench records because the single JSON
    line outgrew it.  bench.py's LAST line must stay complete inside
    that tail for any registry size — pin it at 3x today's count."""
    import json

    import bench

    fake = {f"q_padded_name_{i:04d}": round(0.123 + i / 1000, 3) for i in range(400)}
    full, compact = bench.summary_lines(fake, 0.1)
    assert len(compact) < 1800, len(compact)
    rec = json.loads(compact)
    assert rec["n_queries"] == 400
    assert rec["value"] == round(sum(fake.values()), 3)
    assert len(rec["slowest"]) == 10
    json.loads(full)  # line 1 stays valid JSON too


def test_registry_order_is_derived_for_any_record_state(tmp_path):
    """Round-7 fix for the two-rounds-running rotation failure: the
    registry order is now COMPUTED from the CORRECTNESS records, so
    landing a new record can never invalidate it.  Drive
    _registry_order through synthetic record states — none, one,
    partial, all-verified, a fresh record landing mid-round — and
    assert the head==must invariant plus oldest-evidence-first
    priority hold in every one."""
    import json

    names = [f"q_{chr(97 + i)}{i}" for i in range(12)]

    def write(round_no, verified):
        p = tmp_path / f"CORRECTNESS_r{round_no:02d}.json"
        p.write_text(
            json.dumps(
                {
                    n: {"rows_match": True, "schema_match": True, "hash_match": ok}
                    for n, ok in verified.items()
                }
            )
        )

    def check():
        order = entry._registry_order(names, records_root=str(tmp_path))
        assert sorted(order) == sorted(names)  # a permutation, always
        records = sorted(tmp_path.glob("CORRECTNESS_r*.json"))
        recent = set()
        for p in records[-2:]:
            rec = json.loads(p.read_text())
            recent |= {n for n, row in rec.items() if row.get("hash_match")}
        must = set(names) - recent
        assert set(order[: len(must)]) == must
        return order

    # no records: everything is must, sorted by name
    order = check()
    assert order == sorted(names)

    # one record verifying half (and one hash MISMATCH, which must not count)
    write(1, {n: True for n in names[:6]} | {names[6]: False})
    order = check()
    assert set(order[:6]) == set(names[6:])

    # a second record verifying the rest: must-set empty, oldest-first tail
    write(2, {n: True for n in names[6:]})
    order = check()
    assert order[:6] == sorted(names[:6])  # r1 block ages out first

    # a THIRD record lands (the failure mode that bit rounds 5 and 6):
    # r1's block immediately becomes the must-set, no manual edit needed
    write(3, {n: True for n in names[6:]})
    order = check()
    assert set(order[:6]) == set(names[:6])


def test_scc_oracle_keeps_the_nlj_fence():
    """Round-7: DuckDB 1.0 rewrites a cross-alias inequality inside a
    multi-join block (WHERE c.c_nationkey != s.s_nationkey) into
    customer NESTED_LOOP_JOIN supplier — a 1.5e9-row intermediate at
    decade scale that spilled to disk-full.  The q_scc oracle must
    keep the MATERIALIZED-CTE fence: aggregate the flow groups first,
    filter the diagonal groups afterward."""
    import re

    sql = entry.oracle_sql()["q_scc"]
    assert "MATERIALIZED" in sql
    # the inequality must only appear as the post-aggregation group
    # filter, never next to the nationkey columns inside the join
    # (strip `--` comments first: the fence's own explanation quotes
    # the pathological predicate)
    code = re.sub(r"--[^\n]*", "", sql).replace(" ", "")
    assert "c_nationkey!=s" not in code
    assert "WHERE a != b" in sql
