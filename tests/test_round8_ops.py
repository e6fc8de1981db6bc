"""Round-8 property tests: the baseline JPEG codec's two contracts
(exact on the planted coefficient subspace — the q_jpeg_decode value
oracle's foundation — and bounded-error on arbitrary pixels), and
salted_join equivalence under randomized skew/salt counts (the
SCALE.md wall-2 cure must be semantics-preserving for ANY shape, not
just the q_salted_join fixture).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.multimodal import (
    _S4,
    image_dims,
    jpeg_gray_decode,
    jpeg_gray_encode,
)
from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.partitioning import (
    salted_join,
)


@st.composite
def planted_subspace_image(draw):
    """Random image on the q_jpeg_decode coefficient subspace: each
    8x8 block is m + a1*S4_r + a2*S4_c + a3*S4_r*S4_c (the DC and
    (4,0)/(0,4)/(4,4) DCT bases), the construction the oracle replays
    in closed form.  Any m/a combination keeping pixels in [0, 255]
    must round-trip EXACTLY — quantization is all-ones and these
    bases hit integer DCT coefficients."""
    bh = draw(st.integers(min_value=1, max_value=3))
    bw = draw(st.integers(min_value=1, max_value=3))
    r_idx = np.asarray(_S4)[:, None]
    c_idx = np.asarray(_S4)[None, :]
    img = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    for b in range(bh * bw):
        m = draw(st.integers(min_value=64, max_value=191))
        a1 = draw(st.integers(min_value=-4, max_value=4))
        a2 = draw(st.integers(min_value=-4, max_value=4))
        a3 = draw(st.integers(min_value=-4, max_value=4))
        block = m + a1 * r_idx + a2 * c_idx + a3 * r_idx * c_idx
        img[(b // bw) * 8 : (b // bw) * 8 + 8, (b % bw) * 8 : (b % bw) * 8 + 8] = block
    return img


@settings(max_examples=40, deadline=None)
@given(img=planted_subspace_image())
def test_jpeg_exact_on_planted_subspace(img):
    enc = jpeg_gray_encode(img)
    assert np.array_equal(jpeg_gray_decode(enc), img)
    assert image_dims(enc) == (img.shape[1], img.shape[0])  # (width, height)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    data=st.data(),
)
def test_jpeg_bounded_error_on_arbitrary_pixels(h, w, data):
    """Arbitrary pixels, arbitrary (non-8-multiple) dims: shape is
    preserved through the edge-pad + crop path and every pixel lands
    within the orthonormal-DCT rounding bound.  Per coefficient the
    encoder's rint loses <= 0.5; 2D DCT basis entries are <= 0.125,
    so the per-pixel error is < 64 * 0.5 * 0.125 = 4 in the worst
    case (typical random images land well under 1)."""
    img = np.asarray(
        data.draw(
            st.lists(
                st.lists(st.integers(min_value=0, max_value=255), min_size=w, max_size=w),
                min_size=h,
                max_size=h,
            )
        ),
        dtype=np.int64,
    )
    dec = jpeg_gray_decode(jpeg_gray_encode(img))
    assert dec.shape == (h, w)
    assert int(np.abs(dec - img).max()) < 4


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    salts=st.integers(min_value=1, max_value=8),
    hot_rows=st.integers(min_value=0, max_value=40),
    cold_keys=st.integers(min_value=0, max_value=10),
    dim_extra=st.integers(min_value=0, max_value=5),
)
def test_salted_join_equivalence_under_random_skew(sess, salts, hot_rows, cold_keys, dim_extra):
    """salted_join == plain inner join for any salt count and any
    skew mix, including duplicate dim keys (the explode side must
    replicate matches, never dedupe them) and fact keys missing from
    the dim (inner-join drops them on both paths)."""
    fact_rows = [(1, f"hot{i}") for i in range(hot_rows)] + [
        (10 + k, f"cold{k}") for k in range(cold_keys)
    ]
    # key 999 exists only in the fact; dim key 1 is DUPLICATED so the
    # join multiplicity > 1 on the hot key.
    fact_rows.append((999, "orphan"))
    dim_rows = [(1, "d1a"), (1, "d1b")] + [(10 + k, f"d{k}") for k in range(cold_keys + dim_extra)]
    fact = sess.createDataFrame(fact_rows, "k long, payload string")
    dim = sess.createDataFrame(dim_rows, "k long, label string")
    plain = sorted(
        (r["k"], r["payload"], r["label"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["label"])
        for r in salted_join(fact, dim, "k", salts=salts).collect()
    )
    assert salted == plain


def test_snapshot_absorb_updates_only_verified_names():
    """The rotation snapshot may absorb a name's live hash ONLY off a
    record that hash-matched it (scripts/snapshot_oracle_hashes.py
    protocol) — a blanket refresh before the verifying record lands
    would erase the must-verify flags _registry_order acts on."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "snapmod",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "snapshot_oracle_hashes.py"),
    )
    snapmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(snapmod)

    snap = {"a": "old_a", "b": "h_b", "d": "old_d"}
    live = {"a": "new_a", "b": "h_b", "c": "h_c", "d": "new_d"}
    record = {
        "a": {"hash_match": True},   # verified -> absorbed
        "b": {"hash_match": False},  # failed -> untouched
        "c": {"hash_match": True},   # new name verified -> added
        # d changed but absent from the record -> stays stale/pinned
        "zz_gone": {"hash_match": True},  # not in live -> ignored
    }
    updated = snapmod.absorb(snap, live, record)
    assert updated == ["a", "c"]
    assert snap == {"a": "new_a", "b": "h_b", "c": "h_c", "d": "old_d"}


def test_trained_ivfpq_recall_floor(spark):
    """The round-8 quality claim itself, not just Spark/DuckDB parity:
    the oracle hash-compares both engines computing the SAME
    construction, so a symmetric quality regression (both sides
    dropping to 0.4) would stay oracle-green.  Pin the declared
    operating point — trained cells, m=32 x 128 codes, n_probe=8 of
    16 — to recall@10 >= 0.7 at sf0.01 (measured 0.9, BASELINE.md
    probe/recall frontier)."""
    from pyspark.sql import functions as F

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = cosine_topk(emb, qvec, 10).select("vec_id")
    approx = ivf_pq_topk(
        emb, qvec, 10, n_probe=8, m=32, n_codes=128, train_iters=2, cell_iters=2
    ).select("vec_id")
    matched = exact.join(approx, "vec_id").count()
    assert matched >= 7, f"trained IVF-PQ recall@10 fell to {matched / 10}"


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    members=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
    probes=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60),
)
def test_bloom_probe_never_false_negative(sess, members, probes):
    """The Bloom contract the join-pruning path leans on: every true
    member probes 'maybe' (NO false negatives, any build/probe mix) —
    so bloom-prune -> exact-join always equals the plain exact join."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    build = sess.createDataFrame([(v,) for v in members], "v long")
    probe = sess.createDataFrame([(v,) for v in probes], "v long")
    bits = bloom_bits(build, "v")
    flagged = {r["item"] for r in bloom_probe(bits, probe, "v").collect() if r["maybe"]}
    true_hits = members & probes
    assert true_hits <= flagged  # no false negatives, ever
    # pruning equivalence: survivors exact-joined == plain exact join
    survivors = probe.where(probe["v"].isin(list(flagged)) if flagged else "false")
    pruned = {r["v"] for r in survivors.join(build, "v").collect()}
    assert pruned == true_hits


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    core=st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=8, max_size=20),
    pre_a=st.text(alphabet="qrstuvwxyz", min_size=0, max_size=15),
    suf_a=st.text(alphabet="qrstuvwxyz", min_size=0, max_size=15),
    pre_b=st.text(alphabet="abcdefghijkl", min_size=0, max_size=25),
    suf_b=st.text(alphabet="abcdefghijkl", min_size=0, max_size=25),
)
def test_winnowing_guarantee_random_shared_run(sess, core, pre_a, suf_a, pre_b, suf_b):
    """SIGMOD-2003 winnowing guarantee, randomized: a shared substring
    of length >= k + window - 1 (= 8 at k=5, w=4) embedded at DIFFERENT
    offsets inside otherwise-arbitrary documents must contribute at
    least one shared fingerprint — position-robustness is the whole
    point of min-window selection over head-anchored sampling."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = sess.createDataFrame(
        [
            (1, f"{pre_a} {core} {suf_a}", "en", "s"),
            (2, f"{pre_b} {core} {suf_b}", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=5, window=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps.get(1, set()) & fps.get(2, set()), "shared run produced no shared fingerprint"


@st.composite
def asof_fixture(draw):
    """Random as-of shape: per-key unique right timestamps (the
    documented precondition), left timestamps free to tie each other
    and the right side; multiple keys; keys missing on either side."""
    n_keys = draw(st.integers(min_value=1, max_value=3))
    left = []
    right = []
    for k in range(n_keys):
        lts = draw(st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=6))
        rts = draw(st.sets(st.integers(min_value=0, max_value=50), min_size=0, max_size=6))
        left += [(k, t) for t in lts]
        right += [(k, t, float(100 * k + t)) for t in sorted(rts)]
    direction = draw(st.sampled_from(["backward", "forward"]))
    tol = draw(st.sampled_from([None, 0, 3, 10]))
    return left, right, direction, tol


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fx=asof_fixture())
def test_asof_join_matches_merge_asof_brute_force(sess, fx):
    """asof_join vs a per-row python replay of the pandas merge_asof
    contract (backward/forward, inclusive ties, tolerance nulling,
    left rows always kept) over random keyed timestamp mixes — the
    union-merge implementation must agree everywhere, not just on the
    four fixture shapes."""
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        asof_join,
    )

    left_rows, right_rows, direction, tol = fx
    ts = lambda s: datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)
    left = sess.createDataFrame(
        [(k, ts(t)) for k, t in left_rows] or [(99, ts(0))], "k int, t timestamp"
    )
    right = sess.createDataFrame(
        [(k, ts(t), v) for k, t, v in right_rows] or [(98, ts(0), 0.0)],
        "k int, rt timestamp, v double",
    )
    got = {
        (r["k"], r["t"]): (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="rt", values=["v"],
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }

    rindex = {}
    for k, t, v in (right_rows or [(98, 0, 0.0)]):
        rindex.setdefault(k, []).append((t, v))
    want = {}
    for k, t in (left_rows or [(99, 0)]):
        cands = rindex.get(k, [])
        if direction == "backward":
            cands = [(rt, v) for rt, v in cands if rt <= t]
            best = max(cands) if cands else None
        else:
            cands = [(rt, v) for rt, v in cands if rt >= t]
            best = min(cands) if cands else None
        if best is not None and tol is not None and abs(best[0] - t) > tol:
            best = None
        want[(k, ts(t))] = (ts(best[0]), best[1]) if best else (None, None)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=90),  # minutes between events
        min_size=1,
        max_size=12,
    ),
    gap_minutes=st.sampled_from([1, 30, 45]),
)
def test_sessionize_matches_python_scan(sess, gaps, gap_minutes):
    """Gap sessionization vs a linear python scan on random inter-event
    gaps (including exact-boundary gaps: silence == gap_minutes must
    NOT split — the rule is strictly-greater).  Checks the session
    count, per-session event counts, and start/end timestamps."""
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.relational import (
        sessionize_events,
    )

    t0 = datetime.datetime(2024, 1, 1)
    ts, cur = [], t0
    for g in gaps:
        cur = cur + datetime.timedelta(minutes=g)
        ts.append(cur)
    rows = [(1, t, i, 1.0) for i, t in enumerate(ts)]
    events = sess.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_events(events, gap_minutes=gap_minutes).collect()
    )
    sessions, start, prev, n = [], ts[0], ts[0], 1
    for t in ts[1:]:
        if (t - prev) > datetime.timedelta(minutes=gap_minutes):  # strictly greater splits
            sessions.append((start, prev, n))
            start, n = t, 1
        else:
            n += 1
        prev = t
    sessions.append((start, prev, n))
    assert got == sorted(sessions)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=8), min_size=2, max_size=4),
    salt=st.sampled_from(["split", "v2", "exp-7"]),
    n=st.integers(min_value=50, max_value=200),
)
def test_train_split_partition_properties(sess, weights, salt, n):
    """train_split is a FUNCTION of (id, salt, fracs): every row gets
    exactly one split (exhaustive, no drops/dupes), re-running yields
    identical assignments, a different salt reshuffles without
    changing the contract, and empirical proportions track fracs
    within a generous binomial envelope."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sampling import (
        train_split,
    )

    total = sum(weights)
    fracs = {f"s{i}": w / total for i, w in enumerate(weights[:-1])}
    fracs[f"s{len(weights) - 1}"] = 1.0 - sum(fracs.values())  # exact 1.0
    docs = sess.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = train_split(docs, fracs=fracs, salt=salt).collect()
    assert len(out) == n and len({r["doc_id"] for r in out}) == n  # exhaustive, 1:1
    assert {r["split"] for r in out} <= set(fracs)
    again = {(r["doc_id"], r["split"]) for r in train_split(docs, fracs=fracs, salt=salt).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in out}  # deterministic
    from collections import Counter

    got = Counter(r["split"] for r in out)
    for name, frac in fracs.items():
        # 4-sigma binomial envelope + 2-row slack for tiny fractions.
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(got.get(name, 0) - n * frac) <= 4 * sigma + 2, (name, dict(got), fracs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.dictionaries(
        st.integers(min_value=0, max_value=30),  # hour offsets
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=3),
        min_size=1,
        max_size=8,
    ),
)
def test_time_gapfill_matches_python_scan(sess, obs):
    """time_gapfill vs a python replay on random sparse hour series:
    dense grid exactly spans [first, last] observed hour, observed
    hours carry their own sum (filled=0), gap hours carry the last
    observed sum (filled=1)."""
    import datetime

    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.temporal import (
        time_gapfill,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, vals in obs.items():
        for i, v in enumerate(vals):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=5 * i), 7, "e", float(v), "{}")
            )
            eid += 1
    events = sess.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        "value double, props string"
    )
    got = {
        int((r["hour"] - t0).total_seconds() // 3600): (r["value_filled"], r["filled"])
        for r in time_gapfill(events).collect()
    }
    sums = {h: float(sum(vals)) for h, vals in obs.items()}
    lo, hi = min(sums), max(sums)
    want, carry = {}, None
    for h in range(lo, hi + 1):
        if h in sums:
            carry = sums[h]
            want[h] = (carry, 0)
        else:
            want[h] = (carry, 1)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=4),
    k=st.integers(min_value=1, max_value=6),
)
def test_group_sample_exact_contract(sess, sizes, k):
    """group_sample_exact: exactly min(k, |group|) rows per group,
    contiguous 1..n ranks, selection INVARIANT to physical
    partitioning (the determinism-across-partitionings claim), and
    stable across runs."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sampling import (
        group_sample_exact,
    )

    rows = [
        (g, g * 1000 + i)
        for g, n in enumerate(sizes)
        for i in range(n)
    ]
    if not rows:
        rows = [(0, 0)]
        sizes = [1]
    df = sess.createDataFrame(rows, "g int, doc_id long")

    def run(frame):
        return sorted(
            (r["g"], r["doc_id"], r["sample_rank"])
            for r in group_sample_exact(frame, group_by=["g"], id_col="doc_id", k=k).collect()
        )

    got = run(df)
    from collections import Counter

    per_group = Counter(g for g, _, _ in got)
    for g, n in enumerate(sizes):
        assert per_group.get(g, 0) == min(k, n)
    ranks = {}
    for g, _, r in got:
        ranks.setdefault(g, []).append(r)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())
    assert {(g, d) for g, d, _ in got} <= set(rows)  # a true subset
    assert got == run(df.repartition(7))  # partitioning-invariant
    assert got == run(df.coalesce(1))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=40),
    sub_bits=st.sampled_from([2, 4]),
)
def test_hdr_quantile_matches_integer_replay(sess, vals, sub_bits):
    """hdr_quantile_err's estimates vs a pure-python replay of the
    SAME integer bucket function and cumulative selection — the
    bit-exactness claim that lets the SQL oracle reproduce the sketch.
    Whole-dollar values keep the cents cast exact."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sketches import (
        hdr_quantile_err,
    )
    from pyspark.sql import functions as F

    qs = (0.5, 0.9, 0.99)
    df = sess.createDataFrame([(float(v),) for v in vals], "x double")
    got = {
        r["q"]: r["est_v"]
        for r in hdr_quantile_err(df, F.col("x"), sub_bits=sub_bits, qs=qs).collect()
    }

    def bucket(c: int) -> int:
        shift = max(c.bit_length() - 1 - sub_bits, 0)
        return (c >> shift) << shift

    from collections import Counter

    hist = sorted(Counter(bucket(v * 100) for v in vals).items())
    n = len(vals)
    want = {}
    for q in qs:
        cum = 0
        for b, cnt in hist:
            cum += cnt
            if cum >= q * n:
                want[q] = round(b / 100.0, 4)
                break
    assert got == want
    # Sketch soundness: the estimate never exceeds the exact quantile
    # value and sits within one relative bucket width below it.
    sv = sorted(vals)
    for q in qs:
        import math

        exact = sv[min(n - 1, max(0, math.ceil(q * n) - 1))]
        assert got[q] <= exact
        assert got[q] >= exact * (1 - 2.0 ** -sub_bits) - 0.01


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=1, max_value=25),
        min_size=1,
        max_size=25,
    ),
)
def test_heavy_hitters_sketch_then_verify_is_exact(sess, counts):
    """heavy_hitters == the exact threshold set for ANY multiset: the
    CMS prune is an upper bound (never drops a true heavy hitter) and
    the second pass exact-counts survivors, so the sketch changes the
    COST, never the answer."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.sketches import (
        heavy_hitters,
    )

    rows = [(str(k),) for k, n in counts.items() for _ in range(n)]
    df = sess.createDataFrame(rows, "v string")
    got = {(r["item"], r["n_exact"]) for r in heavy_hitters(df, "v").collect()}
    total, n_items = sum(counts.values()), len(counts)
    want = {
        (str(k), n)
        for k, n in counts.items()
        if n * n_items * 10 >= total * 12  # the cross-multiplied predicate
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=0,
        max_size=15,
    ),
    n_docs=st.integers(min_value=16, max_value=20),
)
def test_dedup_clusters_matches_union_find(sess, edges, n_docs):
    """dedup_clusters vs python union-find on random pair graphs
    (self-loops included): cluster_id is each component's min doc id,
    exactly one keep per cluster, and docs in no pair come back as
    singleton keeps when documents is supplied."""
    from distributed_graph_database_simulation_with_load_balancing_and_threaded_request_handling__spark.operators.dedup import (
        dedup_clusters,
    )

    pairs = sess.createDataFrame(
        [(a, b) for a, b in edges] or [(99, 99)], "id_a long, id_b long"
    )
    docs = sess.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_clusters(pairs, documents=docs).collect()
    }

    parent = list(range(101))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in (edges or [(99, 99)]):
        parent[find(a)] = find(b)
    want = {}
    for d in range(n_docs):
        comp = find(d)
        rep = min(x for x in range(101) if find(x) == comp and (x < n_docs or x in {99}))
        want[d] = (rep, d == rep)
    assert got == want
