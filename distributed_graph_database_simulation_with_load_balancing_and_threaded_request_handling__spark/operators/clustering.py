"""Engine-exact k-means clustering over embedding columns — the
semantic-clustering primitive of a training-data pipeline (cluster
then diversify/prune, the SemDeDup recipe), built on the repo's two
standing postures:

* **Integer fixed-point arithmetic** (the ``pagerank_fixed`` idiom):
  embeddings are quantized to int64 (``floor((x + 1) * 10^6)`` — the
  +1 offset keeps every value positive so floor-div == trunc-div in
  every engine), distances are exact int64 sums, and centroid updates
  are ``sum div count`` — order-independent, so the result is
  bit-identical across engines/partitionings and the declared query
  gets a full value oracle (float Lloyd's is run-order-dependent).
* **Arrow-batched vectorized workers** (the
  ``similarity.hyperplane_signatures_arrow`` idiom): assignment is one
  numpy broadcast ``(n_batch, k, dim)`` reduction per Arrow batch;
  no per-row Python.

Scale posture (100 TB): per round, the big table flows through ONE
``mapInPandas`` that emits k·dim-sized per-batch partial sums; the
shuffle carries ``batches x k x dim`` longs (map-side combined), and
only ``k x (dim + 1)`` integers ever reach the driver (the same
O(1)-rows posture as ``similarity.ivf_centroids``).  Vectors are
never re-shuffled; centroids ride to workers as closure constants.

Reference seam: the reference has no analytics beyond traversal
(SURVEY.md §2.2) — this extends the north-star extension surface
(BASELINE.json dedup/similarity family).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KMEANS_SCALE = 10**6
KMEANS_OFFSET = 1.0  # embeddings live in (-1, 1); +1 keeps quanta positive


def _quantize(values) -> "object":
    """(n, dim) int64 quantization of a pandas Series of float arrays.
    ``(x + 1) * 1e6`` uses only correctly-rounded IEEE double ops, so
    numpy and any SQL engine land on identical integers.  The widen to
    float64 FIRST is load-bearing: float32 source columns must be
    promoted exactly (float32 -> float64 is lossless) before the
    arithmetic, or the numpy side would compute in float32 while a SQL
    engine promotes to double — off-by-one quanta."""
    import numpy as np

    X = np.stack(values.to_numpy()).astype(np.float64)
    return np.floor((X + KMEANS_OFFSET) * KMEANS_SCALE).astype(np.int64)


def kmeans_fixed(
    embeddings: DataFrame,
    *,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    loop_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Lloyd's k-means with exact integer arithmetic.  Returns the
    assignment under the FINAL centroids:
    ``(vec_id: long, cluster: int, dist: long)`` where ``dist`` is the
    exact quantized squared distance to the winning centroid.

    Deterministic contract (what the SQL oracle replays):

    * init: centroids = quantized vectors of the k smallest ids;
    * assignment: argmin of int64 squared distance, ties to the
      lowest centroid id (numpy argmin takes the first minimum);
    * update: per-dimension ``sum div count`` floor division (positive
      quanta, so floor == trunc in every engine); a cluster that
      captures no vectors keeps its previous centroid.

    int64 headroom: quanta < 2^21, squared diffs < 2^42, summed over
    dim <= 2^10 dims < 2^52 — no overflow anywhere near.

    ``loop_shuffle_partitions`` (scoped set/restore, the sssp idiom):
    the per-round keyed aggregation carries only ``batches x k``
    rows of longs, so right-size the round's shuffle to that, not to
    the session's scan width; restored in ``finally``.
    """
    import numpy as np

    spark = embeddings.sparkSession
    _parts_key = "spark.sql.shuffle.partitions"
    _prev_parts = spark.conf.get(_parts_key)

    src = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("emb")
    )
    init_rows = src.orderBy("vec_id").limit(k).collect()  # k rows to driver
    cents = np.floor(
        (np.stack([list(r["emb"]) for r in init_rows]) + KMEANS_OFFSET) * KMEANS_SCALE
    ).astype(np.int64)
    dim = cents.shape[1]

    if loop_shuffle_partitions is not None:
        spark.conf.set(_parts_key, str(int(loop_shuffle_partitions)))
    try:
        cents = _lloyd_rounds(src, cents, k, dim, iters)
    finally:
        if loop_shuffle_partitions is not None:
            spark.conf.set(_parts_key, _prev_parts)

    C_final = cents

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = _quantize(pdf["emb"])
            d = ((X[:, None, :] - C_final[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": a.astype("int32"),
                    "dist": d[np.arange(len(a)), a],
                }
            )

    return src.mapInPandas(assign, schema="vec_id long, cluster int, dist long")


def _lloyd_rounds(src: DataFrame, cents, k: int, dim: int, iters: int):
    """The update loop of ``kmeans_fixed`` (runs under the caller's
    scoped shuffle width); returns the final int64 centroid matrix."""
    import numpy as np

    for _ in range(iters):
        C = cents  # bind the round's centroids into the closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                X = _quantize(pdf["emb"])
                d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                cids, sums = [], []
                for j in np.unique(a):
                    sel = X[a == j]
                    cids.append(int(j))
                    # slot dim holds the member count, so ONE keyed
                    # aggregation carries sums and counts together
                    sums.append(
                        sel.sum(axis=0, dtype=np.int64).tolist() + [int(sel.shape[0])]
                    )
                yield pd.DataFrame({"cid": cids, "sums": sums})

        p = src.mapInPandas(partials, schema="cid int, sums array<long>")
        dimsums = (
            p.select("cid", F.posexplode("sums").alias("pos", "s"))
            .groupBy("cid", "pos")
            .agg(F.sum("s").alias("s"))
            .collect()
        )  # k x (dim+1) longs to the driver — O(1) in table size
        acc = np.zeros((k, dim + 1), dtype=np.int64)
        for r in dimsums:
            acc[r["cid"], r["pos"]] = r["s"]
        new_cents = cents.copy()  # empty clusters keep their centroid
        for j in range(k):
            if acc[j, dim] > 0:
                new_cents[j] = acc[j, :dim] // acc[j, dim]
        cents = new_cents
    return cents


def semantic_dedup_pairs(
    embeddings: DataFrame,
    assignments: DataFrame,
    *,
    threshold: float = 0.95,
    round_digits: int = 4,
    max_cluster_size: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: exact cosine is
    computed only WITHIN a k-means cluster (``assignments`` from
    ``kmeans_fixed``), never across — the cluster structure is the
    blocking step, so the quadratic term is bounded by the largest
    cluster, not the corpus (Abbas et al. 2023 recipe: cluster with
    k-means, then prune near-identical members per cluster).

    Returns ``(cluster, id_a, id_b, sim)`` with ``id_a < id_b`` and
    ``sim >= threshold`` (rounded, so the value oracle hash-matches).

    Scale posture: complements ``similarity.embedding_near_dup``
    (sign-LSH blocking) — k-means blocking gives deterministic,
    semantically-coherent blocks whose size the pipeline controls by
    raising k; clusters beyond ``max_cluster_size`` are dropped before
    pairing (the standing degenerate-bucket guard).  ONE shuffle of
    ``(cluster, id, vec)`` keyed on the cluster, then each cluster's
    all-pairs cosine is a single dense float64 matmul (``X @ X.T``)
    inside an Arrow ``applyInPandas`` group — vectorized BLAS, never a
    row-at-a-time pair join (the zip_with/aggregate HOF formulation
    was measured ~4x slower at sf0.1: interpreted per-element lambdas
    over |cluster|²·dim terms)."""
    import numpy as np

    from pyspark.sql.window import Window

    from ..functions.vectors import as_double_vec

    m = (
        embeddings.select(
            F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("vec")
        )
        .join(
            assignments.select(F.col("vec_id").alias("id"), "cluster"), on="id"
        )
        .withColumn("csz", F.count("*").over(Window.partitionBy("cluster")))
        .where(F.col("csz") <= max_cluster_size)
        .select("cluster", "id", "vec")
    )

    def pairs_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"cluster": [], "id_a": [], "id_b": [], "sim": []}
            ).astype({"cluster": "int32", "id_a": "int64", "id_b": "int64", "sim": "float64"})
        order = np.argsort(pdf["id"].to_numpy())  # id_a < id_b for free
        ids = pdf["id"].to_numpy()[order]
        X = np.stack(pdf["vec"].to_numpy()[order]).astype(np.float64)
        G = X @ X.T  # gram matrix: dots and squared norms in one BLAS call
        nrm = np.sqrt(np.diag(G))
        nrm = np.where(nrm == 0.0, 1.0, nrm)  # zero vectors -> sim 0, not NaN
        iu, ju = np.triu_indices(n, 1)
        sims = np.round(G[iu, ju] / (nrm[iu] * nrm[ju]), round_digits)
        keep = sims >= threshold
        return pd.DataFrame(
            {
                "cluster": np.full(keep.sum(), int(pdf["cluster"].iloc[0]), dtype="int32"),
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "sim": sims[keep],
            }
        )

    return m.groupBy("cluster").applyInPandas(
        pairs_in_cluster, schema="cluster int, id_a long, id_b long, sim double"
    )


def cluster_label_profile(
    assignments: DataFrame, labeled: DataFrame, *, id_col: str = "vec_id"
) -> DataFrame:
    """Cluster-vs-label contingency over a k-means assignment: per
    (cluster, label) member counts — the quick purity read a pipeline
    uses to sanity-check unsupervised clusters against any available
    labels.  One broadcast-joinable narrow join + one aggregation."""
    return (
        assignments.join(labeled.select(id_col, "label"), on=id_col)
        .groupBy("cluster", "label")
        .agg(F.count("*").cast("long").alias("n"))
    )
