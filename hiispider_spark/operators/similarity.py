"""Similarity search over embedding columns (array<float>).

Two paths, both over the driver's ``embeddings`` table:

- brute-force cosine top-k — the exactness baseline. Query side is
  small → broadcast; dot products are pure Column expressions
  (``zip_with`` + ``aggregate``), JVM-side, no UDF. At 100 TB this is
  one scan of the corpus per query batch.
- IVF-style bucketed ANN — the scale path: a deterministic coarse
  quantizer (every C-th vector is a "centroid"), vectors are assigned
  to their nearest centroid once (write-time), and a query only scans
  its centroid's bucket: scan cost drops by ~n_centroids×. Recall is
  tested against the brute-force baseline.

All similarities are rounded to 6 decimals *before* ranking, with
vec_id as the total tie-break, so results are stable across engines
(Spark vs DuckDB oracle) and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim) — self
    excluded, ranked by rounded sim DESC then neighbor_id ASC."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("qv"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q))  # small query side × corpus scan
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim)
    with vec_a < vec_b and rounded sim ≥ threshold.

    Sandbox: exact all-pairs (broadcast one side). At corpus scale this
    is the verify stage behind a blocking prefilter — LSH buckets
    (random hyperplanes) or the IVF assignment below — so the quadratic
    term only applies within blocks.
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), _as_double(F.col("embedding")).alias("va")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), _as_double(F.col("embedding")).alias("vb")
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def assign_centroids(embeddings: DataFrame, every: int = 50) -> DataFrame:
    """Deterministic IVF coarse assignment: centroids = vectors with
    vec_id % every == 0; each vector joins its nearest centroid.

    (vec_id, centroid_id). One broadcast join + argmax — write-time
    cost, amortized over all queries.
    """
    cents = embeddings.filter(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("centroid_id"),
        _as_double(F.col("embedding")).alias("cent"),
    )
    vecs = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    scored = vecs.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(cosine_col(F.col("v"), F.col("cent")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    every: int = 50,
    n_probe: int = 1,
) -> DataFrame:
    """IVF ANN: search only the query's centroid bucket(s).

    n_probe=1 scans ~1/n_centroids of the corpus per query. Returns the
    same schema as brute_force_topk (approximate results).
    """
    assign = assign_centroids(embeddings, every)
    emb = embeddings.join(assign, "vec_id")
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("qv"),
        F.col("centroid_id").alias("q_cent"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("cv"),
        F.col("centroid_id").alias("c_cent"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("c_cent") == F.col("q_cent"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
