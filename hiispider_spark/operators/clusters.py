"""Duplicate-cluster assignment and survivor selection.

LSH/MinHash/SimHash emit duplicate PAIRS (dedup.py, similarity.py);
an actual dedup pipeline needs CLUSTERS and a keep/drop decision per
document: connected components over the pair graph, then one survivor
per component. This module finishes that pipeline.

Algorithm: minimum-label propagation (the standard Spark-shaped
connected components — e.g. GraphFrames/GraphX CC is the same
fixpoint). Each vertex starts labeled with itself; every iteration each
vertex takes the min of its own and its neighbors' labels; at fixpoint
the label is the component's minimum id.

100 TB shape:
- labels and undirected-edge messages are (long, long) rows — two
  map-side-combinable shuffles per iteration, nothing wider;
- iteration count is the component DIAMETER, not size — near-dup
  clusters are dense (LSH emits most intra-cluster pairs), so real
  diameters are tiny; `max_iter` guards pathological chains;
- per-iteration ``localCheckpoint`` truncates lineage exactly like the
  deep-iteration path in linkgraph.py (r2 lesson: unpersisted
  iterative lineage re-plans under AQE and crawls);
- convergence is detected from the SAME aggregation that builds the
  next labels (max over a changed flag) — no extra job per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster) — cluster = min doc_id of the connected
    component; singletons keep their own id.

    ``ids``: one row per document (the universe). ``pairs``: duplicate
    edges, any orientation, duplicates tolerated.
    """
    a, b = pair_cols
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    edges.count()
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint()
    try:
        for _ in range(max_iter):
            msgs = edges.join(
                labels.withColumnRenamed("id", "src"), "src"
            ).select(F.col("dst").alias("id"), "label")
            # one aggregation yields the new label AND whether anything
            # changed: carry the old label alongside, compare after
            merged = (
                labels.withColumn("_old", F.col("label"))
                .unionByName(msgs.withColumn("_old", F.lit(None).cast("long")))
                .groupBy("id")
                .agg(
                    F.min("label").alias("label"),
                    F.max("_old").alias("_old"),
                )
                .persist()
            )
            new_labels = merged.select("id", "label").localCheckpoint()
            converged = not (
                merged.filter(F.col("label") != F.col("_old")).take(1)
            )
            merged.unpersist()
            labels = new_labels
            if converged:
                break
        return labels.select(
            F.col("id").alias(id_col), F.col("label").alias("cluster")
        )
    finally:
        edges.unpersist()


def dedup_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One keep-row per cluster: highest ``quality_col`` (ties → lowest
    id), or simply the cluster representative (min id) when no quality
    column is given. Output: docs columns + cluster + keep flag.

    Window per cluster plans as WindowGroupLimit-eligible rank ≤ 1 —
    partial top-1 before the shuffle, so a giant near-dup cluster
    (boilerplate pages) never concentrates rows on one task beyond 1
    per map partition.
    """
    joined = docs.join(clusters, id_col)
    if quality_col is None:
        keep = F.col(id_col) == F.col("cluster")
        return joined.withColumn("keep", keep)
    w = Window.partitionBy("cluster").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return joined.withColumn("keep", F.row_number().over(w) == 1)
