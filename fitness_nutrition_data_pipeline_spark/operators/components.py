"""Connected components over an edge list — the transitive-closure stage
of near-dedup: LSH gives pairwise collisions; the dedup *cluster* is the
component (A~B, B~C ⟹ {A,B,C} keep one survivor).

Algorithm: iterative min-label propagation (each vertex adopts the
smallest label among itself and its neighbors) until fixpoint. Per
iteration: one join edges⋈labels + one groupBy min — both shuffled on
vertex id, so an iteration is linear in |E|. Convergence in O(diameter)
iterations; near-dup graphs are unions of small cliques, so diameter is
tiny in practice. ``localCheckpoint`` truncates the lineage each round —
without it the plan doubles per iteration and the driver OOMs long before
the data does (the classic iterative-Spark trap).

(The large-star/small-star optimization [Kiveris et al.] drops the round
count to O(log n) for adversarial graphs; the per-round plan shape here is
the same and the swap is local to this file.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id reachable."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.where(F.col("a") != F.col("b")).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        n_changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def near_dup_components(bands: DataFrame, id_col: str) -> DataFrame:
    """Dedup clusters from LSH band rows: star edges doc↔bucket-minimum
    (linear in corpus, no pairwise expansion) → connected components.
    Returns (id, component) where component is the cluster's canonical
    (minimum) doc id; singleton docs keep component == their own id only
    if they collided with nothing (absent from the result)."""
    mins = bands.groupBy("band_id", "band_key").agg(F.min(id_col).alias("bucket_min"))
    edges = (
        bands.join(mins, ["band_id", "band_key"])
        .where(F.col(id_col) != F.col("bucket_min"))
        .select(F.col(id_col).alias("src"), F.col("bucket_min").alias("dst"))
        .distinct()
    )
    return connected_components(edges).withColumnRenamed("vertex", id_col)
