"""Streaming-ingest kNN-GRAPH bridge: the graph-ANN index
(operators/similarity.py::knn_graph_edges — the NSW/HNSW base layer)
maintained incrementally across micro-batches, marrying lsh_bridge.py's
append-only state protocol to the graph rung of the ANN ladder
(VERDICT r16 ask #8's "streaming graph-ANN ingest bridge").

A batch index build answers "what is the kNN graph of THIS corpus"; an
ingest pipeline needs the ONLINE form — vectors arrive continuously and
the searchable graph must stay current — without rebuilding the
partition-local self-join over history each batch. The bridge keeps two
relations as state:

  nodes  (vec_id, centroid_id, vec)   — every vector seen, IVF-assigned
  edges  (src, dst, edge_sim)         — the current top-k graph

and folds a batch in as a TOP-K INSERT-ONLY IVM step:

  1. anti-join the batch against seen vec_ids (idempotence is algebraic,
     the lsh_bridge rule: a redelivered batch contributes zero new
     nodes, touches zero srcs, and leaves both relations fixed);
  2. assign the genuinely-new vectors to the STATIC coarse quantizer
     (centroids are a trained artifact passed at construction — the IVF
     precedent; assignment therefore never depends on arrival order);
  3. candidate edges = new × same-partition members (state ∪ batch) in
     the forward direction plus member → new in reverse — exactly the
     pair set knn_graph_edges would score for those nodes, so per batch
     the work is |batch| × touched-partition members, never |history|²;
  4. re-rank ONLY the affected srcs (the new nodes + the state nodes
     that gained a candidate): their old top-k edges union their new
     candidates, row_number by (edge_sim desc, dst), keep k. Untouched
     srcs' edges pass through without a shuffle.

Correctness of the fold: per src, candidates only ever ACCUMULATE
(insert-only corpus, static assignment), and top-k of (top-k(old) ∪
new-candidates) equals top-k(all candidates) for pure insertions — an
evicted edge can never re-enter later. The final edge relation after
ANY batch split therefore equals knn_graph_edges over the full corpus
(the IVM contract: incremental == batch), which
tests/test_graph_bridge_staged.py pins by drawn splits and
queries/llm_ops.py::graph_ingest_batch_replay puts under the DuckDB
value oracle.

Exactly-once mirrors lsh_bridge: node identity is append-only, so
idempotence needs no batch-id watermark; the delta SINK (the touched
srcs' re-ranked edges — what a downstream search tier must invalidate)
runs BEFORE the state swap, so a crash inside the sink re-delivers the
batch against the OLD state and recomputes the identical delta, while
a crash after the swap re-delivers a no-op batch whose delta the sink
already durably holds (sink must be idempotent per batch_id —
overwrite-by-batch-id parquet, the standard foreachBatch discipline).

State durability: memory tier pins both relations (localCheckpoint —
node/edge state is corpus × (1 + k) rows, the bounded/test tier); the
durable tier writes BOTH relations under ONE parent state dir
(state/nodes, state/edges) and swaps the PARENT with the
write-new-then-swap protocol, so the two relations can never be
observed from different batches — the atomicity reason they share a
directory. Completeness marker = both sub-writes' _SUCCESS files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.similarity import (
    assign_centroids,
    cosine,
)

_NODE_SCHEMA = "vec_id long, centroid_id long, vec array<double>"
_EDGE_SCHEMA = "src long, dst long, edge_sim double"


class GraphIngestBridge:
    """foreachBatch-shaped incremental kNN-graph maintainer.

    Usage (batch replay or inside ``writeStream.foreachBatch``)::

        bridge = GraphIngestBridge(spark, centroids, k=8,
                                   state_dir="/state")
        bridge.process_batch(
            batch_df, batch_id,
            sink=lambda d: d.write.mode("overwrite")
                            .parquet(f"/delta/batch={batch_id}"),
        )
        searchable = bridge.read_edges()   # always == the batch build

    ``process_batch`` returns the batch's DELTA: the re-ranked edge
    rows of every affected src (new nodes and state nodes whose top-k
    changed candidates), already materialized so it outlives the swap.
    ``read_edges`` returns the full current graph — by the IVM contract
    always equal to knn_graph_edges over every vector seen so far.
    """

    def __init__(
        self,
        spark: SparkSession,
        centroids: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 8,
        state_dir: str | None = None,
    ) -> None:
        if state_dir is not None and "://" in state_dir:
            # loud refusal, the lsh_bridge/ivm precedent: the swap
            # protocol is POSIX renames; a scheme'd URI would silently
            # resume from empty state (the whole graph re-derived as new)
            raise ValueError(
                "GraphIngestBridge state_dir must be a local filesystem "
                f"path (got URI {state_dir!r})"
            )
        self.spark = spark
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k
        self.state_dir = state_dir
        # the static coarse quantizer: pinned once — every batch
        # broadcasts it, and assignment must not re-derive a mutable
        # upstream (arrival-order independence is what makes the fold
        # closed-form checkable)
        self._centroids = centroids.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        ).localCheckpoint()
        self._mem_nodes: DataFrame | None = None
        self._mem_edges: DataFrame | None = None

    # ---- state tier ----------------------------------------------------
    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def read_nodes(self) -> DataFrame:
        if self.state_dir is None:
            return (
                self._mem_nodes
                if self._mem_nodes is not None
                else self._empty(_NODE_SCHEMA)
            )
        self._recover()
        p = os.path.join(self.state_dir, "nodes")
        if os.path.isdir(p):
            return self.spark.read.parquet(p)
        return self._empty(_NODE_SCHEMA)

    def read_edges(self) -> DataFrame:
        """Current graph: (src, dst, edge_sim), k rows per src."""
        if self.state_dir is None:
            return (
                self._mem_edges
                if self._mem_edges is not None
                else self._empty(_EDGE_SCHEMA)
            )
        self._recover()
        p = os.path.join(self.state_dir, "edges")
        if os.path.isdir(p):
            return self.spark.read.parquet(p)
        return self._empty(_EDGE_SCHEMA)

    def _complete(self, d: str) -> bool:
        return os.path.isfile(
            os.path.join(d, "nodes", "_SUCCESS")
        ) and os.path.isfile(os.path.join(d, "edges", "_SUCCESS"))

    def _recover(self) -> None:
        """Same single crash window as lsh_bridge, on the PARENT dir: a
        complete ._next left between the aside-rename and the swap-in is
        rolled forward; anything else rolls back (the batch re-delivers
        and the append-only node algebra absorbs it)."""
        nxt, old = self.state_dir + "._next", self.state_dir + "._old"
        if os.path.isdir(self.state_dir):
            shutil.rmtree(nxt, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            return
        if self._complete(nxt):
            os.replace(nxt, self.state_dir)
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            os.replace(old, self.state_dir)
            shutil.rmtree(nxt, ignore_errors=True)

    def _write_state(self, nodes: DataFrame, edges: DataFrame) -> None:
        if self.state_dir is None:
            # memory tier: pin both (iterative-loop lineage rule; state
            # is corpus × (1 + k) rows — the bounded/test tier)
            self._mem_nodes = nodes.localCheckpoint()
            self._mem_edges = edges.localCheckpoint()
            return
        nxt, old = self.state_dir + "._next", self.state_dir + "._old"
        shutil.rmtree(nxt, ignore_errors=True)
        nodes.write.mode("overwrite").parquet(os.path.join(nxt, "nodes"))
        edges.write.mode("overwrite").parquet(os.path.join(nxt, "edges"))
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(self.state_dir):
            os.replace(self.state_dir, old)
        os.replace(nxt, self.state_dir)
        shutil.rmtree(old, ignore_errors=True)

    # ---- the operator ---------------------------------------------------
    def process_batch(
        self,
        vectors: DataFrame,
        batch_id: int = -1,
        *,
        sink=None,
    ) -> DataFrame:
        """Fold one micro-batch of vectors in; return the delta edges.

        ``batch_id`` is accepted for foreachBatch signature parity but
        unused — idempotence is algebraic (append-only node identity),
        not watermark-based. ``sink`` (callable on the delta DataFrame)
        runs on the materialized delta BEFORE the state swap; if it
        raises, the state does not advance and the batch re-delivers
        cleanly (crash-window note in the module docstring).
        """
        nodes = self.read_nodes()
        edges = self.read_edges()

        seen = nodes.select("vec_id").distinct()
        fresh = (
            vectors.select(
                F.col(self.id_col).cast("long").alias("vec_id"),
                F.col(self.vec_col).cast("array<double>").alias("vec"),
            )
            .join(seen, "vec_id", "left_anti")
        )
        new_nodes = (
            fresh.join(
                assign_centroids(
                    fresh.select(
                        F.col("vec_id"), F.col("vec").alias(self.vec_col)
                    ),
                    self._centroids,
                    "vec_id",
                    self.vec_col,
                ).select("vec_id", F.col("centroid_id").cast("long").alias("centroid_id")),
                "vec_id",
            )
            .select("vec_id", "centroid_id", "vec")
            # pin: consumed by the member union, the reverse-candidate
            # join, AND the state merge (diamond policy; batch-sized)
            .localCheckpoint()
        )

        members = nodes.unionByName(new_nodes)
        fwd = (
            new_nodes.alias("n")
            .join(members.alias("m"), "centroid_id")
            .where(F.col("n.vec_id") != F.col("m.vec_id"))
            .select(
                F.col("n.vec_id").alias("src"),
                F.col("m.vec_id").alias("dst"),
                F.round(cosine(F.col("n.vec"), F.col("m.vec")), 6).alias(
                    "edge_sim"
                ),
            )
        )
        rev = (
            nodes.alias("o")
            .join(new_nodes.alias("n"), "centroid_id")
            .select(
                F.col("o.vec_id").alias("src"),
                F.col("n.vec_id").alias("dst"),
                F.round(cosine(F.col("o.vec"), F.col("n.vec")), 6).alias(
                    "edge_sim"
                ),
            )
        )
        # pin: consumed by the affected-src projection AND the re-rank
        # union — unpinned, the batch × partition-member joins would run
        # twice (the lsh_bridge new_bands precedent; cand is the batch's
        # work set, bounded by |batch| × touched-partition members)
        cand = fwd.unionByName(rev).localCheckpoint()

        affected = cand.select("src").distinct()
        kept = edges.join(affected, "src", "left_anti")
        w = W.partitionBy("src").orderBy(F.desc("edge_sim"), "dst")
        # old top-k of affected srcs ∪ their new candidates: disjoint by
        # construction (a state edge's dst is a seen node; a candidate's
        # dst involves a new node on one side), so row_number ranks a
        # true candidate SET — the insert-only top-k fold
        reranked = (
            edges.join(affected, "src")
            .unionByName(cand)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= self.k)
            .drop("rn")
        )
        # materialize the delta BEFORE the swap — it must outlive the
        # state advance, and the durable sink runs on it first
        delta = reranked.localCheckpoint()
        if sink is not None:
            sink(delta)
        self._write_state(
            nodes.unionByName(new_nodes), kept.unionByName(delta)
        )
        return delta


def run_graph_bridge_stream(
    spark: SparkSession,
    input_dir: str,
    centroids: DataFrame,
    *,
    schema: str = "vec_id long, embedding array<double>",
    state_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    **bridge_kwargs,
) -> DataFrame:
    """Drive the bridge through a REAL Structured Streaming query (file
    source → foreachBatch → availableNow drain) and return the FINAL
    graph — the §2.8 discipline of proving the engine under the actual
    streaming runtime, not just direct process_batch calls. A
    production deployment points a search tier at read_edges() (or the
    per-batch delta sink) instead of returning it."""
    bridge = GraphIngestBridge(
        spark, centroids, state_dir=state_dir, **bridge_kwargs
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        bridge.process_batch(batch_df, batch_id)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return bridge.read_edges()
