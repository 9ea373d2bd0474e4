"""Graph analytics operators beyond components/PageRank: k-core peeling.

k-core decomposition (Seidman 1983) — the densest-region extractor a
pipeline reaches for after components/PageRank/triangles: repeatedly
remove nodes of degree < k until the remaining subgraph (the k-core) is
stable. Used for community seeding, spam/bot subgraph isolation, and
curriculum mining over citation/link graphs.

Spark plan shape (the ``g6_pagerank`` fixed-iteration recipe):

- **fixed round count, not a convergence loop** — peeling is monotone and
  idempotent past its fixpoint, so running ``rounds`` unconditional rounds
  gives a deterministic plan an unrolled-CTE SQL oracle replays exactly,
  while a bounded-depth graph construction (see ``g8_k_core``) guarantees
  the fixpoint is reached;
- each round is one map-side-combinable degree aggregate over the
  symmetrised edge list plus two semi-joins (edges keep both endpoints) —
  no windows, no driver state;
- ``localCheckpoint`` per round cuts the iterative-join lineage, the same
  hygiene the CC/PageRank loops use.

Reference parity: the reference has no k-core (its graph layer stops at
components — ``src/matchbox/common/graph.py``); this extends the graph
family the same way g5/g6/g7 do, as a training-data-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 6,
    a_col: str = "a",
    b_col: str = "b",
    checkpoint: bool = True,
) -> DataFrame:
    """Nodes of the k-core after ``rounds`` peel rounds, with their final
    in-core degree: ``(node, degree)``, degree ≥ k.

    ``edges`` is an undirected simple graph, one row per edge (no
    self-loops; (a,b) stored once in either orientation). Rounds past the
    fixpoint are no-ops, so callers pick ``rounds`` from a bound on the
    peel depth of their graph family, not from the data.

    ``checkpoint=False`` is for composing into an outer plan that manages
    its own materialisation — WARNING: without the per-round
    localCheckpoint the iterative lineage branches ~3× per round
    (degree agg + two semi-joins each re-reference the edge plan), so
    analysis cost grows exponentially and stalls past ~6 rounds. Keep the
    default unless rounds is small.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    for _ in range(rounds):
        sym = e.select(F.col("a").alias("v")).unionAll(
            e.select(F.col("b").alias("v"))
        )
        keep = (
            sym.groupBy("v")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= k)
            .select("v")
        )
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a")
            .join(keep.withColumnRenamed("v", "b"), "b")
            .select("a", "b")
        )
        if checkpoint:
            e = e.localCheckpoint(eager=False)
    sym = e.select(F.col("a").alias("v")).unionAll(
        e.select(F.col("b").alias("v"))
    )
    return (
        sym.groupBy("v")
        .agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("v").alias("node"), "degree")
    )
