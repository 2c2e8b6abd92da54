"""Connected components over the near-duplicate pair graph.

Pair-level dedup (minhash/simhash/embedding `*_pairs` operators) is not
a dedup decision yet: keep-one-per-group needs the transitive closure
of the pairs — A~B and B~C must collapse A, B, C together even though
(A, C) was never emitted.  The standard corpus pipeline therefore runs
connected components on the candidate-pair graph and keeps the minimum
doc id per component.

Spark-first implementation: min-label propagation with pointer
jumping.  Each round every node takes the min component label among
itself and its neighbors, then labels are compressed one hop
(``comp := comp[comp]``), which halves remaining path lengths — so
rounds grow O(log diameter), not O(diameter).  Each round is two
equi-joins + a groupBy on the PAIR graph, which is orders of magnitude
smaller than the corpus (only near-duplicates appear in it); the
corpus itself is touched once at the end to label isolated documents.
Lineage is truncated per round with an eager localCheckpoint, and
convergence is detected by the strictly-decreasing sum of labels (one
cheap scalar action per round — no row-level diff join).

The driver-side loop is bounded and tiny (a handful of rounds); all
row-scaled work stays distributed.  (GraphFrames' large-star/small-star
is the same idea with a 2-phase split; this 1-phase variant keeps the
dependency surface to plain DataFrames.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected `edges` graph.  Returns
    (id, component) with component = min node id reachable.  `nodes`
    (single column ``id``) adds isolated vertices; defaults to the
    vertices appearing in `edges`."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # materialize the pair graph once — its lineage (an LSH/simhash
    # candidate join) would otherwise recompute on every round
    esym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    if nodes is None:
        nodes = esym.select(F.col("a").alias("id")).distinct()
    comp = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    prev_sum = comp.agg(F.sum("comp")).collect()[0][0] or 0
    for _ in range(max_iter):
        msgs = esym.join(comp, esym["a"] == comp["id"]).select(
            F.col("b").alias("id"), "comp"
        )
        prop = (
            comp.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: follow the label one hop (comp := comp[comp])
        jumped = (
            prop.alias("x")
            .join(
                prop.select(
                    F.col("id").alias("jid"), F.col("comp").alias("jcomp")
                ),
                F.col("x.comp") == F.col("jid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.coalesce("jcomp", F.col("x.comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = jumped.agg(F.sum("comp")).collect()[0][0] or 0
        comp = jumped
        if cur_sum == prev_sum:  # min-label sum strictly decreases until fixed
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return comp
