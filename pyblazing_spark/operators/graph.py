"""Connected components over near-duplicate pair graphs.

Greedy pair-drop dedup (remove ``id_b`` of every pair) under-merges
transitive chains: a~b, b~c with a<b<c drops b and c correctly, but
a~b, c~b (no a~c edge) must still collapse to ONE cluster. The correct
primitive is connected components; this module implements the standard
distributed min-label propagation (the simplified form of the
large-star/small-star MapReduce algorithm — Kiveris et al., "Connected
Components in MapReduce and Beyond", public literature):

repeat: every node takes the min label among itself and its neighbors.
Converges in O(graph diameter) rounds; near-dup graphs are unions of
small cliques/chains, so a handful of rounds suffices. Each round is
one shuffle of (node, label) longs — no text, no vectors. The driver
checks a scalar convergence count per round (bounded, documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable through the undirected pair graph.

    Raises if the label propagation hasn't converged after ``max_iter``
    rounds (diameter > max_iter) rather than returning a wrong answer.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    labels = (
        sym.select(F.col("u").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb_min, labels["id"] == nb_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # one scalar to the driver per round — the convergence check.
        # localCheckpoint would truncate lineage for huge graphs; at
        # catalog scale the plans stay small enough without it.
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter too large — raise max_iter or switch to "
        "large-star/small-star)"
    )


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Transitive near-dup dedup: keep the min-id member of every
    connected component, plus every unpaired doc."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
