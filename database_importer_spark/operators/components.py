"""Connected components over a pair/edge DataFrame — the clustering
step of near-duplicate dedup: LSH/verify produces *pairs*; choosing
one canonical document per duplicate *group* requires the transitive
closure (A~B, B~C ⇒ {A,B,C} one group).

Algorithm: iterative hash-to-min label propagation — every node
starts labeled with its own id; each round takes the min label over
itself and its neighbors; converges in O(graph diameter) rounds.
Each round is one join + one aggregation (all DataFrame ops, shuffle
on node id), and the lineage is cut per round with an eager
localCheckpoint — the standard Spark iterative-algorithm pattern
(on a cluster, set a checkpoint dir and use checkpoint()).

At 100 TB: near-dup graphs are overwhelmingly tiny components
(pairs/triples), so diameter — and the round count — stays small;
each round's shuffle carries (node, label) pairs only.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceWarning(RuntimeWarning):
    """Raised-as-warning when label propagation exhausts max_rounds
    with labels still changing — the returned labels are an upper
    bound on the true components, not the fixed point."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
    strict: bool = False,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable
    from ``id`` — the canonical-representative assignment. Only nodes
    appearing in ``edges`` are returned (isolated docs are their own
    canonical trivially).

    Convergence is verified: if labels are still changing when
    ``max_rounds`` is exhausted (graph diameter > max_rounds), raises
    RuntimeError when ``strict`` else emits ConvergenceWarning —
    never silently returns non-converged labels."""
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    )

    converged = False
    for _ in range(max_rounds):
        nbr_min = (
            adj.join(
                labels.select(F.col("id").alias("b"), F.col("label").alias("nl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("min_nl"))
            .select(F.col("a").alias("id"), "min_nl")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("min_nl", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            "connected_components exhausted max_rounds=%d with labels "
            "still changing; results are not the transitive closure "
            "(graph diameter exceeds the round budget)" % max_rounds
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, ConvergenceWarning)
    return labels.select("id", F.col("label").alias("component"))


def dedup_groups(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → (doc_id, canonical_id): every member of a
    duplicate group maps to the group's min id; keep rows where
    doc_id == canonical_id (plus all unpaired docs) to dedup."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("canonical_id")
    )
