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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable
    from ``id`` — the canonical-representative assignment. Only nodes
    appearing in ``edges`` are returned (isolated docs are their own
    canonical trivially)."""
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    )

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
            break
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
