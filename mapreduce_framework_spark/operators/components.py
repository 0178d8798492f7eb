"""Connected components by iterative min-label propagation.

Near-dup PAIRS (minhash/simhash/jaccard output) aren't the deliverable
of a dedup pipeline — duplicate CLUSTERS are: the transitive closure of
pairs, with one canonical document kept per cluster.  Components over
the pair graph is the canonical iterative-dataflow algorithm, the one
shape the engine cannot express as a single declarative plan.

Algorithm (min-label propagation, the DataFrame rendition of
large-star/small-star, cf. the MapReduce connected-components
literature): every node starts labeled with itself; each round, a node
takes the min of its own label and its neighbors' labels; stop when a
round changes nothing.  Rounds = O(component diameter) — near-dup
clusters are dense and shallow, so this converges in a handful of
rounds.

Scale shape: one shuffle per round (groupBy node), label frame is
(node, label) longs only; edges are reused each round (cache-worthy on
a cluster).  The driver-side loop is the legitimate kind: it iterates
ROUNDS (bounded by diameter), never rows — the per-round convergence
check is an aggregate count, not a collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """DataFrame[node, component] — component = min node id reachable.

    ``edges`` is an undirected pair list (each pair once is fine).
    Isolated nodes don't appear (join the caller's node table with a
    coalesce afterwards if needed).
    """
    # Iterative-dataflow hygiene: WITHOUT materialization each round's
    # convergence count re-executes the whole lineage — including the
    # caller's (possibly expensive) edge derivation — once per round,
    # and the logical plan grows unboundedly.  Edges persist once;
    # labels localCheckpoint each round (eager), which BOTH caches and
    # truncates lineage.  (localCheckpoint blocks are executor-local and
    # unreplicated — on a cluster run that must survive executor loss,
    # switch to checkpoint() with a checkpoint dir.)  Measured 17s → 3s
    # at sf0.1 on the dedup_clusters query.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )

    labels = (
        sym.select("u")
        .distinct()
        .select("u", F.col("u").alias("component"))
        .localCheckpoint(eager=True)
    )

    try:
        for _ in range(max_iter):
            # Each node's candidate label: min over neighbors' labels.
            neighbor_min = (
                sym.join(labels.withColumnRenamed("u", "v2"), sym.v == F.col("v2"))
                .groupBy("u")
                .agg(F.min("component").alias("nbr_min"))
            )
            updated = (
                labels.join(neighbor_min, "u", "left")
                .select(
                    "u",
                    F.least(
                        F.col("component"), F.coalesce("nbr_min", F.col("component"))
                    ).alias("component"),
                    (
                        F.coalesce("nbr_min", F.col("component")) < F.col("component")
                    ).alias("_changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = updated.where(F.col("_changed")).limit(1).count()
            labels = updated.drop("_changed")
            if changed == 0:
                break
    finally:
        sym.unpersist()

    return labels.select(F.col("u").alias("node"), "component")
