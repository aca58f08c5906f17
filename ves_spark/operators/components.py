"""Connected components over near-duplicate pairs: the step that
turns pairwise dup detection into dedup DECISIONS. Near-dup relations
chain (A~B, B~C without A~C), so keep/drop choices need the whole
component, not pairs — every doc gets the component's minimum doc id
as its canonical representative.

Algorithm: hash-min label propagation as iterative DataFrame joins —
each round, every node takes the min label among itself and its
neighbours; converged when nothing changes. Rounds needed = component
diameter, and near-dup components are shallow (duplicates of a common
ancestor), so a handful of rounds closes real corpora.

Scale shape (100 TB): edges are symmetrized once and only (node,
label) pairs shuffle per round — O(E) per round on the dup-pair set,
which is orders of magnitude smaller than the corpus. Labels persist
per round and the previous round unpersists (bounded lineage/memory;
``localCheckpoint`` would cut lineage too but persists suffice at
O(diameter) rounds). For adversarial long-chain graphs the
production-scale upgrade is alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce"), which
converges in O(log d) rounds with the same join shape — the seam is
this function's body, not its callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Undirected: edges are
    symmetrized internally."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    sym.persist()
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    labels.persist()

    for _ in range(max_iter):
        # every node's candidate: min neighbour label
        msgs = (
            sym.join(labels, sym.s == labels.node)
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def dedup_keepers(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Left-join the component map back onto the corpus: docs in no
    component keep themselves; others keep only component == id
    (one canonical doc per near-dup cluster survives)."""
    joined = docs.join(
        components.withColumnRenamed("node", id_col), id_col, "left"
    )
    return joined.withColumn(
        "keeper",
        F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col),
    )
