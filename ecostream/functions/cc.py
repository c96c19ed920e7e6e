"""Distributed connected components over undirected edge DataFrames.

The missing half of near-dup deduplication: LSH (d3) yields candidate
PAIRS, but a dedup pass needs CLUSTERS — if A~B and B~C, one keeper for
{A,B,C} even though (A,C) was never a candidate pair.  Pair→cluster is
connected components, and the canonical dataflow formulation is
hash-min label propagation: every vertex starts labeled with itself,
and each round takes the min label over itself and its neighbors until
a fixpoint.  Rounds are bounded by the graph diameter (near-dup
clusters are shallow — duplicates of a common source — so a handful of
rounds in practice; the large-star/small-star algorithm of Kiveris et
al. 2014 gets O(log n) worst-case and is the drop-in upgrade if ever
needed).

Every step is one hash join + partial-aggregated min on the vertex id
— co-partitioned once the first shuffle lands, no driver adjacency,
``localCheckpoint`` truncating lineage per round (same discipline as
functions/scc.py).  The fixpoint test piggybacks on the same join: it
counts changed labels, which AQE executes as a broadcast-free
one-column probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """Component labels for an undirected graph held as DataFrames.

    ``vertices``: one column ``v``; ``edges``: columns ``src``, ``dst``
    (either orientation; symmetrized internally).  Returns
    ``(v, component)`` where ``component`` is the MIN vertex id of the
    component — a deterministic canonical representative, which is
    exactly the "keep the lowest doc_id" dedup rule.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = _ckpt(vertices.select("v", F.col("v").alias("component")))
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym.dst == labels.v)
            .select(F.col("src").alias("v"), "component")
        )
        new = _ckpt(
            labels.unionByName(nbr_min)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels
