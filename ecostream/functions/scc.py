"""Distributed strongly-connected components over edge DataFrames.

The scale path for DTMC state classification (SURVEY §2.8 M4): the
driver-local Tarjan in ``markov_analysis.py`` is sanctioned for the
event-vocabulary-sized matrix, but a state space that does not fit the
driver needs SCC as dataflow.  This implements the coloring algorithm
(Orzan 2004; also the shape used by Pregel-style SCC in GraphX /
GraphFrames): repeat { propagate the max vertex id forward to a
fixpoint ("color"); every vertex whose color is itself is a root; the
backward-reachable set from each root *within its own color* is
exactly that root's SCC; extract all of them at once and recurse on
the remainder }.  Every step is a join / aggregate — no adjacency ever
materializes on the driver, and all roots of a round are extracted in
a single backward BFS.

Rounds are bounded by the number of SCCs on the longest
inter-SCC chain; each propagation step is one hash join on the edge
relation, co-partitioned by vertex.  ``localCheckpoint`` truncates
lineage every step so the plan stays O(1) per iteration instead of
growing with the diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def distributed_scc(
    vertices: DataFrame, edges: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """SCC labels for a directed graph held as DataFrames.

    ``vertices``: one column ``v``; ``edges``: columns ``src``, ``dst``.
    Returns ``(state, scc)`` where ``scc`` is the max vertex id of the
    component (a deterministic canonical representative).
    """
    spark = vertices.sparkSession
    remaining = _ckpt(vertices.select("v").distinct())
    e = _ckpt(
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    assigned = spark.createDataFrame([], "state string, scc string")

    for _ in range(max_rounds):
        if remaining.isEmpty():
            return assigned
        # 1. forward max-color propagation to fixpoint: color(v) ends as
        #    the max vertex id that can reach v.
        color = _ckpt(remaining.select("v", F.col("v").alias("color")))
        while True:
            incoming = (
                e.join(color.withColumnRenamed("v", "src"), "src")
                .groupBy(F.col("dst").alias("v"))
                .agg(F.max("color").alias("in_color"))
            )
            new_color = _ckpt(
                color.join(incoming, "v", "left").select(
                    "v",
                    F.greatest(
                        "color", F.coalesce("in_color", "color")
                    ).alias("color"),
                )
            )
            changed = (
                new_color.alias("n")
                .join(color.alias("o"), "v")
                .where(F.col("n.color") != F.col("o.color"))
                .isEmpty()
            )
            color = new_color
            if changed:
                break
        # 2. roots (color(v) == v) and one backward BFS from ALL roots at
        #    once, restricted to each root's own color: that set is the
        #    root's SCC.
        members = _ckpt(
            color.where(F.col("v") == F.col("color")).select(
                "v", F.col("v").alias("scc")
            )
        )
        frontier = members
        while not frontier.isEmpty():
            preds = (
                e.join(frontier.withColumnRenamed("v", "dst"), "dst")
                .select(F.col("src").alias("v"), "scc")
                .distinct()
                .join(color, "v")
                .where(F.col("color") == F.col("scc"))
                .select("v", "scc")
            )
            frontier = _ckpt(preds.join(members, "v", "left_anti"))
            # Lazy union of already-checkpointed legs: re-checkpointing
            # the WHOLE member set per round copies O(rounds x |V|)
            # rows (the g16 BFS lesson); the anti-join scans the
            # materialized legs without recomputation.
            members = members.unionByName(frontier)
        # 3. extract and recurse on the remainder.
        assigned = _ckpt(
            assigned.unionByName(
                members.select(F.col("v").alias("state"), "scc")
            )
        )
        remaining = _ckpt(remaining.join(members, "v", "left_anti"))
        e = _ckpt(
            e.join(remaining.withColumnRenamed("v", "src"), "src").join(
                remaining.withColumnRenamed("v", "dst"), "dst"
            )
        )
    raise RuntimeError(f"SCC did not converge in {max_rounds} rounds")


def scc_bfs_levels(
    members: DataFrame, edges: DataFrame, max_iter: int = 64
) -> DataFrame:
    """Forward BFS levels from each SCC's representative, restricted to
    intra-SCC edges: ``(v, scc, level)``.  Feeds the period computation
    (gcd of ``level(u)+1−level(v)`` over internal edges)."""
    intra = _ckpt(
        edges.join(
            members.select(F.col("v").alias("src"), "scc"), "src"
        ).join(
            members.select(F.col("v").alias("dst"), F.col("scc").alias("dscc")),
            "dst",
        )
        .where(F.col("scc") == F.col("dscc"))
        .select("src", "dst", "scc")
    )
    levels = _ckpt(
        members.where(F.col("v") == F.col("scc")).select(
            "v", "scc", F.lit(0).alias("level")
        )
    )
    frontier = levels
    for _ in range(max_iter):
        if frontier.isEmpty():
            return levels
        nxt = (
            intra.join(
                frontier.select(F.col("v").alias("src"), "scc", "level"),
                ["src", "scc"],
            )
            .groupBy(F.col("dst").alias("v"), "scc")
            .agg((F.min("level") + 1).alias("level"))
        )
        frontier = _ckpt(nxt.join(levels, ["v", "scc"], "left_anti"))
        # Lazy union of checkpointed legs (same rationale as above).
        levels = levels.unionByName(frontier)
    raise RuntimeError(f"BFS did not converge in {max_iter} iterations")
