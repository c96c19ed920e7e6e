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


def _local_union_find(
    spark, vertices: DataFrame, sym: DataFrame
) -> DataFrame:
    """Driver-side path-compressed union-find for SMALL graphs.

    Below ``local_threshold`` the edge set is model-sized (for dedup:
    LSH candidate pairs, orders of magnitude smaller than the corpus),
    and a driver pass is hundreds of Spark jobs cheaper than iterating
    label propagation.  Same collect-a-model shape as the bloom bitset
    and k-means centroid round-trips (sanctioned, SURVEY §2.7/§7).

    Only EDGE-TOUCHED vertices round-trip through the driver (≤ 2·|E|,
    bounded by the threshold); the possibly-huge vertex set stays
    distributed — isolated vertices get their own id via a left join.
    The label schema is taken from ``vertices`` so non-long vertex ids
    work the same as on the distributed path.
    """
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in sym.collect():
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(v, find(v)) for v in parent]
    vtype = vertices.schema["v"].dataType
    schema = T.StructType(
        [T.StructField("v", vtype), T.StructField("component", vtype)]
    )
    labels = spark.createDataFrame(rows, schema)
    return vertices.join(labels, "v", "left").select(
        "v", F.coalesce("component", "v").alias("component")
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 64,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Component labels for an undirected graph held as DataFrames.

    ``vertices``: one column ``v``; ``edges``: columns ``src``, ``dst``
    (either orientation; symmetrized internally).  Returns one row per
    INPUT VERTEX: ``(v, component)`` where ``component`` is the MIN
    vertex id of the component — a deterministic canonical
    representative, which is exactly the "keep the lowest doc_id" dedup
    rule.  Edge endpoints absent from ``vertices`` still CONDUCT
    connectivity (A-X, X-B with X ∉ vertices puts A and B in one
    component) but are not emitted — both execution paths agree on
    this.

    Size-adaptive: the symmetrized edge list is materialized once
    (required anyway — every round joins it); if it holds fewer than
    ``local_threshold`` edges, a driver union-find finishes in one
    pass instead of diameter-many distributed rounds.  Set
    ``local_threshold=0`` to force the distributed path.
    """
    # Materialize the symmetrized edge list ONCE: every round joins it,
    # and without this the full upstream lineage (for dedup: the whole
    # LSH candidate pipeline) would re-execute per round.
    # Null endpoints carry no connectivity; drop them BEFORE the size
    # branch so both paths agree on dirty input (the distributed join
    # silently drops nulls, while the local union-find would raise on
    # ordering None against a vertex id).
    sym = _ckpt(
        edges.select("src", "dst")
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        )
    )
    if local_threshold and sym.count() < local_threshold:
        return _local_union_find(vertices.sparkSession, vertices, sym)
    # Propagation runs over vertices ∪ edge endpoints so endpoints
    # missing from `vertices` still conduct (matching the union-find
    # path); the final projection restricts back to the input vertices.
    all_verts = _ckpt(
        vertices.select("v")
        .unionByName(sym.select(F.col("src").alias("v")))
        .distinct()
    )
    labels = _ckpt(all_verts.select("v", F.col("v").alias("component")))
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
    return vertices.select("v").join(labels, "v", "left").select(
        "v", F.coalesce("component", "v").alias("component")
    )
