"""Distributed connected components over undirected edge DataFrames.

The missing half of near-dup deduplication: LSH (d3) yields candidate
PAIRS, but a dedup pass needs CLUSTERS — if A~B and B~C, one keeper for
{A,B,C} even though (A,C) was never a candidate pair.  Pair→cluster is
connected components.  The distributed path is the two-phase
large-star / small-star algorithm of Kiveris et al. 2014 ("Connected
Components in MapReduce and Beyond"): each round rewires every edge
toward the minimum of a local neighborhood, and the edge set provably
converges in O(log n) rounds to a forest of stars whose centers are
the component minima — unlike plain hash-min label propagation, whose
round count is the graph DIAMETER (adversarial for chain-shaped
clusters).

Every step is one hash join + partial-aggregated min on the vertex id
— co-partitioned once the first shuffle lands, no driver adjacency,
``localCheckpoint`` truncating lineage per round (same discipline as
functions/scc.py).  The fixpoint test is a one-row ``limit(1)`` probe
over the symmetric difference of consecutive edge sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _local_union_find(
    spark, vertices: DataFrame | None, pdf, vtype
) -> DataFrame:
    """Driver-side path-compressed union-find for SMALL graphs.

    Below ``local_threshold`` the edge set is model-sized (for dedup:
    LSH candidate pairs, orders of magnitude smaller than the corpus),
    and a driver pass is hundreds of Spark jobs cheaper than iterating
    label propagation.  Same collect-a-model shape as the bloom bitset
    and k-means centroid round-trips (sanctioned, SURVEY §2.7/§7).

    ``pdf`` is the already-collected un-symmetrized edge frame (Arrow
    toPandas — row-at-a-time collect() / createDataFrame pickle every
    edge/label through Py4J, measured ~10 s at 864k edges on er1's x10
    slice; .tolist() normalizes numpy scalars so min/max/dict keys
    behave identically to the collect() form).  ``vtype`` carries the
    vertex id type so non-long ids work the same as on the distributed
    path.

    With ``vertices=None`` the label table — one row per EDGE-TOUCHED
    vertex, exactly the set the distributed path would derive from the
    symmetric edge list — is returned directly as a local table: no
    symmetrize, no distinct, no label join, zero extra Spark jobs.
    With an explicit vertex set, isolated vertices get their own id
    via the left join, as before.
    """
    import pandas as pd
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    schema = T.StructType(
        [T.StructField("v", vtype), T.StructField("component", vtype)]
    )
    touched = list(parent)
    labels = spark.createDataFrame(
        pd.DataFrame(
            {"v": touched, "component": [find(v) for v in touched]}
        ),
        schema,
    )
    if vertices is None:
        # touched == the edge-endpoint set, which is exactly what the
        # distributed path's vertices derivation (sym.distinct) yields,
        # and every touched vertex has a label — the left join would be
        # the identity.  Same rows, no join.
        return labels
    return vertices.join(labels, "v", "left").select(
        "v", F.coalesce("component", "v").alias("component")
    )


def connected_components(
    vertices: DataFrame | None,
    edges: DataFrame,
    max_rounds: int = 64,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Component labels for an undirected graph held as DataFrames.

    ``vertices``: one column ``v``; ``edges``: columns ``src``, ``dst``
    (either orientation; symmetrized internally).  Pass
    ``vertices=None`` to label exactly the EDGE-TOUCHED vertices: they
    are then derived from the internally-materialized symmetric edge
    list, so a caller whose vertex set IS the edge endpoints (dedup
    clustering: every non-trivial doc appears in a pair) avoids
    re-executing the expensive pair-producing lineage a second time
    for the vertex derivation — the edge pipeline runs exactly once.
    Returns one row per
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
    # Null endpoints carry no connectivity; drop them BEFORE the size
    # branch so both paths agree on dirty input (the distributed join
    # silently drops nulls, while the local union-find would raise on
    # ordering None against a vertex id).
    clean_lineage = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if local_threshold:
        # ONE evaluation both decides the size branch AND ships the
        # edges (formerly: checkpoint job + count job + toPandas job).
        # The probe runs on a LAZY localCheckpoint of the edge list
        # (ADVICE r12): a bare `clean_lineage.limit(cap)` would fully
        # execute every upstream stage past the first shuffle boundary
        # (CollectLimit only short-circuits the final stage) and the
        # distributed branch's checkpoint would then re-execute the
        # same expensive lineage a second time.  The lazy checkpoint
        # materializes as a side effect of the probe action (runJob's
        # doCheckpoint fills the remaining partitions in the same
        # action), so the upstream lineage — for dedup, the whole LSH
        # candidate pipeline — runs exactly ONCE on BOTH branches,
        # while the local branch still pays a single action.
        # Branch predicate identical to the old
        # `2 * count < threshold`: with cap = ceil(threshold/2),
        # len(pdf) < cap  ⟺  |edges| < threshold/2.  The union-find is
        # orientation-agnostic, so only the un-symmetrized half ships.
        cap = (local_threshold + 1) // 2
        clean = clean_lineage.localCheckpoint(eager=False)
        pdf = clean.limit(cap).toPandas()
        if len(pdf) < cap:
            vtype = (
                vertices.schema["v"].dataType
                if vertices is not None
                else clean_lineage.schema["src"].dataType
            )
            return _local_union_find(
                edges.sparkSession, vertices, pdf, vtype
            )
    else:
        # Materialize the edge list ONCE, BEFORE symmetrizing: every
        # round joins it, and without this the full upstream lineage
        # would re-execute per round — and checkpointing only AFTER
        # the union would still execute that lineage twice, once per
        # union branch (measured: half of er1's CC wall at x10 was
        # the blocking join running a second time).
        clean = _ckpt(clean_lineage)
    sym = clean.union(
        clean.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if vertices is None:
        # Derived from the materialized edge list, not the upstream
        # lineage.
        vertices = sym.select(F.col("src").alias("v")).distinct()
    # Two-phase star contraction runs over the edge set alone; the
    # final projection restores isolated input vertices, and endpoints
    # missing from `vertices` still conduct (matching the union-find
    # path) but are not emitted.
    labels, _rounds = _two_phase_labels(sym, max_rounds=max_rounds)
    return vertices.select("v").join(labels, "v", "left").select(
        "v", F.coalesce("component", "v").alias("component")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014, Alg. 2).

    For every node ``u`` with neighborhood Γ(u), connect each STRICTLY
    LARGER neighbor to ``min(Γ(u) ∪ {u})``.  Operates on the full
    symmetric neighborhood; every input edge survives via its smaller
    endpoint's perspective, so connectivity is preserved.  One shuffle
    on ``src`` serves both the min-aggregate and the join (the
    exchange is reused — co-partitioned on the same key).
    """
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round (Kiveris et al. 2014, Alg. 3).

    Input/output edges are oriented larger→smaller.  For every node
    ``u``, connect ``u`` and all its SMALLER neighbors to the minimum
    of that set.  Output stays strictly oriented (src > dst), so the
    two phases compose without re-canonicalizing.
    """
    mins = edges.groupBy("src").agg(F.min("dst").alias("m"))
    rewired = (
        edges.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return rewired.unionByName(
        mins.select("src", F.col("m").alias("dst"))
    ).distinct()


def _two_phase_labels(sym: DataFrame, max_rounds: int = 64):
    """Run alternating large-star/small-star to the edge-set fixpoint.

    ``sym`` is a symmetrized edge list (both orientations present, no
    nulls).  Returns ``(labels, rounds)`` where ``labels`` has one row
    ``(v, component)`` per NON-ROOT edge-touched vertex plus the roots
    themselves, ``component`` being the minimum vertex id of the
    component.  At the fixpoint the edge set is a forest of stars
    centered at component minima (Kiveris et al. 2014, Thm. 5.1), so
    labels are read directly off the edges — no extra propagation.
    ``rounds`` is the number of LS+SS iterations taken; O(log n) by
    the paper's potential argument (tested on an adversarial chain).
    """
    # Canonical orientation larger→smaller; drops self-loops.
    edges = _ckpt(
        sym.where(F.col("src") > F.col("dst")).select("src", "dst").distinct()
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        new = _ckpt(_small_star(_large_star(edges)))
        # Both sides are distinct sets: equal iff same size and no row
        # of `new` is outside `edges`.
        changed = (
            new.count() != edges.count()
            or new.exceptAll(edges).limit(1).count() > 0
        )
        edges = new
        if not changed:
            break
    roots = edges.select(F.col("dst").alias("v")).distinct()
    labels = _ckpt(
        edges.select(F.col("src").alias("v"), F.col("dst").alias("component"))
        .unionByName(roots.select("v", F.col("v").alias("component")))
        .groupBy("v")
        .agg(F.min("component").alias("component"))
    )
    # At a true fixpoint the edges are flat stars and this probe finds
    # nothing; if max_rounds cut the loop short, pointer-jump the
    # residual trees to their roots (O(log depth) tiny joins).
    while True:
        hop = (
            labels.alias("l")
            .join(
                labels.alias("p"),
                F.col("l.component") == F.col("p.v"),
            )
            .where(F.col("p.component") != F.col("l.component"))
        )
        if hop.limit(1).count() == 0:
            break
        labels = _ckpt(
            labels.alias("l")
            .join(
                labels.alias("p"),
                F.col("l.component") == F.col("p.v"),
                "left",
            )
            .select(
                F.col("l.v").alias("v"),
                F.coalesce("p.component", "l.component").alias("component"),
            )
        )
    return labels, rounds
