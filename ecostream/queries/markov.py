"""Markov / event-sequence suite (SURVEY §2.8 M1-M4).

The reference sorts ALL events globally by eventTime and pairs each
with its successor (transition_matrix.py:22-46), normalizes counts into
P(next|cur) (":51-62"), pivots to a dense matrix (":64-84"), and runs a
driver-local DTMC classification (MarkovChainAnalysis.py).

Spark mapping: ``F.lead`` over a window.  The scale-correct variant
partitions by user (shuffle = hash(user_id), no global sort); the
strict-parity variant keeps the reference's single global ordering and
is fine at test scale but documented as the non-scalable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pairs_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cur, nxt) consecutive-event pairs within each user's timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
    )


_PAIRS_SQL = """
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
"""


# --- M1: consecutive-event pairing (lead/lag) -------------------------------


@query(
    "m1_transition_pairs",
    oracle=f"""
    SELECT cur, nxt, count(*) AS cnt
    FROM ({_PAIRS_SQL})
    WHERE nxt IS NOT NULL
    GROUP BY cur, nxt
    """,
)
def m1_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transition pair counts, per-user ordering (the scale path: the
    window shuffle partitions by user_id instead of the reference's
    global sort)."""
    return (
        _pairs_per_user(spark, sf_dir)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "m1_global_transition_pairs",
    oracle="""
    SELECT cur, nxt, count(*) AS cnt FROM (
        SELECT event_type AS cur,
               lead(event_type) OVER (ORDER BY ts, event_id) AS nxt
        FROM events
    ) WHERE nxt IS NOT NULL
    GROUP BY cur, nxt
    """,
)
def m1_global_transition_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict parity with the reference's single global event ordering
    (transition_matrix.py:36).  NOTE: a global ORDER BY window is a
    single-partition sort — correct but intentionally non-scalable;
    m1_transition_pairs is the 100-TB form."""
    ev = load_table(spark, sf_dir, "events")
    w = W.orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
    )


# --- M2: Markov chain P(next|cur) -------------------------------------------


@query(
    "m2_markov_probabilities",
    oracle=f"""
    WITH pairs AS (
        SELECT cur, nxt, count(*) AS cnt
        FROM ({_PAIRS_SQL})
        WHERE nxt IS NOT NULL
        GROUP BY cur, nxt
    )
    SELECT cur, nxt, cnt,
           ROUND(CAST(cnt AS DOUBLE)
                 / CAST(SUM(cnt) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
    FROM pairs
    """,
)
def m2_markov_probabilities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next|cur) = count(cur→next) / count(cur→*): window-normalized
    group count (transition_matrix.py:51-62).  Integer counts divide as
    doubles — IEEE division is deterministic, so round(6) is hash-safe."""
    pairs = (
        _pairs_per_user(spark, sf_dir)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("cur")
    return pairs.withColumn(
        "p",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(w).cast("double"), 6
        ),
    )


# --- M3: dense transition matrix (pivot) -------------------------------------


@query(
    "m3_transition_matrix",
    oracle=f"""
    WITH pairs AS (
        SELECT cur, nxt FROM ({_PAIRS_SQL}) WHERE nxt IS NOT NULL
    )
    SELECT cur,
           ROUND(CAST(SUM(CASE WHEN nxt = 'click'    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS p_click,
           ROUND(CAST(SUM(CASE WHEN nxt = 'error'    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS p_error,
           ROUND(CAST(SUM(CASE WHEN nxt = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS p_purchase,
           ROUND(CAST(SUM(CASE WHEN nxt = 'signup'   THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS p_signup,
           ROUND(CAST(SUM(CASE WHEN nxt = 'view'     THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS p_view
    FROM pairs GROUP BY cur
    """,
)
def m3_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-normalized dense transition matrix via groupBy().pivot() with
    the state list pinned (transition_matrix.py:64-84).  Pinning the
    pivot values avoids the extra distinct-collection job."""
    pairs = _pairs_per_user(spark, sf_dir)
    pivoted = (
        pairs.groupBy("cur")
        .pivot("nxt", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    total = sum(F.col(s) for s in EVENT_TYPES)
    out = pivoted.select(
        "cur",
        *[
            F.round(F.col(s).cast("double") / total.cast("double"), 6).alias(
                f"p_{s}"
            )
            for s in EVENT_TYPES
        ],
    )
    return out


# --- M4: DTMC state classification (driver-local; SURVEY M4) -----------------


def _dtmc_oracle(edges_sql: str) -> str:
    """Full-classification DuckDB oracle for the m4 family, derived from
    first principles over a given positive-transition edge relation:

    - recurrence: a state is recurrent iff its communicating class is
      closed — every state it reaches can reach it back (recursive-CTE
      transitive closure, the m4c device);
    - period: gcd of the SCC's simple-cycle lengths, enumerated by a
      path-tracking recursive walk bounded at |vocabulary| steps (a
      simple cycle never exceeds the state count); the gcd of a set
      bounded by N is the largest d in 1..N dividing every length;
    - scc index: dense ascending rank of each component's MAX member —
      the same canonical id distributed_scc labels components with.
    """
    n = len(EVENT_TYPES)
    return f"""
    WITH RECURSIVE
    edges AS ({edges_sql}),
    states AS (
        -- explicit DISTINCT: under WITH RECURSIVE, DuckDB evaluates
        -- this UNION without deduplicating across the two branches
        SELECT DISTINCT st FROM (
            SELECT cur AS st FROM edges UNION ALL SELECT nxt FROM edges
        )
    ),
    reach(src, dst) AS (
        SELECT cur, nxt FROM edges
        UNION
        SELECT r.src, e.nxt FROM reach r JOIN edges e ON e.cur = r.dst
    ),
    walk(start, cur, len, path) AS (
        SELECT cur, nxt, 1, [cur, nxt] FROM edges
        UNION ALL
        SELECT w.start, e.nxt, w.len + 1, list_append(w.path, e.nxt)
        FROM walk w JOIN edges e ON e.cur = w.cur
        WHERE w.cur <> w.start
          AND w.len < {n}
          AND (e.nxt = w.start OR NOT list_contains(w.path, e.nxt))
    ),
    cycles AS (SELECT start, len FROM walk WHERE cur = start),
    comm AS (
        SELECT s.st AS state,
               (SELECT MAX(t.st) FROM states t
                WHERE t.st = s.st
                   OR (EXISTS (SELECT 1 FROM reach r
                               WHERE r.src = s.st AND r.dst = t.st)
                       AND EXISTS (SELECT 1 FROM reach r
                                   WHERE r.src = t.st AND r.dst = s.st))
               ) AS rep
        FROM states s
    ),
    closedness AS (
        SELECT s.st AS state,
               NOT EXISTS (
                   SELECT 1 FROM reach r
                   WHERE r.src = s.st
                     AND NOT EXISTS (
                         SELECT 1 FROM reach r2
                         WHERE r2.src = r.dst AND r2.dst = s.st
                     )
               ) AS is_recurrent
        FROM states s
    ),
    scc_cycles AS (
        SELECT m.rep, c.len FROM cycles c JOIN comm m ON m.state = c.start
    ),
    periods AS (
        SELECT reps.rep, CAST(MAX(ds.d) AS INTEGER) AS period
        FROM (SELECT DISTINCT rep FROM comm) reps,
             (SELECT UNNEST(RANGE(1, {n + 1})) AS d) ds
        WHERE EXISTS (SELECT 1 FROM scc_cycles sc WHERE sc.rep = reps.rep)
          AND NOT EXISTS (SELECT 1 FROM scc_cycles sc
                          WHERE sc.rep = reps.rep AND sc.len % ds.d <> 0)
        GROUP BY reps.rep
    ),
    scc_idx AS (
        SELECT rep, CAST(row_number() OVER (ORDER BY rep) - 1 AS INTEGER) AS scc
        FROM (SELECT DISTINCT rep FROM comm)
    )
    SELECT m.state,
           CASE WHEN cl.is_recurrent THEN 'recurrent'
                ELSE 'transient' END AS "class",
           CAST(CASE WHEN cl.is_recurrent THEN COALESCE(p.period, 0)
                     ELSE 0 END AS INTEGER) AS period,
           i.scc
    FROM comm m
    JOIN closedness cl ON cl.state = m.state
    LEFT JOIN periods p ON p.rep = m.rep
    JOIN scc_idx i ON i.rep = m.rep
    ORDER BY m.state
    """


# m4 classifies the ROUNDED transition matrix (faithful to the
# reference, which feeds MarkovChainAnalysis the normalized matrix), so
# its oracle derives edges by the same rounded-probability > 0 rule.
_M4_EDGES_SQL = f"""
    SELECT cur, nxt FROM (
        SELECT cur, nxt,
               ROUND(CAST(count(*) AS DOUBLE)
                     / CAST(SUM(count(*)) OVER (PARTITION BY cur) AS DOUBLE),
                     6) AS p
        FROM ({_PAIRS_SQL}) WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ) WHERE p > 1e-12
"""

# m4b classifies the RAW distinct pair relation (the scale path joins
# edges, never a dense matrix), so its oracle uses the raw edges.
_M4B_EDGES_SQL = f"""
    SELECT DISTINCT cur, nxt FROM ({_PAIRS_SQL}) WHERE nxt IS NOT NULL
"""


def _canonical_scc_index(result: dict[str, dict]) -> dict[int, int]:
    """Map Tarjan component ids to the canonical index: dense ascending
    rank of each component's max member (distributed_scc's labeling),
    so m4, m4b, and the SQL oracle all agree on the column."""
    max_member: dict[int, str] = {}
    for state, info in result.items():
        i = info["scc"]
        if i not in max_member or state > max_member[i]:
            max_member[i] = state
    order = {rep: k for k, rep in enumerate(sorted(max_member.values()))}
    return {i: order[rep] for i, rep in max_member.items()}


@query("m4_dtmc_classification", oracle=_dtmc_oracle(_M4_EDGES_SQL))
def m4_dtmc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTMC analysis of the transition matrix: recurrent/transient states
    via SCCs, period per SCC (MarkovChainAnalysis.py:4-161).  The state
    space is the 5 event types, so the matrix is collected to the driver
    and classified locally — the one sanctioned driver-side step
    (SURVEY M4); the matrix itself is computed distributed.  The DuckDB
    oracle re-derives the classification from first principles
    (transitive closure + bounded simple-cycle enumeration), so class,
    period, AND component id are all hash-checked."""
    from ..markov_analysis import classify_states

    mat = m3_transition_matrix(spark, sf_dir)
    rows = mat.collect()
    probs = {
        r["cur"]: {s: r[f"p_{s}"] for s in EVENT_TYPES} for r in rows
    }
    result = classify_states(probs)
    idx = _canonical_scc_index(result)
    out_rows = [
        (state, info["class"], info["period"], idx[info["scc"]])
        for state, info in sorted(result.items())
    ]
    return spark.createDataFrame(
        out_rows, "state string, class string, period int, scc int"
    )


# --- M4b: DTMC classification, distributed SCC (scale path) ------------------


@query(
    "m4b_dtmc_classification_distributed",
    oracle=_dtmc_oracle(_M4B_EDGES_SQL),
)
def m4b_dtmc_classification_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same classification as m4 but with SCCs, closedness, and BFS
    levels computed as dataflow (functions/scc.py — Orzan coloring),
    for state spaces that do not fit the driver.  Oracle-checked like
    m4 (the edge relation here is the raw distinct pairs — the scale
    path never materializes a rounded dense matrix).  Only SCC-count-sized
    metadata ever reaches the driver: the distinct per-SCC level
    differences (for the period gcd) and the representative list (for
    the dense scc index); per-state labels stay distributed and the
    metadata joins back via broadcast.  Tested equal to the Tarjan
    path on the same matrix and on random digraphs."""
    from math import gcd

    from ..functions.scc import distributed_scc, scc_bfs_levels

    edges = _pairs_per_user(spark, sf_dir).select(
        F.col("cur").alias("src"), F.col("nxt").alias("dst")
    ).distinct()
    vertices = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    lab = distributed_scc(vertices, edges)  # (state, scc)
    src_lab = lab.select(F.col("state").alias("src"), F.col("scc").alias("s_scc"))
    dst_lab = lab.select(F.col("state").alias("dst"), F.col("scc").alias("d_scc"))
    open_sccs = (
        edges.join(src_lab, "src")
        .join(dst_lab, "dst")
        .where(F.col("s_scc") != F.col("d_scc"))
        .select(F.col("s_scc").alias("scc"))
        .distinct()
    )
    members = lab.select(F.col("state").alias("v"), "scc")
    levels = scc_bfs_levels(members, edges)
    diffs = (
        edges.join(
            levels.select(F.col("v").alias("src"), "scc", "level"), "src"
        )
        .join(
            levels.select(
                F.col("v").alias("dst"),
                F.col("scc").alias("dscc"),
                F.col("level").alias("dlevel"),
            ),
            "dst",
        )
        .where(F.col("scc") == F.col("dscc"))
        .select("scc", (F.col("level") + 1 - F.col("dlevel")).alias("d"))
        .distinct()
        .collect()
    )
    period_of: dict[str, int] = {}
    for r in diffs:
        period_of[r["scc"]] = gcd(period_of.get(r["scc"], 0), abs(r["d"]))
    reps = sorted(r["scc"] for r in lab.select("scc").distinct().collect())
    meta = spark.createDataFrame(
        [(rep, i, period_of.get(rep, 0)) for i, rep in enumerate(reps)],
        "scc string, scc_idx int, closed_period int",
    )
    return (
        lab.join(open_sccs.withColumn("is_open", F.lit(True)), "scc", "left")
        .join(F.broadcast(meta), "scc")
        .select(
            "state",
            F.when(F.col("is_open"), F.lit("transient"))
            .otherwise(F.lit("recurrent"))
            .alias("class"),
            F.when(F.col("is_open"), F.lit(0))
            .otherwise(F.col("closed_period"))
            .alias("period"),
            F.col("scc_idx").alias("scc"),
        )
        .orderBy("state")
    )


# --- M4c: recurrence classification, oracle-checked --------------------------


@query(
    "m4c_dtmc_recurrence",
    oracle=f"""
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT cur, nxt FROM ({_PAIRS_SQL}) WHERE nxt IS NOT NULL
    ),
    states AS (
        -- explicit DISTINCT: under WITH RECURSIVE, DuckDB evaluates
        -- this UNION without deduplicating across the two branches
        SELECT DISTINCT st FROM (
            SELECT cur AS st FROM edges UNION ALL SELECT nxt FROM edges
        )
    ),
    reach(src, dst) AS (
        SELECT cur, nxt FROM edges
        UNION
        SELECT r.src, e.nxt FROM reach r JOIN edges e ON e.cur = r.dst
    )
    SELECT s.st AS state,
           NOT EXISTS (
               SELECT 1 FROM reach r
               WHERE r.src = s.st
                 AND NOT EXISTS (
                     SELECT 1 FROM reach r2
                     WHERE r2.src = r.dst AND r2.dst = s.st
                 )
           ) AS is_recurrent
    FROM states s
    ORDER BY state
    """,
)
def m4c_dtmc_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recurrent/transient half of M4, oracle-checked end to end: a
    state is recurrent iff its communicating class is closed — every
    state it can reach can reach it back.  The engine classifies via
    Tarjan SCC over the transition matrix (same path as m4); the DuckDB
    oracle derives the SAME answer independently from first principles
    with a recursive-CTE transitive closure over the positive-transition
    edges.  (Periods stay rows-only in m4/m4b: cycle-length gcds are not
    reasonably SQL-expressible.)

    The adjacency comes from the RAW pair counts (cnt ≥ 1), not m3's
    6-decimal-rounded probabilities — a rare transition whose empirical
    probability rounds to 0.000000 is still an edge to the oracle, and
    must be one to the engine too.

    The driver sees only the DISTINCT (cur, nxt) edge set — at most
    |states|² ≤ 25 rows after a partial-aggregated exchange — never the
    per-event pair stream (which is O(events))."""
    from ..markov_analysis import classify_states

    pair_rows = (
        m1_transition_pairs(spark, sf_dir)
        .where(F.col("nxt").isNotNull())
        .select("cur", "nxt")
        .distinct()
        .collect()
    )
    probs: dict[str, dict[str, float]] = {}
    for r in pair_rows:
        probs.setdefault(r["cur"], {})[r["nxt"]] = 1.0  # positive weight
    result = classify_states(probs)
    out_rows = [
        (state, info["class"] == "recurrent")
        for state, info in sorted(result.items())
    ]
    return spark.createDataFrame(out_rows, "state string, is_recurrent boolean")


# --- RC1: recursive-CTE transitive closure (Spark 4 WITH RECURSIVE) ----------

# One SQL text, two engines: the recursion is depth-bounded (paths of
# <= 5 edges cover every reachable pair in a <= 5-state space), so
# UNION ALL terminates without relying on either engine's cycle
# detection.  {table} is the only dialect difference.
_RC1_SQL = """
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT cur, nxt FROM (
            SELECT event_type AS cur,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM {table}
        ) WHERE nxt IS NOT NULL
    ),
    reach (src, dst, depth) AS (
        SELECT cur, nxt, 1 FROM pairs
        UNION ALL
        SELECT r.src, p.nxt, r.depth + 1
        FROM reach r JOIN pairs p ON p.cur = r.dst
        WHERE r.depth < 5
    )
    SELECT src,
           CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_reachable,
           MIN(dst) AS first_dst,
           MAX(dst) AS last_dst
    FROM reach
    GROUP BY src
    ORDER BY src
"""


@query("rc1_transitive_closure", oracle=_RC1_SQL.format(table="events"))
def rc1_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the event-transition adjacency via a
    RECURSIVE CTE — Spark 4's ``WITH RECURSIVE`` running natively,
    checked against DuckDB executing the IDENTICAL SQL text (the only
    difference is the table reference).  This is the declarative twin
    of the iterative-dataflow reachability the m4 family computes with
    explicit loops (functions/scc.py): same adjacency (m1's per-user
    lead pairs), same reachable sets, but the fixpoint loop lives in
    the engine.

    The recursion is DEPTH-BOUNDED (≤5 edges reaches every pair in a
    ≤5-state space), so it terminates under UNION ALL semantics on
    both engines regardless of cycles.  Scale shape: the recursive
    step is a self-join of a ≤|states|² working set against a
    ≤|states|² edge table — model-sized iteration state, exactly like
    the driver loops it replaces; the heavy part (the lead() pair
    derivation) is one user_id-partitioned window over the scan."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("rc1_events")
    return spark.sql(_RC1_SQL.format(table="rc1_events"))


# --- M5: held-out next-event prediction accuracy (round 8) ---------------------


@query(
    "m5_transition_heldout",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        FROM events
    ),
    mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
    tr AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT event_type AS cur,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                   ) AS nxt
            FROM ev, mid WHERE us <= mid
        ) WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    model AS (
        SELECT cur, nxt AS predicted, c AS n_train FROM (
            SELECT cur, nxt, c,
                   row_number() OVER (
                       PARTITION BY cur ORDER BY c DESC, nxt
                   ) AS rn
            FROM tr
        ) WHERE rn = 1
    ),
    te AS (
        SELECT cur, nxt FROM (
            SELECT event_type AS cur,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                   ) AS nxt
            FROM ev, mid WHERE us > mid
        ) WHERE nxt IS NOT NULL
    )
    SELECT t.cur, m.predicted, m.n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.nxt = m.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST((1000 * sum(CASE WHEN t.nxt = m.predicted
                                 THEN 1 ELSE 0 END))
                // greatest(count(*), 1) AS BIGINT) AS acc_permille
    FROM te t JOIN model m USING (cur)
    GROUP BY t.cur, m.predicted, m.n_train
    ORDER BY cur
    """,
)
def m5_transition_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT evaluation of the Markov transition model — the eval
    the reference's DTMC analysis never runs: train argmax-next on the
    first half of event time, score next-event prediction accuracy on
    the second half.  Split is the event-time midpoint (drift1's exact
    integer device); pairs are m1's per-user consecutive semantics,
    formed WITHIN each half so no pair straddles the split.  The model
    is argmax_{{nxt}} count(cur→nxt) with lexicographic tie-break, and
    the report is per-state test support, hits, and exact integer
    accuracy permille — the train/test discipline every production
    sequence model gets, applied to the reference's M2 object.

    Scale shape: two window passes over the SAME user-keyed exchange
    (one per half), two partial-aggregated count shuffles, a |states|²
    model reduced driver-free via row_number over |states| partitions,
    and a broadcast model join onto the test pairs — nothing beyond
    m1's cost.  The oracle replays split, training, tie-breaks, and
    scoring exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    mid = ev.agg(
        F.expr("(min(us) + max(us)) div 2").cast("long").alias("mid")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")

    def half_pairs(pred) -> DataFrame:
        return (
            ev.crossJoin(F.broadcast(mid))
            .where(pred)
            .select(
                F.col("event_type").alias("cur"),
                F.lead("event_type").over(w).alias("nxt"),
            )
            .where(F.col("nxt").isNotNull())
        )

    tr = (
        half_pairs(F.col("us") <= F.col("mid"))
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    mw = W.partitionBy("cur").orderBy(F.desc("c"), "nxt")
    model = (
        tr.withColumn("rn", F.row_number().over(mw))
        .where(F.col("rn") == 1)
        .select(
            "cur",
            F.col("nxt").alias("predicted"),
            F.col("c").alias("n_train"),
        )
    )
    te = half_pairs(F.col("us") > F.col("mid"))
    return (
        te.join(F.broadcast(model), "cur")
        .groupBy("cur", "predicted", "n_train")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum((F.col("nxt") == F.col("predicted")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "cur",
            "predicted",
            "n_train",
            "n_test",
            "n_correct",
            F.expr("(1000 * n_correct) div greatest(n_test, 1L)")
            .cast("long")
            .alias("acc_permille"),
        )
        .orderBy("cur")
    )


# --- M6: stationary distribution by power iteration (round 8) -------------------

_M6_ITERS = 8


def _m6_oracle() -> str:
    parts = [
        f"""
    WITH pairs AS MATERIALIZED (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
        FROM ({_PAIRS_SQL}) WHERE nxt IS NOT NULL
        GROUP BY cur, nxt
    ),
    r AS MATERIALIZED (
        SELECT cur, CAST(sum(c) AS BIGINT) AS rt FROM pairs GROUP BY 1
    ),
    st AS MATERIALIZED (SELECT DISTINCT cur AS state FROM pairs),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM st),
    p0 AS MATERIALIZED (
        SELECT state, CAST(1000000 // n AS BIGINT) AS pi FROM st, ns
    )"""
    ]
    for k in range(1, _M6_ITERS + 1):
        parts.append(
            f""",
    p{k} AS MATERIALIZED (
        SELECT pairs.nxt AS state,
               CAST(sum((p.pi * pairs.c) // r.rt) AS BIGINT) AS pi
        FROM p{k - 1} p
        JOIN pairs ON pairs.cur = p.state
        JOIN r ON r.cur = p.state
        GROUP BY 1
    )"""
        )
    parts.append(
        f"""
    SELECT state, pi AS pi_micro FROM p{_M6_ITERS} ORDER BY state"""
    )
    return "".join(parts)


@query("m6_stationary_distribution", oracle=_m6_oracle())
def m6_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the reference's event-type Markov
    chain by {K} rounds of synchronous power iteration — where the
    simulated ecosystem settles in the long run, the quantity M4's
    recurrent-class analysis exists to support (an irreducible
    aperiodic chain converges to unique π with π = πP; 5 states at
    these mixing rates converge well inside {K} rounds).  Exactness:
    π lives in integer micro-units; each step's term is the exact
    BIGINT product π(i)·c(i→j) floor-divided by the row total r(i) —
    the declared statistic is the floor-quantized iterate (the surv1
    convention), so no float crosses engines and the oracle replays
    all {K} rounds as unrolled MATERIALIZED CTEs.

    Scale shape: ONE user-keyed window + partial-aggregated groupBy
    collapses the event log to the |states|² transition-count model;
    each iteration is a model-sized join + aggregation (states², not
    events), so the whole job after the single scan is {K} bounded
    waves over a table the size of the state space."""
    pairs = (
        _pairs_per_user(spark, sf_dir)
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    r = pairs.groupBy("cur").agg(F.sum("c").cast("long").alias("rt"))
    st = pairs.select(F.col("cur").alias("state")).distinct()
    ns = st.agg(F.count("*").cast("long").alias("n"))
    pi = st.crossJoin(F.broadcast(ns)).select(
        "state", F.expr("CAST(1000000 div n AS BIGINT)").alias("pi")
    )
    for _ in range(_M6_ITERS):
        pi = (
            pi.join(pairs, pi["state"] == pairs["cur"])
            .join(r, "cur")
            .select(
                F.col("nxt").alias("state"),
                F.expr("CAST((pi * c) div rt AS BIGINT)").alias("term"),
            )
            .groupBy("state")
            .agg(F.sum("term").cast("long").alias("pi"))
        )
    return pi.select("state", F.col("pi").alias("pi_micro")).orderBy(
        "state"
    )


m6_stationary_distribution.__doc__ = m6_stationary_distribution.__doc__.format(
    K=_M6_ITERS
)


# --- M7: top event-sequence paths (round 9) ----------------------------------


@query(
    "m7_top_trigram_paths",
    oracle="""
    WITH tri AS (
        SELECT event_type AS e1,
               lead(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
               lead(event_type, 2)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        FROM events
    ),
    counted AS (
        SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counted)
    SELECT e1, e2, e3, n,
           CAST((1000 * n) // t AS BIGINT) AS share_permille
    FROM counted, tot
    ORDER BY n DESC, e1, e2, e3
    LIMIT 20
    """,
)
def m7_top_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 three-step behavioural paths — the sequence-mining view
    of the reference's Markov machinery (MarkovChainAnalysis.py models
    ORDER-1 transitions; real journeys are longer, and the first
    question any funnel owner asks is "what are the common 3-step
    paths?").  Two stacked lead() windows over the SAME user-keyed
    sort form (e1, e2, e3) per consecutive event triple; counts and
    corpus share (exact integer permille) rank them; ties break
    lexicographically so the top-20 cut is deterministic.

    Scale shape: ONE user-keyed window exchange (both leads ride the
    same sort — the m1/m5 spine), a partial-aggregated groupBy on the
    |states|^3-bounded path key, and a TakeOrderedAndProject top-k —
    no global sort, no driver collect.  Cites reference
    MarkovChainAnalysis.py:1-40 (order-1 pairing) for the semantics
    this extends to order 2."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counted = tri.groupBy("e1", "e2", "e3").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = counted.agg(F.sum("n").cast("long").alias("t"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .select(
            "e1",
            "e2",
            "e3",
            "n",
            F.expr("CAST((1000 * n) div t AS BIGINT)").alias(
                "share_permille"
            ),
        )
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )
