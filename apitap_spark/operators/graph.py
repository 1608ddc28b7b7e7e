"""Distributed graph operators: connected components over an edge list.

The scale path for near-dup clustering (op_dedup_clusters collects its
pair list driver-side because dedup graphs are tiny relative to the
corpus; THIS module is the swap-in when they are not): min-label
propagation with pointer doubling, the DataFrame rendition of the
large-star/small-star MapReduce family (Kiveris et al., "Connected
Components in MapReduce and Beyond").

Per round: one join+groupBy to pull each node's neighborhood minimum,
then one self-join that short-circuits labels to their label's label
(path compression). Doubling makes convergence O(log diameter) rounds,
so even chain graphs (the worst case — e.g. session chains) settle in
a handful of shuffles; each round's state is exactly one (node, label)
row per node.

Correctness gate: components of the "consecutive events within 30 min"
graph are BY CONSTRUCTION the gap-based sessions of q_sessionization,
so the iterative algorithm gets a real SQL oracle (window running-sum
sessionization in DuckDB) — rare for graph code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apitap_spark.session import context_key, note_memo_event, read_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components of an undirected graph.

    ``nodes``: one column ``v`` (long). ``edges``: columns ``src``,
    ``dst`` (longs; direction ignored). Returns ``(v, component)`` where
    component is the minimum node id of v's component.

    Each iteration: label(v) <- min(label(v), min over neighbors u of
    label(u)), then label(v) <- label(label(v)) (pointer doubling).
    Convergence detected via the monotonically decreasing label sum —
    one cheap action per round instead of a change-count join.
    """
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    # Materialize the (bidirectional) edge list ONCE. Without this, every
    # round's neighborhood join re-executes the edge list's full upstream
    # plan — for op_dedup_clusters that upstream is the entire MinHash-LSH
    # pipeline, turning O(log n) cheap rounds into O(log n) corpus scans.
    bidir = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    # localCheckpoint each round: the doubling self-join would otherwise
    # double the logical plan every iteration (exponential planner blowup);
    # checkpointing truncates lineage AND caches the round's labels.
    # Lazy where single-consumer (round-10, guide §1.2): the round's
    # label-sum collect materializes lab, so each round runs TWO jobs
    # (cand ckpt + sum) instead of three. cand stays EAGER: both sides
    # of the doubling self-join consume it within ONE job, and a lazy
    # cand is race-computed by both join legs before the cache fills
    # (measured slower). Plan truncation is unchanged.
    # The INITIAL lab is eager for the same reason (r10 ADVICE #2):
    # round 1's cand job consumes it on BOTH legs (nbr_min build and the
    # left-join probe) with no prior action to fill its cache; every
    # in-loop lab IS materialized by the round's sum collect before the
    # next cand job, so those stay lazy.
    lab = nodes.select(F.col("v"), F.col("v").alias("p")).localCheckpoint()
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            bidir.join(lab, bidir.b == lab.v)
            .groupBy("a")
            .agg(F.min("p").alias("np"))
        )
        cand = lab.join(nbr_min, lab.v == nbr_min.a, "left").select(
            lab.v, F.least(lab.p, F.coalesce("np", lab.p)).alias("p")
        ).localCheckpoint()
        x, y = cand.alias("x"), cand.alias("y")
        lab = x.join(y, F.col("x.p") == F.col("y.v")).select(
            F.col("x.v").alias("v"), F.least("x.p", "y.p").alias("p")
        ).localCheckpoint(eager=False)
        cur_sum = lab.agg(F.sum("p")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return lab.select("v", F.col("p").alias("component"))


SESSION_GAP_SEC = 30 * 60


@_register(
    "op_graph_session_components",
    f"""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN date_diff('second', LAG(ts) OVER w, ts) <= {SESSION_GAP_SEC}
                  THEN 0 ELSE 1 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT event_id, user_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT event_id,
           MIN(event_id) OVER (PARTITION BY user_id, sid) AS component
    FROM sess
    """,
)
def op_graph_session_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the event-proximity graph (edges between a
    user's consecutive events <= 30 min apart); components equal
    gap-based sessions, so the DuckDB oracle is window sessionization.

    Chain graphs are the diameter worst case for label propagation —
    pointer doubling keeps it to O(log chain) rounds (see
    connected_components). Edge build is one window over (user_id, ts).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    edged = ev.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        gap.alias("gap"),
    )
    edges = edged.filter(
        F.col("prev_id").isNotNull() & (F.col("gap") <= SESSION_GAP_SEC)
    ).select(F.col("event_id").alias("src"), F.col("prev_id").alias("dst"))
    nodes = ev.select(F.col("event_id").alias("v"))
    cc = connected_components(nodes, edges)
    return cc.select(F.col("v").alias("event_id"), "component")


PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 10


PAGERANK_SCALE = 1_000_000  # micro-rank units per node of initial mass


def _damping_fraction(damping: float) -> tuple[int, int]:
    """damping as an exact small fraction (0.85 → 17/20). Small terms keep
    the per-node product dnum*inflow_micro far inside int64 even at
    billions of nodes (17 * n*1e6 overflows only past n≈5e11)."""
    from fractions import Fraction

    frac = Fraction(damping).limit_denominator(PAGERANK_SCALE)
    return frac.numerator, frac.denominator


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list, in exact
    integer micro-rank units.

    ``nodes``: column ``v``. ``edges``: ``src``, ``dst``. Returns
    ``(v, rank_micro, rank)``: ``rank_micro`` is the exact bigint state
    (initial mass PAGERANK_SCALE per node), ``rank`` its double view.

    Each iteration: contribution = rank_micro(src) div outdeg(src)
    summed per dst (one join + one groupBy, both keyed so AQE
    coalesces), leaked mass (dangling nodes + integer-floor remainders)
    redistributed uniformly by conservation, damping applied as an
    exact fraction. localCheckpoint per round truncates the growing
    lineage exactly like connected_components.

    Fixed-point arithmetic makes every sum order-INdependent (bigint,
    not float), so the whole 10-iteration computation is replayable in
    any engine — the driver gate hash-checks it against a DuckDB
    recursive CTE (round 2 this was rows-only float). Floor division
    leaks < (E + 2n) micro-units of mass per iteration; tests assert
    the conservation band instead of float-exact totals.
    """
    n = nodes.count()
    dnum, dden = _damping_fraction(damping)
    base_u = (PAGERANK_SCALE * (dden - dnum)) // dden
    total_u = n * PAGERANK_SCALE
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranked_edges = edges.join(outdeg, "src").localCheckpoint()
    rank = nodes.select(
        "v", F.lit(PAGERANK_SCALE).cast("long").alias("rank_u")
    ).localCheckpoint()
    for _ in range(iters):
        # ONE heavy plan per round: the contribution join+groupBy is
        # checkpointed, then reused by both the leaked-mass probe and
        # the rank update. (The previous formulation ran a separate
        # rank-vs-outdeg anti-join action per round — the contribution
        # plan effectively executed twice; measured ~1.9x slower.)
        contrib = (
            ranked_edges.join(rank, ranked_edges.src == rank.v)
            .select(
                F.col("dst").alias("v"),
                F.expr("rank_u div deg").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
            .localCheckpoint()
        )
        # leaked mass by conservation: every non-dangling node's rank is
        # distributed up to its floor remainder, so Σ inflow = delivered
        # mass and the leak (dangling + remainders) is total - Σ inflow.
        # The 1-row aggregate rides the rank-update plan as a broadcast
        # scalar — no extra driver action per round.
        dmass = contrib.agg(
            F.expr(
                f"(({total_u}L - coalesce(sum(inflow), 0L)) div {n}L) as share"
            )
        )
        # rank is NOT checkpointed: it is a cheap projection of nodes
        # left-joined to the checkpointed contrib, so lineage depth stays
        # bounded by the contrib checkpoint and skipping the second
        # materialization saves ~25% wall time per run (measured sf0.1).
        rank = (
            nodes.join(contrib, "v", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "v",
                F.expr(
                    f"{base_u}L + ({dnum}L * (coalesce(inflow, 0L) + share))"
                    f" div {dden}L"
                ).alias("rank_u"),
            )
        )
    return rank.select(
        "v",
        F.col("rank_u").alias("rank_micro"),
        (F.col("rank_u").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
            "rank"
        ),
    )


_PR_DNUM, _PR_DDEN = _damping_fraction(PAGERANK_DAMPING)
_PR_BASE_U = (PAGERANK_SCALE * (_PR_DDEN - _PR_DNUM)) // _PR_DDEN

_PAGERANK_ORACLE = f"""
    WITH RECURSIVE
    ev AS (
      SELECT event_id AS src,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS dst
      FROM events
    ),
    edges AS (SELECT src, dst FROM ev WHERE dst IS NOT NULL),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT event_id AS v FROM events),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr(iter, v, rank_u) AS (
      SELECT 0, v, CAST({PAGERANK_SCALE} AS BIGINT) FROM nodes
      UNION ALL
      SELECT p.iter + 1, p.v,
             CAST({_PR_BASE_U} + ({_PR_DNUM} * (COALESCE(a.inflow, 0) + t.share))
                  // {_PR_DDEN} AS BIGINT)
      FROM (SELECT * FROM pr WHERE iter < {PAGERANK_ITERS}) p
      LEFT JOIN (
        SELECT e.dst AS v, SUM(pr.rank_u // d.deg) AS inflow
        FROM pr JOIN edges e ON e.src = pr.v JOIN deg d ON d.src = pr.v
        WHERE pr.iter < {PAGERANK_ITERS}
        GROUP BY e.dst
      ) a ON a.v = p.v
      CROSS JOIN (
        SELECT (nn.n * {PAGERANK_SCALE} - COALESCE((
                  SELECT SUM(pr.rank_u // d.deg)
                  FROM pr JOIN edges e ON e.src = pr.v JOIN deg d ON d.src = pr.v
                  WHERE pr.iter < {PAGERANK_ITERS}), 0)) // nn.n AS share
        FROM nn
      ) t
    )
    SELECT v, rank_u AS rank_micro,
           CAST(rank_u AS DOUBLE) / {float(PAGERANK_SCALE)} AS rank
    FROM pr WHERE iter = {PAGERANK_ITERS}
    """


@_register("op_graph_pagerank", _PAGERANK_ORACLE)
def op_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user-interaction graph (directed edges from each
    event to the user's next event, like the session graph but directed)
    — the second iterative-graph operator (importance scoring for
    link-graph corpus curation, e.g. page-level quality priors).

    Exact fixed-point iteration (see :func:`pagerank`), hash-checked
    against a DuckDB recursive-CTE replay of the same integer updates
    (round-2 verdict: was rows-only under float iteration). pytest
    additionally asserts the mass-conservation band, dangling-mass
    redistribution, and iteration stability.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edged = ev.select(
        F.col("event_id").alias("src"),
        F.lead("event_id").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    nodes = ev.select(F.col("event_id").alias("v"))
    return pagerank(nodes, edged)


LP_ITERS = 4  # synchronous label-propagation rounds


def _lp_oracle() -> str:
    return f"""
    WITH RECURSIVE
    grp AS (
      SELECT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events GROUP BY 1, 2, 3
    ),
    hubs AS (
      SELECT b, event_type, MIN(user_id) AS hub FROM grp GROUP BY 1, 2
    ),
    star AS (
      SELECT g.user_id AS src, h.hub AS dst
      FROM grp g JOIN hubs h ON h.b = g.b AND h.event_type = g.event_type
      WHERE g.user_id <> h.hub
    ),
    edges AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT src, dst FROM star
        UNION ALL
        SELECT dst AS src, src AS dst FROM star
      ) GROUP BY src, dst
    ),
    nodes AS (SELECT DISTINCT user_id AS v FROM events),
    lp(iter, v, label) AS (
      SELECT 0, v, v FROM nodes
      UNION ALL
      SELECT l.iter + 1, l.v, COALESCE(m.new_label, l.label)
      FROM lp l
      LEFT JOIN (
        SELECT src AS v, iter, label AS new_label
        FROM (
          SELECT e.src, l2.iter, l2.label, SUM(e.w) AS wsum,
                 ROW_NUMBER() OVER (PARTITION BY e.src, l2.iter
                   ORDER BY SUM(e.w) DESC, l2.label ASC) AS rk
          FROM edges e JOIN lp l2 ON l2.v = e.dst
          GROUP BY e.src, l2.iter, l2.label
        ) WHERE rk = 1
      ) m ON m.v = l.v AND m.iter = l.iter
      WHERE l.iter < {LP_ITERS}
    )
    SELECT v AS user_id, CAST(label AS BIGINT) AS community
    FROM lp WHERE iter = {LP_ITERS}
    """


def lp_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned memo of the converged label-propagation labels (v, label)
    — node-cardinality. op_graph_modularity composes the SAME LP_ITERS
    rounds op_graph_label_propagation runs; before round 10 each gate
    re-ran the full loop (~4 s at sf0.1)."""
    from apitap_spark.session import pinned_local_checkpoint

    key = (context_key(spark), sf_dir, "lp_labels")
    hit = _EDGE_CACHE.get(key)
    note_memo_event(hit=hit is not None, family="lp_labels")
    if hit is not None:
        return hit
    d, ids = pinned_local_checkpoint(_lp_labels(spark, sf_dir), spark)
    _GRAPH_PINNED_IDS.update(ids)
    _EDGE_CACHE[key] = d
    return d


@_register("op_graph_label_propagation", _lp_oracle())
def op_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation
    (Raghavan et al. 2007, public arXiv:0709.2938) over the user
    co-activity graph: users active in the same (hour, event_type)
    bucket connect through the bucket's min-user hub (star
    construction — O(group) edges instead of the quadratic clique, the
    standard scalable rewrite), and for LP_ITERS rounds every user
    adopts the weight-heaviest label among its neighbors (tie -> lowest
    label; isolated nodes keep their own). Unlike connected components
    (pure reachability), the weighted mode concentrates hub-heavy
    cohorts — the co-activity analogue of community detection.

    Determinism: synchronous rounds (all updates read the PREVIOUS
    round's labels), integer weights, total argmax order (w DESC,
    label ASC) — so the whole iteration replays exactly in a DuckDB
    recursive CTE. Per round: one edge-to-label join + one (node,
    label)-keyed integer aggregate; lineage cut per round.

    The converged labels are the pinned ``lp_labels`` memo shared with
    op_graph_modularity (round-10) — the detect half is computed once,
    the evaluate half reads it.
    """
    labels = lp_labels_cached(spark, sf_dir)
    return labels.select(
        F.col("v").alias("user_id"),
        F.col("label").cast("bigint").alias("community"),
    )


def _lp_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    grp = ev.select(
        F.date_trunc("hour", "ts").alias("b"), "event_type", "user_id"
    ).distinct()
    hubs = grp.groupBy("b", "event_type").agg(F.min("user_id").alias("hub"))
    star = (
        grp.join(hubs, ["b", "event_type"])
        .filter(F.col("user_id") != F.col("hub"))
        .select(F.col("user_id").alias("src"), F.col("hub").alias("dst"))
    )
    edges = (
        star.union(star.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
        .localCheckpoint()
    )
    labels = ev.select(F.col("user_id").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    for _ in range(LP_ITERS):
        msg = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy(F.col("src"), F.col("label"))
            .agg(F.sum("w").alias("wsum"))
        )
        win = Window.partitionBy("src").orderBy(
            F.desc("wsum"), F.asc("label")
        )
        best = (
            msg.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") == 1)
            .select(F.col("src").alias("v"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, "v", "left")
            .select(
                "v",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint()
        )
    return labels


# --- L107: triangle counting over the bounded-degree co-activity graph ------

TRI_NEXT_K = 2  # connect each user to the next K users (by id) in its bucket
TRI_TOPK = 10


def coactivity_edges(spark: SparkSession, sf_dir: str, k: int = TRI_NEXT_K) -> DataFrame:
    """Bounded-degree co-activity edge list shared by the triangle /
    degree-profile / link-prediction / BFS gates: users active in the
    same (hour, event_type) bucket connect to their next ``k``
    id-neighbors within the bucket.

    The successor relation "rank difference in 1..k within the bucket"
    is computed with ``lead(user_id, i) OVER (PARTITION BY bucket ORDER
    BY user_id)`` for i in 1..k — one window pass over the already
    bucket-partitioned frame, ZERO joins. The previous formulation
    self-joined the ranked frame on the bucket key and filtered
    ``rkc - rka BETWEEN 1 AND k`` post-join; because the rank predicate
    is not an equi-key, that enumerated all |g|^2 rank pairs per bucket
    before filtering to the |g|*k survivors — a skewed-key scale
    hazard at 100x (one hot bucket with 10^5 users = 10^10
    comparisons in a single task). The window emits exactly the
    |g|*k survivors directly; edge set (and every downstream oracle
    hash) is identical.

    Edges come out id-oriented (u < v by construction, since leads are
    strictly later in the per-bucket user_id order); the cross-bucket
    ``distinct`` is the single shuffle, keyed by the edge itself.
    """
    # NOTE (r11 A/B): scan_parallel(ev) measured SLOWER here (warm 0.7
    # -> 1.4s for the edge build) — this path is shuffle-bound, not
    # compute-bound, so the extra round-robin exchange (plus its
    # sort-before-repartition pass) costs more than the 1-task map side
    # saves. Split-starved-scan fixes only pay above heavy per-row
    # compute (minhash signatures, shingle explodes).
    ev = read_table(spark, sf_dir, "events")
    grp = ev.select(
        F.date_trunc("hour", "ts").alias("b"), "event_type", "user_id"
    ).distinct()
    w = Window.partitionBy("b", "event_type").orderBy("user_id")
    leads = grp.select(
        F.col("user_id").alias("u"),
        *[F.lead("user_id", i).over(w).alias(f"_v{i}") for i in range(1, k + 1)],
    )
    if k == 1:
        paired = leads.select("u", F.col("_v1").alias("v"))
    else:
        paired = leads.select(
            "u",
            F.explode(F.array(*[f"_v{i}" for i in range(1, k + 1)])).alias("v"),
        )
    return paired.filter(F.col("v").isNotNull()).distinct()


_TRI_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_triangles FROM tri),
    pernode AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_tri
      FROM (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY user_id
    ),
    top AS (
      SELECT user_id, n_tri,
             CAST(ROW_NUMBER() OVER (ORDER BY n_tri DESC, user_id) AS BIGINT) AS rnk
      FROM pernode ORDER BY n_tri DESC, user_id LIMIT {TRI_TOPK}
    )
    SELECT rnk, user_id, n_tri, total_triangles
    FROM top CROSS JOIN tot
"""


def tri_pernode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts with the per-node AGGREGATE left
    un-checkpointed, factored out so physical-plan tests can assert on
    the oriented-join shape (the gate's downstream localCheckpoint
    truncates the visible plan). Note the edge list ``e`` itself IS
    still localCheckpointed here — calling this helper eagerly runs the
    edge-build job and the visible plan starts at the RDD scan above
    ``e``; only the join/aggregate ABOVE it is assertable."""
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_tri"))
    )


@_register("op_graph_triangles", _TRI_ORACLE)
def op_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (clustering-structure audit) over the
    co-activity graph, completing the graph-analytics family next to
    connected components, PageRank, and label propagation: users active
    in the same (hour, event_type) bucket connect to their next
    2 id-neighbors within the bucket (bounded-degree
    construction — edge count stays LINEAR in bucket membership where
    the full co-activity clique is quadratic, the same sparsification
    every production co-occurrence graph applies). Triangles are
    enumerated with the classic oriented join: every edge is stored
    (u < v), so each triangle (a < b < c) is produced exactly once by
    joining (a,b)x(b,c) against the closing edge (a,c) — no /6
    dedup factor, no symmetric blowup.

    Output: the 10 most triangle-dense users (their local
    clustering hubs) plus the global triangle count on every row.

    Scale shape: bucket ranking is a window bounded by per-bucket
    membership (hour x type granularity keeps it far from the user
    table size); the oriented 3-way self-join shuffles on edge
    endpoints (u < v orientation halves the join input and makes the
    heaviest node a join KEY only for its lower-id neighbors — the
    standard skew guard for triangle joins); per-node counts are one
    map-side-combined aggregate, and the top-K is sort+limit.
    """
    # Checkpoint the node-cardinality per-node counts so the expensive
    # oriented 3-way join is enumerated exactly ONCE: the lazy
    # formulation fed the triangle frame to both the global count and
    # the per-node aggregate, running the triangle join twice (round-5
    # plan audit). The global total then falls out of pernode for free:
    # every triangle contributes exactly 3 exploded rows, so
    # total = Σ n_tri / 3 — exact integer division.
    pernode = tri_pernode_counts(spark, sf_dir).localCheckpoint()
    tot = pernode.agg(
        F.expr("sum(n_tri) div 3").cast("bigint").alias("total_triangles")
    )
    top = pernode.orderBy(F.desc("n_tri"), "user_id").limit(TRI_TOPK)
    wr = Window.orderBy(F.desc("n_tri"), "user_id")
    return (
        top.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select("rnk", "user_id", "n_tri", "total_triangles")
    )


# --- L117: degree profile of the co-activity graph --------------------------

_DEGREE_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    deg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS user_id FROM e UNION ALL SELECT v FROM e)
      GROUP BY user_id
    )
    SELECT degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_nodes,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS node_share
    FROM deg GROUP BY degree
"""


@_register("op_graph_degree_profile", _DEGREE_ORACLE)
def op_graph_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the bounded-degree co-activity graph (the
    edge set op_graph_triangles enumerates): nodes per degree value
    plus each bucket's share. This is the sizing audit run BEFORE an
    iterative graph algorithm — max degree bounds the per-round join
    fan-out of CC/PageRank/LP, and a heavy tail says salt or switch to
    the star construction. Complements op_skew_key_audit (key skew for
    relational joins) with the graph-shaped equivalent.

    Degree counts are one union + one map-side-combined aggregate; the
    histogram rollup shuffles degree-cardinality rows only. The share
    column's global-window SUM runs over the HISTOGRAM (distinct degree
    values — dozens), never the node table.
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    deg = (
        e.select(F.col("u").alias("user_id"))
        .unionAll(e.select(F.col("v").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_nodes"))
    wall = Window.partitionBy()
    return hist.select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(wall).cast("bigint").alias("total_nodes"),
        F.round(
            F.col("n_nodes").cast("double")
            / F.sum("n_nodes").over(wall).cast("double"),
            6,
        ).alias("node_share"),
    )


# --- Link prediction (common-neighbor / Jaccard) -------------------------

LINKPRED_TOP_K = 20

# Shared wedge statistics, memoized per (SparkContext, sf_dir):
# op_graph_link_prediction and op_graph_resource_allocation build the
# SAME edges/degrees/wedge-enumeration (the two most expensive graph
# gates, ~13s combined at sf0.1 when each rebuilt it); one checkpointed
# frame emitting (u, v, cn, ra_micro) serves both — Jaccard derives from
# cn + broadcast degrees, RA reads ra_micro directly (round-7 verdict
# task #3). The cached deg/wedge checkpoints are PINNED
# (session.pinned_local_checkpoint) so the between-gate
# release_persisted sweep doesn't free blocks the second gate still
# reads (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — found by the bench loop).
# Footprint: degrees (node-sized) + non-adjacent co-wedge candidate
# pairs — the same frames each gate previously materialized on its own,
# held once per (context, sf_dir) for the session's lifetime;
# clear_wedge_stats_cache() unpins when a long-lived host wants them
# swept.
_WEDGE_STATS_CACHE: dict[tuple[int, str], tuple] = {}
# coactivity edge lists, keyed (context, sf_dir, k): the shared
# primitive of EIGHT graph gates (triangles, degree profile, link
# prediction / RA via the wedge frame, BFS, k-core, assortativity,
# TrustRank, transitivity) — each previously rebuilt + checkpointed the
# same distinct-bucket window per gate; one pinned build per session.
_EDGE_CACHE: dict[tuple[int, str, int], DataFrame] = {}
_GRAPH_PINNED_IDS: set[int] = set()


def clear_graph_frame_caches() -> None:
    """Drop the memoized edge/wedge frames and unpin their RDD blocks
    (they are then freed by the next release_persisted / ContextCleaner
    GC)."""
    from apitap_spark.session import unpin_rdds

    _WEDGE_STATS_CACHE.clear()
    _EDGE_CACHE.clear()
    unpin_rdds(_GRAPH_PINNED_IDS)
    _GRAPH_PINNED_IDS.clear()


clear_wedge_stats_cache = clear_graph_frame_caches  # back-compat name


def coactivity_edges_cached(
    spark: SparkSession, sf_dir: str, k: int = TRI_NEXT_K
) -> DataFrame:
    """Pinned, memoized checkpoint of :func:`coactivity_edges` — built
    once per (session, sf_dir, k) and shared by every edge-consuming
    gate; blocks survive between-gate release_persisted sweeps."""
    from apitap_spark.session import pinned_local_checkpoint

    key = (context_key(spark), sf_dir, k)
    hit = _EDGE_CACHE.get(key)
    note_memo_event(hit=hit is not None, family="coactivity_edges")
    if hit is not None:
        return hit
    d, ids = pinned_local_checkpoint(coactivity_edges(spark, sf_dir, k), spark)
    _GRAPH_PINNED_IDS.update(ids)
    _EDGE_CACHE[key] = d
    return d


def _build_wedge_stats(spark: SparkSession, sf_dir: str, pin: bool = False):
    """Lazy (e, deg, wedge_candidates) frames — see _wedge_stats.

    wedge_candidates = non-adjacent u<v pairs with
    (cn = |N(u)∩N(v)|, ra_micro = Σ_w floor(1e6/deg(w))).

    deg(w) rides the PROBE side (w is the join key, so either side can
    carry it): keeping y at two columns makes it the narrower relation,
    so Catalyst builds the broadcast from y and STREAMS x — preserving
    x's hashpartitioning(cu) through the join for the co-located
    aggregate. The first cut attached deg to y; Catalyst then built
    from the narrower x, the cu-repartition was broadcast away, and
    the pair-keyed exchange came back (12.7s vs 6.7s for the same
    wedge count — plan read, not guessed).
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    # e is DISTINCT with u < v on every row (coactivity_edges), so the
    # symmetrized union is duplicate-free by construction — skipping
    # the distinct saves a full 2|E| shuffle before the checkpoint.
    # und feeds both sides of the triangle-closing self-join; deg is
    # consumed by the wedge probe AND broadcast twice downstream (du,
    # dv). Checkpoint both or each consumer re-runs the union shuffle /
    # degree groupBy (round-5 double-materialization sweep).
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    if pin:
        # deg is broadcast by link-prediction on LATER gate calls —
        # its blocks must survive between-gate release sweeps
        from apitap_spark.session import pinned_local_checkpoint

        deg, ids = pinned_local_checkpoint(deg, spark)
        _GRAPH_PINNED_IDS.update(ids)
    else:
        deg = deg.localCheckpoint()
    x = und.select(F.col("u").alias("cu"), F.col("v").alias("w")).join(
        F.broadcast(deg.select(F.col("node").alias("w"), "d")), "w"
    )
    y = und.select(F.col("u").alias("cv"), F.col("v").alias("w"))
    # Pre-partition the probe side by cu BEFORE the wedge join: the
    # broadcast join preserves the stream side's hashpartitioning(cu),
    # which satisfies the groupBy(cu, cv) clustering requirement (cu is
    # a prefix of the grouping key), so the Sum deg(w)^2 wedge stream is
    # enumerated, filtered, and aggregated inside ONE codegen stage —
    # zero shuffle of the ~|wedges| intermediate, and the partial-agg
    # hash maps stay small because each task only holds its own cu
    # range (measured 8.2s -> 0.55s for the cn stage at sf0.1). When
    # the edge list outgrows the broadcast threshold at scale, the join
    # falls back to SMJ on w and Catalyst re-inserts the exchange above
    # it — the plan degrades to the classic shape, never breaks.
    # EXPLICIT partition count (r11): a bare repartition("cu") is
    # AQE-coalescible, and AQE sizes the stage by the exchange's INPUT
    # bytes — tiny here, while the stage's real work is the Σ deg(w)^2
    # join fan-out ABOVE it. Measured: the wedge stage ran as 2 tasks
    # on 32 cores (7.4s); pinning numPartitions to defaultParallelism
    # (scale-adaptive, the _df_capped_shingles precedent) keeps the
    # enumeration wide.
    n_par = max(1, spark.sparkContext.defaultParallelism)
    wedge = (
        x.repartition(n_par, "cu")
        .join(y, "w")
        .filter(F.col("cu") < F.col("cv"))
        .groupBy(F.col("cu").alias("u"), F.col("cv").alias("v"))
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.sum(F.expr("1000000L div d")).cast("bigint").alias("ra_micro"),
        )
        .join(e, ["u", "v"], "left_anti")
    )
    return e, deg, wedge


def _wedge_stats(spark: SparkSession, sf_dir: str):
    """Memoized (deg, wedge_candidates), both pin-checkpointed —
    computed once per session per sf_dir, shared by the
    link-prediction and resource-allocation gates."""
    from apitap_spark.session import pinned_local_checkpoint

    key = (context_key(spark), sf_dir)
    hit = _WEDGE_STATS_CACHE.get(key)
    note_memo_event(hit=hit is not None, family="wedge_stats")
    if hit is not None:
        return hit
    _e, deg, wedge = _build_wedge_stats(spark, sf_dir, pin=True)
    wedge, ids = pinned_local_checkpoint(wedge, spark)
    _GRAPH_PINNED_IDS.update(ids)
    out = (deg, wedge)
    _WEDGE_STATS_CACHE[key] = out
    return out

_LINKPRED_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
    cn AS (
      SELECT a.u AS u, b.u AS v, CAST(COUNT(*) AS BIGINT) AS cn
      FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT cn.u, cn.v, cn.cn, du.d + dv.d - cn.cn AS un
      FROM cn
      JOIN deg du ON du.node = cn.u
      JOIN deg dv ON dv.node = cn.v
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.u AND e.v = cn.v)
    )
    SELECT u, v, cn AS common_neighbors, CAST(un AS BIGINT) AS union_size,
           CAST(FLOOR(1000000.0 * CAST(cn AS DOUBLE) / CAST(un AS DOUBLE))
                AS BIGINT) AS jaccard_micro,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY FLOOR(1000000.0 * CAST(cn AS DOUBLE) / CAST(un AS DOUBLE))
                   DESC, u, v) AS rk
      FROM cand
    ) WHERE rk <= {LINKPRED_TOP_K}
"""


@_register("op_graph_link_prediction", _LINKPRED_ORACLE)
def op_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-activity graph — common-neighbor /
    Jaccard scoring of NON-adjacent user pairs (the classic
    Liben-Nowell–Kleinberg baseline behind friend-of-friend
    recommendation and graph densification): pairs that share
    neighbors but no edge, scored cn/(deg_u+deg_v−cn) in exact micro
    units, top-K reported.

    Scale shape: the candidate generation is the standard
    triangle-closing join — neighbor lists self-joined THROUGH the
    shared neighbor, so cost is Σ deg(w)² over hub nodes (the
    bounded-degree construction caps deg), never |V|². The existing-
    edge exclusion is a broadcast anti-join against the canonical
    u<v edge list; degrees broadcast; top-K is TakeOrdered.  The wedge
    frame itself is the memoized _wedge_stats shared with
    op_graph_resource_allocation — computed once per session.
    """
    deg, wedge = _wedge_stats(spark, sf_dir)
    cand = (
        wedge.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
        .select(
            "u",
            "v",
            "cn",
            (F.col("du") + F.col("dv") - F.col("cn")).cast("bigint").alias("un"),
        )
    )
    jacc = F.floor(
        F.lit(1000000.0) * F.col("cn").cast("double") / F.col("un").cast("double")
    ).cast("bigint")
    scored = cand.select(
        "u",
        "v",
        F.col("cn").alias("common_neighbors"),
        F.col("un").alias("union_size"),
        jacc.alias("jaccard_micro"),
    )
    topk = scored.orderBy(
        F.desc("jaccard_micro"), F.asc("u"), F.asc("v")
    ).limit(LINKPRED_TOP_K)
    w_rk = Window.orderBy(F.desc("jaccard_micro"), F.asc("u"), F.asc("v"))
    return topk.withColumn(
        "rk", F.row_number().over(w_rk).cast("bigint")
    )


# --- Community modularity audit (closes the detect -> evaluate loop) -----


def _modularity_oracle() -> str:
    return f"""
    WITH comm AS (SELECT * FROM ({_lp_oracle()}) lp_result),
    grp2 AS (
      SELECT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events GROUP BY 1, 2, 3
    ),
    hubs2 AS (
      SELECT b, event_type, MIN(user_id) AS hub FROM grp2 GROUP BY 1, 2
    ),
    star2 AS (
      SELECT g.user_id AS src, h.hub AS dst
      FROM grp2 g JOIN hubs2 h ON h.b = g.b AND h.event_type = g.event_type
      WHERE g.user_id <> h.hub
    ),
    edges2 AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT src, dst FROM star2
        UNION ALL
        SELECT dst AS src, src AS dst FROM star2
      ) GROUP BY src, dst
    ),
    deg AS (SELECT src AS v, CAST(SUM(w) AS BIGINT) AS d FROM edges2 GROUP BY 1),
    twom AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM edges2),
    intra AS (
      SELECT ca.community, CAST(SUM(e.w) AS BIGINT) AS in_w
      FROM edges2 e
      JOIN comm ca ON ca.user_id = e.src
      JOIN comm cb ON cb.user_id = e.dst AND cb.community = ca.community
      GROUP BY 1
    ),
    tot AS (
      SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(COALESCE(d.d, 0)) AS BIGINT) AS tot_w
      FROM comm c LEFT JOIN deg d ON d.v = c.user_id GROUP BY 1
    )
    SELECT t.community, t.n_nodes,
           CAST(COALESCE(i.in_w, 0) AS BIGINT) AS in_w, t.tot_w,
           m2 AS two_m,
           CAST(m2 * COALESCE(i.in_w, 0) - t.tot_w * t.tot_w AS BIGINT)
             AS contrib_num
    FROM tot t LEFT JOIN intra i USING (community) CROSS JOIN twom
    """


@_register("op_graph_modularity", _modularity_oracle())
def op_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted modularity audit of the label-propagation communities —
    the evaluate half of the detect → evaluate loop (Newman 2004):
    per community, the intra-community weight Σ_in, the total incident
    weight Σ_tot, and the contribution numerator 2m·Σ_in − Σ_tot² (the
    per-community term of Q = Σ_c [Σ_in/2m − (Σ_tot/2m)²] cleared to
    integers; the reader divides the contrib sum by (2m)²). Entirely
    DIVISION-FREE — the same no-doubles discipline as the seasonal
    anomaly gate — so the oracle is hash-exact by construction.
    On this corpus the LP partition scores slightly NEGATIVE Q
    (~−0.04): the bucket hubs bridge communities, so the partition is
    worse than the configuration-model null — which is precisely the
    finding this audit exists to raise before anyone ships those
    communities downstream.

    Scale shape: the star-graph edge list (linear in bucket
    membership), one degree aggregate, one community-tagged edge
    aggregate (two broadcast joins of the node→community map), and a
    community-cardinality output. The LP labels come from the same
    distributed rounds op_graph_label_propagation runs.
    """
    ev = read_table(spark, sf_dir, "events")
    # Pinned memo shared with op_graph_label_propagation (round-10):
    # the detect half ran its full LP_ITERS loop a second time here.
    comm = lp_labels_cached(spark, sf_dir).select(
        "v", F.col("label").cast("bigint").alias("community")
    )
    grp = ev.select(
        F.date_trunc("hour", "ts").alias("b"), "event_type", "user_id"
    ).distinct()
    hubs = grp.groupBy("b", "event_type").agg(F.min("user_id").alias("hub"))
    star = (
        grp.join(hubs, ["b", "event_type"])
        .filter(F.col("user_id") != F.col("hub"))
        .select(F.col("user_id").alias("src"), F.col("hub").alias("dst"))
    )
    edges = (
        star.unionByName(
            star.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
        .localCheckpoint()  # feeds degrees, 2m, and the intra aggregate
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.sum("w").cast("bigint").alias("d")
    )
    two_m = edges.agg(F.sum("w").cast("bigint").alias("m2"))
    intra = (
        edges.join(
            F.broadcast(comm.select(F.col("v").alias("src"), F.col("community"))),
            "src",
        )
        .join(
            F.broadcast(
                comm.select(
                    F.col("v").alias("dst"), F.col("community").alias("c2")
                )
            ),
            "dst",
        )
        .filter(F.col("community") == F.col("c2"))
        .groupBy("community")
        .agg(F.sum("w").cast("bigint").alias("in_w"))
    )
    tot = (
        comm.join(deg, "v", "left")
        .groupBy("community")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum(F.coalesce("d", F.lit(0))).cast("bigint").alias("tot_w"),
        )
    )
    return (
        tot.join(intra, "community", "left")
        .crossJoin(F.broadcast(two_m))
        .select(
            "community",
            "n_nodes",
            F.coalesce("in_w", F.lit(0)).cast("bigint").alias("in_w"),
            "tot_w",
            F.col("m2").alias("two_m"),
            (
                F.col("m2") * F.coalesce("in_w", F.lit(0))
                - F.col("tot_w") * F.col("tot_w")
            )
            .cast("bigint")
            .alias("contrib_num"),
        )
    )


# --- HITS hubs & authorities (bipartite purchase graph) ------------------

HITS_ITERS = 6
HITS_SCALE = 1_000_000
# Partitions for the node-sized score vectors between half-steps: 1 is
# right while node count ≪ edge count (the window-mean normalization
# needs a single partition anyway); see the hits() scale note.
HITS_VECTOR_PARTITIONS = 1


def _hits_oracle() -> str:
    """Recursive-CTE replay of the integer HITS iteration.

    The a-normalization subquery appears verbatim in both the h-raw
    computation and its mean (factored here through Python f-strings, the
    sanctioned alternative to string-splicing a shared prefix), because a
    recursive member is a single SELECT and the working table may be
    referenced from any nesting depth.
    """
    n, s = HITS_ITERS, HITS_SCALE
    araw = f"""SELECT e1.p, CAST(SUM(i1.h) AS BIGINT) AS a_raw
        FROM e e1 JOIN it i1 ON i1.c = e1.c WHERE i1.iter < {n}
        GROUP BY e1.p"""
    anorm = f"""SELECT ar.p,
          CAST((ar.a_raw * {s}) // GREATEST(m.ma, 1) AS BIGINT) AS a
        FROM ({araw}) ar
        CROSS JOIN (SELECT CAST(CAST(SUM(a_raw) AS BIGINT) // COUNT(*)
                         AS BIGINT) AS ma
                    FROM ({araw})) m"""
    hraw = f"""SELECT e2.c AS c, CAST(SUM(an.a) AS BIGINT) AS h_raw
        FROM e e2 JOIN ({anorm}) an ON an.p = e2.p GROUP BY e2.c"""
    return f"""
    WITH RECURSIVE
    e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT DISTINCT c FROM e),
    it(iter, c, h) AS (
      SELECT 0, c, CAST({s} AS BIGINT) FROM nodes
      UNION ALL
      SELECT p0.iter + 1, p0.c,
             CAST((hr.h_raw * {s}) // GREATEST(t.mh, 1) AS BIGINT)
      FROM (SELECT * FROM it WHERE iter < {n}) p0
      JOIN ({hraw}) hr ON hr.c = p0.c
      CROSS JOIN (SELECT CAST(CAST(SUM(h_raw) AS BIGINT) // COUNT(*)
                       AS BIGINT) AS mh
                  FROM ({hraw})) t
    ),
    fh AS (SELECT c, h FROM it WHERE iter = {n}),
    far AS (SELECT e.p, CAST(SUM(f.h) AS BIGINT) AS a_raw
            FROM e JOIN fh f ON f.c = e.c GROUP BY e.p),
    fa AS (SELECT p, CAST((a_raw * {s}) // GREATEST(
             (SELECT CAST(CAST(SUM(a_raw) AS BIGINT) // COUNT(*) AS BIGINT)
              FROM far), 1) AS BIGINT) AS a FROM far)
    SELECT 'hub' AS kind, c AS id, h AS score_micro FROM fh
    UNION ALL
    SELECT 'authority' AS kind, p AS id, a AS score_micro FROM fa
    """


def hits(edges: DataFrame, n_iter: int = HITS_ITERS) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) on a bipartite edge list
    ``(c, p)``: hub scores live on ``c``, authority scores on ``p``.

    Each iteration is two broadcast-free aggregate half-steps —
    a_raw(p) = Σ_{c→p} h(c), then h_raw(c) = Σ_{c→p} a(p) — with a
    mean-normalization between them that keeps every score an int64
    micro (score*1e6, mean ≈ 1e6): m = Σ//count, score = raw*SCALE//m.
    Truncating div on non-negative operands matches DuckDB ``//``
    exactly, so the whole iteration replays in a recursive CTE. L1-mean
    normalization replaces the classical L2 norm: the *ranking* is
    identical (normalization is a positive per-side scalar) and the
    arithmetic stays rational — the same trade op_graph_pagerank makes.

    Scale shape: the edge list is checkpointed once; each half-step is
    one shuffle keyed by the side being scored (cardinality = node
    count, not edge count after the map-side combine); the
    normalization mean folds into the same pass as an over-() window
    on the node-sized vector. Worst case int64 headroom: raw ≤ Σ_side
    score ≈ n_side·1e6, so raw*SCALE ≤ n_side·1e12 — safe through sf10.
    """
    # Lazy checkpoints throughout (round-10, guide §1.2): every eager
    # localCheckpoint in the loop ran its own materialization job; the
    # lazy form materializes inside the NEXT half-step's broadcast
    # collect, halving the loop's job count (26 -> 13 jobs; measured
    # 5.2s -> 4.4s warm at sf0.1, byte-identical output). Plan
    # truncation is unchanged — localCheckpoint cuts lineage at mark
    # time regardless of eagerness.
    e = edges.select("c", "p").distinct().localCheckpoint(eager=False)
    h = e.select("c").distinct().select(
        "c", F.lit(HITS_SCALE).cast("bigint").alias("h")
    )
    # Each half-step normalizes by the mean raw score. Computing that
    # mean as an unpartitioned WINDOW over the raw frame (sum()/count()
    # over ()) folds the 1-row aggregate + crossJoin-rescale of the
    # first cut into the SAME pass: one job per half-step instead of
    # two (checkpoint job + rescale job), measured 5.98s -> 4.1s at
    # sf0.1 with byte-identical output. The over-() window needs a
    # single partition — coalesce(1) supplies it without an exchange,
    # and is safe because the frame is NODE-cardinality (score vectors,
    # orders of magnitude below the edge list). For billion-node graphs
    # raise HITS_VECTOR_PARTITIONS and replace the window mean with the
    # broadcast 1-row aggregate (the shape this replaced) — the
    # iteration math is unchanged either way.
    norm = (
        f"(raw * {HITS_SCALE}L) div "
        "greatest(sum(raw) over () div count(raw) over (), 1L)"
    )

    def a_step(h_df: DataFrame) -> DataFrame:
        # Explicit broadcast: the score vector is node-cardinality and
        # derives from checkpointed RDDs whose stats Catalyst can't see,
        # so without the hint every half-step sort-merge-joins — 3
        # exchanges instead of 1 (measured at sf0.01; round-6 audit).
        raw = (
            e.join(F.broadcast(h_df), "c")
            .groupBy("p")
            .agg(F.sum("h").cast("bigint").alias("raw"))
            .coalesce(HITS_VECTOR_PARTITIONS)
        )
        # Checkpoint AFTER the rescale: the vector feeds the next
        # half-step's broadcast and (for the last a) the final union —
        # without it the lineage re-runs the whole iteration chain.
        return raw.select("p", F.expr(norm).alias("a")).localCheckpoint(
            eager=False
        )

    for _ in range(n_iter):
        a = a_step(h)
        h_raw = (
            e.join(F.broadcast(a), "p")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("raw"))
            .coalesce(HITS_VECTOR_PARTITIONS)
        )
        h = h_raw.select("c", F.expr(norm).alias("h")).localCheckpoint(
            eager=False
        )
    a = a_step(h)  # authorities from the converged hub vector
    return h.select(
        F.lit("hub").alias("kind"),
        F.col("c").alias("id"),
        F.col("h").alias("score_micro"),
    ).unionByName(
        a.select(
            F.lit("authority").alias("kind"),
            F.col("p").alias("id"),
            F.col("a").alias("score_micro"),
        )
    )


@_register("op_graph_hits", _hits_oracle())
def op_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the customer→part purchase bipartite
    graph — the third iterative-graph operator (next to PageRank and
    label propagation): hubs are broad buyers, authorities are parts
    bought by the strongest hubs. The link-analysis scorer a corpus
    curation pipeline uses when importance flows BOTH ways (e.g. site ↔
    document quality priors), where PageRank's single score conflates
    the two roles.

    Hash-exact via the integer iteration in :func:`hits` replayed by a
    DuckDB recursive CTE; pytest triangulates with a pure-Python
    power-iteration recount and asserts rank agreement with float HITS.
    """
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
    )
    return hits(edges)


# --- Bounded multi-source BFS (graph distance features) -------------------

BFS_SEED_MOD = 97  # seeds: user_id % MOD == 0 (deterministic ~1%)
BFS_MAX_HOPS = 4

_BFS_EDGE_CTES = """
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e0 AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type AND c.rk - a.rk = 1
    ),
    e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    nodes AS (SELECT DISTINCT u AS v FROM e)
"""

_BFS_ORACLE = (
    _BFS_EDGE_CTES
    + f""",
    l0 AS (SELECT v FROM nodes WHERE v % {BFS_SEED_MOD} = 0),
    l1 AS (SELECT DISTINCT e.v FROM e JOIN l0 ON e.u = l0.v),
    l2 AS (SELECT DISTINCT e.v FROM e JOIN l1 ON e.u = l1.v),
    l3 AS (SELECT DISTINCT e.v FROM e JOIN l2 ON e.u = l2.v),
    l4 AS (SELECT DISTINCT e.v FROM e JOIN l3 ON e.u = l3.v)
    SELECT v AS user_id,
           CAST(CASE WHEN v IN (SELECT v FROM l0) THEN 0
                     WHEN v IN (SELECT v FROM l1) THEN 1
                     WHEN v IN (SELECT v FROM l2) THEN 2
                     WHEN v IN (SELECT v FROM l3) THEN 3
                     ELSE 4 END AS BIGINT) AS hops
    FROM nodes
    WHERE v IN (SELECT v FROM l0) OR v IN (SELECT v FROM l1)
       OR v IN (SELECT v FROM l2) OR v IN (SELECT v FROM l3)
       OR v IN (SELECT v FROM l4)
"""
)


@_register("op_graph_bfs_hops", _BFS_ORACLE)
def op_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS over the co-activity graph: hop distance
    from every node to the nearest SEED user (user_id % 97 == 0),
    capped at BFS_MAX_HOPS — the "distance to a labeled anchor" feature
    a curation pipeline derives when only a sparse seed set is labeled
    (distance to known-spam accounts, to verified publishers, to
    moderated communities). Unreached nodes are excluded (distance is
    undefined, not 0).

    Both engines compute hops as min level over DISTINCT per-level
    frontier sets — no path enumeration, so a dense graph cannot blow
    up the oracle, and the Spark loop is R bounded rounds.

    Scale shape: the edge list is built once and checkpointed; each
    round is one join keyed by the frontier (node-cardinality DISTINCT
    set, broadcast) against the edge list + a distinct — the textbook
    frontier BFS where per-round cost is O(edges touched), and R is a
    constant. State per round is one (node) set, never paths.
    """
    e0 = coactivity_edges_cached(spark, sf_dir, 1)
    # coactivity_edges is DISTINCT with u < v on every row, so the
    # symmetrized union is duplicate-free by construction ((u,v) from
    # the left leg and (v,u) from the right leg can never coincide) —
    # no distinct, which would be a full 2|E| shuffle for nothing.
    e = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()  # probed once per BFS round
    nodes = e.select("u").distinct().select(F.col("u").alias("v"))
    level = nodes.filter(F.col("v") % BFS_SEED_MOD == 0).localCheckpoint()
    # dist accumulates (v, hops); per round the NEW frontier is the
    # neighbor set minus everything already labeled (classic BFS).
    dist = level.select("v", F.lit(0).cast("bigint").alias("hops"))
    for r in range(1, BFS_MAX_HOPS + 1):
        nbrs = (
            e.join(F.broadcast(level.select(F.col("v").alias("u"))), "u")
            .select("v")
            .distinct()
        )
        level = nbrs.join(
            F.broadcast(dist.select("v")), "v", "left_anti"
        ).localCheckpoint()  # feeds dist AND next round's probe
        dist = dist.unionByName(
            level.select("v", F.lit(r).cast("bigint").alias("hops"))
        )
    return dist.select(F.col("v").alias("user_id"), "hops")


# --- L13x round 8: bounded k-core peel trajectory ----------------------------

KCORE_ROUNDS = 3  # bounded simultaneous-peel rounds (fixpoint is 1-2 here)


def _kcore_oracle() -> str:
    """Unrolled KCORE_ROUNDS-round simultaneous peel: per round, every
    node whose degree in the previous survivor graph is < k drops at
    once. k is data-dependent (floor(mean degree) + 1) so the gate is
    non-vacuous at every SF — a FIXED k is all-or-nothing on this graph
    because co-activity degree scales with the corpus (measured: the
    whole graph survives k<=11 at sf0.001 yet k<=115 at sf0.01)."""
    parts = [
        f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e0 AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    n0 AS (
      SELECT DISTINCT node
      FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
    ),
    kk AS (
      SELECT CAST((SELECT 2 * COUNT(*) FROM e0) // (SELECT COUNT(*) FROM n0)
                  + 1 AS BIGINT) AS k
    )"""
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        p = r - 1
        parts.append(
            f""",
    deg{p} AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p})
      GROUP BY node
    ),
    s{r} AS (SELECT node FROM deg{p}, kk WHERE d >= k),
    e{r} AS (
      SELECT u, v FROM e{p}
      WHERE u IN (SELECT node FROM s{r}) AND v IN (SELECT node FROM s{r})
    )"""
        )
    sel = [
        """
    SELECT CAST(0 AS BIGINT) AS peel_round, k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM n0) AS survivors,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS edges_remaining
    FROM kk"""
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        sel.append(
            f"""
    SELECT CAST({r} AS BIGINT), k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s{r}),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r})
    FROM kk"""
        )
    return "".join(parts) + "\n    UNION ALL".join(sel)


@_register("op_graph_kcore_peel", _kcore_oracle())
def op_graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel trajectory over the co-activity graph: per
    round, simultaneously drop every node with fewer than k surviving
    neighbors, reporting (survivors, edges remaining) after each of
    KCORE_ROUNDS rounds — the density-structure audit next to triangles
    and degree profile (the k-core is the standard "engaged core"
    community definition: Seidman 1983; Kong et al. 2019 survey). The
    trajectory, not just the fixpoint, is the signal: how fast the
    periphery sheds quantifies core/periphery separation.

    k is data-dependent — floor(mean degree) + 1, exact integer
    arithmetic in both engines — because co-activity degree scales with
    corpus size, so ANY fixed k is all-or-nothing (measured at three
    SFs; see _kcore_oracle). Both engines peel SIMULTANEOUSLY (degree
    snapshot per round), the textbook parallel formulation that maps to
    Spark as R bounded passes.

    Scale shape: the edge list builds once via the lead()-window
    coactivity_edges (zero joins) and checkpoints; each round is one
    map-side-combined degree aggregate + two broadcast semi-joins of
    the node-cardinality survivor set against the shrinking edge list.
    Per-round cost is O(|E_r|), R is a constant, and state is one node
    set — never paths. The scalar V/E collects are single-row
    aggregates (house collect policy).
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    n_nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .count()
    )
    n_edges = e.count()
    k = 2 * n_edges // n_nodes + 1
    rows = [(0, k, n_nodes, n_edges)]
    cur = e
    for r in range(1, KCORE_ROUNDS + 1):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionByName(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        # survivor set is node-cardinality -> broadcast both semi-joins
        s = deg.filter(F.col("d") >= k).select("node").localCheckpoint()
        cur = (
            cur.join(
                F.broadcast(s.select(F.col("node").alias("u"))), "u", "semi"
            )
            .join(F.broadcast(s.select(F.col("node").alias("v"))), "v", "semi")
            .localCheckpoint()  # feeds the count AND the next round
        )
        rows.append((r, k, s.count(), cur.count()))
    return spark.createDataFrame(
        rows,
        "peel_round bigint, k bigint, survivors bigint, edges_remaining bigint",
    )


# --- L13x round 8: degree assortativity --------------------------------------

_ASSORT_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ),
    -- symmetrized endpoint-degree pairs: each undirected edge
    -- contributes (d_u, d_v) AND (d_v, d_u)
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d, du.d
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs
    )
    SELECT n AS n_endpoint_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS assortativity
    FROM s
"""


@_register("op_graph_assortativity", _ASSORT_ORACLE)
def op_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the co-activity graph: the
    Pearson correlation of endpoint degrees over all symmetrized edge
    pairs — positive means hubs attach to hubs (social networks),
    negative means hub-and-spoke (infrastructure / bot farms). The
    one-number structural audit next to op_graph_degree_profile: a
    degree histogram can stay flat while assortativity flips sign.

    Exactness: degrees and all five regression sums are exact bigint
    (budget: pairs x max_deg^2 is ~1.6e10 here and sits 5 orders
    inside int64 even at 100x); the coefficient is one fixed double
    chain (two casts, one multiply, one correctly-rounded sqrt, one
    division) — bit-identical across engines. No pow/ln.

    Scale shape: edges come from the lead()-window builder (zero
    joins); the degree aggregate is map-side combined; attaching
    endpoint degrees is two joins keyed by node (the degree table is
    node-cardinality — broadcast at dim scale, shuffle-keyed beyond);
    the correlation is a single-row aggregate. One scan end to end.
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
        .localCheckpoint()  # probed twice (u side and v side)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("xu"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("xv"))
    base = e.join(du, "u").join(dv, "v")
    pairs = base.select(
        F.col("xu").alias("x"), F.col("xv").alias("y")
    ).unionByName(base.select(F.col("xv").alias("x"), F.col("xu").alias("y")))
    s = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").alias("n_endpoint_pairs"),
        (num / F.sqrt(dx * dy)).alias("assortativity"),
    )


# --- Seeded PageRank (TrustRank) over the co-activity graph --------------

TRUST_ITERS = 4
TRUST_SEED_MOD = 50  # deterministic seed cohort: user_id % 50 == 0
_TR_DNUM, _TR_DDEN = _damping_fraction(PAGERANK_DAMPING)
_TR_BASE_U = (PAGERANK_SCALE * (_TR_DDEN - _TR_DNUM)) // _TR_DDEN

_TRUSTRANK_ORACLE = f"""
    WITH RECURSIVE
    grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id)
               AS rk
      FROM grp
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    und AS MATERIALIZED (SELECT u, v FROM e UNION SELECT v, u FROM e),
    deg AS MATERIALIZED (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM und),
    tr(iter, v, rank_u) AS (
      SELECT 0, v,
             CAST(CASE WHEN v % {TRUST_SEED_MOD} = 0
                       THEN {PAGERANK_SCALE} ELSE 0 END AS BIGINT)
      FROM nodes
      UNION ALL
      SELECT t.iter + 1, t.v,
             CAST(CASE WHEN t.v % {TRUST_SEED_MOD} = 0
                       THEN {_TR_BASE_U} ELSE 0 END
                  + ({_TR_DNUM} * COALESCE(a.inflow, 0)) // {_TR_DDEN}
                  AS BIGINT)
      FROM (SELECT * FROM tr WHERE iter < {TRUST_ITERS}) t
      LEFT JOIN (
        SELECT e2.v AS v, SUM(tr.rank_u // d.d) AS inflow
        FROM tr JOIN und e2 ON e2.u = tr.v JOIN deg d ON d.u = tr.v
        WHERE tr.iter < {TRUST_ITERS}
        GROUP BY e2.v
      ) a ON a.v = t.v
    )
    SELECT v AS user_id, (v % {TRUST_SEED_MOD} = 0) AS is_seed,
           rank_u AS trust_micro,
           CAST(rank_u AS DOUBLE) / {float(PAGERANK_SCALE)} AS trust
    FROM tr WHERE iter = {TRUST_ITERS}
"""


@_register("op_graph_trustrank_seeded", _TRUSTRANK_ORACLE)
def op_graph_trustrank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded PageRank (TrustRank, Gyöngyi et al., VLDB 2004) over the
    undirected co-activity graph: teleport mass restarts ONLY at a
    deterministic trusted-seed cohort (user_id % 50 == 0), so the
    stationary score measures proximity to the seeds — the classic
    quality-propagation prior for corpus curation (trust flows from
    vetted sources through the link structure, spam/isolated regions
    starve).  Complements op_graph_pagerank (global importance) with
    the seeded/personalized variant the curation literature actually
    uses for quality weighting.

    Exact fixed-point integer iteration, same discipline as
    :func:`pagerank`: micro-unit ranks, damping as an exact fraction,
    floor-division contributions replayed by a DuckDB recursive CTE.
    The co-activity node set has no dangling nodes by construction
    (every node is an edge endpoint), so no dangling-mass term; floor
    remainders decay (< E micro-units/round) identically in both
    engines.

    Scale shape: edges from :func:`coactivity_edges` (lead-window
    build, zero joins); each of the TRUST_ITERS rounds is ONE
    node-keyed join + groupBy on the checkpointed edge frame — the
    op_graph_pagerank loop shape, bounded rounds, no driver state
    beyond the loop counter.
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    deg = und.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    ranked_edges = und.join(deg, "u").localCheckpoint()
    nodes = und.select(F.col("u").alias("node")).distinct().localCheckpoint()
    seed = F.col("node") % TRUST_SEED_MOD == 0
    rank = nodes.select(
        "node",
        F.when(seed, F.lit(PAGERANK_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_u"),
    )
    for _ in range(TRUST_ITERS):
        contrib = (
            ranked_edges.join(rank, ranked_edges.u == rank.node)
            .select(
                F.col("v").alias("node"),
                F.expr("rank_u div d").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
            .localCheckpoint()
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"CAST(CASE WHEN node % {TRUST_SEED_MOD} = 0"
                f" THEN {_TR_BASE_U}L ELSE 0L END"
                f" + ({_TR_DNUM}L * coalesce(inflow, 0L)) div {_TR_DDEN}L"
                " AS LONG)"
            ).alias("rank_u"),
        )
    return rank.select(
        F.col("node").alias("user_id"),
        (F.col("node") % TRUST_SEED_MOD == 0).alias("is_seed"),
        F.col("rank_u").alias("trust_micro"),
        (F.col("rank_u").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
            "trust"
        ),
    )


# --- Resource-allocation link scoring (Zhou et al. 2009) -----------------

RA_TOP_K = 20

_RA_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    und AS MATERIALIZED (SELECT u, v FROM e UNION SELECT v, u FROM e),
    deg AS MATERIALIZED (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1
    ),
    ra AS (
      SELECT a.u AS u, b.u AS v,
             CAST(COUNT(*) AS BIGINT) AS cn,
             CAST(SUM(1000000 // dw.d) AS BIGINT) AS ra_micro
      FROM und a
      JOIN und b ON a.v = b.v AND a.u < b.u
      JOIN deg dw ON dw.node = a.v
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT ra.u, ra.v, ra.cn, ra.ra_micro
      FROM ra
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = ra.u AND e.v = ra.v)
    )
    SELECT u, v, cn AS common_neighbors, ra_micro, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ra_micro DESC, u, v) AS rk
      FROM cand
    ) WHERE rk <= {RA_TOP_K}
"""


@_register("op_graph_resource_allocation", _RA_ORACLE)
def op_graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link scoring (Zhou, Lü & Zhang 2009, public
    EPJ B 71:623): non-adjacent pairs scored RA(u,v) = Σ_{w∈N(u)∩N(v)}
    1/deg(w) — the common-neighbor variant that DOWN-weights hub
    intermediaries, consistently the strongest local similarity index
    in the link-prediction literature and the natural complement to
    op_graph_link_prediction's size-normalized Jaccard (which cannot
    tell a hub wedge from a rare one).

    Exactness: each wedge contributes floor(1e6/deg(w)) micro-units —
    one floor per WEDGE in both engines, so the per-pair sum is exact
    int64 and the top-K ordering hashes bit-for-bit.

    Scale shape: identical to the link-prediction cn stage — it IS the
    same memoized _wedge_stats frame (deg(w) on the probe side of the
    wedge join, cu-co-located aggregate, broadcast anti-join
    exclusion), computed once per session and read here for ra_micro;
    top-K is TakeOrdered.
    """
    _deg, wedge = _wedge_stats(spark, sf_dir)
    topk = wedge.orderBy(
        F.desc("ra_micro"), F.asc("u"), F.asc("v")
    ).limit(RA_TOP_K)
    w_rk = Window.orderBy(F.desc("ra_micro"), F.asc("u"), F.asc("v"))
    return topk.select(
        "u", "v", F.col("cn").alias("common_neighbors"), "ra_micro"
    ).withColumn("rk", F.row_number().over(w_rk).cast("bigint"))


# --- Global clustering coefficient (transitivity) ------------------------

_TRANSITIVITY_ORACLE = f"""
    WITH grp AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, event_type, user_id
      FROM events
    ),
    ranked AS (
      SELECT b, event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY b, event_type ORDER BY user_id) AS rk
      FROM grp
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM ranked a JOIN ranked c
        ON a.b = c.b AND a.event_type = c.event_type
       AND c.rk - a.rk BETWEEN 1 AND {TRI_NEXT_K}
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    wed AS (
      SELECT CAST(SUM(d * (d - 1)) AS BIGINT) AS wedges2,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d) AS BIGINT) AS deg_sum
      FROM (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u)
    )
    SELECT w.n_nodes, CAST(w.deg_sum // 2 AS BIGINT) AS n_edges, t.n_tri,
           CAST(w.wedges2 // 2 AS BIGINT) AS n_wedges,
           CAST(6 * t.n_tri * 1000000 // w.wedges2 AS BIGINT)
             AS transitivity_micro
    FROM tri t CROSS JOIN wed w
"""


@_register("op_graph_transitivity", _TRANSITIVITY_ORACLE)
def op_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the co-activity
    graph: C = 3·triangles / wedges — the one-number cohesion metric
    that tells a curation run whether co-activity is clique-like
    (communities worth mining) or star-like (hubs only), completing the
    graph-metrics family next to per-node triangles, degree
    assortativity, and modularity.

    Exactness: triangles come from the oriented u<v join (each counted
    once), wedges from Σ deg(deg−1)/2 over the symmetrized degree
    table; C ships as one bigint floor division in micro units
    (6·tri·1e6 // Σd(d−1) — the /2s cancel).

    Scale shape: the oriented 3-way triangle join (endpoint-keyed,
    orientation halves the input — op_graph_triangles' shape) plus one
    degree aggregate; both scalar outputs, one row at any size.
    """
    e = coactivity_edges_cached(spark, sf_dir, TRI_NEXT_K)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count("*").cast("bigint").alias("n_tri"))
    )
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    wed = (
        und.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("d"))
        .agg(
            F.sum(F.col("d") * (F.col("d") - 1)).cast("bigint").alias("wedges2"),
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("deg_sum"),
        )
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_nodes",
        F.expr("deg_sum div 2").cast("bigint").alias("n_edges"),
        "n_tri",
        F.expr("wedges2 div 2").cast("bigint").alias("n_wedges"),
        F.expr("6 * n_tri * 1000000L div wedges2")
        .cast("bigint")
        .alias("transitivity_micro"),
    )
