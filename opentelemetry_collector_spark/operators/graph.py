"""Graph operators over pipeline-derived edge lists.

The reference's service topology is implicit (pipelines wired by config,
``service/internal/builder/pipelines_builder.go:117-216``); a tracing
backend derives the *runtime* graph from the data the collector transports
(our ``aggregate.service_graph``). This module adds the iterative analytics
a 100 TB corpus asks of that graph:

- :func:`navigation_edges` — weighted directed edge list from consecutive
  page-view / item-click events per user (the classic web-navigation graph).
- :func:`pagerank` — fixed-iteration weighted PageRank in EXACT integer
  micro-units, so the result is engine- and partitioning-independent
  (float PageRank sums are order-dependent; integer sums are associative,
  the same trick as the cents-exact star-schema queries).

Scale shape: the only corpus-sized pass is the edge aggregation (one
partial-aggregated groupBy over the event stream). Every PageRank iteration
runs on the AGGREGATED edge list — bounded by distinct (src, dst) pairs,
not by events — and the rank frame (one row per node) joins onto it, so
iterations add no corpus-sized shuffle. The rank-side join strategy is
SIZE-GATED (same probe-and-switch as ``dedup.connected_components``): at
or under ``broadcast_node_threshold`` nodes the per-iteration join carries
an explicit broadcast hint (rank frames are post-shuffle aggregates whose
size estimates AQE routinely overshoots); above it the hint is withheld so
Catalyst/AQE plan a shuffled hash-join on ``src`` — an unconditional hint
would try to materialize billions of ranks on the driver instead of
degrading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: rank unit: 1.0 of probability mass == 1_000_000 micro-units.
UNIT = 1_000_000


def navigation_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Weighted edges (src, dst, weight) from consecutive view/click events.

    Nodes: ``page:<event_id % 50>`` for views, ``item:<event_id % 100>``
    for clicks (the same derivation the transcript fixture embeds in its
    text payloads, ``sources/transcripts.py``). An edge src -> dst is one
    user doing src immediately before dst within the view/click
    subsequence, weight = number of such transitions corpus-wide.
    """
    vc = events.filter(F.col(type_col).isin("view", "click")).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.when(
            F.col(type_col) == "view",
            F.concat(F.lit("page:"), (F.col(id_col) % 50).cast("string")),
        )
        .otherwise(F.concat(F.lit("item:"), (F.col(id_col) % 100).cast("string")))
        .alias("dst"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    return (
        vc.withColumn("src", F.lag("dst").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    broadcast_node_threshold: int = 4_000_000,
) -> DataFrame:
    """Weighted PageRank over (src, dst, weight), exact in integer arithmetic.

    Every node starts at :data:`UNIT` micro-units. Per iteration, a node
    sends ``rank * weight div out_weight`` along each out-edge (integer
    floor-division — deterministic, associative) and every node's new rank
    is ``(100 - damping_pct)% of UNIT + damping_pct% of received mass``
    (dangling mass is dropped, the common simplification). Returns
    (node, rank_micros) — bit-identical under any partitioning because
    only integer adds/divides are involved.

    The per-iteration rank join is broadcast ONLY when a one-time
    ``limit(threshold+1)`` probe proves the node set fits
    (``broadcast_node_threshold`` nodes ≈ 64 MB of (node, rank) rows);
    otherwise the hint is withheld and the join shuffles on ``src`` — an
    unconditional ``F.broadcast`` would be honored regardless of size and
    OOM the driver at web scale instead of degrading. Lineage is truncated
    with ``localCheckpoint`` every few rounds so deep iteration counts
    don't stack a re-execution cliff (same guard as
    ``dedup.connected_components``).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (1, 99)")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    small_nodes = (
        broadcast_node_threshold > 0
        and nodes.limit(broadcast_node_threshold + 1).count() <= broadcast_node_threshold
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    # out_weight rides along each edge once; iterations then only touch ranks
    e = edges.join(out_w, on="src").select("src", "dst", "weight", "out_weight")
    base = (100 - damping_pct) * UNIT // 100
    ranks = nodes.select("node", F.lit(UNIT).cast("bigint").alias("rank_micros"))
    for it in range(iterations):
        if it and it % 4 == 0:
            ranks = ranks.localCheckpoint(eager=True)
        rank_side = ranks.withColumnRenamed("node", "src")
        if small_nodes:
            rank_side = F.broadcast(rank_side)
        contrib = (
            e.join(rank_side, on="src")
            .select(
                F.col("dst").alias("node"),
                # integer div: exact on non-negative operands (never `/`,
                # which is double-typed and order/precision-dependent)
                F.expr("rank_micros * weight div out_weight").alias("sent"),
            )
            .groupBy("node")
            .agg(F.sum("sent").alias("received"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"{damping_pct} * coalesce(received, 0L) div 100"
                    )
                ).alias("rank_micros"),
            )
        )
    return ranks


def k_hop_reachability(edges: DataFrame, hops: int = 3) -> DataFrame:
    """Per source node, how many distinct nodes are reachable within
    ``hops`` directed steps (bounded transitive closure — the iterative-
    join workload PageRank's fixed-point cousin).

    Each round extends the frontier by one edge join and dedups with a
    set-union (``distinct``); cycles are free (the reach set is a set).
    Like :func:`pagerank`, iterations run on the AGGREGATED edge list,
    never the raw corpus, and the reach frame is bounded by
    nodes x reachable-set size. Returns (node, n_reachable) — the source
    itself counts only if a cycle returns to it.
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    e = edges.select("src", "dst").distinct()
    reach = e
    for _ in range(hops - 1):
        step = (
            reach.select(F.col("src"), F.col("dst").alias("_mid"))
            .join(e.select(F.col("src").alias("_mid"), "dst"), "_mid")
            .select("src", "dst")
        )
        reach = reach.union(step).distinct()
    return reach.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reachable")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation and clustering coefficient over the
    undirected simple graph underlying ``(src, dst)`` — the cohesion
    statistic (friend-of-friend closure) backing community/quality reports
    on the navigation graph, one analytic order up from
    :func:`k_hop_reachability`'s reach counts.

    Algorithm: compact-forward / node-iterator with DEGREE ORDERING
    (Latapy, TCS 2008; the same orientation trick every distributed
    triangle counter uses). Each undirected edge is oriented from the
    endpoint with the lesser ``(degree, node)`` to the greater — a total
    order, so every triangle is discovered exactly once as a wedge
    ``u -> v, u -> w`` (with ``(deg,v) < (deg,w)``) closed by the oriented
    edge ``v -> w``. Orientation bounds every node's out-degree by
    O(sqrt(m)), so the wedge self-join materializes O(m^1.5) candidate
    rows worst-case instead of sum(deg^2) — the difference between a hub
    node costing deg^2 wedges and costing sqrt(m)*deg. All joins key on
    node ids and run on the AGGREGATED edge list (bounded by distinct
    pairs, never raw events); the degree frame is node-sized and
    AQE-broadcastable.

    Returns ``(node, degree, n_triangles, clustering_ppm)`` with
    ``clustering_ppm = 1e6 * 2 * triangles div (degree * (degree - 1))``
    (integer floor-division — engine-exact; 0 when degree < 2).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    # degree rides each endpoint once; orientation = lesser (degree, node) first
    d = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    )
    fwd = F.struct("da", "a") < F.struct("db", "b")
    o = d.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    wedge = (
        o.alias("x")
        .join(o.alias("y"), on=F.col("x.u") == F.col("y.u"))
        .filter(F.struct("x.dv", "x.v") < F.struct("y.dv", "y.v"))
        .select(
            F.col("x.u").alias("t0"),
            F.col("x.v").alias("t1"),
            F.col("y.v").alias("t2"),
        )
    )
    tri = wedge.join(
        o.select(F.col("u").alias("t1"), F.col("v").alias("t2")),
        on=["t1", "t2"],
        how="leftsemi",
    )
    per_node = (
        tri.select(F.explode(F.array("t0", "t1", "t2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return deg.join(per_node, on="node", how="left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.expr(
                f"{2 * UNIT} * coalesce(n_triangles, 0L)"
                " div (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("clustering_ppm"),
    )


def path_ngrams(
    events: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Frequent navigation n-grams: counts of length-``n`` consecutive node
    sequences per the :func:`navigation_edges` node derivation (sequence
    mining one order up from the edge/transition matrix).

    One window per user supplies the n-1 lag columns in a single sort;
    the count is one partial-aggregated groupBy on the n-tuple. A user's
    history never crosses partitions, so hot users cost one partition sort
    — the same bound as any per-key window.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    vc = events.filter(F.col(type_col).isin("view", "click")).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.when(
            F.col(type_col) == "view",
            F.concat(F.lit("page:"), (F.col(id_col) % 50).cast("string")),
        )
        .otherwise(F.concat(F.lit("item:"), (F.col(id_col) % 100).cast("string")))
        .alias(f"step_{n - 1}"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    cols = [f"step_{i}" for i in range(n)]
    for i in range(n - 1):
        vc = vc.withColumn(f"step_{i}", F.lag(f"step_{n - 1}", n - 1 - i).over(w))
    return (
        vc.filter(F.col("step_0").isNotNull())
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )


def covisitation_pairs(
    events: DataFrame,
    min_count: int = 1,
    max_per_user: int | None = None,
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Item-item co-visitation similarity ("users who viewed X also viewed
    Y") over the :func:`navigation_edges` node derivation: for every
    unordered node pair, how many distinct users touched both, with an
    exact integer Jaccard over the user sets — the association-mining
    counterpart of the transition-matrix edges (co-occurrence ignores
    order; transitions keep it).

    Scale shape: repeat visits collapse FIRST (distinct (user, node) —
    partial-aggregated, so a user hammering one page ships one row), then
    the pair generation is a self-join keyed on the user. Its fan-out is
    quadratic in a user's DISTINCT node count, so ``max_per_user`` caps
    each user's contribution — rank by ``md5(node)`` per user (seed-free,
    engine-reproducible; plans as a WindowGroupLimit, each map task
    forwards at most the cap per user). That is the standard mitigation
    every co-occurrence miner applies before the pair join; uncapped, one
    crawler user touching all N nodes would emit N^2/2 pairs. The per-node
    user counts are node-bounded and AQE-broadcastable onto the pair frame.

    ``jaccard_ppm = 1e6 * n_both div (n_a + n_b - n_both)`` — integer
    floor-division, engine-exact. Pairs with ``n_both < min_count`` drop.
    Returns (node_a, node_b, n_a, n_b, n_both, jaccard_ppm).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_per_user is not None and max_per_user < 2:
        raise ValueError(f"max_per_user must be >= 2, got {max_per_user}")
    vc = events.filter(F.col(type_col).isin("view", "click")).select(
        F.col(user_col).alias("u"),
        F.when(
            F.col(type_col) == "view",
            F.concat(F.lit("page:"), (F.col(id_col) % 50).cast("string")),
        )
        .otherwise(F.concat(F.lit("item:"), (F.col(id_col) % 100).cast("string")))
        .alias("node"),
    )
    per_user = vc.distinct()
    if max_per_user is not None:
        w = Window.partitionBy("u").orderBy(F.md5("node"), F.col("node"))
        per_user = (
            per_user.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_per_user)
            .drop("_rn")
        )
    node_users = per_user.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    pairs = (
        per_user.alias("x")
        .join(per_user.alias("y"), on=F.col("x.u") == F.col("y.u"))
        .filter(F.col("x.node") < F.col("y.node"))
        .select(F.col("x.node").alias("node_a"), F.col("y.node").alias("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= min_count)
    )
    return (
        pairs.join(
            node_users.select(F.col("node").alias("node_a"), F.col("n_users").alias("n_a")),
            "node_a",
        )
        .join(
            node_users.select(F.col("node").alias("node_b"), F.col("n_users").alias("n_b")),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(f"{UNIT} * n_both div (n_a + n_b - n_both)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
