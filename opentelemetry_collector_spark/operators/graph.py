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
not by events — and the rank frame (one row per node) broadcasts onto it,
so iterations add no corpus-sized shuffle. At web scale (billions of nodes)
the same code degrades gracefully: the broadcast becomes a shuffled
hash-join on ``src``, still proportional to edges, never to raw events.
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
) -> DataFrame:
    """Weighted PageRank over (src, dst, weight), exact in integer arithmetic.

    Every node starts at :data:`UNIT` micro-units. Per iteration, a node
    sends ``rank * weight div out_weight`` along each out-edge (integer
    floor-division — deterministic, associative) and every node's new rank
    is ``(100 - damping_pct)% of UNIT + damping_pct% of received mass``
    (dangling mass is dropped, the common simplification). Returns
    (node, rank_micros) — bit-identical under any partitioning because
    only integer adds/divides are involved.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (1, 99)")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    # out_weight rides along each edge once; iterations then only touch ranks
    e = edges.join(out_w, on="src").select("src", "dst", "weight", "out_weight")
    base = (100 - damping_pct) * UNIT // 100
    ranks = nodes.select("node", F.lit(UNIT).cast("bigint").alias("rank_micros"))
    for _ in range(iterations):
        contrib = (
            e.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")),
                on="src",
            )
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
