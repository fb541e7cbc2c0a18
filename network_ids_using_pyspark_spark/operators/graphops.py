"""Iterative graph operators over DataFrame edge lists.

The engine's second iterative-algorithm family (the first is
``dedup.connected_components``' min-label propagation): PageRank by
synchronous power iteration, expressed as pure DataFrame joins + keyed
aggregations so Catalyst/AQE plan every superstep.

Cross-engine determinism: ranks are kept in scaled *integer* arithmetic
(rank mass 1e9 per node, integer division for the per-edge share,
damping as ``(85 * x) DIV 100``).  Floating-point power iteration is
partition-order-dependent (float sums don't associate); integer sums
are exact, so the result is bit-identical on Spark and the DuckDB
oracle regardless of partitioning — same design as
``functions/numeric.py``'s decimal sums.

Scale design (100 TB): each superstep is ONE shuffle (contributions
aggregate on dst); the edge⋈degree relation is computed once and
persisted so supersteps don't rescan the fact tables; rank lineage is
cut with ``localCheckpoint`` per superstep exactly like
``dedup.connected_components`` (plan depth stays O(1), not O(iters)).
For skewed hub nodes the contribution aggregate is a partial
(map-side) sum, so hot dst keys combine before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_MASS = 1_000_000_000  # initial integer rank per node
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 damping in integer arithmetic
BASE = 150_000_000  # (1 - d) * RANK_MASS


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    checkpoint: bool = True,
    materialize: bool = True,
    seeds: "list | None" = None,
) -> DataFrame:
    """Integer PageRank over a directed edge list ``(src, dst)``.

    Every node must appear as a ``src`` at least once (feed an
    undirected graph as both edge directions); dangling-node mass is
    therefore never lost.  Returns ``(node, rank)`` with ``rank`` the
    scaled integer score after ``iters`` synchronous supersteps.

    ``seeds`` switches uniform teleport to PERSONALIZED PageRank: the
    per-step (1−d) restart mass — N·RANK_MASS·0.15 in total, kept in
    the same integer arithmetic — is deposited only on the seed nodes
    (split evenly), so rank measures proximity to the seed set instead
    of global centrality.  ``None`` (default) is classic PageRank.

    ``checkpoint`` (default on) cuts rank lineage per superstep with a
    lazy ``localCheckpoint`` so plan depth stays O(1) at any iteration
    count.  The returned frame is eagerly checkpointed, so the
    superstep caches (``e_d``/``nodes``) are released before returning
    — repeated invocations in a long-lived session don't accumulate
    cached blocks.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edge ⋈ degree: reused every superstep — materialize once; nodes
    # derive from the SAME persisted relation so no superstep (or the
    # node frame itself) ever rescans the fact tables.
    e_d = edges.join(deg, "src").persist()
    nodes = e_d.select(F.col("src").alias("node")).distinct().persist()
    if seeds is None:
        base = F.lit(BASE)
    else:
        # per-seed integer share of the total restart mass; the node
        # count rides a 1-row broadcast (never a collect)
        n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
        nodes = nodes.crossJoin(F.broadcast(n1)).persist()
        base = F.when(
            F.col("node").isin(list(seeds)),
            F.expr(
                f"({DAMP_DEN - DAMP_NUM} * CAST({RANK_MASS} AS BIGINT) * _n)"
                f" DIV ({DAMP_DEN} * {len(seeds)})"
            ),
        ).otherwise(F.lit(0))
    ranks = nodes.select("node").withColumn("rank", F.lit(RANK_MASS).cast("long"))
    for _ in range(iters):
        contrib = (
            e_d.join(ranks, e_d.src == ranks.node)
            .select(F.col("dst"), F.expr("rank DIV outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    base
                    + F.expr(f"({DAMP_NUM} * coalesce(c, 0)) DIV {DAMP_DEN}")
                ).cast("long").alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    if materialize:
        # materialize, then drop the superstep caches (ADVICE r2:
        # callers must not inherit cached blocks they never asked for)
        ranks = ranks.localCheckpoint(eager=True)
        e_d.unpersist()
        nodes.unpersist()
    # materialize=False keeps full lineage (plan-shape tests); the
    # caller then owns unpersisting e_d/nodes via the session catalog.
    return ranks


def pagerank_sql_ctes(
    edges_cte: str, iters: int = 3, seeds: "list | None" = None
) -> str:
    """DuckDB oracle: the same integer power iteration, unrolled as
    CTEs.  ``edges_cte`` must define a relation named ``edges`` with
    columns (src, dst).  ``seeds`` mirrors :func:`pagerank_int`'s
    personalized-teleport arithmetic exactly."""
    if seeds is None:
        base = str(BASE)
    else:
        seed_list = ", ".join(f"'{x}'" for x in seeds)
        base = (
            f"(CASE WHEN n.node IN ({seed_list}) THEN "
            f"({DAMP_DEN - DAMP_NUM} * CAST({RANK_MASS} AS BIGINT)"
            f" * (SELECT COUNT(*) FROM nodes)) // ({DAMP_DEN} * {len(seeds)})"
            f" ELSE 0 END)"
        )
    parts = [
        edges_cte,
        "deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"r0 AS (SELECT node, CAST({RANK_MASS} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS c "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.node "
            f"JOIN deg d ON e.src = d.node GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} + ({DAMP_NUM} * COALESCE(c.c, 0)) // {DAMP_DEN} AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def lpa_labels(edges, iters: int = 2, checkpoint: bool = True):
    """Deterministic synchronous label propagation: every node adopts
    the most frequent label among its neighbors each superstep, ties
    broken by smallest label — the classic community detector made
    reproducible (async/random-order LPA is run-dependent; the
    synchronous min-tiebreak variant is a pure function of the graph).

    ``edges`` must be the undirected edge relation (both directions
    present), columns (src, dst).  Labels initialize to the node id.

    Scale plan: one superstep = one equi-join of the label relation
    onto edges (keyed by node) + one (node, label)-keyed counting
    aggregate + one per-node argmax — the same shuffle skeleton as a
    PageRank superstep, O(iters) shuffles total.  The argmax is
    ``min(struct(-count, label))``, a map-side-combinable aggregate —
    no per-node sort window.  Edges persist across supersteps;
    lineage is cut per superstep like pagerank_int."""
    from pyspark.sql import functions as F

    e = edges.persist()
    labels = e.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(iters):
        counted = (
            e.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counted.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("lbl"))).alias("m"))
            .select("node", F.col("m.lbl").alias("lbl"))
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    e.unpersist()
    return labels


def lpa_sql_ctes(edges_cte: str, iters: int = 2) -> str:
    """DuckDB oracle: the same synchronous min-tiebreak propagation,
    unrolled.  ``edges_cte`` must define ``edges``(src, dst), both
    directions present."""
    parts = [
        edges_cte,
        "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"cnt{i} AS (SELECT e.src AS node, l.lbl, COUNT(*) AS c "
            f"FROM edges e JOIN l{i-1} l ON e.dst = l.node GROUP BY 1, 2)"
        )
        parts.append(
            f"l{i} AS (SELECT node, lbl FROM ("
            f"SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node "
            f"ORDER BY c DESC, lbl ASC) AS rk FROM cnt{i}) WHERE rk = 1)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, lbl FROM l{iters}"


def kcore_nodes(edges: DataFrame, k: int, iters: int = 8, checkpoint: bool = True) -> DataFrame:
    """k-core of an undirected graph by synchronous peeling: drop every
    node with degree < ``k`` (within the surviving subgraph), recompute,
    repeat ``iters`` supersteps.  ``edges`` must contain both directions
    of every undirected edge, columns (src, dst); returns ``(node,)``
    rows for the surviving set.

    Peeling is monotone (the alive set only shrinks), so a fixpoint is
    reached in at most |V| supersteps and typically a handful; callers
    verify convergence by checking one further peel is a no-op (see
    tests).  Deterministic — no ordering anywhere, so the oracle unrolls
    the same supersteps as SQL CTEs (:func:`kcore_sql_ctes`).

    Scale plan: each superstep = two semi-joins of the edge relation
    against the (shrinking, dim-sized) alive set + one degree count on
    src — the same one-shuffle skeleton as a PageRank superstep; edges
    persist across supersteps; lineage cut per superstep."""
    e = edges.persist()
    alive = e.select(F.col("src").alias("node")).distinct()
    for _ in range(iters):
        ea = e.join(
            alive.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
        deg = ea.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        if checkpoint:
            alive = alive.localCheckpoint(eager=False)
    if checkpoint:
        # materialize the peel WHILE the edge relation is still cached,
        # exactly like pagerank_int: unpersisting first (the old order)
        # dropped the cache before any action had ever filled it — the
        # persist was dead weight and every superstep's two semi-joins
        # recomputed the edge build at the caller's first action
        # (r11 fix; no-leak + lineage-cut contract pinned in
        # tests/test_round11_units.py)
        alive = alive.localCheckpoint(eager=True)
    e.unpersist()
    return alive


def kcore_sql_ctes(edges_cte: str, k: int, iters: int = 8) -> str:
    """DuckDB oracle: the same synchronous peeling, unrolled.
    ``edges_cte`` must define ``edges``(src, dst), both directions
    present.  Final relation: ``a{iters}``(node)."""
    parts = [
        edges_cte,
        "a0 AS (SELECT DISTINCT src AS node FROM edges)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS (SELECT e.src, COUNT(*) AS deg FROM edges e "
            f"JOIN a{i-1} s ON e.src = s.node "
            f"JOIN a{i-1} t ON e.dst = t.node GROUP BY e.src)"
        )
        parts.append(
            f"a{i} AS (SELECT src AS node FROM d{i} WHERE deg >= {k})"
        )
    return "WITH " + ",\n".join(parts)
