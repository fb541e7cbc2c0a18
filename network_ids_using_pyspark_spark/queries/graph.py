"""Graph analytics over the star schema's implicit trade graph.

The reference has no graph surface at all; an IDS-adjacent engine needs
one (beaconing detection, lateral-movement scoring, and — on the
LLM-data side — domain authority weighting for crawl prioritization are
all PageRank-shaped).  Nodes are customers and suppliers, edges are
"traded with" (distinct customer–supplier pairs observed through
orders⋈lineitem), fed undirected so no rank mass dangles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.graphops import pagerank_int, pagerank_sql_ctes
from ..sources.tables import load_table
from . import register

_TOPK = 50

_EDGES_CTE = """edges0 AS (
  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT src, dst FROM edges0
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges0
)"""

_PAGERANK_SQL = f"""
SELECT node, rank FROM (
  {pagerank_sql_ctes(_EDGES_CTE, iters=3)}
) ranked
ORDER BY rank DESC, node ASC
LIMIT {_TOPK}
"""


@register("pagerank_trade_graph", _PAGERANK_SQL)
def q_pagerank_trade_graph(spark, sf_dir):
    """Top-{50} nodes of the customer–supplier trade graph by integer
    PageRank (3 supersteps, 0.85 damping — see operators/graphops.py
    for the exact-arithmetic design and the 100 TB superstep plan).

    The edge list is built once (distinct pair extraction = one
    shuffle), each superstep is one more shuffle on dst, and the final
    top-k is TakeOrderedAndProject.  Ties broken by node id for a
    total order."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank_int(edges, iters=3)
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(_TOPK)


_SEED = "c0"
_MAX_DEPTH = 2

_BFS_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
reach(node, depth) AS (
  SELECT '{_SEED}' AS node, 0 AS depth
  UNION ALL
  SELECT e.dst AS node, r.depth + 1 AS depth
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < {_MAX_DEPTH}
)
SELECT first_depth, COUNT(*) AS n_nodes FROM (
  SELECT node, MIN(depth) AS first_depth FROM reach GROUP BY node
) d
GROUP BY first_depth
"""


@register("recursive_bfs_reachability", _BFS_SQL)
def q_recursive_bfs_reachability(spark, sf_dir):
    """WITH RECURSIVE (Spark 4 SQL surface): breadth-first reachability
    from one seed node of the trade graph, {_MAX_DEPTH} hops, reported
    as nodes-per-first-reach-depth.  The recursion is the declarative
    twin of operators/graphops.py's iterative join loop — same edges,
    planner-managed iteration instead of Python-driven supersteps.

    Scale note: the recursion is UNION ALL (path multiset), so the
    frontier is kept small by the depth bound and the final MIN(depth)
    dedup; unbounded reachability at 100 TB belongs to the superstep
    operator (`dedup_clusters` / `pagerank_int`) where each level is
    deduplicated before the next shuffle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges.createOrReplaceTempView("nids_bfs_edges")
    return spark.sql(f"""
      WITH RECURSIVE reach(node, depth) AS (
        SELECT '{_SEED}' AS node, 0 AS depth
        UNION ALL
        SELECT e.dst AS node, r.depth + 1 AS depth
        FROM reach r JOIN nids_bfs_edges e ON e.src = r.node
        WHERE r.depth < {_MAX_DEPTH}
      )
      SELECT first_depth, COUNT(*) AS n_nodes FROM (
        SELECT node, MIN(depth) AS first_depth FROM reach GROUP BY node
      ) d
      GROUP BY first_depth
    """)
