"""Graph analytics on relational data: PageRank over the nation trade
graph — the iterative-algorithm pattern (bounded loop of joins, cached
edge relation, integer-exact arithmetic) the engine uses wherever Spark
lacks a native primitive. Companion to the label-propagation connected
components in ``operators/dedup.py``.

The reference has no graph-compute surface (its knowledge graph is
driver-side NetworkX metadata, reference ``sap_knowledge_graph.py:95``);
this is the data-scale counterpart: the graph IS a query over the fact
tables, and each iteration is a broadcast join + one narrow aggregation.

Exactness across engines: ranks live in integer micro-units (SCALE =
1e12) and every step is integer multiply / integer floor-divide / integer
sum — associative and bit-identical on any plan, so a DuckDB oracle that
unrolls the same recurrence as chained CTEs hash-matches. (Float PageRank
would accumulate in nondeterministic order.) The recurrence is the
classic damped form r' = floor((15*base + 85*incoming)/100) with
per-edge contribution floor(r_src * w / out_w_src); dangling-node mass
and the last-digit floor residue are deliberately dropped — the oracle
states the identical recurrence, so the gate pins the semantics.

Overflow headroom: the per-edge product r_src * w computes in
DECIMAL(38,0) on both engines (Spark DECIMAL div / DuckDB HUGEINT //)
before the integral divide, so edge weights up to ~1e26 are exact — no
sf-bound on the BIGINT path (the same headroom move
``quantity_price_corr`` makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import cache_eager
from ..sources.loader import table

PR_SCALE = 1_000_000_000_000  # integer micro-rank units (1e12)
PR_ITERATIONS = 3
PR_DAMP_NUM = 85  # damping 0.85 as an integer percentage
PR_N_NATIONS = 25  # teleport base = PR_SCALE / 25, exact


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): customer-nation -> supplier-nation, weighted by
    lineitem count. The TRUE dims (customer, supplier) broadcast;
    lineitem ⋈ orders is fact ⋈ fact and is left to AQE — both sides
    shuffle on the order key (the classic co-shuffle), or AQE flips it
    to broadcast when the orders projection is genuinely small. A forced
    broadcast of orders (~150 GB at 100 TB posture) would OOM the
    executors. The only full-volume work is the lineitem scan + one
    (src, dst) aggregation (<= 625 groups)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_loop(
    nodes: DataFrame, edges: DataFrame, iterations: int, n_teleport: int
) -> DataFrame:
    """The iteration kernel, factored for planted-graph tests: ``nodes``
    is (node), ``edges`` is (src, dst, w); returns (node, pr) after
    ``iterations`` damped rounds with teleport base PR_SCALE/n_teleport."""
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges_n = cache_eager(edges.join(out_w, "src"))
    base = PR_SCALE // n_teleport
    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("pr"))
    for it in range(iterations):
        # fresh, per-iteration column names on both sides of each join:
        # ranks/contrib all descend from `nodes`, and re-joining shared
        # lineage by same-named attributes trips Spark's ambiguous-column
        # resolution for non-trivial node relations — renamed keys keep
        # the factored kernel robust for arbitrary callers
        rk = ranks.select(F.col("node").alias(f"__rk{it}"), "pr")
        contrib = (
            edges_n.join(F.broadcast(rk), edges_n["src"] == F.col(f"__rk{it}"))
            # DECIMAL(38,0) product before the integral divide: exact at
            # any edge weight (result <= pr, fits BIGINT after DIV)
            .select(
                "dst",
                F.expr("CAST(pr AS DECIMAL(38,0)) * w DIV out_w").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("incoming"))
            .select(F.col("dst").alias(f"__ct{it}"), "incoming")
        )
        # contrib is <= |V| rows — broadcast it; at web-scale graphs flip this
        # to a shuffled join keyed on node (the docstring's scale note)
        ranks = nodes.join(
            F.broadcast(contrib), nodes["node"] == F.col(f"__ct{it}"), "left"
        ).select(
            "node",
            F.expr(
                f"({100 - PR_DAMP_NUM} * CAST({base} AS BIGINT) "
                f"+ {PR_DAMP_NUM} * coalesce(incoming, CAST(0 AS BIGINT))) DIV 100"
            ).alias("pr"),
        )
    return ranks


def q_nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERATIONS rounds of damped PageRank over the nation trade graph.

    Scale shape: the edge relation (<= 625 rows here; <= |nations|^2
    always) is built once from the fact tables and eager-cached — at
    larger graphs (user-user, doc-link) the same loop runs with the rank
    relation shuffled on the join key instead of broadcast, and a
    checkpoint every few iterations truncates plan growth. Each iteration
    is: broadcast ranks into edges (map-side), aggregate contributions by
    dst (one narrow exchange over <= |V| groups), left-join back to the
    node set. The iteration count is bounded and the loop is driver-side
    Python over DataFrames — no collect of data, no RDDs."""
    edges = cache_eager(_trade_edges(spark, sf_dir))
    nations = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    ranks = pagerank_loop(nations.select("node"), edges, PR_ITERATIONS, PR_N_NATIONS)
    return (
        nations.join(F.broadcast(ranks), "node")
        .select(
            "n_name",
            F.col("pr").alias("pagerank_micro"),
            F.round(F.col("pr") / F.lit(float(PR_SCALE)), 8).alias("pagerank"),
        )
        .orderBy(F.col("pagerank_micro").desc(), F.col("n_name"))
    )


def _oracle_pagerank() -> str:
    base = PR_SCALE // PR_N_NATIONS
    d, t = PR_DAMP_NUM, 100 - PR_DAMP_NUM
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(({t} * CAST({base} AS BIGINT) + {d} * COALESCE(s.incoming, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(CAST(CAST(p.pr AS HUGEINT) * e.w // e.out_w AS BIGINT)) AS incoming
    FROM edges_n e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) s ON n.node = s.dst
)"""
        )
        prev = f"r{i}"
    return f"""
WITH edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
edges_n AS (
  SELECT e.*, o.out_w FROM edges e
  JOIN (SELECT src, sum(w) AS out_w FROM edges GROUP BY src) o USING (src)
),
nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
r0 AS (SELECT node, CAST({base} AS BIGINT) AS pr FROM nodes),
{",".join(iters)}
SELECT n.n_name,
       p.pr AS pagerank_micro,
       round(p.pr / {float(PR_SCALE)!r}, 8) AS pagerank
FROM nodes n JOIN {prev} p USING (node)
ORDER BY pagerank_micro DESC, n_name
"""


ORACLE_NATION_TRADE_PAGERANK = _oracle_pagerank()


QUERIES = {
    "nation_trade_pagerank": q_nation_trade_pagerank,
}

ORACLES = {
    "nation_trade_pagerank": ORACLE_NATION_TRADE_PAGERANK,
}
