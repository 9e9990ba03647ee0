"""Graph analytics over derived relational graphs: fixed-iteration
PageRank (Pregel-style join/agg loop).

Complements the connected-components operator used for near-dup
clustering (dedup/cluster.py) — together they pin the engine's
iterative-algorithm story: each iteration is a plain distributed
join + partial aggregation, with localCheckpoint truncating the
lineage so plans don't grow with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t

_DAMP = 0.85
_ITERS = 8


def _pagerank_oracle() -> str:
    its = []
    prev = "it0"
    for i in range(1, _ITERS + 1):
        its.append(f"""it{i} AS (
      SELECT nodes.n,
             {1 - _DAMP:.2f}/(SELECT n_nodes FROM nn)
               + {_DAMP}*COALESCE(SUM(p.pr*e.wn), 0) AS pr
      FROM nodes
      LEFT JOIN norm e ON e.dst = nodes.n
      LEFT JOIN {prev} p ON p.n = e.src
      GROUP BY 1
    )""")
        prev = f"it{i}"
    return f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*)::DOUBLE AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    norm AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS wn FROM edges
    ),
    nodes AS (
      SELECT DISTINCT src AS n FROM edges
      UNION SELECT DISTINCT dst AS n FROM edges
    ),
    nn AS (SELECT COUNT(*)::DOUBLE AS n_nodes FROM nodes),
    it0 AS (SELECT n, 1.0/(SELECT n_nodes FROM nn) AS pr FROM nodes),
    {",".join(its)}
    SELECT n AS nationkey, ROUND(pr, 6) AS pagerank FROM it{_ITERS}
    """


@query("nation_trade_pagerank", oracle=_pagerank_oracle())
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (edge
    customer-nation -> supplier-nation, weight = lineitem count),
    damping 0.85, 8 fixed iterations from a uniform start.

    Scale shape: the edge build is the expensive part — fact-table
    joins with broadcast dims, one groupBy on (src, dst) whose output
    is |V|^2-bounded. Each PageRank step is then
    ranks ⋈ edges → groupBy dst → left join nodes: a pair of shuffles
    sized O(|E|) / O(|V|), the Pregel pattern, independent of
    iteration count in memory because localCheckpoint cuts the
    lineage each round (same discipline as dedup/cluster.py's label
    propagation). Edge normalization is a per-src window over the
    edge aggregate, not over facts. The oracle unrolls the same 8
    iterations as chained CTEs.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    wsrc = Window.partitionBy("src")
    # |V|²-bounded frames: coalesce to ONE partition so each of the 8
    # iterations schedules 1 task per stage instead of 32 empties —
    # the iteration loop is scheduler-bound, not data-bound, at any
    # graph size that fits a nation-level rollup. (A billion-edge
    # graph would instead keep E partitioned and this coalesce out.)
    norm = edges.select(
        "src", "dst", (F.col("w") / F.sum("w").over(wsrc)).alias("wn")
    ).coalesce(1).persist()
    nodes = (
        norm.select(F.col("src").alias("n"))
        .union(norm.select(F.col("dst").alias("n")))
        .distinct()
        .coalesce(1)
        .persist()
    )
    n_nodes = float(nodes.count())
    ranks = nodes.select("n", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(_ITERS):
        contrib = (
            ranks.join(norm, ranks.n == norm.src)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("wn")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.n == F.col("dst"), "left")
            .select(
                "n",
                (
                    F.lit((1 - _DAMP) / n_nodes)
                    + F.lit(_DAMP) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("n").alias("nationkey"), F.round("pr", 6).alias("pagerank")
    )
