"""Graph analytics over the relational schema: weighted PageRank on
the nation-level trade graph.

Complements the iterative min-label connected components in
llm/dedup.py (q_llm_dedup_clusters) with the other canonical
fixed-point graph computation. The reference has no graph surface;
this is north-star extension territory, expressed as pure DataFrame
joins + aggregations so the per-iteration cost is one shuffle of the
edge list.

Exactness: PageRank is usually float — and float contributions sum in
nondeterministic order under parallel aggregation, so a naive version
can't hash-match an oracle. Here scores are SCALED INTEGERS
(initial 1e9 per node) and every step is integer arithmetic
(``(score * w) div out_w``, damping as ``150e6 + 85*sum div 100``):
associative, overflow-safe at fixture scale (< 2^63), and
bit-identical in Spark (`div`) and DuckDB (`//`). Three unrolled
iterations — the edge relation is reused, so Catalyst caches the
scan; at 100 TB each iteration is one shuffle-join keyed on src.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iceberg_workshop_spark.registry import register
from iceberg_workshop_spark.sources.tables import load

_P = "iws_gr_"

_PAGERANK = """
WITH edges AS (
  SELECT sn.n_nationkey AS src, cn.n_nationkey AS dst, COUNT(*) AS w
  FROM {t}lineitem l
  JOIN {t}orders o ON l.l_orderkey = o.o_orderkey
  JOIN {t}customer c ON o.o_custkey = c.c_custkey
  JOIN {t}supplier s ON l.l_suppkey = s.s_suppkey
  JOIN {t}nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN {t}nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY sn.n_nationkey, cn.n_nationkey
),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
s0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS score FROM nodes),
c1 AS (SELECT e.dst AS node,
              CAST(SUM((s.score * e.w) {div} o.ow) AS BIGINT) AS contrib
       FROM edges e JOIN s0 s ON s.node = e.src JOIN outw o ON o.src = e.src
       GROUP BY e.dst),
s1 AS (SELECT n.node,
              CAST(150000000 + (85 * COALESCE(c.contrib, 0)) {div} 100
                   AS BIGINT) AS score
       FROM nodes n LEFT JOIN c1 c ON c.node = n.node),
c2 AS (SELECT e.dst AS node,
              CAST(SUM((s.score * e.w) {div} o.ow) AS BIGINT) AS contrib
       FROM edges e JOIN s1 s ON s.node = e.src JOIN outw o ON o.src = e.src
       GROUP BY e.dst),
s2 AS (SELECT n.node,
              CAST(150000000 + (85 * COALESCE(c.contrib, 0)) {div} 100
                   AS BIGINT) AS score
       FROM nodes n LEFT JOIN c2 c ON c.node = n.node),
c3 AS (SELECT e.dst AS node,
              CAST(SUM((s.score * e.w) {div} o.ow) AS BIGINT) AS contrib
       FROM edges e JOIN s2 s ON s.node = e.src JOIN outw o ON o.src = e.src
       GROUP BY e.dst),
s3 AS (SELECT n.node,
              CAST(150000000 + (85 * COALESCE(c.contrib, 0)) {div} 100
                   AS BIGINT) AS score
       FROM nodes n LEFT JOIN c3 c ON c.node = n.node)
SELECT node AS nationkey, score AS pagerank_scaled
FROM s3 ORDER BY score DESC, node
"""


@register("q_graph_pagerank", oracle=_PAGERANK.format(t="", div="//"))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 iterations, damping 0.85) over the
    supplier-nation → customer-nation trade graph, in scaled-integer
    arithmetic so the fixed point is bit-identical across engines.
    The heavy part — building the edge list — is one pass over the
    fact table with broadcast dims; each iteration then joins the
    25-node score vector to the edge list (broadcast, no shuffle of
    edges at this node count)."""
    for n in ("lineitem", "orders", "customer", "supplier", "nation"):
        load(spark, sf_dir, n).createOrReplaceTempView(f"{_P}{n}")
    return spark.sql(_PAGERANK.format(t=_P, div=" div "))
