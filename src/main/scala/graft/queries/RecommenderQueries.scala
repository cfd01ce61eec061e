package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Drift, Recommender, Tables}

/** Recommendation and model-monitoring tier: item-item CF neighbors
  * and the PSI drift screen. */
object RecommenderQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def specs: Seq[QuerySpec] = Seq(

    // Item-item cosine neighbors over customer co-purchase baskets
    // (basket = customer, item = part): top-3 neighbors per part.
    // Basket-local pair generation with the maxBasket power-user cap.
    QuerySpec("q_item_cf", (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val baskets = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("b"), col("l_partkey").as("i"))
      Recommender.itemNeighbors(baskets, "b", "i", k = 3,
          maxBasket = 1000, minSupport = 2)
        .orderBy("item", "rank")
    }, Some(
      """WITH inc AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey AS b, l_partkey AS i
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |kept AS MATERIALIZED (
        |  SELECT b, i FROM inc
        |  WHERE b IN (SELECT b FROM inc GROUP BY b
        |              HAVING COUNT(*) <= 1000)),
        |ni AS (SELECT i, COUNT(*) AS n FROM kept GROUP BY i),
        |co AS (
        |  SELECT a.i AS i, c.i AS j, COUNT(*) AS c
        |  FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |scored AS MATERIALIZED (
        |  SELECT co.i, co.j, c,
        |         ROUND(CAST(c AS DOUBLE)
        |               / SQRT(CAST(n1.n AS DOUBLE)
        |                      * CAST(n2.n AS DOUBLE)), 8) AS cos
        |  FROM co JOIN ni n1 ON n1.i = co.i JOIN ni n2 ON n2.i = co.j),
        |sym AS (
        |  SELECT i, j, c, cos FROM scored
        |  UNION ALL SELECT j, i, c, cos FROM scored),
        |ranked AS (
        |  SELECT i AS item, j AS neighbor, c AS co_count, cos,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY i
        |                ORDER BY cos DESC, j) AS BIGINT) AS rank
        |  FROM sym)
        |SELECT item, neighbor, co_count, cos, rank FROM ranked
        |WHERE rank <= 3 ORDER BY item, rank""".stripMargin)),

    // PSI drift of the order-value distribution, reference = pre-1998
    // orders (testdata spans 1995-2001), bins at the reference deciles — the scorecard-standard
    // population-shift screen.
    QuerySpec("q_psi_drift", (s, dir) => {
      Drift.psiBins(t(s, dir, "orders"), "o_totalprice",
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
          bins = 10)
        .orderBy("bin")
    }, Some {
      val cutCols = (1 to 9).map(i =>
        s"quantile_cont(x, 0.$i) AS c$i").mkString(", ")
      val binExpr = (1 to 9).map(i =>
        s"(CASE WHEN x > c$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH base AS (
         |  SELECT CAST(o_totalprice AS DOUBLE) AS x,
         |         o_orderdate < TIMESTAMP '1998-01-01' AS is_ref
         |  FROM orders
         |  WHERE o_totalprice IS NOT NULL
         |    AND (o_orderdate < TIMESTAMP '1998-01-01') IS NOT NULL),
         |cuts AS (SELECT $cutCols FROM base WHERE is_ref),
         |binned AS (
         |  SELECT is_ref, CAST($binExpr AS BIGINT) AS bin
         |  FROM base CROSS JOIN cuts),
         |counts AS (
         |  SELECT bin,
         |         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_ref,
         |         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
         |           AS n_cur
         |  FROM binned GROUP BY bin),
         |tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
         |               CAST(SUM(n_cur) AS BIGINT) AS tc FROM counts)
         |SELECT bin, n_ref, n_cur,
         |       ROUND(GREATEST(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE),
         |                      CAST(0.0001 AS DOUBLE)), 8) AS p,
         |       ROUND(GREATEST(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE),
         |                      CAST(0.0001 AS DOUBLE)), 8) AS q,
         |       ROUND((GREATEST(CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE),
         |                       CAST(0.0001 AS DOUBLE))
         |              - GREATEST(CAST(n_cur AS DOUBLE)
         |                         / CAST(tc AS DOUBLE),
         |                         CAST(0.0001 AS DOUBLE)))
         |             * ROUND(LN(GREATEST(CAST(n_ref AS DOUBLE)
         |                                 / CAST(tr AS DOUBLE),
         |                                 CAST(0.0001 AS DOUBLE))
         |                        / GREATEST(CAST(n_cur AS DOUBLE)
         |                                   / CAST(tc AS DOUBLE),
         |                                   CAST(0.0001 AS DOUBLE))), 8),
         |             8) AS contrib
         |FROM counts CROSS JOIN tot ORDER BY bin""".stripMargin
    })
  )
}
