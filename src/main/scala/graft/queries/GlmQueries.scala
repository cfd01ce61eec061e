package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Glm, Tables}

/** GLM fitting as unrolled closed-form rounds: logistic regression via
  * IRLS (the q_ols_multi family, one rung up the model ladder). */
object GlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The shared (y, x) construction of the logistic fit: y = 1 iff
    * returnflag 'R', x = extended price scaled to ~[0, 1]. */
  private[queries] def logregBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      (col("l_returnflag") === "R").cast("int").cast("double").as("y"),
      (col("l_extendedprice").cast("decimal(18,2)").cast("double") /
        lit(100000.0)).as("x"))
      .where(col("y").isNotNull && col("x").isNotNull)

  def specs: Seq[QuerySpec] = Seq(

    // P(returnflag = 'R') as a logistic function of order value —
    // 3 IRLS rounds, each one aggregation pass; the oracle replays
    // every round (6dp sigmoid grid, 8dp term grid, Cramer solve).
    QuerySpec("q_logreg_irls", (s, dir) => {
      Glm.logisticIrls(t(s, dir, "lineitem"),
        (col("l_returnflag") === "R").cast("int"),
        col("l_extendedprice").cast("decimal(18,2)").cast("double") /
          lit(100000.0),
        iters = 3)
    }, Some(
      s"""WITH $irlsOracleCtes
         |SELECT n, b0, b1 FROM beta3""".stripMargin))
  )

  /** Everything up to `beta3` — the 3-round IRLS replay as a WITH-list
    * fragment, shared with the calibration oracle. */
  private[queries] val irlsOracleCtes: String = {
      val eps = "CAST(0.000001 AS DOUBLE)"
      val one = "CAST(1.0 AS DOUBLE)"
      def roundCte(k: Int): String = {
        val prev = s"beta${k - 1}"
        val eta = "(b0 + b1 * x)"
        val mu0 = s"ROUND($one / ($one + EXP(-$eta)), 6)"
        val mu = s"LEAST(GREATEST($mu0, $eps), $one - $eps)"
        s"""p$k AS (
           |  SELECT x, y, $eta AS eta, $mu AS mu
           |  FROM base CROSS JOIN $prev),
           |q$k AS (
           |  SELECT x, y, eta, mu, ROUND(mu * ($one - mu), 6) AS w
           |  FROM p$k),
           |r$k AS (
           |  SELECT x, w, eta + (y - mu) / w AS z FROM q$k),
           |m$k AS (
           |  SELECT COUNT(*) AS n,
           |         SUM(CAST(ROUND(w, 8) AS DECIMAL(28,8))) AS sw,
           |         SUM(CAST(ROUND(w * x, 8) AS DECIMAL(28,8))) AS swx,
           |         SUM(CAST(ROUND(w * x * x, 8) AS DECIMAL(28,8)))
           |           AS swxx,
           |         SUM(CAST(ROUND(w * z, 8) AS DECIMAL(28,8))) AS swz,
           |         SUM(CAST(ROUND(w * x * z, 8) AS DECIMAL(28,8)))
           |           AS swxz
           |  FROM r$k),
           |s$k AS (
           |  SELECT n, CAST(sw AS DOUBLE) AS sw, CAST(swx AS DOUBLE)
           |           AS swx, CAST(swxx AS DOUBLE) AS swxx,
           |         CAST(swz AS DOUBLE) AS swz, CAST(swxz AS DOUBLE)
           |           AS swxz
           |  FROM m$k),
           |t$k AS (
           |  SELECT n, sw, swx, swz,
           |         ROUND((sw * swxz - swx * swz)
           |               / (sw * swxx - swx * swx), 8) AS b1
           |  FROM s$k),
           |beta$k AS (
           |  SELECT n, ROUND((swz - b1 * swx) / sw, 8) AS b0, b1
           |  FROM t$k)""".stripMargin
      }
      val rounds = (1 to 3).map(roundCte).mkString(",\n")
      s"""base AS (
         |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
         |              AS DOUBLE) AS y,
         |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
         |           / CAST(100000.0 AS DOUBLE) AS x
         |  FROM lineitem
         |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
         |beta0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0,
         |                 CAST(0.0 AS DOUBLE) AS b1),
         |$rounds""".stripMargin
  }
}
