package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-predictor logistic regression by iteratively reweighted least
  * squares (IRLS — the canonical GLM fit), as a FIXED number of unrolled
  * closed-form rounds, so the DuckDB oracle can replay the whole solve
  * (the q_ols_multi/q_pca_project precedent).
  *
  * Each round is ONE aggregation pass: per-row η = β₀ + β₁x, μ =
  * σ(η), w = μ(1−μ), working response z = η + (y−μ)/w, then the 2×2
  * weighted normal equations solve in closed form (Cramer). β updates
  * round to the 8dp grid between rounds.
  *
  * Determinism: x and y are exact; η is the shared IEEE expression;
  * σ(η) is the ONE transcendental — its result rounds to the 6dp grid
  * at birth (coarser than the house 8dp ln rule: with corpus-scale row
  * counts the probability of an exp() landing within a cross-libm ulp
  * of a ROUNDING boundary scales with rows×rounds, and 6dp buys 100×
  * margin at zero statistical cost), μ clamps to (ε, 1−ε) so w > 0,
  * every per-row moment term rounds to 8dp and sums in DECIMAL, and
  * the β solve is a scalar double formula rounded to 8dp.
  *
  * Shape: `iters` aggregation passes over the data (no joins — β is a
  * broadcast scalar row), map-side partials throughout — the textbook
  * distributed-GLM shape. */
object Glm {

  def logisticIrls(df: DataFrame, yCol: Column, xCol: Column,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters")
    val base = df.select(yCol.cast("double").as("y"),
      xCol.cast("double").as("x"))
      .where(col("y").isNotNull && col("x").isNotNull)

    def d28(c: Column): Column = round(c, 8).cast("decimal(28,8)")

    var beta = base.sparkSession.range(1)
      .select(lit(0.0).as("b0"), lit(0.0).as("b1"))
    for (_ <- 1 to iters) {
      val eta = col("b0") + col("b1") * col("x")
      val mu0 = round(lit(1.0) / (lit(1.0) + exp(-eta)), 6)
      val mu = least(greatest(mu0, lit(1e-6)), lit(1.0 - 1e-6))
      val w = round(mu * (lit(1.0) - mu), 6)
      val z = eta + (col("y") - mu) / w
      val m = base.crossJoin(broadcast(beta)).agg(
        count(lit(1)).as("n"),
        sum(d28(w)).as("sw"),
        sum(d28(w * col("x"))).as("swx"),
        sum(d28(w * col("x") * col("x"))).as("swxx"),
        sum(d28(w * z)).as("swz"),
        sum(d28(w * col("x") * z)).as("swxz"))
      val (sw, swx, swxx, swz, swxz) = (col("sw").cast("double"),
        col("swx").cast("double"), col("swxx").cast("double"),
        col("swz").cast("double"), col("swxz").cast("double"))
      val det = sw * swxx - swx * swx
      // b1 rounds to the grid FIRST and the rounded value feeds b0 —
      // one unambiguous association order for the oracle to mirror
      beta = m.select(col("n"), col("sw"), col("swx"), col("swz"),
          round((sw * swxz - swx * swz) / det, 8).as("b1"))
        .select(col("n"),
          round((col("swz").cast("double") -
            col("b1") * col("swx").cast("double")) /
            col("sw").cast("double"), 8).as("b0"),
          col("b1"))
    }
    beta
  }
}
