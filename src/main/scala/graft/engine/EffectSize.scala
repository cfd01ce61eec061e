package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Effect sizes and interval estimates — the "how big, not just how
  * unlikely" layer the test tier (t/U/KS/ANOVA) needs beside it:
  * Cohen's d (with the Hedges small-sample correction), the Wilson
  * score interval for proportions, and Tukey-style pairwise
  * standardized differences after ANOVA.
  *
  * All from per-group DECIMAL moment aggregations; scalar formulas are
  * shared expression trees rounded to the 8dp grid (the q_anova
  * discipline).
  */
object EffectSize {

  /** Cohen's d between the `a` and `b` populations of `sample` within
    * each `label` group, pooled-SD form, plus Hedges' g (the
    * J-corrected small-sample version, J = 1 − 3/(4(n₁+n₂)−9)).
    * Output: label, n1, n2, d (8dp), g (8dp; NULL on degenerate
    * pooled variance). */
  def cohensD(df: DataFrame, label: String, value: String,
      sample: String, a: String, b: String): DataFrame = {
    val x = col(value).cast("decimal(18,2)")
    val base = df.where(col(value).isNotNull)
      .filter(col(sample).isin(a, b))
      .select(col(label).as("lbl"), (col(sample) === lit(a)).as("is_a"),
        x.as("x"))
    val m = base.groupBy(col("lbl")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("is_a"), col("x"))).as("s1"),
      sum(when(col("is_a"), col("x") * col("x"))).as("ss1"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("n2"),
      sum(when(!col("is_a"), col("x"))).as("s2"),
      sum(when(!col("is_a"), col("x") * col("x"))).as("ss2"))
    def d(c: String) = col(c).cast("double")
    val (n1, n2) = (d("n1"), d("n2"))
    val mean1 = d("s1") / n1
    val mean2 = d("s2") / n2
    val v1 = (n1 * d("ss1") - d("s1") * d("s1")) / (n1 * (n1 - 1.0))
    val v2 = (n2 * d("ss2") - d("s2") * d("s2")) / (n2 * (n2 - 1.0))
    val pooled = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
    val cd = (mean1 - mean2) / sqrt(pooled)
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * (n1 + n2) - 9.0)
    m.select(col("lbl").as(label), col("n1"), col("n2"),
      when(col("n1") > 1 && col("n2") > 1 && pooled > 0.0,
        round(cd, 8)).as("d"),
      when(col("n1") > 1 && col("n2") > 1 && pooled > 0.0,
        round(cd * j, 8)).as("g"))
  }

  /** Wilson score interval (Wilson 1927) for a per-group proportion at
    * z — the binomial CI that behaves at extreme rates and small n
    * (the Wald interval's failure mode). Output: group, n, successes,
    * rate, ci_lo, ci_hi (8dp). */
  def wilsonCi(df: DataFrame, groupCol: String, successCol: Column,
      z: Double = 1.96): DataFrame = {
    val m = df.select(col(groupCol).as("g"),
        successCol.cast("long").as("s"))
      .where(col("s").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("k"))
    val nd = col("n").cast("double")
    val p = col("k").cast("double") / nd
    val z2 = z * z
    val denom = lit(1.0) + lit(z2) / nd
    val center = (p + lit(z2) / (nd * 2.0)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nd +
      lit(z2) / (lit(4.0) * nd * nd)) / denom
    m.select(col("g").as(groupCol), col("n"), col("k").as("successes"),
      round(p, 8).as("rate"),
      when(col("n") > 0, round(center - half, 8)).as("ci_lo"),
      when(col("n") > 0, round(center + half, 8)).as("ci_hi"))
  }

  /** Tukey-style pairwise comparison after one-way ANOVA: for every
    * group pair, the mean difference and the studentized statistic
    * q = |Δ| / sqrt(MSW/2 · (1/n₁ + 1/n₂)) against the pooled
    * within-group variance — which pairs drive a significant F. The
    * group-moment table is k rows, so the pair stage is k²-bounded
    * (label cardinality, never data). Output: g1 < g2, n1, n2,
    * diff (8dp), q_stat (8dp; NULL when MSW = 0). */
  def tukeyPairs(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val x = col(valueCol).cast("decimal(18,2)")
    val g = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(x).as("sg"),
        sum(x * x).as("ssg"))
    // MSW from the same grid-summed terms as anovaOneWay
    val term = round(col("sg").cast("double") * col("sg").cast("double") /
      col("ng").cast("double"), 8).cast("decimal(28,8)")
    val tot = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("ssg")).as("ss"), sum(term).as("t"))
    val msw = (col("ss").cast("double") - col("t").cast("double")) /
      (col("n").cast("double") - col("k").cast("double"))
    val withMsw = tot.select(col("k"), col("n"), msw.as("msw"))

    val a = g.select(col("g").as("g1"), col("ng").as("n1"),
      col("sg").as("s1"))
    val b = g.select(col("g").as("g2"), col("ng").as("n2"),
      col("sg").as("s2"))
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    val diff = col("s1").cast("double") / n1 -
      col("s2").cast("double") / n2
    val se = sqrt(col("msw") / 2.0 * (lit(1.0) / n1 + lit(1.0) / n2))
    a.join(b, col("g1") < col("g2"))
      .crossJoin(broadcast(withMsw))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        round(diff, 8).as("diff"),
        when(col("msw") > 0.0, round(abs(diff) / se, 8)).as("q_stat"))
      .orderBy("g1", "g2")
  }
}
