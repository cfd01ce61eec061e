package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population Stability Index — the model-monitoring drift screen
  * (banking-scorecards standard; the tabular complement of the corpus
  * JSD drift in [[graft.llm.TextAnalysis]]):
  *
  *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
  *
  * with p from the REFERENCE population and q from the CURRENT one,
  * over bins cut at the reference deciles (so p_i ≈ 1/bins by
  * construction and drift shows up purely in q). <0.1 stable,
  * 0.1–0.25 moderate, >0.25 major shift — the usual reading.
  */
object Drift {

  /** Per-bin PSI contributions of `valueCol`, reference vs current rows
    * split by `isRef`. Bin edges are the reference population's exact
    * interpolated percentiles (broadcast scalar row — the RFM/quantile-
    * buckets convention); proportions clip at `eps` before the log so
    * empty bins contribute the standard capped penalty instead of ±∞.
    * Determinism: bin assignment compares the value against the shared
    * edge doubles; proportions are exact count ratios; ln rounds to the
    * 8dp grid and the contribution rounds again after the rational
    * factor (the BM25 rule). Both populations must be NON-EMPTY — an
    * empty reference makes the screen meaningless and fails loudly
    * (ANSI division) rather than reporting eps-floored noise. Output:
    * bin, n_ref, n_cur, p, q, contrib — Σ contrib is the PSI. */
  def psiBins(df: DataFrame, valueCol: String, isRef: Column,
      bins: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins=$bins")
    val x = col(valueCol).cast("double")
    // listwise-null discipline on the PREDICATE too: a NULL isRef row
    // belongs to neither population (when(!is_ref) would silently count
    // it as ref=0 AND cur=0 here while a SQL CASE ELSE counts it as
    // current — the exact engine/oracle divergence ADVICE r3 flagged)
    val base = df.where(col(valueCol).isNotNull && isRef.isNotNull)
      .select(x.as("x"), isRef.as("is_ref"))
    val probs = (1 until bins).map(_.toDouble / bins)
    val cuts = base.where(col("is_ref"))
      .agg(percentile(col("x"), typedlit(probs)).as("cuts"))
    // bin = number of edges the value exceeds (edges ascending; ties go
    // LEFT: value == edge stays in the lower bin on both engines)
    val binned = base.crossJoin(broadcast(cuts))
      .select(col("is_ref"),
        aggregate(col("cuts"), lit(0L),
          (acc, e) => acc + when(col("x") > e, 1L).otherwise(0L))
          .as("bin"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    val p = greatest(col("n_ref").cast("double") / col("tr").cast("double"),
      lit(eps))
    val q = greatest(col("n_cur").cast("double") / col("tc").cast("double"),
      lit(eps))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(p, 8).as("p"), round(q, 8).as("q"),
        round((p - q) * round(log(p / q), 8), 8).as("contrib"))
  }

  /** PSI of a batch against FIXED reference bins — the streaming form:
    * `edges` (ascending cuts) and `refProps` (per-bin reference
    * proportions, edges.length + 1 of them) are computed ONCE from the
    * reference population and reused per batch, so each micro-batch
    * costs one aggregation over its own rows. Same eps-clip and
    * 8dp-ln-grid contributions as [[psiBins]]. An EMPTY batch returns
    * zero rows (nothing to monitor — the caller's alert logic decides).
    * Output: bin, n_cur, p, q, contrib. */
  def psiAgainstReference(batch: DataFrame, valueCol: String,
      edges: Seq[Double], refProps: Seq[Double],
      eps: Double = 1e-4): DataFrame = {
    require(refProps.length == edges.length + 1,
      s"need ${edges.length + 1} reference proportions")
    val x = col(valueCol).cast("double")
    val binExpr = edges.zipWithIndex
      .map { case (e, _) => when(x > e, 1L).otherwise(0L) }
      .reduce(_ + _)
    val observed = batch.where(col(valueCol).isNotNull)
      .select(binExpr.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_obs"))
    // EVERY reference bin reports — a bin the batch never hits carries
    // the LARGEST drift penalty ((p−eps)·ln(p/eps)); emitting only
    // observed bins would under-report exactly the severe shifts
    val spark = batch.sparkSession
    import spark.implicits._
    val allBins = refProps.zipWithIndex
      .map { case (pr, i) => (i.toLong, pr) }.toDF("bin", "p_ref")
    val counts = allBins.join(observed, Seq("bin"), "left")
      .select(col("bin"), col("p_ref"),
        coalesce(col("n_obs"), lit(0L)).as("n_cur"))
    val tot = counts.agg(sum(col("n_cur")).as("tc"))
    val p = greatest(col("p_ref"), lit(eps))
    val q = greatest(
      when(col("tc") > 0,
        col("n_cur").cast("double") / col("tc").cast("double"))
        .otherwise(lit(0.0)), lit(eps))
    counts.crossJoin(broadcast(tot))
      .where(col("tc") > 0) // empty batch → zero rows, not eps noise
      .select(col("bin"), col("n_cur"),
        round(p, 8).as("p"), round(q, 8).as("q"),
        round((p - q) * round(log(p / q), 8), 8).as("contrib"))
  }
}
