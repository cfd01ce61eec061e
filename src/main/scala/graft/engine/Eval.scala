package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Model-evaluation tier: classifier quality (confusion/P/R/F1), kNN
  * classification over embeddings, probability calibration, and the
  * two-proportion A/B z-test — the metrics layer that closes the loop
  * on the classifiers and scores the engine already produces
  * (NaiveBayes, Glm, Similarity).
  *
  * Every metric reduces to counts and exact-int ratios: one or two
  * key-group aggregations, ratios rounded to the 8dp grid at the end —
  * nothing here is row-scale on the output side.
  */
object Eval {

  /** Per-class precision / recall / F1 from (actual, predicted) rows.
    * Classes are the union of both sides (a class never predicted still
    * reports recall; a hallucinated class reports precision 0). NULL
    * metric where the denominator is 0. Output: class, support, tp, fp,
    * fn, precision, recall, f1 — ordered by class. */
  def confusionReport(preds: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val base = preds.select(col(actualCol).cast("string").as("a"),
      col(predCol).cast("string").as("p"))
    val cells = base.groupBy(col("a"), col("p"))
      .agg(count(lit(1)).as("n"))
    val classes = cells.select(col("a").as("cls"))
      .union(cells.select(col("p"))).distinct()
    val tp = cells.where(col("a") === col("p"))
      .select(col("a").as("cls"), col("n").as("tp"))
    val actual = cells.groupBy(col("a").as("cls"))
      .agg(sum(col("n")).as("support"))
    val predicted = cells.groupBy(col("p").as("cls"))
      .agg(sum(col("n")).as("n_pred"))
    val j = classes
      .join(tp, Seq("cls"), "left")
      .join(actual, Seq("cls"), "left")
      .join(predicted, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
    val prec = col("tp").cast("double") / col("n_pred").cast("double")
    val rec = col("tp").cast("double") / col("support").cast("double")
    j.select(col("cls"), col("support"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("support") - col("tp")).as("fn"),
        when(col("n_pred") > 0, round(prec, 8)).as("precision"),
        when(col("support") > 0, round(rec, 8)).as("recall"),
        when(col("n_pred") > 0 && col("support") > 0 &&
            (prec + rec) > 0.0,
          round(lit(2.0) * prec * rec / (prec + rec), 8)).as("f1"))
      .orderBy("cls")
  }

  /** kNN majority-vote classification over the embedding corpus
    * (leave-one-out: each vector is scored by its k nearest OTHER
    * vectors' labels; ties break toward the smaller label). Candidate
    * generation is [[Similarity.topKNeighbors]]'s exact tier — swap in
    * the ANN candidates at corpus scale, the vote is identical. The
    * argmax is a struct-max over (count, −label): exact integers, no
    * float in the vote. Output: id, actual, predicted, correct. */
  def knnClassify(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val labels = emb.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lbl"))
    val nbrs = Similarity.topKNeighbors(emb, idCol, vecCol, k)
      .select(col("id"), col("neighbor_id"))
      .join(labels.select(col("id").as("neighbor_id"),
        col("lbl").as("nlbl")), "neighbor_id")
    val votes = nbrs.groupBy(col("id"), col("nlbl"))
      .agg(count(lit(1)).as("cnt"))
    val pred = votes.groupBy(col("id"))
      .agg(max(struct(col("cnt"), (-col("nlbl")).as("neg"))).as("m"))
      .select(col("id"), (-col("m.neg")).as("predicted"))
    labels.join(pred, "id")
      .select(col("id"), col("lbl").as("actual"), col("predicted"),
        (col("lbl") === col("predicted")).as("correct"))
  }

  /** Reliability (calibration) bins: EQUAL-COUNT probability bins cut
    * at the score distribution's own percentiles (fixed-width bins
    * collapse when a weak model's scores cluster in one decile — the
    * quantile cut keeps resolution wherever the mass is, the standard
    * reliability-diagram practice), per bin the count, mean predicted
    * probability, observed positive rate, and the gap. Bin edges are
    * one broadcast percentile row (the PSI convention; duplicate edges
    * from tied scores merge bins — ≤ `bins` rows out). Mean-of-
    * probabilities sums EXACT micro units (p·1e6 as long), never raw
    * doubles (order-dependence). Output: bin, n, avg_pred, obs_rate,
    * gap. */
  def calibrationBins(scored: DataFrame, probCol: String, yCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins=$bins")
    val p = col(probCol).cast("double")
    // unscored rows (null p) and unlabeled rows drop — they would land
    // in bin 0 / inflate n while the micro-unit sum skips them
    val base = scored
      .where(col(probCol).isNotNull && col(yCol).isNotNull)
      .select(p.as("p"), col(yCol).cast("long").as("y"))
    val probs = (1 until bins).map(_.toDouble / bins)
    val cuts = base.agg(percentile(col("p"), typedlit(probs)).as("cuts"))
    val binned = base.crossJoin(broadcast(cuts))
      .select(
        aggregate(col("cuts"), lit(0L),
          (acc, e) => acc + when(col("p") > e, 1L).otherwise(0L))
          .as("bin"),
        // round before the cast: p·1e6 sits within an ulp of the
        // integer and a bare cast truncates the low side
        round(col("p") * 1000000).cast("long").as("p6u"), col("y"))
    binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p6u")).as("sp"),
        sum(col("y")).as("sy"))
      .select(col("bin"), col("n"),
        round(col("sp").cast("double") / lit(1000000.0) /
          col("n").cast("double"), 8).as("avg_pred"),
        round(col("sy").cast("double") / col("n").cast("double"), 8)
          .as("obs_rate"),
        round(col("sp").cast("double") / lit(1000000.0) /
          col("n").cast("double") -
          col("sy").cast("double") / col("n").cast("double"), 8)
          .as("gap"))
      .orderBy("bin")
  }

  /** Two-proportion z-test (pooled variance) between variants `a` and
    * `b`: the A/B conversion readout. All counts exact; the z formula
    * is one shared IEEE expression rounded to 8dp. Output one row:
    * n_a, conv_a, rate_a, n_b, conv_b, rate_b, lift, z. */
  def abTest(df: DataFrame, variantCol: Column, successCol: Column)
      : DataFrame = {
    val agg = df.select(variantCol.as("v"),
        successCol.cast("long").as("s"))
      .agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("v") === 0, col("s")).otherwise(0L)).as("conv_a"),
        sum(when(col("v") =!= 0, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("v") =!= 0, col("s")).otherwise(0L)).as("conv_b"))
    val (na, ca, nb, cb) = (col("n_a").cast("double"),
      col("conv_a").cast("double"), col("n_b").cast("double"),
      col("conv_b").cast("double"))
    val (pa, pb) = (ca / na, cb / nb)
    val pp = (ca + cb) / (na + nb)
    val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(col("n_a"), col("conv_a"), round(pa, 8).as("rate_a"),
      col("n_b"), col("conv_b"), round(pb, 8).as("rate_b"),
      when(pb > 0.0, round(pa / pb - 1.0, 8)).as("lift"),
      when(se > 0.0, round((pa - pb) / se, 8)).as("z"))
  }
}
