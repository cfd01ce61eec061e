package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed SUM/COUNT aggregates — the
  * "never rescan the base" tier of the warehouse stack (Blakeley et al.,
  * SIGMOD 1986; the Δ-propagation shape DBSP/Materialize generalize).
  *
  * A maintained aggregate (n, Σm per measure, per key) is a group
  * homomorphism of the base multiset, so a CDC delta — rows tagged with
  * multiplicity +1 (insert) / −1 (delete); an update is a −1/+1 pair —
  * folds in WITHOUT touching base rows:
  *
  *   agg(base ⊎ Δ) = agg(base) ⊕ agg(Δ),  ⊕ = per-key componentwise add.
  *
  * At 100 TB this is the difference between a full-corpus scan per
  * refresh and work proportional to the CHANGE: the delta pass costs one
  * aggregation of the batch, and the merge costs one join whose left
  * side is GROUP-cardinality, not row-cardinality. (AVG et al. derive
  * from (n, Σ); MIN/MAX are NOT self-maintainable under deletes and are
  * deliberately out of scope.)
  *
  * Sums accumulate in DECIMAL (exact, associative) so a maintained
  * aggregate is bit-identical to a full recompute — which is exactly
  * what the oracle checks.
  */
object Ivm {

  /** Aggregate a CDC delta: per key, `dn` = Σ mult and `dsum_<m>` =
    * Σ mult·m for each measure. `multCol` must be +1/−1 (guarded
    * in-plan: any other multiplicity is a malformed CDC feed). */
  def deltaAgg(delta: DataFrame, keyCols: Seq[String], multCol: String,
      measureCols: Seq[String], scale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty && measureCols.nonEmpty,
      "keyCols and measureCols must be non-empty")
    val m = when(col(multCol) === 1 || col(multCol) === -1, col(multCol))
      .otherwise(raise_error(concat(lit(s"ivm: $multCol must be +1/-1, got "),
        col(multCol).cast("string")))).cast("long")
    val aggs = sum(m).as("dn") +: measureCols.map(c =>
      sum(m * col(c).cast(s"decimal(18,$scale)"))
        .cast(s"decimal(38,$scale)").as(s"dsum_$c"))
    delta.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a delta aggregate (from [[deltaAgg]]) into the maintained
    * aggregate (keys, `n`, `sum_<m>`). Groups whose count reaches 0 are
    * dropped (fully-deleted group) — but only after checking the merged
    * sums also netted to 0: a zero count with residual sum means an
    * over-delete was masked by a same-batch insert, and silently
    * swallowing it would lose that insert (review-found). A count going
    * NEGATIVE — deletes for rows the base never had — raises likewise.
    * The key join is NULL-SAFE (`<=>`): `fullAgg` itself emits null-key
    * groups, and a plain equi-join would orphan their deltas into
    * spurious negative-count errors or duplicate group rows
    * (review-found). One full-outer join; both sides group-cardinality. */
  def applyDelta(baseAgg: DataFrame, deltaAggDf: DataFrame,
      keyCols: Seq[String], measureCols: Seq[String],
      scale: Int = 2): DataFrame = {
    val b = baseAgg.select(
      keyCols.map(k => col(k).as(s"__bk_$k")) ++
        (col("n") +: measureCols.map(c => col(s"sum_$c"))): _*)
    val d = deltaAggDf.select(
      keyCols.map(k => col(k).as(s"__dk_$k")) ++
        (col("dn") +: measureCols.map(c => col(s"dsum_$c"))): _*)
    val cond = keyCols.map(k => col(s"__bk_$k") <=> col(s"__dk_$k"))
      .reduce(_ && _)
    val keyOut = keyCols.map(k =>
      coalesce(col(s"__bk_$k"), col(s"__dk_$k")).as(k))
    val keyStr = concat_ws("|", keyCols.map(k =>
      coalesce(col(s"__bk_$k"), col(s"__dk_$k")).cast("string")): _*)
    val n2 = coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))
    // merged sums normalized to DECIMAL(38,scale): still exact, and the
    // view's schema is STABLE across maintenance rounds (unnormalized,
    // Spark widens decimal precision per addition and a long-lived
    // maintained view would drift schemas batch over batch)
    val merged = measureCols.map { c =>
      (coalesce(col(s"sum_$c"), lit(0)) + coalesce(col(s"dsum_$c"), lit(0)))
        .cast(s"decimal(38,$scale)")
    }
    val residual = merged.map(_ =!= lit(0)).reduce(_ || _)
    val outSums = merged.zip(measureCols).map { case (m, c) => m.as(s"sum_$c") }
    b.join(d, cond, "full_outer")
      .withColumn("__n2",
        when(n2 < 0, raise_error(concat(
          lit("ivm: negative count for key "), keyStr)))
          .when(n2 === 0 && residual, raise_error(concat(
            lit("ivm: zero count with nonzero residual sum for key "),
            keyStr)))
          .otherwise(n2))
      .where(col("__n2") > 0)
      .select(keyOut ++ (col("__n2").as("n") +: outSums): _*)
  }

  /** Full-recompute aggregate of a base table — the shape `applyDelta`
    * maintains, used to INITIALIZE the view (and by tests/oracles to
    * prove maintained == recomputed). */
  def fullAgg(base: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String], scale: Int = 2): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n") +:
      measureCols.map(c =>
        sum(col(c).cast(s"decimal(18,$scale)"))
          .cast(s"decimal(38,$scale)").as(s"sum_$c"))
    base.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
