package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-governance audits: k-anonymity (privacy), functional-dependency
  * conformance (quality), and inclusion-dependency discovery (foreign-key
  * candidates) — the pre-flight screens a curation pipeline runs before
  * publishing a dataset, complementing the row-level [[Quality]] checks
  * with dataset-level structural ones.
  *
  * All three reduce to aggregations over key groups: map-side combinable,
  * one shuffle per audit, output sized by the audit (levels / candidate
  * pairs), never by rows.
  */
object Governance {

  /** k-anonymity generalization ladder over the quasi-identifier columns
    * (Sweeney 2002): level 0 groups by ALL of `qis`, each next level
    * drops the most specific (last) attribute — exactly `rollup(qis)`,
    * so the whole ladder is ONE pass with partial aggregation (the
    * grouping-sets Expand shape PlanSpec already locks elsewhere).
    *
    * Per level: distinct QI groups, the minimum group size (the
    * dataset's k at that generalization), rows in groups below `k`
    * (what a suppression release would drop), and the anonymous
    * fraction. Output: (level, n_groups, min_group, rows_below_k,
    * anon_frac) — level = the grouping_id bitmask (0 = full QI set;
    * each set bit = that attribute generalized away; rollup emits the
    * prefix ladder 0, 1, 3, 7, …). */
  def kAnonymity(df: DataFrame, qis: Seq[String], k: Int): DataFrame = {
    require(qis.nonEmpty && k >= 2, s"qis=$qis k=$k")
    val groups = df.rollup(qis.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        grouping_id().as("level"))
    groups.groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("cnt")).as("min_group"),
        sum(when(col("cnt") < k, col("cnt")).otherwise(lit(0L)))
          .as("rows_below_k"),
        sum(col("cnt")).as("n_rows"))
      .select(col("level"), col("n_groups"), col("min_group"),
        col("rows_below_k"),
        round(lit(1.0) - col("rows_below_k").cast("double") /
          col("n_rows").cast("double"), 8).as("anon_frac"))
      .orderBy(col("level"))
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2007 — the
    * attribute-disclosure complement of [[kAnonymity]]: group SIZE
    * protects identity, but a 50-row group whose rows all share one
    * sensitive value still discloses the attribute). Over the full
    * quasi-identifier grouping, reports group count, the minimum
    * distinct-sensitive count, groups and rows below `l`, and the
    * diverse row fraction.
    *
    * NULL sensitive values disclose nothing and are excluded from the
    * diversity count (a group with only NULLs reports diversity 0);
    * group row counts include every row. Two stacked aggregations, both
    * map-side combinable; the per-group exact distinct is group-bounded
    * state (the column-profile convention). Output one row: n_groups,
    * min_diversity, groups_below_l, rows_below_l, diverse_frac. */
  def lDiversity(df: DataFrame, qis: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qis.nonEmpty && l >= 2, s"qis=$qis l=$l")
    val groups = df.groupBy(qis.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col(sensitiveCol)).as("div"))
    groups.agg(
        count(lit(1)).as("n_groups"),
        min(col("div")).as("min_diversity"),
        sum(when(col("div") < l, 1L).otherwise(0L)).as("groups_below_l"),
        sum(when(col("div") < l, col("cnt")).otherwise(lit(0L)))
          .as("rows_below_l"),
        sum(col("cnt")).as("__n"))
      .select(col("n_groups"), col("min_diversity"),
        col("groups_below_l"), col("rows_below_l"),
        round(lit(1.0) - col("rows_below_l").cast("double") /
          col("__n").cast("double"), 8).as("diverse_frac"))
  }

  /** t-closeness audit for an ORDERED (numeric) sensitive attribute
    * (Li, Li & Venkatasubramanian 2007 — the distribution-disclosure
    * member of the privacy triad: [[kAnonymity]] guards group size,
    * [[lDiversity]] guards distinct counts, t-closeness guards how far
    * a group's sensitive DISTRIBUTION drifts from the table's): per
    * quasi-identifier group, the Earth Mover's Distance to the global
    * distribution under the ordered-distance ground metric, which
    * collapses to EMD = Σ_v |P_g(≤v) − P(≤v)| / (m−1) over the m-value
    * ordered domain.
    *
    * Exactness/scale: the cumulative difference is computed as the
    * INTEGER numerator cum_g·n − cum·n_g over the common denominator
    * n_g·n (DECIMAL(19,0) products — long c·n wraps at petabyte
    * cardinalities, the HHI lesson), summed exactly, divided once in
    * double on the 8dp grid. The value grid is (groups × domain) —
    * domain-sized windows (the RankStats discipline), never row-sized;
    * NULL sensitive values are excluded from both distributions.
    * Output per group: qi columns, n, emd, above_t. */
  def tCloseness(df: DataFrame, qis: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(qis.nonEmpty && t > 0.0 && t < 1.0, s"qis=$qis t=$t")
    // the sensitive value keys the domain in its NATIVE type — a
    // narrowing cast here would merge distinct fractional values
    // (collapsing a disclosed distribution to one point: an audit
    // false negative) and Spark truncates where DuckDB rounds
    val v = col(sensitiveCol)
    val base = df.where(v.isNotNull)
      .select(qis.map(col) :+ v.as("__v"): _*)
    val counts = base.groupBy(qis.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val domain = base.groupBy(col("__v")).agg(count(lit(1)).as("__gc"))
    val wDom = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllDom = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val globalCum = domain
      .withColumn("__cum", sum(col("__gc")).over(wDom))
      .withColumn("__m", count(lit(1)).over(wAllDom))
      .withColumn("__n", sum(col("__gc")).over(wAllDom))
      .select(col("__v"), col("__cum"), col("__m"), col("__n"))
    val groups = counts.groupBy(qis.map(col): _*)
      .agg(sum(col("__c")).as("__ng"))
    // full (group × domain) grid so absent cells carry cum forward
    val grid = groups.crossJoin(broadcast(globalCum.select(col("__v"))))
      .join(counts, qis :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
    val wGrp = Window.partitionBy(qis.map(col): _*)
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val cells = grid
      .withColumn("__cumg", sum(col("__c")).over(wGrp))
      .join(broadcast(globalCum), Seq("__v"))
      .withColumn("__num",
        abs(dec(col("__cumg")) * dec(col("__n")) -
          dec(col("__cum")) * dec(col("__ng"))))
    cells.groupBy((qis.map(col) :+ col("__ng") :+ col("__m")
        :+ col("__n")): _*)
      .agg(sum(col("__num")).as("__s"))
      .select(qis.map(col) ++ Seq(col("__ng").as("n"),
        // a single-valued domain (m = 1) means every distribution IS
        // the global one: EMD is exactly 0, not the 0/0 NaN the raw
        // formula would produce (NaN compares > t in Spark — every
        // group would spuriously flag)
        when(col("__m") > 1,
          round(col("__s").cast("double") /
            (col("__ng").cast("double") * col("__n").cast("double") *
              (col("__m") - 1).cast("double")), 8))
          .otherwise(lit(0.0)).as("emd")): _*)
      .withColumn("above_t", col("emd") > t)
  }

  /** Functional-dependency audit lhs → rhs: does every `lhs` value map
    * to ONE `rhs` value, and if not, how far off is the data? Reports
    * the standard g3 measure (Kivinen & Mannila 1995): the minimum
    * number of rows to delete so the FD holds = Σ_key (rows_key −
    * max_single_rhs_count_key), as a fraction of all rows.
    *
    * Two key-group aggregations (lhs×rhs counts roll up to lhs), both
    * map-side combinable. NULL keys/values are excluded (SQL FD
    * semantics — NULL matches nothing). Output one row: lhs, rhs,
    * n_keys, violating_keys, g3_rows, g3. */
  def fdAudit(df: DataFrame, lhs: String, rhs: String): DataFrame = {
    val pair = df.where(col(lhs).isNotNull && col(rhs).isNotNull)
      .groupBy(col(lhs).as("a"), col(rhs).as("b"))
      .agg(count(lit(1)).as("cnt"))
    pair.groupBy(col("a"))
      .agg(count(lit(1)).as("n_rhs"), sum(col("cnt")).as("rows"),
        max(col("cnt")).as("max_cnt"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("violating_keys"),
        sum(col("rows") - col("max_cnt")).as("g3_rows"),
        sum(col("rows")).as("n_rows"))
      .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_keys"),
        col("violating_keys"), col("g3_rows"),
        round(col("g3_rows").cast("double") / col("n_rows").cast("double"),
          8).as("g3"))
  }

  /** Inclusion-dependency coverage a ⊆ b: the fraction of DISTINCT
    * `colA` values (in `dfA`) present among `colB`'s values (in `dfB`)
    * — the foreign-key discovery screen (coverage 1.0 = FK candidate).
    *
    * Distinct both sides first (map-side partial distinct), then one
    * left-semi-shaped join on the shrunken key sets. Output one row:
    * a, b, n_a, n_matched, coverage.
    *
    * EQUALITY CONTRACT: keys compare by their canonical STRING form
    * (both sides `cast('string')`), not by native-type coercion. For
    * same-typed or string/integer columns the two notions coincide; for
    * MIXED-typed pairs they deliberately do not — an INT 7 does NOT
    * match a zero-padded VARCHAR '007' here (string '7' ≠ '007'),
    * whereas a native-coercion join would first cast '007' to 7 and
    * report them equal. Screening FK candidates across types is exactly
    * when silent coercion lies (it also nulls out non-numeric codes);
    * callers wanting coercion semantics should cast the columns
    * EXPLICITLY before the call. Any SQL oracle must mirror with
    * CAST(... AS VARCHAR) on both keys to stay definitionally
    * identical. */
  def inclusionDep(dfA: DataFrame, colA: String, dfB: DataFrame,
      colB: String, labelA: String, labelB: String): DataFrame = {
    // STRING key space: injective for integer/string keys of any width,
    // where a numeric cast silently nulls out non-numeric FK columns
    // (country codes etc.) and reports a bogus coverage 0
    val a = dfA.where(col(colA).isNotNull)
      .select(col(colA).cast("string").as("k")).distinct()
    val b = dfB.where(col(colB).isNotNull)
      .select(col(colB).cast("string").as("k")).distinct()
    a.join(b.withColumn("m", lit(1L)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_a"), sum(col("m")).as("matched"))
      .select(lit(labelA).as("a"), lit(labelB).as("b"), col("n_a"),
        coalesce(col("matched"), lit(0L)).as("n_matched"),
        round(coalesce(col("matched"), lit(0L)).cast("double") /
          col("n_a").cast("double"), 8).as("coverage"))
  }
  /** Differentially-private counts via the Laplace mechanism (Dwork,
    * McSherry, Nissim & Smith 2006): per-key counts plus Laplace(1/ε)
    * noise — the release-side member of the privacy tier (k-anonymity /
    * l-diversity / t-closeness audit what a dataset leaks; this is the
    * standard mechanism for publishing the aggregate anyway). Count
    * queries have sensitivity 1, so the noise scale is b = 1/ε.
    *
    * The noise is DERIVED, not drawn: u = md5(seed|key) → 32-bit
    * uniform, inverse-CDF'd to Laplace — deterministic per key/seed
    * (reproducible releases, engine-portable, and the house md5-uniform
    * convention; a cryptographic RNG would be the production swap-in
    * and is the ONLY non-public-knowledge piece of a real release).
    * Noise is rounded to the 6dp grid (absorbs the ≤1-ulp libm LN
    * spread). Map-only after one count aggregation. Output per key:
    * key, noisy_count. The raw count is deliberately NOT emitted. */
  def dpLaplaceCounts(df: DataFrame, keyCol: String, epsilon: Double,
      seed: String = "dp"): DataFrame = {
    require(epsilon > 0.0 && epsilon <= 10.0,
      s"dpLaplaceCounts: epsilon=$epsilon")
    val cnt = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    // +0.5 keeps u strictly inside (0,1): |u-0.5| < 0.5 exactly, so the
    // LN argument is ≥ 2^-32 and the inverse CDF can never hit -inf
    val u = (conv(substring(md5(concat(lit(s"$seed|"),
      col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val centered = u - lit(0.5)
    val noise = round(
      lit(-1.0 / epsilon) *
        when(centered < 0.0, lit(-1.0)).otherwise(lit(1.0)) *
        log(lit(1.0) - lit(2.0) * abs(centered)), 6)
    cnt.select(col(keyCol),
      round(col("__c").cast("double") + noise, 6).as("noisy_count"))
  }
  /** Randomized response (Warner 1965) — the LOCAL differential-privacy
    * member beside the central [[dpLaplaceCounts]]: each unit reports
    * its true boolean with probability q and the lie otherwise, and the
    * group-level prevalence is debiased by π̂ = (p̂ + q − 1)/(2q − 1).
    * Plausible deniability per row, unbiased estimates in aggregate —
    * the survey mechanism for sensitive attributes.
    *
    * The coin is md5-derived per key (deterministic, engine-portable,
    * the dpLaplaceCounts convention — a crypto RNG is the production
    * swap-in); one count aggregation per group, exact integers into one
    * final double formula. Output per group: group, n, p_reported,
    * pi_hat (both 8dp; q must keep 2q−1 ≠ 0). */
  def randomizedResponse(df: DataFrame, groupCol: String, keyCol: String,
      truth: Column, q: Double, seed: String = "rr"): DataFrame = {
    require(q > 0.5 && q < 1.0, s"randomizedResponse: q=$q " +
      "(q ≤ 0.5 destroys identification; q = 1 destroys deniability)")
    val thr = graft.llm.Sampling.hexThreshold(q)
    val honest = graft.llm.Sampling.uniformHex(seed, col(keyCol)) <
      lit(thr)
    val reported = when(honest, truth).otherwise(!truth)
    // NULL truth or NULL key rows are unanswerable units: listwise-drop
    // (a NULL truth would silently count as a 'false' report and a NULL
    // key would deterministically lie — both bias the debias)
    val agg = df
      .where(truth.isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"),
        sum(when(reported, 1L).otherwise(0L)).as("__y"))
    val ph = col("__y").cast("double") / col("n").cast("double")
    agg.select(col(groupCol), col("n"),
      round(ph, 8).as("p_reported"),
      round((ph + lit(q) - lit(1.0)) / lit(2.0 * q - 1.0), 8)
        .as("pi_hat"))
  }
}
