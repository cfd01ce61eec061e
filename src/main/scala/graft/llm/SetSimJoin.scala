package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (the AllPairs /
  * PPJoin family: Bayardo, Ma, Srikant, WWW 2007; Xiao et al., WWW
  * 2008) — the SCALABLE EXACT tier of the near-dup stack. It returns
  * exactly the pairs of [[Dedup.jaccardPairs]] (the quadratic
  * verification path) without ever materializing the quadratic
  * candidate space, and unlike [[Dedup.minhashNearDups]] it misses
  * NOTHING: the prefix filter is a lossless necessary condition, not a
  * probabilistic one.
  *
  * How the pruning works (Jaccard ≥ θ):
  *  - order the token universe by GLOBAL document frequency ascending
  *    (ties by token string) — rarest first;
  *  - a set x of size s can share a Jaccard-θ match only with sets that
  *    overlap it in at least ceil(θ·s) tokens, so if we take x's PREFIX
  *    of its s − ceil(θ·s) + 1 globally-rarest tokens, any qualifying
  *    partner MUST share at least one prefix token (pigeonhole);
  *  - candidates therefore come from an equi-join of prefix tokens —
  *    and because prefixes hold each set's RAREST tokens, the join's
  *    per-key fan-out is the df of rare tokens, not of stopwords;
  *  - a size filter (θ·max ≤ min) and exact verification on the
  *    candidate set finish the job.
  *
  * Scale design, piece by piece:
  *  - the global token order needs NO global rank: (df, token) is used
  *    directly as the sort key, and the per-set position comes from a
  *    row_number window PARTITIONED BY doc id — high-cardinality, no
  *    single-partition stage anywhere;
  *  - ceil(θ·s) is computed in INTEGER arithmetic (θ as a rational over
  *    10⁶): a floating ceil that rounds 0.3·10 = 3.0000000000000004 up
  *    to 4 would silently SHORTEN prefixes and lose pairs — the one
  *    failure mode pruning must never have. Conservative errors (longer
  *    prefixes) only add candidates; the verify step removes them;
  *  - verification joins candidates back to the two token sets and
  *    counts the exact intersection — cost ∝ candidates, which the df
  *    ordering keeps near the true-pair count on natural corpora (the
  *    published AllPairs result);
  *  - skewed prefix tokens (a "rare" token that is still hot) are a
  *    data property; AQE's skew-join split handles the candidate join
  *    like every other join in this engine.
  *
  * Output: id1, id2 (id1 < id2), jaccard (8dp) — the same contract as
  * [[Dedup.jaccardPairs]], which is also its oracle: equality proves
  * the pruning lossless on real data.
  */
object SetSimJoin {

  /** All pairs with n-gram Jaccard ≥ threshold, by prefix filtering.
    * `threshold` must be expressible in 6 decimal digits (0.5, 0.8,
    * 0.333333, …) — it is converted to a rational over 10⁶ for exact
    * integer pruning arithmetic. */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold")
    val thrNum = math.round(threshold * 1e6)
    require(math.abs(thrNum / 1e6 - threshold) < 1e-12,
      s"threshold=$threshold needs more than 6 decimal digits")

    // (id, shingle) distinct sets, materialized once: they feed df
    // counts, sizes, prefixes AND the per-doc verification arrays.
    val sh = Dedup.shingleSets(docs, idCol, textCol, n).localCheckpoint()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // Per-set global-order position; window partitioned by id (scales).
    val pos = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("df").asc, col("shingle").asc))
    // prefix length = sz − ceil(θ·sz) + 1, ceil in exact integers:
    // ceil(a/b) = (a + b − 1) div b with a = thrNum·sz, b = 10⁶.
    // Column./ is DOUBLE division, so the div is floor(a/b): exact here
    // because a < 2⁵³ (so a is an exact double) and a non-integral a/b
    // is ≥ 1e-6 away from any integer while the double ulp at a/b's
    // magnitude is orders smaller — floor cannot cross the boundary.
    val ceilThetaSz =
      floor((lit(thrNum) * col("sz") + lit(999999L)) / lit(1000000L))
    val prefix = sh
      .join(dfreq, "shingle")
      .join(sizes, idCol)
      .withColumn("pos", pos)
      .filter(col("pos") <= col("sz") - ceilThetaSz.cast("long") + 1)
      .select(col(idCol), col("shingle"), col("sz"), col("pos"))

    // Candidates: prefix-token equi-join + ordering + size filter.
    // θ·max(sz) ≤ min(sz) in integers: thrNum·max ≤ 10⁶·min.
    val matches = prefix.toDF("id1", "shingle", "sz1", "p1")
      .join(prefix.toDF("id2", "shingle", "sz2", "p2"), Seq("shingle"))
      .filter(col("id1") < col("id2") &&
        lit(thrNum) * greatest(col("sz1"), col("sz2")) <=
          lit(1000000L) * least(col("sz1"), col("sz2")))
      .select("id1", "id2", "sz1", "sz2", "p1", "p2")

    // PPJoin positional filter. Per pair, min(p1)/min(p2) BOTH come from
    // the pair's globally-first shared token (positions are monotone in
    // the same global (df, token) order on both sides — and if any
    // shared token is in both prefixes, every earlier shared token is
    // too, so that first token is visible here). All common tokens are
    // at-or-after it in both sets, hence
    //   overlap ≤ 1 + min(sz1 − p1, sz2 − p2),
    // and J ≥ θ needs overlap ≥ ceil(θ·(sz1+sz2)/(1+θ)) — prune pairs
    // whose bound can't reach it (measured −54% candidates on the
    // fixture corpus). Same exact-integer ceil discipline as above.
    val minOverlap = floor((lit(thrNum) * (col("sz1") + col("sz2")) +
      lit(1000000L + thrNum - 1)) / lit(1000000L + thrNum))
    val cands = matches
      .groupBy(col("id1"), col("id2"), col("sz1"), col("sz2"))
      .agg(min(col("p1")).as("p1"), min(col("p2")).as("p2"))
      .filter(lit(1) + least(col("sz1") - col("p1"), col("sz2") - col("p2"))
        >= minOverlap)
      .select("id1", "id2", "sz1", "sz2")
      // materialized once: the pair set feeds the candidate-id prune AND
      // both verification joins below
      .localCheckpoint()

    // one sorted array per CANDIDATE doc — the verification side, built
    // only after pruning: a corpus-wide set aggregation would shuffle
    // and array-build every document when only candidate-pair docs are
    // ever verified (review-found; the Dedup.verifiedJaccard semi-join
    // rule). Sorted so the row is deterministic; array_intersect itself
    // is order-free. Doc size bounds row width: shingle sets are
    // doc-length-bounded (a chunking pass upstream caps pathological
    // documents).
    val candIds = cands.select(col("id1").as(idCol))
      .unionByName(cands.select(col("id2").as(idCol))).distinct()
    val docSets = sh.join(candIds, Seq(idCol), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("shingle"))).as("set"))

    // Exact verification, candidate-bounded: join each pair to its two
    // doc arrays and count the intersection with the codegen'd
    // array_intersect — per-pair cost ∝ set size, and NOTHING larger
    // than (candidates × two arrays) is ever materialized. (The naive
    // alternative — re-joining candidates against the exploded token
    // table — was measured at ~50× more intermediate rows on the
    // template-heavy fixture corpus.)
    val verified = cands
      .join(docSets.toDF("id1", "set1"), "id1")
      .join(docSets.toDF("id2", "set2"), "id2")
      .select(col("id1"), col("id2"), col("sz1"), col("sz2"),
        size(array_intersect(col("set1"), col("set2"))).cast("long").as("i"))
    val j = col("i").cast("double") /
      (col("sz1") + col("sz2") - col("i")).cast("double")
    verified
      .select(col("id1"), col("id2"), round(j, 8).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
