package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, pair tier (Agrawal & Srikant 1994, Apriori;
  * the SON/"Savasere et al." partition trick is what Spark's shuffle
  * gives for free): which items co-occur in the same basket more often
  * than chance — the co-occurrence screen behind related-products,
  * query-term affinity, and topic-lexicon discovery.
  *
  * Scale design:
  *  - the Apriori property prunes FIRST: a pair can only be frequent if
  *    BOTH items are, so baskets are filtered to frequent items before
  *    any pair is generated — on Zipf-tailed item catalogs this deletes
  *    almost the whole long tail before the quadratic step;
  *  - pair generation self-joins the (basket, frequent-item) table on
  *    basket: cost Σ f_b² over baskets, where f_b counts only FREQUENT
  *    items in basket b. That bound is the knob: minSupport directly
  *    caps the blowup (same df-cap contract as the winnowing dedup);
  *  - support counting is one map-side-combinable aggregation; lift
  *    divides by item supports carried through the join — no second
  *    pass over the data.
  */
object Itemsets {

  /** Frequent co-occurring pairs with support and lift over exploded
    * (basket, item) rows (duplicates collapse — set semantics).
    * Output: item1 < item2, support (co-occurrence count), lift
    * (support·n / (c1·c2), 8dp; > 1 means above-chance association). */
  /** Shared Apriori pair lattice: distinct (basket, item), frequent-item
    * prune, basket self-join, support cut. Returns the surviving pairs
    * (item1 < item2, c1, c2, support) with the basket total riding along
    * (n_baskets — identical on every row). Both public entry points
    * consume this so the pruning/checkpoint strategy lives once. */
  private def pairLattice(items: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val it = items.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().localCheckpoint()
    // total baskets as a broadcast 1-row frame — stays in-plan
    val nb = it.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val freq = it.groupBy(col("i")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minSupport)
    val fit = it.join(freq, "i")
    fit.select(col("b"), col("i").as("item1"), col("c").as("c1"))
      .join(fit.select(col("b"), col("i").as("item2"), col("c").as("c2")),
        Seq("b"))
      .where(col("item1") < col("item2"))
      .groupBy(col("item1"), col("item2"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .crossJoin(broadcast(nb))
  }

  def frequentPairs(items: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    pairLattice(items, basketCol, itemCol, minSupport)
      .select(col("item1"), col("item2"), col("support"),
        round(col("support").cast("double") * col("n_baskets") /
          (col("c1") * col("c2")).cast("double"), 8).as("lift"))

  /** Directed association rules from the frequent-pair lattice (Agrawal
    * & Srikant 1994's rule-generation step): each surviving unordered
    * pair emits up to two rules a→b and b→a, kept when
    * confidence = support(ab)/support(a) ≥ `minConf`. Confidence is the
    * routing signal lift cannot give (lift is symmetric; confidence is
    * not — "buyers of a also buy b" ≠ "buyers of b also buy a").
    *
    * Scale: identical cost to [[frequentPairs]] (the rule expansion is
    * 2 rows per surviving pair — output-sized); the quadratic candidate
    * step stays bounded by the same minSupport cap on Σ f_b². All
    * measures are exact-count ratios rounded at 8dp.
    * Output: antecedent, consequent, support, confidence, lift. */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConf: Double): DataFrame = {
    require(minConf > 0.0 && minConf <= 1.0, s"minConf=$minConf")
    val pairs = pairLattice(items, basketCol, itemCol, minSupport)
    val directed = pairs.select(col("item1").as("antecedent"),
        col("item2").as("consequent"), col("c1").as("ca"), col("c2").as("cc"),
        col("support"), col("n_baskets"))
      .unionByName(pairs.select(col("item2").as("antecedent"),
        col("item1").as("consequent"), col("c2").as("ca"), col("c1").as("cc"),
        col("support"), col("n_baskets")))
    directed
      .withColumn("confidence",
        round(col("support").cast("double") / col("ca").cast("double"), 8))
      .where(col("confidence") >= minConf)
      .select(col("antecedent"), col("consequent"), col("support"),
        col("confidence"),
        round(col("support").cast("double") * col("n_baskets") /
          (col("ca") * col("cc")).cast("double"), 8).as("lift"))
  }
  /** Frequent sequential pairs (the length-2 tier of GSP / PrefixSpan —
    * Srikant & Agrawal 1996, Pei et al. 2001): for each session, the
    * FIRST occurrence time of every item, then the pairs (a, b) where
    * a's first occurrence strictly precedes b's, counted across
    * sessions — "what follows what" for funnel and next-event mining.
    *
    * Scale discipline mirrors [[frequentPairs]]: the (session, item)
    * frame holds at most |item domain| rows per session, so the
    * session-keyed self-join costs Σ_s k_s² with k_s bounded by the
    * item-type domain, never by event rows; support counting is one
    * map-side-combinable aggregation. Pairs whose first occurrences
    * share a timestamp are dropped (no order is observable — including
    * them would make the result engine-sort-dependent). Output:
    * item_a, item_b, n_sessions for pairs with support ≥ `minSupport`. */
  def sequentialPairs(df: DataFrame, sessionCols: Seq[String],
      itemCol: String, tsCol: String, minSupport: Long): DataFrame = {
    require(sessionCols.nonEmpty, "sequentialPairs: no session key")
    require(minSupport >= 1, s"sequentialPairs: minSupport=$minSupport")
    val firsts = df
      .where(col(itemCol).isNotNull && col(tsCol).isNotNull)
      .groupBy((sessionCols.map(col) :+ col(itemCol).as("__it")): _*)
      .agg(min(col(tsCol)).as("__t"))
    val l = firsts.as("l")
    val r = firsts.as("r")
    val sameSession = sessionCols
      .map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _)
    l.join(r, sameSession && col("l.__t") < col("r.__t"))
      .groupBy(col("l.__it").as("item_a"), col("r.__it").as("item_b"))
      .agg(count(lit(1)).as("n_sessions"))
      .where(col("n_sessions") >= minSupport)
  }
}
