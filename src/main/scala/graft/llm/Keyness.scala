package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus keyness (Dunning 1993 log-likelihood G²): for every
  * (group, term), how surprising is the term's frequency in the group
  * against the rest of the corpus — the corpus-linguistics screen for
  * "what words characterize this source", robust where raw frequency
  * ratios break on small counts (the reason keyword lists use G², not
  * PMI, for corpus comparison).
  *
  *   G² = 2·( a·ln(a/E₁) + b·ln(b/E₂) ),  E₁ = n₁(a+b)/N, E₂ = n₂(a+b)/N
  *
  * with a/b the term's counts in the group/rest and n₁/n₂ the token
  * totals. Zero cells contribute zero (x·ln(x/E) → 0). Shape: ONE
  * (group, term) count aggregation; term and group totals derive from
  * it and broadcast back — cost one token-explode scan, output sized
  * groups × vocabulary. Determinism: each ln rounds to the 8dp grid,
  * each additive part rounds after its integer multiply, and the
  * two-part sum is a fixed-order expression (the q_anova rule trivially
  * holds at 2 terms). Output: group, term, a, expected_a (8dp),
  * g2 (8dp), over_used. */
object Keyness {

  def keyness(docs: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val toks = docs.select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val gt = toks.groupBy(col("g"), col("w")).agg(count(lit(1)).as("a"))
    val termTot = gt.groupBy(col("w")).agg(sum(col("a")).as("t"))
    val grpTot = gt.groupBy(col("g")).agg(sum(col("a")).as("n1"))
    val nTot = grpTot.agg(sum(col("n1")).as("nn"))

    val joined = gt
      .join(broadcast(termTot), "w")
      .join(broadcast(grpTot), "g")
      .crossJoin(broadcast(nTot))
    val ad = col("a").cast("double")
    val bd = (col("t") - col("a")).cast("double")
    val n1d = col("n1").cast("double")
    val n2d = (col("nn") - col("n1")).cast("double")
    val td = col("t").cast("double")
    val nd = col("nn").cast("double")
    val e1 = n1d * td / nd
    val e2 = n2d * td / nd
    def part(x: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column) =
      when(x > 0, round(x * round(log(x / e), 8), 8)).otherwise(lit(0.0))
    joined.select(col("g").as(groupCol), col("w").as("term"), col("a"),
      round(e1, 8).as("expected_a"),
      round(lit(2.0) * (part(ad, e1) + part(bd, e2)), 8).as("g2"),
      (ad / n1d > bd / n2d).as("over_used"))
  }
}
