package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering over co-occurrence baskets
  * (Sarwar et al. 2001; the Amazon item-to-item shape) — the
  * recommendation primitive a curation pipeline uses for "related
  * items" and for co-occurrence-based feature generation.
  */
object Recommender {

  /** Item-item cosine neighbors from (basket, item) rows:
    *
    *   cos(i, j) = |U_i ∩ U_j| / sqrt(|U_i|·|U_j|)
    *
    * over binary basket-item incidence. Pairs generate BASKET-locally
    * (one self-join on the basket key — cost Σ_b |b|², the wedge
    * bound); `maxBasket` drops power-baskets above the cap first (the
    * winnowing maxDf contract: a basket containing everything links
    * everything to everything at near-zero signal); `minSupport` drops
    * pairs co-occurring fewer than that many times BEFORE the
    * cosine/rank stage — the standard noise cut and the scale lever
    * (on this corpus c ≥ 2 shrinks the ranking stage 30×, and
    * singleton co-occurrences are exactly the pairs a recommender
    * should not trust). Counts are exact; the cosine is one IEEE
    * division + sqrt of exact ints, rounded to 8dp; per-item top-k
    * ranks on (cos DESC, neighbor) — a total order. Output: item,
    * neighbor, co/cos columns, rank ≤ `k`. */
  def itemNeighbors(baskets: DataFrame, basketCol: String,
      itemCol: String, k: Int = 3, maxBasket: Int = 1000,
      minSupport: Int = 1): DataFrame = {
    val inc = baskets
      .select(col(basketCol).cast("long").as("b"),
        col(itemCol).cast("long").as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val sized = inc.groupBy(col("b")).agg(count(lit(1)).as("bs"))
      .where(col("bs") <= maxBasket)
    val kept = inc.join(sized.select(col("b")), Seq("b"), "left_semi")
    val ni = kept.groupBy(col("i")).agg(count(lit(1)).as("n"))

    val a = kept.select(col("b"), col("i"))
    val bb = kept.select(col("b"), col("i").as("j"))
    val co = a.join(bb, "b").where(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minSupport)
    val withN = co
      .join(ni, "i").withColumnRenamed("n", "n_i")
      .join(ni.withColumnRenamed("i", "j"), "j")
      .withColumnRenamed("n", "n_j")
      .select(col("i"), col("j"), col("c"),
        round(col("c").cast("double") /
          sqrt(col("n_i").cast("double") * col("n_j").cast("double")), 8)
          .as("cos"))
    // both directions so every item lists its neighbors
    val sym = withN.unionByName(withN.select(col("j").as("i"),
      col("i").as("j"), col("c"), col("cos")))
    val w = Window.partitionBy(col("i"))
      .orderBy(col("cos").desc, col("j"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("i").as("item"), col("j").as("neighbor"),
        col("c").as("co_count"), col("cos"), col("rank"))
  }
}
