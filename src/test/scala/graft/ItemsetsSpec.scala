package graft

import graft.llm.Itemsets

/** Apriori pair mining: support/lift arithmetic, the frequent-item
  * prefilter, and set (not bag) semantics. */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  private def mine(rows: Seq[(Long, String)], minSup: Long) =
    Itemsets.frequentPairs(rows.toDF("b", "i"), "b", "i", minSup)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap

  test("support counts baskets, lift is support*n/(c1*c2)") {
    // 4 baskets; {x,y} together in 2, x in 3, y in 2
    val rows = Seq(
      1L -> "x", 1L -> "y",
      2L -> "x", 2L -> "y",
      3L -> "x",
      4L -> "z")
    val got = mine(rows, 2)
    // lift(x,y) = 2*4/(3*2) = 1.33333333
    assert(got === Map(("x", "y") -> (2L, 1.33333333)))
  }

  test("an infrequent item never reaches pair generation") {
    // y is in every basket with x, but y's own support < minSup
    val rows = Seq(1L -> "x", 1L -> "y", 2L -> "x", 3L -> "x", 3L -> "w",
      2L -> "w")
    val got = mine(rows, 2)
    // only x (3) and w (2) are frequent; {x,w} co-occur twice
    assert(got.keySet === Set(("w", "x")))
  }

  test("duplicate items in one basket count once (set semantics)") {
    val rows = Seq(1L -> "x", 1L -> "x", 1L -> "y", 2L -> "x", 2L -> "y")
    val got = mine(rows, 2)
    assert(got(("x", "y"))._1 === 2L)
  }

  test("associationRules: confidence is directional; minConf prunes one side") {
    // x in baskets {1,2,3}; y in {1,2}; pair {x,y} in {1,2}:
    //   y→x conf = 2/2 = 1.0 (kept), x→y conf = 2/3 = 0.66666667
    val rows = Seq(1L -> "x", 1L -> "y", 2L -> "x", 2L -> "y", 3L -> "x")
    val df = rows.toDF("b", "i")
    val all = graft.llm.Itemsets
      .associationRules(df, "b", "i", minSupport = 2L, minConf = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(all(("y", "x")) === ((2L, 1.0, 1.0)))          // lift = 2*3/(2*3)
    assert(all(("x", "y"))._2 === 0.66666667)
    // a tighter minConf keeps only the strong direction
    val strict = graft.llm.Itemsets
      .associationRules(df, "b", "i", minSupport = 2L, minConf = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(strict.toSeq === Seq(("y", "x")))
  }
}
