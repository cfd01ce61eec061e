package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

import graft.llm.{SimHash, SimHash64Expr}

class ExtensionsSpec extends SparkSpec {

  test("registerAll exposes engine functions to SQL on an existing session") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash64('hello world') AS h,
        |       dot_seq(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .head()
    assert(r.getLong(0) === SimHash.compute("hello world"))
    assert(r.getDouble(1) === 11.0)
    val topk = spark.sql(
      """SELECT g, topk_by_score(s, id, 2) AS top FROM VALUES
        |  ('a', 1.0d, 1L), ('a', 3.0d, 2L), ('a', 2.0d, 3L), ('b', 5.0d, 9L)
        |  AS t(g, s, id) GROUP BY g ORDER BY g""".stripMargin).collect()
    val aTop = topk(0).getSeq[org.apache.spark.sql.Row](1)
    assert(aTop.map(_.getLong(1)) === Seq(2L, 3L))
    val sh = spark.sql("SELECT word_shingles('The quick brown Fox!', 2) AS s")
      .head().getSeq[String](0)
    assert(sh === Seq("the quick", "quick brown", "brown fox"))
  }

  test("GraftExtensions.apply injects cleanly; builders construct the right expressions") {
    // getOrCreate would silently reuse the shared test session and skip
    // injection, so exercise the extension object against a fresh
    // SparkSessionExtensions (no public read API — apply() not throwing
    // covers the injection wiring) and validate the single-source builders.
    new GraftExtensions().apply(new SparkSessionExtensions)
    val builders = GraftFunctions.all.map(f => f._1 -> f._3).toMap
    assert(builders.keySet ===
      Set("simhash64", "dot_seq", "topk_by_score", "word_shingles",
        "winnow_fps", "minhash_sigs", "cov_sums", "jaro_winkler",
        "poisson_boot_sums", "sign_flip_sums"))
    assert(builders("jaro_winkler")(Seq(Literal("ab"), Literal("ba")))
      .isInstanceOf[graft.llm.JaroWinklerExpr])
    assert(builders("minhash_sigs")(
        Seq(Literal("a b c d"), Literal(3), Literal(9)))
      .isInstanceOf[graft.llm.MinHashSigsExpr])
    assert(builders("winnow_fps")(
        Seq(Literal("abcdefghij"), Literal(8), Literal(4)))
      .isInstanceOf[graft.llm.WinnowExpr])
    assert(builders("simhash64")(Seq(Literal("x"))).isInstanceOf[SimHash64Expr])
    val agg = builders("topk_by_score")(
      Seq(Literal(1.0), Literal(1L), Literal(3)))
    assert(agg.isInstanceOf[AggregateExpression])
    assert(builders("word_shingles")(Seq(Literal("a b c"), Literal(2)))
      .isInstanceOf[graft.llm.WordShinglesExpr])
  }

  test("topk_by_score k argument: long accepted, null/invalid rejected") {
    val builder = GraftFunctions.all.find(_._1 == "topk_by_score").get._3
    // BIGINT literal works (SQL integer literals can be long-typed)
    builder(Seq(Literal(1.0), Literal(1L), Literal(5L)))
    val nullErr = intercept[IllegalArgumentException] {
      builder(Seq(Literal(1.0), Literal(1L), Literal(null, org.apache.spark.sql.types.IntegerType)))
    }
    assert(nullErr.getMessage.contains("non-null"))
    intercept[IllegalArgumentException] {
      builder(Seq(Literal(1.0), Literal(1L), Literal(0)))
    }
  }
}
