package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.llm.{DotProductExpr, SimHash64Expr, TopKByScore}

/** The engine's custom Catalyst functions, packaged the two standard ways:
  *
  *  - [[GraftExtensions]] for config-driven injection:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions` — functions resolve in
  *    pure SQL (`SELECT simhash64(text) …`) on every session of the
  *    cluster;
  *  - [[GraftFunctions.registerAll]] for an existing session.
  *
  * Surface: `simhash64(text)`, `dot_seq(arr, arr)`,
  * `topk_by_score(score, id, k)` — all native expressions/aggregates (no
  * UDF serialization, codegen-friendly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions._
  override def apply(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name, usage)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "simhash64(text) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head)),
    ("dot_seq",
      info("dot_seq", "dot_seq(a, b) - sequential-fold dot product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1))),
    ("topk_by_score",
      info("topk_by_score",
        "topk_by_score(score, id, k) - k best (score,id) pairs per group"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2).eval(null).asInstanceOf[Int]
        TopKByScore(exprs(0), exprs(1), k).toAggregateExpression()
      }))

  /** Register on an already-built session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
