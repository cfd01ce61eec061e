package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document as a native Catalyst expression.
  *
  * Algorithm (Charikar similarity-estimation, as used in large-scale
  * near-dup detection): tokenize (lowercase, non-alphanumeric splits),
  * weight each distinct token by its occurrence count, hash it to 64 bits,
  * accumulate ±weight per bit position, emit the sign vector as one int64.
  * Token bits come from the first 16 hex chars of md5(token) — chosen
  * because the identical bit derivation is expressible in ANSI SQL
  * (`substr(md5(t), …)` + hex-digit arithmetic), which is what the DuckDB
  * oracle replays (see `DedupQueries.q_simhash`).
  *
  * Why an Expression and not the relational formulation: computing 64 bit
  * positions relationally costs a 64× row explosion + a 64-way aggregation
  * per document; this expression does the whole accumulation in one pass
  * over the row, keeping a 100 TB scan at one-row-in/one-long-out.
  * (`CodegenFallback` for now — the eval is a single tight JVM loop; a
  * `doGenCode` emit is a follow-up optimization.)
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String].toString)

  /** Real codegen: static-helper call keeps the document scan inside one
    * whole-stage-codegen'd loop (no interpreted fallback). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHash.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash {

  /** Register `simhash64(text)` for SQL/expr use on this session
    * (delegates to the single builder registry in [[graft.GraftFunctions]]). */
  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.register(spark, "simhash64")

  def compute(text: String): Long = {
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    val toks = text.toLowerCase.split("[^a-z0-9]+")
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) counts.merge(t, 1, Integer.sum)
      i += 1
    }
    val acc = new Array[Long](64)
    counts.forEach { (tok, cnt) =>
      val hex = md5Hex(tok)
      var j = 0
      while (j < 64) {
        val digit = Character.digit(hex.charAt(j / 4), 16)
        val bit = (digit >> (j % 4)) & 1
        acc(j) += cnt.toLong * (2 * bit - 1)
        j += 1
      }
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) h |= 1L << j
      j += 1
    }
    h
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def md5Hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
