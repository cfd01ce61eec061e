package graft.llm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler name similarity as a native codegen'd expression — the
  * scalar kernel of fuzzy record linkage (the reference's pipeline joins
  * address registries on exact normalized keys, `extract.py:529-535`; a
  * production linkage tier needs the approximate variant for the rows the
  * exact key misses).
  *
  * Semantics pinned to the textbook Winkler convention so the DuckDB
  * oracle's `jaro_winkler_similarity` matches bit-for-bit:
  *
  *  - operates on UTF-8 BYTES (not code points) — multi-byte characters
  *    count per byte, exactly like the oracle's rapidfuzz-derived kernel;
  *  - match window `max(|a|,|b|)/2 - 1` (floored, min 0), greedy
  *    left-to-right matching;
  *  - transpositions = (# matched positions whose byte differs) / 2 with
  *    INTEGER division (odd counts floor);
  *  - `jaro = (m/|a| + m/|b| + (m-t)/m) / 3`, in that IEEE order;
  *  - zero matches — including both sides empty — yield 0.0;
  *  - Winkler boost only when `jaro > 0.7`: `jaro + min(prefix,4)·0.1·(1-jaro)`.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  /** Real codegen (no CodegenFallback): one static call, so linkage
    * filters/projections stay inside whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.llm.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr = copy(newLeft, newRight)
}

object JaroWinkler {

  /** Called from both interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    jaroWinklerBytes(s, t)
  }

  private[llm] def jaroWinklerBytes(s: Array[Byte], t: Array[Byte]): Double = {
    val jaro = jaroBytes(s, t)
    if (jaro > 0.7) {
      val maxPrefix = math.min(4, math.min(s.length, t.length))
      var p = 0
      while (p < maxPrefix && s(p) == t(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  private[llm] def jaroBytes(s: Array[Byte], t: Array[Byte]): Double = {
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val sMatch = new Array[Boolean](l1)
    val tMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Walk both matched sequences in order; count differing positions.
    var diffs = 0
    var si = 0
    var tj = 0
    while (si < l1) {
      if (sMatch(si)) {
        while (!tMatch(tj)) tj += 1
        if (s(si) != t(tj)) diffs += 1
        tj += 1
      }
      si += 1
    }
    val trans = diffs / 2 // integer floor, the strcmp95/rapidfuzz convention
    val md = m.toDouble
    (md / l1 + md / l2 + (md - trans) / md) / 3.0
  }

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.register(spark, "jaro_winkler")

  /** Column form; requires [[register]] on the session first. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)
}
