package graft.engine

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership probe as a NATIVE Catalyst expression —
  * replaces the two Scala `udf` probes that were the engine's last
  * codegen breaks on the dedup path (`LoadDedup.antiJoinBloomPruned`,
  * `Dedup.contaminatedDocsBloom`). A `udf` node forces the surrounding
  * stage out of whole-stage codegen and pays a boxing round-trip per
  * row; this expression stays inside the codegen'd scan loop — the
  * generated code is one virtual call on the broadcast value per row.
  *
  * Semantics are identical to the UDFs it replaces: probe the broadcast
  * `org.apache.spark.util.sketch.BloomFilter` (built by
  * `df.stat.bloomFilter`, whose String items hash through the same
  * `mightContainString` path) with the row's key string; null input →
  * null out (the callers' null-key rows are routed by an explicit
  * `isNull` OR, exactly as before). The broadcast rides the expression
  * tree the same way the UDF closure carried it, so the
  * ContextCleaner lifetime note in `LoadDedup` is unchanged.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the broadcast handle as a plan reference object: resolved
    // once per generated class, then each row is a single probe call
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BloomFilter].getName}) $bcRef.value())" +
        s".mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomProbe {
  /** Column wrapper: `mightContain(bloomBc, keyCol)`. */
  def mightContain(bloom: Broadcast[BloomFilter], key: Column): Column =
    GraftExpressionBridge.column(
      BloomMightContain(GraftExpressionBridge.expression(key), bloom))
}
