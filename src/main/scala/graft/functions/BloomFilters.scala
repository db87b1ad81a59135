package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long-hash column against a serialized
  * [[BloomFilter]] — the engine-level analog of Spark's internal
  * `might_contain` runtime-filter expression, exposed as a public column
  * function so operators can prefilter a huge side against a
  * broadcast-sized bit array WITHOUT a UDF.
  *
  * The filter travels as its serialized bytes (always
  * `java.io.Serializable`-safe) and is deserialized once per codegen
  * instance / interpreted evaluator, then probed per row with
  * `mightContainLong` — the hot path stays inside WholeStageCodegen with
  * zero boxing.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT hash input, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bloomCls = classOf[BloomFilter].getName
    val bloomField = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"""try {
              |  $v = $bloomCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
              |} catch (java.io.IOException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomField.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomFilters {
  /** True when `c` (a long hash column) might be in `bloom`; false ⇒
    * definitely absent. Pair with an exact confirm join for exactness. */
  def bloom_might_contain(c: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(c), bos.toByteArray))
  }
}
