package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain(key)` probe against a prebuilt [[BloomFilter]].
  *
  * The filter rides the expression as a codegen reference object, so it is
  * serialized into the stage's task binary — which Spark broadcasts once
  * per executor, not once per task. The generated code is a single virtual
  * call on the deserialized sketch inside whole-stage codegen: no UDF
  * boxing, no Row allocation, and the probe sits in the same generated
  * loop as the parquet scan's other residual filters.
  *
  * Key hashing must agree bit-for-bit with how `df.stat.bloomFilter` fed
  * the build side: integral keys go through `mightContainLong` (the build
  * used `putLong` on the widened value) and strings through
  * `mightContainBinary` over the UTF-8 bytes (the build used `putBinary`
  * on the same bytes) — both faces delegate to the sketch's own hash, so
  * there is nothing to drift.
  */
case class BloomKeyMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"expects an integral or string key, got $other")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case _ => filter.mightContainLong(input.asInstanceOf[Number].longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, in => child.dataType match {
      case StringType => s"${ev.value} = $bf.mightContainBinary($in.getBytes());"
      case _ => s"${ev.value} = $bf.mightContainLong((long) $in);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContain(key: Column, filter: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomKeyMightContain(GraftColumnBridge.expression(key), filter))
}
