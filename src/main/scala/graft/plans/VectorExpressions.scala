package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding math.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product declaratively but evaluate the lambda per element *interpreted*
  * — ~100µs/row on 64-dim vectors, which dominates any similarity scan.
  * These are proper `Expression`s with `doGenCode`: the inner loop
  * compiles into whole-stage codegen as a primitive `double` loop (and the
  * interpreted `eval` fallback is still a tight JVM loop, used e.g. inside
  * other HOF lambdas). At 100 TB this is the difference between a
  * CPU-bound scan and a lambda-dispatch benchmark.
  */
private[graft] trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"expects two numeric arrays, got ${left.dataType} and ${right.dataType}")
  }

  protected def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  /** java accessor snippet for element i of an ArrayData variable */
  protected def getter(tpe: NumericType, arr: String, i: String): String = tpe match {
    case FloatType => s"$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"$arr.getInt($i)"
    case LongType => s"$arr.getLong($i)"
    case ShortType => s"$arr.getShort($i)"
    case ByteType => s"$arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case _ => s"((Number)$arr.get($i, null)).doubleValue()"
  }

  protected def getElem(tpe: NumericType, arr: ArrayData, i: Int): Double = tpe match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case _ => 0.0
  }
}

/** Σ aᵢ·bᵢ in double; null elements contribute 0; length = min(len). */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) sum += getElem(ta, a, i) * getElem(tb, b, i)
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val (ga, gb) = (getter(elemType(left), a, i), getter(elemType(right), b, i))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += (double)($ga) * (double)($gb);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cos(a,b) = Σab / √(Σa²·Σb²) in ONE pass over both arrays (three
  * accumulators in the same loop — no re-fold per norm); 0.0 when either
  * norm is zero. */
case class ArrayCosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = getElem(ta, a, i); val y = getElem(tb, b, i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val (ga, gb) = (getter(elemType(left), a, i), getter(elemType(right), b, i))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = (double)($ga); double $y = (double)($gb);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level entry points (Expression ↔ Column bridge). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayDotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayCosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
