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

/** All `tables` hyperplane-LSH bucket ids of a vector in ONE fused pass.
  *
  * The declarative form — `tables × bits` separate [[ArrayDotProduct]]s
  * against 64-element literal arrays, summed through `when` chains — is
  * semantically identical but generates a projection method so large the
  * JVM refuses to JIT it (HugeMethodLimit), leaving the hot loop running
  * interpreted bytecode: measured ~0.7 ms/row at dim=64, bits=8,
  * tables=8, which dominated the LSH pipelines. Here the planes matrix
  * is one flat `double[]` reference object and all `tables·bits·dim`
  * multiply-adds run in a single small JIT-friendly method; the input
  * vector is copied to a primitive `double[]` once so the inner loop has
  * no per-element type dispatch. Output: `array<long>` of length
  * `tables` — `posexplode` it to recover (table, bucket) rows.
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Seq[Double],
    dim: Int,
    bits: Int,
    tables: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.length == tables * bits * dim,
    s"planes must be tables*bits*dim = ${tables * bits * dim} doubles, got ${planes.length}")
  require(bits > 0 && bits <= 63, "bits must fit a long bucket id")

  @transient private lazy val p: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a numeric array, got $other")
  }

  @transient private lazy val et: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  /** Called from both interpreted eval and the generated code. */
  def compute(a: ArrayData): ArrayData = {
    val n = math.min(dim, a.numElements())
    val v = new Array[Double](n)
    var i = 0
    et match { // hoisted dispatch: the copy loop is monomorphic
      case FloatType  => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getFloat(i); i += 1 }
      case DoubleType => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getDouble(i); i += 1 }
      case _ => while (i < n) {
        if (!a.isNullAt(i)) v(i) = et match {
          case IntegerType => a.getInt(i).toDouble
          case LongType    => a.getLong(i).toDouble
          case ShortType   => a.getShort(i).toDouble
          case ByteType    => a.getByte(i).toDouble
          case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
          case _ => 0.0
        }
        i += 1
      }
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var bit = 0
      while (bit < bits) {
        val base = (t * bits + bit) * dim
        var s = 0.0
        var j = 0
        while (j < n) { s += p(base + j) * v(j); j += 1 }
        if (s > 0) bucket |= 1L << bit
        bit += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of a vector against EVERY centroid of an IVF index
  * in one fused pass — `array<double>` of length `nCells`.
  *
  * The unrolled form (one [[ArrayCosineSimilarity]] per `typedLit`
  * centroid, argmax via greatest-of-structs) is linear in nCells in
  * GENERATED SOURCE SIZE: at 64 cells × 64 dims Janino compilation took
  * tens of seconds and the projection method blew past the JIT's
  * HugeMethodLimit (measured in SCALEPROBE.md round 6). Here the centroid
  * matrix is one flat `double[]` reference object — generated code is a
  * single call regardless of cell count, so thousand-cell indexes plan
  * and compile in constant time. Cell assignment is
  * `array_position(scores, array_max(scores))`; probing posexplodes the
  * same array. */
case class CentroidScores(
    child: Expression,
    centroids: Seq[Double], // flattened nCells x dim
    nCells: Int,
    dim: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.length == nCells * dim,
    s"centroids must be nCells*dim = ${nCells * dim} doubles, got ${centroids.length}")

  @transient private lazy val m: Array[Double] = centroids.toArray
  // per-centroid norms, precomputed once
  @transient private lazy val cn: Array[Double] = {
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0; var j = 0
      while (j < dim) { val x = m(c * dim + j); s += x * x; j += 1 }
      out(c) = math.sqrt(s); c += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a numeric array, got $other")
  }

  @transient private lazy val et: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(a: ArrayData): ArrayData = {
    val n = math.min(dim, a.numElements())
    val v = new Array[Double](n)
    var i = 0
    et match {
      case FloatType  => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getFloat(i); i += 1 }
      case DoubleType => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getDouble(i); i += 1 }
      case _ => while (i < n) {
        if (!a.isNullAt(i)) v(i) = et match {
          case IntegerType => a.getInt(i).toDouble
          case LongType    => a.getLong(i).toDouble
          case ShortType   => a.getShort(i).toDouble
          case ByteType    => a.getByte(i).toDouble
          case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
          case _ => 0.0
        }
        i += 1
      }
    }
    var vn = 0.0
    i = 0
    while (i < n) { vn += v(i) * v(i); i += 1 }
    vn = math.sqrt(vn)
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0; var j = 0
      val base = c * dim
      while (j < n) { s += m(base + j) * v(j); j += 1 }
      out(c) = if (vn == 0.0 || cn(c) == 0.0) 0.0 else s / (vn * cn(c))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidScores", this, classOf[CentroidScores].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared numeric-array → double[] reader for the reference-object
  * expressions below (zero-fills nulls and missing tail elements). */
private[plans] object VecRead {
  def toDoubles(a: ArrayData, dim: Int, et: NumericType): Array[Double] = {
    val n = math.min(dim, a.numElements())
    val v = new Array[Double](dim)
    var i = 0
    et match {
      case FloatType  => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getFloat(i); i += 1 }
      case DoubleType => while (i < n) { if (!a.isNullAt(i)) v(i) = a.getDouble(i); i += 1 }
      case _ => while (i < n) {
        if (!a.isNullAt(i)) v(i) = et match {
          case IntegerType => a.getInt(i).toDouble
          case LongType    => a.getLong(i).toDouble
          case ShortType   => a.getShort(i).toDouble
          case ByteType    => a.getByte(i).toDouble
          case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
          case _ => 0.0
        }
        i += 1
      }
    }
    v
  }
}

/** Product-quantization encode: for each of `m` subspaces, the index of
  * the L2-nearest sub-centroid — the vector compressed to m small ints
  * (m bytes on disk after parquet dictionary/bit-packing) instead of
  * dim floats. `codebook` is flattened (sub·nCodes + code)·dsub. One
  * fused pass per row, same addReferenceObj codegen shape as
  * [[CentroidScores]] (generated call size is constant in m·nCodes). */
case class PqEncode(
    child: Expression,
    codebook: Seq[Double],
    m: Int,
    nCodes: Int,
    dsub: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebook.length == m * nCodes * dsub,
    s"codebook must be m*nCodes*dsub = ${m * nCodes * dsub} doubles, got ${codebook.length}")

  @transient private lazy val cb: Array[Double] = codebook.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a numeric array, got $other")
  }

  @transient private lazy val et: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(a: ArrayData): ArrayData = {
    val v = VecRead.toDoubles(a, m * dsub, et)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val voff = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < nCodes) {
        val base = (s * nCodes + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) { val t = v(voff + j) - cb(base + j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric PQ score: cosine(query, reconstruction-from-codes). The
  * query stays exact; the corpus side is its m sub-centroid ids, so the
  * scan reads m ints per row instead of dim floats — the memory/IO cut
  * that makes billion-vector shortlisting fit. One fused loop; the
  * reconstruction norm comes from the same codebook constants. */
case class PqCosine(
    left: Expression,  // query vector (numeric array)
    right: Expression, // codes (int array from PqEncode)
    codebook: Seq[Double],
    m: Int,
    nCodes: Int,
    dsub: Int) extends BinaryExpression {

  require(codebook.length == m * nCodes * dsub,
    s"codebook must be m*nCodes*dsub = ${m * nCodes * dsub} doubles, got ${codebook.length}")

  @transient private lazy val cb: Array[Double] = codebook.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: NumericType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"expects (numeric array, int array), got $l and $r")
  }

  @transient private lazy val et: NumericType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(q: ArrayData, codes: ArrayData): Double = {
    val dim = m * dsub
    val v = VecRead.toDoubles(q, dim, et)
    var qn = 0.0
    var i = 0
    while (i < dim) { qn += v(i) * v(i); i += 1 }
    var dotv = 0.0
    var rn = 0.0
    val nc = math.min(m, codes.numElements())
    var s = 0
    while (s < nc) {
      val c = codes.getInt(s)
      val base = (s * nCodes + c) * dsub
      val voff = s * dsub
      var j = 0
      while (j < dsub) {
        val x = cb(base + j)
        dotv += v(voff + j) * x
        rn += x * x
        j += 1
      }
      s += 1
    }
    if (qn == 0.0 || rn == 0.0) 0.0
    else dotv / (math.sqrt(qn) * math.sqrt(rn))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCosine", this, classOf[PqCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Scalar int8 quantization: per-vector affine map onto [0,255] —
  * code_i = round((x_i − min)/scale), scale = (max − min)/255. One byte
  * per dimension instead of four (float) on disk and in the scan, with
  * reconstruction error ≤ scale/2 per element. The per-VECTOR (not
  * per-corpus) range makes the encode a single shuffle-free map pass
  * with no training stage — the pragmatic middle ground between raw
  * floats and PQ (which needs a codebook) for shortlisting scans.
  * Output: struct(codes binary, qmin double, qscale double). All math
  * in double so DuckDB replays it bit-identically for the oracle. */
case class Int8Encode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = Int8Encode.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a numeric array, got $other")
  }

  @transient private lazy val et: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val v = VecRead.toDoubles(a, n, et)
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var i = 0
    while (i < n) { val x = v(i); if (x < mn) mn = x; if (x > mx) mx = x; i += 1 }
    if (n == 0) { mn = 0.0; mx = 0.0 }
    val sc = (mx - mn) / 255.0
    val codes = new Array[Byte](n)
    if (sc != 0.0) {
      i = 0
      while (i < n) {
        val c = math.round((v(i) - mn) / sc)
        codes(i) = (if (c < 0L) 0L else if (c > 255L) 255L else c).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](codes, mn, sc))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Encode", this, classOf[Int8Encode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Encode {
  val schema: StructType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("qmin", DoubleType, nullable = false),
    StructField("qscale", DoubleType, nullable = false)))
}

/** Per-vector int8 quantization error report, one fused pass:
  * struct(qmin, qmax, max_abs_err, mean_abs_err) where err_i =
  * |qmin + round((x_i−qmin)/scale)·scale − x_i|. Strictly sequential
  * double arithmetic (min/max sweep, then left-to-right error sum) so
  * a SQL oracle doing the same list operations reproduces the values
  * exactly — this is the CORRECTNESS window into [[Int8Encode]], whose
  * binary codes a hash compare can't inspect directly. */
case class Int8Stats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = Int8Stats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a numeric array, got $other")
  }

  @transient private lazy val et: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val v = VecRead.toDoubles(a, n, et)
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var i = 0
    while (i < n) { val x = v(i); if (x < mn) mn = x; if (x > mx) mx = x; i += 1 }
    if (n == 0) { mn = 0.0; mx = 0.0 }
    val sc = (mx - mn) / 255.0
    var maxE = 0.0
    var sumE = 0.0
    if (sc != 0.0) {
      i = 0
      while (i < n) {
        val e = math.abs(mn + math.round((v(i) - mn) / sc) * sc - v(i))
        if (e > maxE) maxE = e
        sumE += e
        i += 1
      }
    }
    val meanE = if (n == 0) 0.0 else sumE / n
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mn, mx, maxE, meanE))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Stats", this, classOf[Int8Stats].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Stats {
  val schema: StructType = StructType(Seq(
    StructField("qmin", DoubleType, nullable = false),
    StructField("qmax", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("mean_abs_err", DoubleType, nullable = false)))
}

/** cos(query, dequantized-int8-corpus-vector) in one fused loop — the
  * corpus side is read as 1 byte/dim plus two doubles, dequantized
  * on the fly (x̂_i = qmin + code_i·qscale), never materialized. The
  * asymmetric analogue of [[PqCosine]] for scalar quantization. */
case class Int8Cosine(
    first: Expression,  // query vector (numeric array)
    second: Expression, // codes (binary, from Int8Encode)
    third: Expression,  // qmin (double)
    fourth: Expression) // qscale (double)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(_: NumericType, _), BinaryType, DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"expects (numeric array, binary, double, double), got ($a, $b, $c, $d)")
    }

  @transient private lazy val et: NumericType =
    first.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  def compute(qa: ArrayData, codes: Array[Byte], mn: Double, sc: Double): Double = {
    // Fail loudly on a query/codes dimension split: silently truncating
    // to the shorter side yields a plausible-looking but wrong score for
    // a mixed-dimension corpus (same contract as HllSketch.mergeRegs'
    // precision check on its artifacts).
    val n = qa.numElements()
    require(n == codes.length,
      s"Int8Cosine dimension mismatch: query has $n dims, codes ${codes.length}")
    val v = VecRead.toDoubles(qa, n, et)
    var dotv = 0.0
    var qn = 0.0
    var rn = 0.0
    var i = 0
    while (i < n) {
      val x = mn + (codes(i) & 0xFF) * sc
      val q = v(i)
      dotv += q * x
      qn += q * q
      rn += x * x
      i += 1
    }
    if (qn == 0.0 || rn == 0.0) 0.0
    else dotv / (math.sqrt(qn) * math.sqrt(rn))
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Cosine", this, classOf[Int8Cosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = $ref.compute($a, $b, $c, $d);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object VectorExpressions {
  /** Column-level entry points (Expression ↔ Column bridge). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayDotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ArrayCosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneBuckets(vec: Column, planes: Seq[Double], dim: Int, bits: Int,
      tables: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(vec), planes, dim, bits, tables))

  def centroidScores(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dim = centroids.head.size
    GraftColumnBridge.column(CentroidScores(
      GraftColumnBridge.expression(vec), centroids.flatten, centroids.size, dim))
  }

  /** `codebooks`: m subspaces × nCodes sub-centroids × dsub doubles. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.size
    val nCodes = codebooks.head.size
    val dsub = codebooks.head.head.size
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(vec),
      codebooks.flatten.flatten, m, nCodes, dsub))
  }

  def pqCosine(vec: Column, codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.size
    val nCodes = codebooks.head.size
    val dsub = codebooks.head.head.size
    GraftColumnBridge.column(PqCosine(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(codes),
      codebooks.flatten.flatten, m, nCodes, dsub))
  }

  def int8Encode(vec: Column): Column =
    GraftColumnBridge.column(Int8Encode(GraftColumnBridge.expression(vec)))

  def int8Stats(vec: Column): Column =
    GraftColumnBridge.column(Int8Stats(GraftColumnBridge.expression(vec)))

  def int8Cosine(vec: Column, codes: Column, qmin: Column, qscale: Column): Column =
    GraftColumnBridge.column(Int8Cosine(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(qmin), GraftColumnBridge.expression(qscale)))
}
