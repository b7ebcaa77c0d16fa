package graft.sources

import java.io.{FileInputStream, FileOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file codec (the wire format of pandas `to_feather` v2) —
  * pandas-interop ingress/egress alongside the NPY and pickle codecs,
  * built on the arrow-vector/arrow-compression libraries Spark itself
  * bundles (no new dependency).
  *
  * Driver-side by design, same contract as [[Npy]]/[[Pickle]]: a feather
  * frame is an inherently single-machine artifact (pandas wrote it from
  * one process); the distributed path for big data is parquet. Reads
  * decode every record batch (LZ4/ZSTD compressed batches included, via
  * the commons compression factory); writes emit one uncompressed batch
  * readable by any Arrow implementation.
  *
  * Types covered both directions: int8/16/32/64, float32/64, utf8,
  * bool, binary — the pandas-frame core. Anything else fails loudly
  * rather than miscoding.
  */
object ArrowIpc {

  private def sparkType(t: ArrowType): DataType = t match {
    case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
      case 8 => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
      case w => throw new IllegalArgumentException(s"int width $w")
    }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new IllegalArgumentException(s"float precision $p")
    }
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary => BinaryType
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  /** Read an Arrow IPC file (feather v2) into a DataFrame. */
  def readArrow(spark: SparkSession, path: String): DataFrame = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(path)
    val reader =
      new ArrowFileReader(in.getChannel, alloc, CommonsCompressionFactory.INSTANCE)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toSeq
      val schema = StructType(fields.map(f =>
        StructField(f.getName, sparkType(f.getType), nullable = true)))
      val rows = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors.asScala.toSeq
        var i = 0
        while (i < root.getRowCount) {
          rows += Row.fromSeq(vectors.map(v => cell(v, i)))
          i += 1
        }
      }
      spark.createDataFrame(rows.result().asJava, schema)
    } finally {
      reader.close(); in.close(); alloc.close()
    }
  }

  private def cell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: TinyIntVector  => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: IntVector      => x.get(i)
      case x: BigIntVector   => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: Float8Vector   => x.get(i)
      case x: VarCharVector  => new String(x.get(i), "UTF-8")
      case x: BitVector      => x.get(i) == 1
      case x: VarBinaryVector => x.get(i)
      case other =>
        throw new IllegalArgumentException(s"unsupported vector ${other.getClass}")
    }

  /** Write a DataFrame as one uncompressed Arrow IPC file. Collects to
    * the driver (egress of a SMALL result — same contract as toNpy). */
  def toArrow(df: DataFrame, path: String): Unit = {
    val data = df.collect()
    val sparkSchema = df.schema
    def arrowType(dt: DataType): ArrowType = dt match {
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => new ArrowType.Utf8()
      case BooleanType => new ArrowType.Bool()
      case BinaryType => new ArrowType.Binary()
      case other =>
        throw new IllegalArgumentException(s"unsupported spark type $other")
    }
    val schema = new Schema(sparkSchema.map(f =>
      new Field(f.name, FieldType.nullable(arrowType(f.dataType)), null)).asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val out = new FileOutputStream(path)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    try {
      root.allocateNew()
      data.zipWithIndex.foreach { case (row, i) =>
        sparkSchema.indices.foreach { c =>
          val v = root.getVector(c)
          if (row.isNullAt(c)) v.setNull(i)
          else (v, row.get(c)) match {
            case (x: TinyIntVector, b: Byte)    => x.setSafe(i, b)
            case (x: SmallIntVector, s: Short)  => x.setSafe(i, s)
            case (x: IntVector, n: Int)         => x.setSafe(i, n)
            case (x: BigIntVector, n: Long)     => x.setSafe(i, n)
            case (x: Float4Vector, f: Float)    => x.setSafe(i, f)
            case (x: Float8Vector, d: Double)   => x.setSafe(i, d)
            case (x: VarCharVector, s: String)  => x.setSafe(i, s.getBytes("UTF-8"))
            case (x: BitVector, b: Boolean)     => x.setSafe(i, if (b) 1 else 0)
            case (x: VarBinaryVector, b: Array[Byte]) => x.setSafe(i, b)
            case (vec, value) => throw new IllegalArgumentException(
              s"cell mismatch ${vec.getClass}/${value.getClass}")
          }
        }
      }
      root.setRowCount(data.length)
      writer.start(); writer.writeBatch(); writer.end()
    } finally {
      writer.close(); out.close(); root.close(); alloc.close()
    }
  }

  private implicit class SetNullOps(private val v: FieldVector) extends AnyVal {
    def setNull(i: Int): Unit = v match {
      case x: TinyIntVector   => x.setNull(i)
      case x: SmallIntVector  => x.setNull(i)
      case x: IntVector       => x.setNull(i)
      case x: BigIntVector    => x.setNull(i)
      case x: Float4Vector    => x.setNull(i)
      case x: Float8Vector    => x.setNull(i)
      case x: VarCharVector   => x.setNull(i)
      case x: BitVector       => x.setNull(i)
      case x: VarBinaryVector => x.setNull(i)
      case other =>
        throw new IllegalArgumentException(s"unsupported vector ${other.getClass}")
    }
  }
}
