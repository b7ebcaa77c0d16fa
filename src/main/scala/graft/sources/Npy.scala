package graft.sources

import java.io.{BufferedOutputStream, ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.api.PsDataFrame

/** NumPy `.npy` / `.npz` ingestion — the Spark face of the reference's
  * `read_numpy` (reference: pandasql/io.py:35-36; `read_pickle`,
  * io.py:39-40, is covered by the sibling [[Pickle]] codec).
  *
  * The NPY format is public and tiny (numpy/lib/format.py docs): magic
  * `\x93NUMPY`, version, a Python-dict header (`descr`, `fortran_order`,
  * `shape`), then the raw buffer. Like the reference's call (a local
  * in-memory `pd.read_numpy` handed to the engine), parsing happens on
  * the driver and the rows enter the plan through the same local-data
  * path as `fromLocal` — this is a LOCAL-data ingestion facade for
  * model-side artifacts (centroid matrices, eval embeddings, label
  * vectors), not a 100 TB source; corpus-scale arrays belong in parquet
  * (`embeddings.parquet`), where scans split and prune.
  *
  * Mapping: 1-D -> `(idx BIGINT, value <dtype>)`; 2-D -> `(idx BIGINT,
  * value ARRAY<dtype>)` — one row per array row, i.e. exactly the
  * embedding-column shape the similarity operators consume.
  */
object Npy {

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  private[sources] case class Header(
      descr: String, fortran: Boolean, shape: Seq[Int], dataOffset: Int)

  private[sources] def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length > 10 && bytes.take(6).sameElements(Magic),
      "not an NPY file (bad magic)")
    val major = bytes(6)
    val (headerLen, headerStart) =
      if (major == 1) (ByteBuffer.wrap(bytes, 8, 2).order(ByteOrder.LITTLE_ENDIAN)
        .getShort & 0xFFFF, 10)
      else (ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        .getInt, 12) // v2.0/3.0: 4-byte header length
    val header = new String(bytes, headerStart, headerLen, StandardCharsets.UTF_8)
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"NPY header missing descr: $header")).group(1)
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"NPY header missing fortran_order: $header"))
      .group(1) == "True"
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"NPY header missing shape: $header")).group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    Header(descr, fortran, shape, headerStart + headerLen)
  }

  /** element Spark type + reader for a dtype descr like `<f8`. */
  private def dtype(descr: String): (DataType, ByteBuffer => Any, Int) = {
    val (_, kind, width) = descr match {
      case s if s.length >= 2 =>
        val order = s.head match {
          case '<' | '>' | '|' | '=' => s.head
          case _ => '|' // bare descr like 'f8'
        }
        val rest = if (order == s.head) s.tail else s
        (order, rest.head, rest.tail.toInt)
      case s => sys.error(s"unsupported NPY descr: $s")
    }
    (kind, width) match {
      case ('f', 8) => (DoubleType, (b: ByteBuffer) => b.getDouble, 8)
      case ('f', 4) => (FloatType, (b: ByteBuffer) => b.getFloat, 4)
      case ('i', 8) => (LongType, (b: ByteBuffer) => b.getLong, 8)
      case ('i', 4) => (IntegerType, (b: ByteBuffer) => b.getInt, 4)
      case ('i', 2) => (ShortType, (b: ByteBuffer) => b.getShort, 2)
      case ('i', 1) => (ByteType, (b: ByteBuffer) => b.get, 1)
      case ('u', 1) => (IntegerType, (b: ByteBuffer) => b.get & 0xFF, 1)
      case ('b', 1) => (BooleanType, (b: ByteBuffer) => b.get != 0, 1)
      case _ => sys.error(s"unsupported NPY descr: $descr " +
        "(supported: f8 f4 i8 i4 i2 i1 u1 b1)")
    }
  }

  private def frameOf(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val h = parseHeader(bytes)
    val (elemType, read, width) = dtype(h.descr)
    val order = if (h.descr.startsWith(">")) ByteOrder.BIG_ENDIAN
                else ByteOrder.LITTLE_ENDIAN
    val n = h.shape.product
    val buf = ByteBuffer.wrap(bytes, h.dataOffset, n * width).order(order)
    val values = Array.tabulate[Any](n)(_ => read(buf))
    h.shape match {
      case Seq(_) | Seq() => // 0-D reads as one row
        val schema = StructType(Seq(
          StructField("idx", LongType, nullable = false),
          StructField("value", elemType, nullable = false)))
        val rows = values.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
        spark.createDataFrame(rows.toSeq.asJava, schema)
      case Seq(rowsN, cols) =>
        val schema = StructType(Seq(
          StructField("idx", LongType, nullable = false),
          StructField("value", ArrayType(elemType, containsNull = false),
            nullable = false)))
        // C order: row i is values[i*cols ..]; Fortran: column-major
        val rows = (0 until rowsN).map { i =>
          val arr = if (h.fortran) Seq.tabulate(cols)(j => values(j * rowsN + i))
                    else Seq.tabulate(cols)(j => values(i * cols + j))
          Row(i.toLong, arr)
        }
        spark.createDataFrame(rows.asJava, schema)
      case s => sys.error(s"NPY shape $s unsupported: 1-D and 2-D only " +
        "(reshape higher ranks upstream)")
    }
  }

  def readNpy(spark: SparkSession, path: String): PsDataFrame =
    PsDataFrame(frameOf(spark, Files.readAllBytes(Paths.get(path))))

  /** One named entry of an `.npz` archive (a zip of `.npy` members;
    * numpy names entry `x` as `x.npy`). */
  def readNpz(spark: SparkSession, path: String, entry: String): PsDataFrame = {
    val zf = new ZipFile(path)
    try {
      val name = if (entry.endsWith(".npy")) entry else s"$entry.npy"
      val ze = Option(zf.getEntry(name)).getOrElse(sys.error(
        s"npz entry '$name' not found; has: " +
          zf.entries().asScala.map(_.getName).mkString(", ")))
      PsDataFrame(frameOf(spark, zf.getInputStream(ze).readAllBytes()))
    } finally zf.close()
  }

  // ------------------------------------------------------------- writer

  private def descrOf(t: DataType): (String, (DataOutputStream, Any) => Unit) =
    t match {
      case DoubleType => ("<f8", (o, v) => o.writeLong(java.lang.Long.reverseBytes(
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))))
      case FloatType => ("<f4", (o, v) => o.writeInt(Integer.reverseBytes(
        java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))))
      case LongType => ("<i8", (o, v) => o.writeLong(
        java.lang.Long.reverseBytes(v.asInstanceOf[Long])))
      case IntegerType => ("<i4", (o, v) => o.writeInt(
        Integer.reverseBytes(v.asInstanceOf[Int])))
      case other => sys.error(s"toNpy supports double/float/long/int columns, got $other")
    }

  private def headerBytes(descr: String, shape: Seq[Int]): Array[Byte] = {
    val shapeStr = shape match {
      case Seq(n) => s"($n,)"
      case s => s.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val pad = 64 - ((10 + dict.length + 1) % 64) // +1 for the final \n
    val header = dict + (" " * (if (pad == 64) 0 else pad)) + "\n"
    val out = new ByteArrayOutputStream()
    out.write(Magic); out.write(1); out.write(0) // v1.0
    out.write(header.length & 0xFF); out.write((header.length >> 8) & 0xFF)
    out.write(header.getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** Driver-side NPY egress of one column — 1-D from a scalar column,
    * 2-D from an `ARRAY<numeric>` column (ragged rows rejected). Collects:
    * for model-side artifacts (index centroids, eval vectors), not corpus
    * egress — that is `toParquet`. Row order = `df`'s current order, so
    * sort first for a deterministic file. */
  def toNpy(df: DataFrame, valueCol: String, path: String): Unit = {
    val field = df.schema(valueCol)
    // buffered: the per-element writers emit 4-8 bytes each; unbuffered
    // that is one syscall per element on a large embedding matrix
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(path), 1 << 16))
    try field.dataType match {
      case ArrayType(elem, _) =>
        val (descr, write) = descrOf(elem)
        val raw = df.select(valueCol).collect()
        require(!raw.exists(_.isNullAt(0)),
          s"toNpy: '$valueCol' contains null rows; NPY has no null — filter or fill first")
        val rows = raw.map(_.getSeq[Any](0))
        val cols = rows.headOption.map(_.length).getOrElse(0)
        require(rows.forall(_.length == cols),
          s"toNpy: ragged '$valueCol' rows; NPY needs a rectangular matrix")
        require(rows.forall(!_.contains(null)),
          s"toNpy: '$valueCol' contains null elements; NPY has no null — filter or fill first")
        out.write(headerBytes(descr, Seq(rows.length, cols)))
        rows.foreach(_.foreach(write(out, _)))
      case scalar =>
        val (descr, write) = descrOf(scalar)
        val raw = df.select(valueCol).collect()
        require(!raw.exists(_.isNullAt(0)),
          s"toNpy: '$valueCol' contains nulls; NPY has no null — filter or fill first")
        val vals = raw.map(_.get(0))
        out.write(headerBytes(descr, Seq(vals.length)))
        vals.foreach(write(out, _))
    } finally out.close()
  }
}
