package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container-file source/sink built directly on the Avro
  * Java library the Spark image already ships (`avro-1.12.1.jar`) —
  * the external `spark-avro` DataSource module is not bundled, and the
  * Kafka-dump / schema-registry world a 100 TB pipeline ingests from
  * speaks Avro. Same extension posture as the Npy/Pickle/Arrow codecs
  * (reference io parity: io.py reads only csv/json/pickle/numpy —
  * this is §2.11 surface).
  *
  * Scale shape, unlike those driver-side codecs: BOTH directions are
  * distributed. Writes emit one container file per input partition
  * through the Hadoop FileSystem API (local fs here, HDFS/object
  * stores on a cluster); reads parallelize over the file list and
  * decode each container where it lands, so a directory of N files
  * scans with N-way parallelism and no driver materialization. Avro's
  * per-block structure would also admit sub-file splits; per-file
  * granularity matches the common many-files layout Kafka connect
  * sinks produce.
  *
  * Type lattice (both directions, nullable as the standard
  * `[null, T]` union): boolean/int/long/float/double/string/binary.
  * Anything else fails loudly at write/read time — no silent
  * stringification. */
object AvroIo {

  private val SupportedMsg =
    "AvroIo supports boolean/int/long/float/double/string/binary " +
      "(nullable via [null, T] unions)"

  // ------------------------------------------------------------ schema

  private[sources] def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported Spark type $other for field ${f.name}; $SupportedMsg")
      }
      val s =
        if (f.nullable)
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
        else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Unwrap `[null, T]` unions; reject anything wider. */
  private def nonNullBranch(s: Schema): (Schema, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nn = branches.filter(_.getType != Schema.Type.NULL)
      if (nn.size != 1) throw new IllegalArgumentException(
        s"AvroIo: unsupported union $s; $SupportedMsg")
      (nn.head, branches.size != nn.size)
    case _ => (s, false)
  }

  private[sources] def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"AvroIo: top-level Avro type must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (base, nullable) = nonNullBranch(f.schema())
      val t = base.getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.LONG    => LongType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.STRING  => StringType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported Avro type $other for field ${f.name}; $SupportedMsg")
      }
      StructField(f.name, t, nullable)
    }.toSeq)
  }

  // ------------------------------------------------------------- write

  /** Write `df` as a directory of Avro container files, one per input
    * partition, via the Hadoop FileSystem API. `codec`: None (null
    * codec) or Some("deflate") — deflate is JDK-native; snappy would
    * drag in platform natives the jar policy avoids. */
  def toAvro(df: DataFrame, path: String,
             codec: Option[String] = Some("deflate")): Unit = {
    val avroJson = toAvroSchema(df.schema, "row").toString
    val codecName = codec.map(_.toLowerCase)
    codecName.foreach(c => require(c == "deflate",
      s"AvroIo.toAvro: unsupported codec $c (only deflate)"))
    val sparkSchema = df.schema
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // clear stale output so a re-write never mixes generations
    val fs0 = new HPath(path).getFileSystem(conf.value)
    fs0.delete(new HPath(path), true)
    fs0.mkdirs(new HPath(path))
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val out = new HPath(path, f"part-$i%05d.avro")
        val os = out.getFileSystem(conf.value).create(out, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        if (codecName.contains("deflate")) w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, os)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(schema)
            var j = 0
            while (j < sparkSchema.length) {
              val v = row.get(j) match {
                case null => null
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case x => x
              }
              rec.put(j, v)
              j += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes the stream too
        Iterator.single(1)
      }
    }.count(): Unit
  }

  // -------------------------------------------------------------- read

  /** Read a file or directory of Avro container files as a DataFrame.
    * Schema comes from the first file's embedded writer schema (every
    * file must agree — this is a single-generation reader; evolving
    * generations go through readParquetEvolved's lattice after a
    * one-time conversion). Decoding is distributed: one task per file. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new HPath(path).getFileSystem(conf.value)
    val files = {
      val p = new HPath(path)
      val all =
        if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
        else Seq(fs.getFileStatus(p))
      all.filter(s => s.isFile && s.getLen > 0 &&
          !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).sorted
    }
    require(files.nonEmpty, s"AvroIo.readAvro: no files under $path")
    val readerSchema = {
      val in = fs.open(new HPath(files.head))
      val st = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try st.getSchema finally st.close()
    }
    val readerSchemaJson = readerSchema.toString
    val sparkSchema = toSparkSchema(readerSchema)
    val n = sparkSchema.length
    val rdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val in = new HPath(f).getFileSystem(conf.value).open(new HPath(f))
        // each file's embedded writer schema resolves against the
        // first file's schema BY NAME (Avro schema resolution) — a
        // reordered file decodes correctly, an incompatible one fails
        // loudly instead of silently landing values in the wrong column
        val expected = new Schema.Parser().parse(readerSchemaJson)
        val st = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord](null, expected))
        // a task that dies mid-file must not leak the stream
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => st.close()))
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            val h = !closed && st.hasNext
            if (!h && !closed) { st.close(); closed = true }
            h
          }
          def next(): Row = {
            val rec = st.next()
            val vals = new Array[Any](n)
            var j = 0
            while (j < n) {
              vals(j) = rec.get(j) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case x => x
              }
              j += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
