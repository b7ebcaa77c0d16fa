package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIo

class AvroIoSpec extends AnyFunSuite with SparkFixture {

  private def tmp(): String =
    Files.createTempDirectory("graft-avro").toString + "/t"

  test("round-trip: every supported type, nulls, binary, multi-partition") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, 10L, 1.5f, 2.5, true, Option("a"), Option(Array[Byte](1, 2, 3))),
      (2, -20L, -0.5f, -1.25, false, None, None),
      (3, 0L, 0f, 0.0, true, Option(""), Option(Array.empty[Byte])))
      .toDF("i", "l", "f", "d", "b", "s", "bin")
      .repartition(3)
    val dir = tmp()
    AvroIo.toAvro(df, dir)
    val back = AvroIo.readAvro(s, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    def canon(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1), r.getFloat(2), r.getDouble(3), r.getBoolean(4),
        Option(r.getString(5)),
        Option(r.getAs[Array[Byte]](6)).map(_.toSeq))
    assert(back.collect().map(canon).sortBy(_._1).toSeq ==
      df.collect().map(canon).sortBy(_._1).toSeq)
  }

  test("one container file per non-empty input partition; deflate by default") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    AvroIo.toAvro((1 to 100).toDF("n").repartition(4), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)
    // container magic + the codec recorded in the file metadata
    val head = Files.readAllBytes(files.head.toPath)
    assert(head.take(4).sameElements("Obj".getBytes("ISO-8859-1")))
    assert(new String(head, "ISO-8859-1").contains("deflate"))
    assert(AvroIo.readAvro(s, dir).collect().map(_.getInt(0)).sorted.toSeq == (1 to 100))
  }

  test("empty partitions write no file; re-write replaces stale output") {
    val s = spark
    import s.implicits._
    val dir = tmp()
    AvroIo.toAvro(Seq(1, 2).toDF("n").repartition(8), dir, codec = None)
    val first = new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro"))
    assert(first <= 2 && first >= 1)
    AvroIo.toAvro(Seq(9).toDF("n").coalesce(1), dir)
    assert(AvroIo.readAvro(s, dir).collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("unsupported types fail loudly in both directions") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      AvroIo.toAvro(Seq((1, Seq(1, 2))).toDF("i", "arr"), tmp()))
    assert(e.getMessage.contains("unsupported Spark type"))
    intercept[IllegalArgumentException](
      AvroIo.toAvro(Seq((1, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("i", "ts"), tmp()))
  }

  test("readAvro resolves later files BY NAME: reordered fields decode correctly") {
    val s = spark
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("graft-avro-reorder")
    val s1 = SchemaBuilder.record("r").fields()
      .requiredInt("a").requiredString("b").endRecord()
    val s2 = SchemaBuilder.record("r").fields()
      .requiredString("b").requiredInt("a").endRecord() // same fields, swapped
    def write(name: String, sch: org.apache.avro.Schema, a: Int, b: String): Unit = {
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, dir.resolve(name).toFile)
      val rec = new GenericData.Record(sch); rec.put("a", a); rec.put("b", b)
      w.append(rec); w.close()
    }
    write("0.avro", s1, 1, "x")
    write("1.avro", s2, 2, "y") // positional decode would land y in column a
    val got = AvroIo.readAvro(s, dir.toString).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "x"), (2, "y")))
  }

  test("readAvro: schema from the writer's embedded schema, wide-union rejected") {
    val s = spark
    import s.implicits._
    // hand-write a file whose field is a [null,int,string] union
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val sch = SchemaBuilder.record("r").fields()
      .name("x").`type`(Schema.createUnion(
        java.util.Arrays.asList(Schema.create(Schema.Type.NULL),
          Schema.create(Schema.Type.INT), Schema.create(Schema.Type.STRING))))
      .noDefault().endRecord()
    val dir = Files.createTempDirectory("graft-avro-union")
    val f = dir.resolve("u.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, f)
    val rec = new GenericData.Record(sch); rec.put("x", 1)
    w.append(rec); w.close()
    val e = intercept[IllegalArgumentException](AvroIo.readAvro(s, f.toString))
    assert(e.getMessage.contains("unsupported union"))
  }
}
