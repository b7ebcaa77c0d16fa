package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.{Npy, PsIO}

class NpySpec extends AnyFunSuite with SparkFixture {

  private def tmp(suffix: String): String =
    Files.createTempFile("npyspec", suffix).toString

  /** Hand-rolled NPY bytes, independent of the production writer, so the
    * reader round-trips are not writer-reflexive. */
  private def npyBytes(
      descr: String, shape: Seq[Int], fortran: Boolean,
      put: ByteBuffer => Unit, byteLen: Int, v2: Boolean = false): Array[Byte] = {
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)" else shape.mkString("(", ", ", ")")
    val dict =
      s"{'descr': '$descr', 'fortran_order': ${if (fortran) "True" else "False"}, " +
        s"'shape': $shapeStr, }\n"
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y'))
    if (v2) {
      out.write(2); out.write(0)
      val l = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(dict.length).array()
      out.write(l)
    } else {
      out.write(1); out.write(0)
      out.write(dict.length & 0xFF); out.write((dict.length >> 8) & 0xFF)
    }
    out.write(dict.getBytes(StandardCharsets.UTF_8))
    val buf = ByteBuffer.allocate(byteLen).order(
      if (descr.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    put(buf)
    out.write(buf.array())
    out.toByteArray
  }

  test("1-D i8 and f8 read back exactly") {
    val pi8 = tmp(".npy")
    Files.write(java.nio.file.Paths.get(pi8), npyBytes("<i8", Seq(4), fortran = false,
      b => Seq(7L, -1L, 0L, 42L).foreach(b.putLong), 32))
    val got = PsIO.readNpy(spark, pi8).df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(0L -> 7L, 1L -> -1L, 2L -> 0L, 3L -> 42L))

    val pf8 = tmp(".npy")
    Files.write(java.nio.file.Paths.get(pf8), npyBytes("<f8", Seq(3), fortran = false,
      b => Seq(1.5, -2.25, 0.0).foreach(b.putDouble), 24))
    val gotF = PsIO.readNpy(spark, pf8).df.collect().map(_.getDouble(1)).toSeq
    assert(gotF == Seq(1.5, -2.25, 0.0))
  }

  test("2-D f8: C order, Fortran order, and big-endian agree on content") {
    // matrix [[1,2,3],[4,5,6]]
    val c = tmp(".npy")
    Files.write(java.nio.file.Paths.get(c), npyBytes("<f8", Seq(2, 3), fortran = false,
      b => Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).foreach(b.putDouble), 48))
    val f = tmp(".npy") // same matrix column-major: 1,4,2,5,3,6
    Files.write(java.nio.file.Paths.get(f), npyBytes("<f8", Seq(2, 3), fortran = true,
      b => Seq(1.0, 4.0, 2.0, 5.0, 3.0, 6.0).foreach(b.putDouble), 48))
    val be = tmp(".npy")
    Files.write(java.nio.file.Paths.get(be), npyBytes(">f8", Seq(2, 3), fortran = false,
      b => Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).foreach(b.putDouble), 48))
    val expect = Seq(0L -> Seq(1.0, 2.0, 3.0), 1L -> Seq(4.0, 5.0, 6.0))
    for (p <- Seq(c, f, be)) {
      val got = PsIO.readNpy(spark, p).df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
      assert(got == expect, s"file $p")
    }
  }

  test("v2 header, i4/f4/b1/u1 dtypes, unsupported shapes rejected") {
    val v2 = tmp(".npy")
    Files.write(java.nio.file.Paths.get(v2), npyBytes("<i4", Seq(3), fortran = false,
      b => Seq(1, 2, 3).foreach(b.putInt), 12, v2 = true))
    assert(PsIO.readNpy(spark, v2).df.collect().map(_.getInt(1)).toSeq == Seq(1, 2, 3))

    val b1 = tmp(".npy")
    Files.write(java.nio.file.Paths.get(b1), npyBytes("|b1", Seq(3), fortran = false,
      b => Seq[Byte](1, 0, 1).foreach(b.put), 3))
    assert(PsIO.readNpy(spark, b1).df.collect().map(_.getBoolean(1)).toSeq ==
      Seq(true, false, true))

    val u1 = tmp(".npy")
    Files.write(java.nio.file.Paths.get(u1), npyBytes("|u1", Seq(2), fortran = false,
      b => Seq[Byte](0xFF.toByte, 7).foreach(b.put), 2))
    assert(PsIO.readNpy(spark, u1).df.collect().map(_.getInt(1)).toSeq == Seq(255, 7))

    val threeD = tmp(".npy")
    Files.write(java.nio.file.Paths.get(threeD), npyBytes("<f8", Seq(2, 2, 2),
      fortran = false, b => (1 to 8).foreach(i => b.putDouble(i)), 64))
    assertThrows[RuntimeException](PsIO.readNpy(spark, threeD))
  }

  test("npz archive entries read individually") {
    val p = tmp(".npz")
    val zip = new ZipOutputStream(new FileOutputStream(p))
    zip.putNextEntry(new ZipEntry("a.npy"))
    zip.write(npyBytes("<i8", Seq(2), fortran = false,
      b => Seq(10L, 20L).foreach(b.putLong), 16))
    zip.closeEntry()
    zip.putNextEntry(new ZipEntry("b.npy"))
    zip.write(npyBytes("<f8", Seq(1), fortran = false, _.putDouble(3.5), 8))
    zip.closeEntry()
    zip.close()
    assert(PsIO.readNpz(spark, p, "a").df.collect().map(_.getLong(1)).toSeq ==
      Seq(10L, 20L))
    assert(PsIO.readNpz(spark, p, "b").df.collect().map(_.getDouble(1)).toSeq ==
      Seq(3.5))
    assertThrows[RuntimeException](PsIO.readNpz(spark, p, "missing"))
  }

  test("writer round-trips scalar and matrix columns through the reader") {
    val s = spark
    import s.implicits._
    val scalars = Seq(3L, 1L, 2L).toDF("v").orderBy("v")
    val p1 = tmp(".npy")
    PsIO.toNpy(scalars, "v", p1)
    assert(PsIO.readNpy(spark, p1).df.collect().map(_.getLong(1)).toSeq ==
      Seq(1L, 2L, 3L))

    val mat = Seq((0L, Seq(1.0, 2.5)), (1L, Seq(-3.0, 4.0))).toDF("i", "vec")
      .orderBy("i")
    val p2 = tmp(".npy")
    PsIO.toNpy(mat, "vec", p2)
    assert(PsIO.readNpy(spark, p2).df.collect()
      .map(r => r.getSeq[Double](1)).toSeq == Seq(Seq(1.0, 2.5), Seq(-3.0, 4.0)))

    // ragged matrix rejected
    val ragged = Seq(Seq(1.0), Seq(1.0, 2.0)).toDF("vec")
    assertThrows[IllegalArgumentException](PsIO.toNpy(ragged, "vec", tmp(".npy")))
  }

  test("real embeddings survive a parquet -> npy -> Spark round-trip") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .orderBy("vec_id").limit(20)
    val p = tmp(".npy")
    PsIO.toNpy(e, "embedding", p)
    val back = PsIO.readNpy(spark, p).df.collect()
      .map(r => r.getSeq[Double](1)).toSeq
    val orig = e.collect().map(_.getSeq[Double](1)).toSeq
    assert(back == orig && orig.nonEmpty)
  }
}
