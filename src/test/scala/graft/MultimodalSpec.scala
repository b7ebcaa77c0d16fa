package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def media = {
    val s = spark
    import s.implicits._
    Seq(
      MediaRecord(1L, "image/jpeg", "ab".getBytes(StandardCharsets.UTF_8), 2, 1, 0L),
      MediaRecord(2L, "audio/wav", Array.tabulate(256)(_.toByte), 0, 0, 1000L),
      MediaRecord(3L, "image/png", Array.emptyByteArray, 0, 0, 0L))
      .toDS()
  }

  test("extractFeatures: deterministic stats over payload bytes") {
    val f = Multimodal.extractFeatures(media)
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).nBytes == 2)
    assert(f(1L).byteMean == (97.0 + 98.0) / 2)
    // 256 distinct byte values -> exactly 8 bits of entropy
    assert(math.abs(f(2L).byteEntropy - 8.0) < 1e-9)
    assert(f(3L).nBytes == 0 && f(3L).byteMean == 0.0)
    // FNV-1a of "ab" computed independently
    var fp = 0xcbf29ce484222325L
    "ab".getBytes(StandardCharsets.UTF_8).foreach { b =>
      fp ^= (b & 0xffL); fp *= 0x100000001b3L
    }
    assert(f(1L).fingerprint == fp)
  }

  test("resizeAll bounds payload size by target dims") {
    val out = Multimodal.resizeAll(media, 4, 4).collect().map(m => m.id -> m).toMap
    assert(out(2L).payload.length <= 16)
    assert(out(2L).width == 4 && out(2L).height == 4)
  }

  test("sampleFrames splits payload into n chunks") {
    val frames = Multimodal.StubCodecs.sampleFrames(Array.tabulate(100)(_.toByte), 4)
    assert(frames.size == 4)
    assert(frames.map(_.length).sum == 100)
  }

  test("column-level payload helpers agree with byte-level facts") {
    val s = spark
    import s.implicits._
    val d = Seq(Tuple1("héllo")).toDF("text")
    val r = d.select(
      Multimodal.payloadBytes(Multimodal.textAsPayload(col("text")))).head()
    assert(r.getInt(0) == 6) // é is 2 bytes in utf-8
  }

  test("asMedia lifts a DataFrame into the typed Dataset") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "image/jpeg", "xy".getBytes, 1, 1, 0L))
      .toDF("id", "mediaType", "payload", "width", "height", "durationMs")
    val ds = Multimodal.asMedia(df)
    assert(ds.collect().head.mediaType == "image/jpeg")
  }

  test("explodeFrames: one media row becomes n ordered frame rows, bytes conserved") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "video/mp4", Array.tabulate(120)(_.toByte), 0, 0, 4000L),
      (2L, "video/mp4", Array.emptyByteArray, 0, 0, 0L)) // empty payload -> 0 frames
      .toDF("id", "mediaType", "payload", "width", "height", "durationMs")
    val frames = Multimodal.explodeFrames(Multimodal.asMedia(df), 4).collect()
    assert(frames.count(_.id == 1L) == 4)
    assert(frames.filter(_.id == 1L).map(_.frameIndex).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.filter(_.id == 1L).map(_.frame.length).sum == 120)
    assert(!frames.exists(_.id == 2L))
  }
}
