package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FfmpegCliCodec, MediaCodecSpi, Multimodal}
import graft.operators.Multimodal.MediaRecord

/** The ffmpeg-CLI SPI codec: binary gating, the WAV/MJPEG plumbing, and
  * end-to-end dispatch through extractFeatures — all against a FAKE
  * ffmpeg script (the container has no real one; the codec's claims()
  * gate is exactly what makes that safe in production too). */
class FfmpegCodecSpec extends AnyFunSuite with SparkFixture {

  /** Minimal PCM s16le WAV with ffmpeg-like layout. */
  private def wavBytes(channels: Int, rate: Int, samples: Int): Array[Byte] = {
    val dataLen = samples * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until samples * channels).foreach(i => bb.putShort((i % 1000).toShort))
    bb.array()
  }

  test("parseWav reads ffmpeg-shaped PCM output; rejects junk") {
    val m = FfmpegCliCodec.parseWav(wavBytes(1, 8000, 8000)).get
    assert(m.channels == 1 && m.sampleRate == 8000)
    assert(m.data.length == 16000 && m.durationMs == 1000L)
    val st = FfmpegCliCodec.parseWav(wavBytes(2, 44100, 441)).get
    assert(st.channels == 2 && st.durationMs == 10L)
    assert(FfmpegCliCodec.parseWav(Array.tabulate(64)(_.toByte)).isEmpty)
    assert(FfmpegCliCodec.parseWav(Array.empty[Byte]).isEmpty)
  }

  test("splitJpegs cuts an image2pipe stream on SOI/EOI markers") {
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(x => (0 until 4).foreach(y =>
        img.setRGB(x, y, shade)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val a = jpeg(0x336699)
    val b = jpeg(0x993366)
    val split = FfmpegCliCodec.splitJpegs(a ++ b)
    assert(split.length == 2)
    assert(split(0).sameElements(a) && split(1).sameElements(b))
    assert(FfmpegCliCodec.splitJpegs(Array.empty[Byte]).isEmpty)
    // each piece decodes independently (the frames() contract)
    split.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 4)
    }
  }

  test("claims gates on the binary: absent -> stubs stay stubs") {
    val prev = sys.props.get("graft.ffmpeg.bin")
    try {
      sys.props("graft.ffmpeg.bin") = "/nonexistent/ffmpeg"
      val c = new FfmpegCliCodec
      assert(!c.claims("audio/mpeg") && !c.claims("video/mp4"))
      assert(c.decode("audio/mpeg", Array[Byte](1, 2, 3)).isEmpty)
    } finally {
      prev match {
        case Some(p) => sys.props("graft.ffmpeg.bin") = p
        case None    => sys.props -= "graft.ffmpeg.bin"
      }
    }
  }

  test("fake ffmpeg binary: decode + ServiceLoader dispatch end-to-end") {
    val dir = Files.createTempDirectory("graft-ffmpeg-fake")
    val fixture = dir.resolve("fixture.wav")
    Files.write(fixture, wavBytes(1, 16000, 16000)) // 1 s of mono 16 kHz
    val script = dir.resolve("ffmpeg")
    Files.writeString(script,
      s"""#!/bin/sh
         |# fake ffmpeg: emit the canned wav at the last argument
         |for last in "$$@"; do :; done
         |cp ${fixture.toString} "$$last"
         |""".stripMargin)
    script.toFile.setExecutable(true)
    val prev = sys.props.get("graft.ffmpeg.bin")
    try {
      sys.props("graft.ffmpeg.bin") = script.toString
      val c = new FfmpegCliCodec
      assert(c.claims("audio/mpeg") && c.claims("video/mp4"))
      assert(!c.claims("image/png"), "images stay with the in-JDK codec")
      val m = c.decode("audio/mpeg", Array.tabulate(256)(_.toByte)).get
      assert(m.channels == 1 && m.sampleRate == 16000 && m.durationMs == 1000L)
      // registry dispatch: the registered instance claims the type too
      assert(MediaCodecSpi.forType("audio/mpeg").exists(_.isInstanceOf[FfmpegCliCodec]))
      // end-to-end through the operator: an "mp3" row now decodes, with
      // PCM-level (not container-level) stats
      val s = spark
      import s.implicits._
      val ds = Seq(MediaRecord(31L, "audio/mpeg",
        Array.tabulate(128)(_.toByte), 0, 0, 0L)).toDS()
      val f = Multimodal.extractFeatures(ds).collect().head
      assert(f.decoded && f.sampleRate == 16000 && f.channels == 1
        && f.durationMs == 1000L && f.nBytes == 32000)
    } finally {
      prev match {
        case Some(p) => sys.props("graft.ffmpeg.bin") = p
        case None    => sys.props -= "graft.ffmpeg.bin"
      }
    }
  }

  test("fake ffmpeg: a failing decode quarantines the ROW, not the task") {
    val dir = Files.createTempDirectory("graft-ffmpeg-fail")
    val fixture = dir.resolve("fixture.wav")
    Files.write(fixture, wavBytes(1, 16000, 16000))
    // fake ffmpeg with a corruption model: payloads under 200 bytes fail
    // (exit 1, like a real truncated mp3), larger ones decode to the
    // canned wav — so one batch exercises BOTH sides of the quarantine
    val script = dir.resolve("ffmpeg")
    Files.writeString(script,
      s"""#!/bin/sh
         |in=""; prev=""; last=""
         |for a in "$$@"; do
         |  [ "$$prev" = "-i" ] && in="$$a"
         |  prev="$$a"; last="$$a"
         |done
         |[ $$(wc -c < "$$in") -lt 200 ] && { echo corrupt >&2; exit 1; }
         |cp ${fixture.toString} "$$last"
         |""".stripMargin)
    script.toFile.setExecutable(true)
    val prev = sys.props.get("graft.ffmpeg.bin")
    try {
      sys.props("graft.ffmpeg.bin") = script.toString
      val s = spark
      import s.implicits._
      val ds = Seq(
        MediaRecord(1L, "audio/mpeg", Array.tabulate(512)(_.toByte), 0, 0, 0L),
        MediaRecord(2L, "audio/mpeg", Array.tabulate(64)(_.toByte), 0, 0, 0L))
        .toDS()
      val fs = Multimodal.extractFeatures(ds).collect().sortBy(_.id)
      assert(fs(0).decoded && fs(0).sampleRate == 16000
        && fs(0).durationMs == 1000L, "large payload decodes via the CLI")
      assert(!fs(1).decoded && fs(1).nBytes == 64,
        "corrupt payload degrades to byte-level quarantine stats")
    } finally {
      prev match {
        case Some(p) => sys.props("graft.ffmpeg.bin") = p
        case None    => sys.props -= "graft.ffmpeg.bin"
      }
    }
  }
}
