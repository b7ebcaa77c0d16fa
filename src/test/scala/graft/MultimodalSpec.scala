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
    // record 1 claims image/jpeg but carries undecodable bytes: the
    // quarantine path must yield byte-level stats with decoded=false
    assert(f(1L).nBytes == 2 && !f(1L).decoded)
    assert(f(1L).byteMean == (97.0 + 98.0) / 2)
    assert(f(1L).byteSum == 97L + 98L)
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

  // deterministic 8x6 RGB gradient: rgb(i) = (7*i) % 256
  private def gradientRgb(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((7 * i) % 256).toByte)

  test("ImageCodec: encodePng -> decode round-trips pixels exactly") {
    val (w, h) = (8, 6)
    val rgb = gradientRgb(w, h)
    val png = Multimodal.ImageCodec.encodePng(w, h, rgb)
    val d = Multimodal.ImageCodec.decode(png).get
    assert(d.width == w && d.height == h && d.channels == 3)
    assert(d.rgb.toSeq == rgb.toSeq) // PNG is lossless
  }

  test("ImageCodec: resize changes dimensions, output is decodable PNG") {
    val png = Multimodal.ImageCodec.encodePng(8, 6, gradientRgb(8, 6))
    val out = Multimodal.ImageCodec.resize(png, 4, 3).get
    val d = Multimodal.ImageCodec.decode(out).get
    assert(d.width == 4 && d.height == 3)
    assert(Multimodal.ImageCodec.resize(png, 0, 3).isEmpty)
  }

  test("ImageCodec: corrupt bytes and truncated payloads yield None, not a throw") {
    assert(Multimodal.ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decode(Array.emptyByteArray).isEmpty)
    val png = Multimodal.ImageCodec.encodePng(8, 6, gradientRgb(8, 6))
    assert(Multimodal.ImageCodec.decode(png.take(20)).isEmpty)
    assert(Multimodal.ImageCodec.resize("junk".getBytes, 4, 4).isEmpty)
  }

  test("ImageCodec: decompression bomb (huge declared dims) is rejected by the pixel budget") {
    // hand-built PNG signature + IHDR declaring 100000x100000: the header
    // guard must reject it BEFORE allocating w*h pixel buffers
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes(StandardCharsets.US_ASCII))
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    ihdr.write(be32(100000)) // width
    ihdr.write(be32(100000)) // height
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth, RGB, std flags
    val body = ihdr.toByteArray
    bos.write(be32(body.length - 4))
    bos.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    bos.write(be32(crc.getValue.toInt))
    assert(Multimodal.ImageCodec.decode(bos.toByteArray).isEmpty)
  }

  // strong horizontal gradient: adjacent-pixel comparisons are decisive,
  // so the dHash is stable under rescale/mild noise
  private def gradientPng(w: Int, h: Int, reversed: Boolean = false): Array[Byte] = {
    val rgb = Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w
      val v = (x * 255 / (w - 1)) & 0xff
      (if (reversed) 255 - v else v).toByte
    }
    Multimodal.ImageCodec.encodePng(w, h, rgb)
  }

  test("dHash: stable under rescale and mild noise, far for a reversed gradient") {
    val a = Multimodal.ImageCodec.dHash(gradientPng(32, 24)).get
    val rescaled = Multimodal.ImageCodec.resize(gradientPng(32, 24), 16, 12).get
    val b = Multimodal.ImageCodec.dHash(rescaled).get
    val rev = Multimodal.ImageCodec.dHash(gradientPng(32, 24, reversed = true)).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) <= 4, s"rescale moved dHash by ${ham(a, b)} bits")
    assert(ham(a, rev) >= 32, s"reversed gradient only ${ham(a, rev)} bits away")
    assert(Multimodal.ImageCodec.dHash("junk".getBytes).isEmpty)
  }

  test("imageNearDupPairs pairs the rescaled twin, not the reversed image") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      MediaRecord(1L, "image/png", gradientPng(32, 24), 32, 24, 0L),
      MediaRecord(2L, "image/png",
        Multimodal.ImageCodec.resize(gradientPng(32, 24), 16, 12).get, 16, 12, 0L),
      MediaRecord(3L, "image/png", gradientPng(32, 24, reversed = true), 32, 24, 0L),
      MediaRecord(4L, "image/png", "corrupt".getBytes, 0, 0, 0L), // dropped, not fatal
      MediaRecord(5L, "audio/wav", Array.tabulate(16)(_.toByte), 0, 0, 0L)).toDS()
    val pairs = Multimodal.imageNearDupPairs(ds, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("AudioCodec: encodeWav -> decode round-trips PCM and format facts") {
    val samples = Array.tabulate(1000)(i => ((i * 7) % 256).toByte)
    val wav = Multimodal.AudioCodec.encodeWav(8000, samples)
    val d = Multimodal.AudioCodec.decode(wav).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bitsPerSample == 8)
    assert(d.durationMs == 125) // 1000 frames at 8 kHz
    assert(d.pcm.toSeq == samples.toSeq)
  }

  test("AudioCodec: corrupt, truncated, and over-budget payloads yield None") {
    assert(Multimodal.AudioCodec.decode("not audio".getBytes).isEmpty)
    assert(Multimodal.AudioCodec.decode(Array.emptyByteArray).isEmpty)
    val wav = Multimodal.AudioCodec.encodeWav(8000, Array.tabulate(1000)(_.toByte))
    // header intact, data chunk cut short: the frame count lies -> None
    assert(Multimodal.AudioCodec.decode(wav.take(wav.length - 500)).isEmpty)
    // declared PCM past the budget is rejected before allocation
    assert(Multimodal.AudioCodec.decode(wav, maxBytes = 100).isEmpty)
  }

  // 65 bins x 20 samples; bin magnitudes from a seeded generator, samples
  // alternating above/below center so mean |b-128| per bin = the magnitude
  private def binsWav(seed: Long, reverse: Boolean = false): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val samples = (0 until 65).flatMap { k =>
      val m = ((mix(seed * 67 + k) & 7L) * 16L).toInt
      val bin = (0 until 20).map(j => (128 + (if (j % 2 == 0) m else -m)).toByte)
      if (reverse) bin.reverse else bin
    }.toArray
    Multimodal.AudioCodec.encodeWav(8000, samples)
  }

  test("aHash: invariant to within-bin permutation, far for a different energy profile") {
    val a = Multimodal.AudioCodec.aHash(binsWav(1L)).get
    val permuted = Multimodal.AudioCodec.aHash(binsWav(1L, reverse = true)).get
    val other = Multimodal.AudioCodec.aHash(binsWav(2L)).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(a == permuted) // energy profile identical, waveform bytes differ
    assert(ham(a, other) >= 16, s"different profile only ${ham(a, other)} bits away")
    assert(Multimodal.AudioCodec.aHash("junk".getBytes).isEmpty)
    // decodable but too short to fill 65 bins: dropped (None), not a
    // constant hash that would pair every short clip with every other
    val tiny = Multimodal.AudioCodec.encodeWav(8000, Array.tabulate(32)(i => (128 + i).toByte))
    assert(Multimodal.AudioCodec.decode(tiny).nonEmpty)
    assert(Multimodal.AudioCodec.aHash(tiny).isEmpty)
  }

  test("ImageCodec.decode rejects an overflow-prone maxPixels budget loudly") {
    val png = Multimodal.ImageCodec.encodePng(2, 2, Array.fill(12)(7.toByte))
    assert(Multimodal.ImageCodec.decode(png, maxPixels = Int.MaxValue / 3L).nonEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.ImageCodec.decode(png, maxPixels = Int.MaxValue / 3L + 1)
    }
  }

  test("audioNearDupPairs pairs the permuted twin, not a different clip") {
    val s = spark
    import s.implicits._
    val ds = Seq(
      MediaRecord(1L, "audio/wav", binsWav(1L), 0, 0, 0L),
      MediaRecord(2L, "audio/wav", binsWav(1L, reverse = true), 0, 0, 0L),
      MediaRecord(3L, "audio/wav", binsWav(9L), 0, 0, 0L),
      MediaRecord(4L, "audio/wav", "corrupt".getBytes, 0, 0, 0L),
      MediaRecord(5L, "image/png", gradientPng(8, 8), 8, 8, 0L)).toDS()
    val pairs = Multimodal.audioNearDupPairs(ds, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("extractFeatures dispatches audio/* through the real codec") {
    val s = spark
    import s.implicits._
    val samples = Array.tabulate(1000)(i => ((i * 7) % 256).toByte)
    val wav = Multimodal.AudioCodec.encodeWav(8000, samples)
    val ds = Seq(
      MediaRecord(20L, "audio/wav", wav, 0, 0, 0L),
      MediaRecord(21L, "audio/mpeg", Array.tabulate(64)(_.toByte), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().map(x => x.id -> x).toMap
    assert(f(20L).decoded && f(20L).sampleRate == 8000 && f(20L).channels == 1
      && f(20L).durationMs == 125)
    assert(f(20L).nBytes == 1000) // PCM stats, not container-byte stats
    assert(f(20L).byteSum == samples.map(_ & 0xff).map(_.toLong).sum)
    assert(!f(21L).decoded && f(21L).nBytes == 64) // no mp3 SPI: quarantine path
  }

  test("extractFeatures + resizeAll dispatch image/* through the real codec") {
    val s = spark
    import s.implicits._
    val (w, h) = (8, 6)
    val rgb = gradientRgb(w, h)
    val png = Multimodal.ImageCodec.encodePng(w, h, rgb)
    val ds = Seq(
      MediaRecord(10L, "image/png", png, w, h, 0L),
      MediaRecord(11L, "audio/wav", Array.tabulate(64)(_.toByte), 0, 0, 500L)).toDS()

    val f = Multimodal.extractFeatures(ds).collect().map(x => x.id -> x).toMap
    assert(f(10L).decoded && f(10L).width == w && f(10L).height == h
      && f(10L).channels == 3)
    assert(f(10L).nBytes == w * h * 3) // pixel-buffer stats, not PNG-byte stats
    assert(f(10L).byteSum == rgb.map(_ & 0xff).map(_.toLong).sum)
    assert(!f(11L).decoded && f(11L).nBytes == 64)

    val r = Multimodal.resizeAll(ds, 4, 3).collect().map(m => m.id -> m).toMap
    val d = Multimodal.ImageCodec.decode(r(10L).payload).get
    assert(d.width == 4 && d.height == 3)
    assert(r(10L).width == 4 && r(10L).height == 3)
  }

  test("resizeAll quarantines rows no codec can resize: payload AND dims untouched") {
    val out = Multimodal.resizeAll(media, 4, 4).collect().map(m => m.id -> m).toMap
    // audio/wav has no resize codec: the row rides through unchanged —
    // fabricating a stride-sampled payload would LOOK resized downstream
    assert(out(2L).payload.length == 256)
    assert(out(2L).width == 0 && out(2L).height == 0)
    // undecodable image bytes: same quarantine, dims betray no resize ran
    assert(out(1L).payload.toSeq == "ab".getBytes(StandardCharsets.UTF_8).toSeq)
    assert(out(1L).width == 2 && out(1L).height == 1)
  }

  test("SPI codec: ServiceLoader fake decodes a compressed format through extractFeatures") {
    val s = spark
    import s.implicits._
    assert(graft.operators.MediaCodecSpi.registered
      .exists(_.isInstanceOf[FakeCompressedCodec]))
    val raw = Array.tabulate(100)(_.toByte)
    val ds = Seq(
      MediaRecord(1L, FakeCompressedCodec.AudioType, raw, 0, 0, 0L),
      MediaRecord(2L, FakeCompressedCodec.AudioType, Array(1.toByte), 0, 0, 0L),
      MediaRecord(3L, "audio/mpeg", Array.tabulate(64)(_.toByte), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().map(x => x.id -> x).toMap
    // claimed + decodable: REAL features from the plugged-in codec
    assert(f(1L).decoded && f(1L).sampleRate == 44100 && f(1L).channels == 2)
    assert(f(1L).nBytes == 100)
    assert(f(1L).byteSum == raw.map(b => ((b ^ 0x5a) & 0xff).toLong).sum)
    // claimed but "corrupt" (SPI returns None): flagged, not fabricated
    assert(!f(2L).decoded)
    // unclaimed compressed type with no codec: flagged, not fabricated
    assert(!f(3L).decoded && f(3L).sampleRate == 0)
  }

  test("SPI codec: frames route through explodeFrames as decoded; stub rows are flagged") {
    val s = spark
    import s.implicits._
    val payload = Array.tabulate(12)(_.toByte) // 4 fake frames of 3 bytes
    val ds = Seq(
      MediaRecord(1L, FakeCompressedCodec.VideoType, payload, 0, 0, 0L),
      MediaRecord(2L, "video/mp4", payload, 0, 0, 0L)).toDS()
    val fr = Multimodal.explodeFrames(ds, 2).collect()
    val real = fr.filter(_.id == 1L)
    assert(real.length == 2 && real.forall(_.decoded))
    assert(real.map(_.frameIndex).sorted.toSeq == Seq(0, 2)) // ceiling stride over 4
    assert(real.forall(_.frame.length == FakeCompressedCodec.FrameBytes))
    val stub = fr.filter(_.id == 2L)
    assert(stub.nonEmpty && stub.forall(!_.decoded)) // byte-chunks, flagged
    // SPI resize path: video type takes w*h bytes deterministically
    val r = Multimodal.resizeAll(ds, 2, 2).collect().map(m => m.id -> m).toMap
    assert(r(1L).payload.length == 4 && r(1L).width == 2)
    assert(r(2L).payload.length == 12 && r(2L).width == 0) // no codec: quarantined
  }

  test("sampleFrames splits payload into n chunks") {
    val frames = Multimodal.StubCodecs.sampleFrames(Array.tabulate(100)(_.toByte), 4)
    assert(frames.size == 4)
    assert(frames.map(_.length).sum == 100)
  }

  private def solidJpeg(v: Int) =
    Multimodal.VideoCodec.encodeJpeg(8, 8, Array.fill(8 * 8 * 3)(v.toByte))

  test("VideoCodec: MJPEG-AVI round-trip, frames decode as images, guards hold") {
    val frames = (0 until 4).map(f => solidJpeg(40 + f * 50))
    val avi = Multimodal.VideoCodec.encodeMjpegAvi(frames)
    val got = Multimodal.VideoCodec.frames(avi).get
    assert(got.size == 4)
    assert(got.zip(frames).forall { case (a, b) => a.sameElements(b) })
    val img = Multimodal.ImageCodec.decode(got(1)).get
    assert(img.width == 8 && img.height == 8) // dims survive JPEG exactly
    assert(Multimodal.VideoCodec.frames("not a riff".getBytes).isEmpty)
    assert(Multimodal.VideoCodec.frames(avi.take(40)).isEmpty) // chunk header lies
    assert(Multimodal.VideoCodec.frames(avi, maxBytes = 10).isEmpty) // over budget
  }

  test("explodeFrames: real MJPEG frames with stride sampling; stub fallback for mp4") {
    val s = spark
    import s.implicits._
    val avi = Multimodal.VideoCodec.encodeMjpegAvi((0 until 4).map(f => solidJpeg(40 + f * 50)))
    val ds = Seq(
      MediaRecord(1L, "video/x-msvideo", avi, 8, 8, 160L),
      MediaRecord(2L, "video/mp4", Array.tabulate(120)(_.toByte), 0, 0, 0L)).toDS()
    val sampled = Multimodal.explodeFrames(ds, 2).collect()
    // real path: stride-sampled source indices, each frame a decodable JPEG
    assert(sampled.filter(_.id == 1L).map(_.frameIndex).sorted.toSeq == Seq(0, 2))
    assert(sampled.filter(_.id == 1L).forall(f =>
      Multimodal.ImageCodec.decode(f.frame).exists(d => d.width == 8 && d.height == 8)))
    // stub path untouched for formats without a JDK decoder
    assert(sampled.count(_.id == 2L) == 2)
    val all = Multimodal.explodeFrames(ds, 4).collect()
    assert(all.filter(_.id == 1L).map(_.frameIndex).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("explodeFrames: ceiling stride spans the stream when n <= frames < 2n") {
    val s = spark
    import s.implicits._
    // 7 frames, n=4: floor stride would return head frames 0-3 and never
    // see the tail; ceiling stride (step 2) samples 0,2,4,6 across it
    val avi = Multimodal.VideoCodec.encodeMjpegAvi((0 until 7).map(f => solidJpeg(30 + f * 30)))
    val ds = Seq(MediaRecord(1L, "video/x-msvideo", avi, 8, 8, 280L)).toDS()
    val idx = Multimodal.explodeFrames(ds, 4).collect().map(_.frameIndex).sorted.toSeq
    assert(idx == Seq(0, 2, 4, 6), s"sampled $idx")
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
