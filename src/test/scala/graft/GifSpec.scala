package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GifFramesCodec, MediaCodecSpi, Multimodal}
import graft.operators.Multimodal.MediaRecord

/** Animated-GIF frame extraction through the MediaCodecSpi seam. */
class GifSpec extends AnyFunSuite with SparkFixture {

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = r.toByte; rgb(i + 1) = g.toByte; rgb(i + 2) = b.toByte
      i += 3
    }
    rgb
  }

  test("animated GIF round-trips: every frame decodes to its exact color") {
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (40, 80, 120))
    val gif = GifFramesCodec.encodeAnimatedGif(10, 6,
      colors.map { case (r, g, b) => solid(10, 6, r, g, b) })
    val frames = GifFramesCodec.frames(gif).get
    assert(frames.length == 4)
    frames.zip(colors).foreach { case (png, (r, g, b)) =>
      val d = Multimodal.ImageCodec.decode(png).get
      assert(d.width == 10 && d.height == 6)
      // GIF palettes are exact for solid colors; PNG re-encode is lossless
      assert((d.rgb(0) & 0xFF, d.rgb(1) & 0xFF, d.rgb(2) & 0xFF) == ((r, g, b)))
      assert(d.rgb.grouped(3).forall(p =>
        (p(0) & 0xFF) == r && (p(1) & 0xFF) == g && (p(2) & 0xFF) == b))
    }
  }

  test("single-frame and non-GIF payloads behave at the boundary") {
    val one = GifFramesCodec.encodeAnimatedGif(4, 4, Seq(solid(4, 4, 7, 8, 9)))
    assert(GifFramesCodec.frames(one).get.length == 1)
    val png = Multimodal.ImageCodec.encodePng(4, 4, solid(4, 4, 1, 2, 3))
    assert(GifFramesCodec.frames(png).isEmpty, "PNG is not this codec's format")
    assert(GifFramesCodec.frames("nope".getBytes).isEmpty)
  }

  test("frame-count budget rejects a bomb before allocation") {
    val many = GifFramesCodec.encodeAnimatedGif(2, 2,
      Seq.fill(GifFramesCodec.MaxFrames + 1)(solid(2, 2, 1, 1, 1)))
    assert(GifFramesCodec.frames(many).isEmpty)
  }

  test("explodeFrames walks an image/gif through the SPI end-to-end") {
    assert(MediaCodecSpi.forType("image/gif").exists(_.isInstanceOf[GifFramesCodec]))
    val s = spark
    import s.implicits._
    val gif = GifFramesCodec.encodeAnimatedGif(8, 8,
      (0 until 6).map(f => solid(8, 8, f * 40, 10, 200 - f * 30)))
    val media = Seq(
      MediaRecord(1L, "image/gif", gif, 8, 8, 0L),
      MediaRecord(2L, "image/gif", "corrupt".getBytes, 0, 0, 0L)).toDS()
    val frames = Multimodal.explodeFrames(media, 4).collect()
    val real = frames.filter(f => f.id == 1L && f.decoded)
    // 6 source frames sampled to 4 with ceiling stride 2: indices 0,2,4
    assert(real.map(_.frameIndex).sorted.toSeq == Seq(0, 2, 4))
    real.foreach { f =>
      val d = Multimodal.ImageCodec.decode(f.frame).get
      assert(d.width == 8 && d.height == 8)
      assert((d.rgb(0) & 0xFF) == f.frameIndex / 2 * 2 * 40)
    }
    assert(frames.filter(_.id == 2L).forall(!_.decoded),
      "corrupt gif falls to the flagged stub path")
  }

  test("frames compose with imageDHashes for cross-frame dedup") {
    val s = spark
    import s.implicits._
    // two GIFs sharing one identical frame: explode then dHash-pair.
    // patterned frames, not solids — every solid dHashes to 0, which
    // would make the equality assertion vacuous
    def pattern(seed: Int): Array[Byte] =
      Array.tabulate(16 * 12 * 3) { i =>
        ((((i / 3 + seed * 977L) * 2654435761L) >>> 24) & 0xFF).toByte
      }
    val shared = pattern(7)
    val g1 = GifFramesCodec.encodeAnimatedGif(16, 12, Seq(shared, pattern(1)))
    val g2 = GifFramesCodec.encodeAnimatedGif(16, 12, Seq(pattern(2), shared))
    val media = Seq(
      MediaRecord(1L, "image/gif", g1, 16, 12, 0L),
      MediaRecord(2L, "image/gif", g2, 16, 12, 0L)).toDS()
    val asImages = Multimodal.explodeFrames(media, 4)
      .map(f => MediaRecord(f.id * 10 + f.frameIndex, "image/png", f.frame, 0, 0, 0L))
    val hashes = Multimodal.imageDHashes(asImages).collect()
    val byId = hashes.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ids 10 (gif1 frame0) and 21 (gif2 frame1) carry the shared frame
    assert(byId(10L) == byId(21L), "identical shared frame must hash identically")
    assert(byId(11L) != byId(20L), "distinct patterned frames must differ")
    assert(byId(10L) != byId(11L), "frames within one gif must differ")
  }
}
