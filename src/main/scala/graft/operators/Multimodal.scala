package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support.
  *
  * Model: media is an opaque `binary` payload column plus typed metadata —
  * the same layout a 100 TB multimodal corpus uses in parquet (payload
  * bytes inline or as object-store references, metadata queryable without
  * touching payloads). Column pruning means metadata-only queries never
  * read payload bytes from parquet.
  *
  * The heavy per-item work (decode, resize, frame-sample, feature
  * extraction) runs via `mapPartitions` over a typed Dataset: one partition
  * = one batch of records through a (re-usable, per-partition-initialized)
  * decoder — the Scala analogue of arrow-batched UDFs. The actual codec
  * calls are STUBS (this container has no image/audio libraries):
  * [[StubCodecs]] documents exactly where a real libjpeg/ffmpeg call would
  * go and substitutes a deterministic fake so the plumbing (schema,
  * partitioning, batch shape, spill behavior) is fully testable.
  */
object Multimodal {

  /** One media item: opaque payload + metadata. */
  case class MediaRecord(
      id: Long,
      mediaType: String, // "image/jpeg", "audio/wav", "video/mp4", ...
      payload: Array[Byte],
      width: Int, // pixels (images/video); 0 when n/a
      height: Int,
      durationMs: Long) // audio/video; 0 for images

  /** Extracted features (decoder output). */
  case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Int,
      byteMean: Double,
      byteEntropy: Double,
      fingerprint: Long)

  /** Real image codec on `javax.imageio` (in-JDK, no external libs).
    * Handles PNG/JPEG/GIF/BMP — anything the JDK's ImageIO SPI registry
    * decodes. All functions are total: undecodable bytes yield `None`
    * rather than failing the task, so one corrupt blob in a 100 TB corpus
    * quarantines one row, not one partition.
    *
    * ImageIO reader/writer instances are not thread-safe but are cheap to
    * obtain from the static registry, so per-row `ImageIO.read` inside a
    * `mapPartitions` batch is the right granularity (the registry lookup
    * is a hash probe; the decode dominates).
    */
  object ImageCodec {
    /** Decoded image normalized to packed RGB (3 bytes/pixel, row-major).
      * `channels` reports the *source* color model's component count
      * (1=gray, 3=RGB, 4=RGBA/CMYK) before normalization. */
    case class DecodedImage(width: Int, height: Int, channels: Int, rgb: Array[Byte])

    /** Decode any ImageIO-supported format to packed RGB. None = not an
      * image these SPIs understand (or truncated/corrupt payload). */
    def decode(payload: Array[Byte]): Option[DecodedImage] =
      try {
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h * 3)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val argb = img.getRGB(x, y)
              out(i) = ((argb >> 16) & 0xff).toByte
              out(i + 1) = ((argb >> 8) & 0xff).toByte
              out(i + 2) = (argb & 0xff).toByte
              i += 3
              x += 1
            }
            y += 1
          }
          Some(DecodedImage(w, h, img.getColorModel.getNumComponents, out))
        }
      } catch { case _: Exception => None }

    /** Bilinear resize; re-encodes as PNG (lossless, in-JDK writer).
      * None = input not decodable. */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        val src = ImageIO.read(new ByteArrayInputStream(payload))
        if (src == null || w <= 0 || h <= 0) None
        else {
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }

    /** Encode packed RGB back to PNG bytes (fixture generation, tests,
      * synthetic corpora). */
    def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "encodePng: rgb length != w*h*3")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var i = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val r = rgb(i) & 0xff
          val gc = rgb(i + 1) & 0xff
          val b = rgb(i + 2) & 0xff
          img.setRGB(x, y, (r << 16) | (gc << 8) | b)
          i += 3
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Deterministic stand-ins for the codec calls the JDK can't do (audio,
    * video). Each function is where a production build would call into
    * libsndfile/ffmpeg; the fakes preserve the data-flow shape (bytes in,
    * bytes/features out) and are pure, so tests are reproducible. Images
    * go through the real [[ImageCodec]] instead. */
  object StubCodecs {
    /** REAL IMPL: decode(payload) → pixel buffer. Stub: identity view. */
    def decode(payload: Array[Byte]): Array[Byte] = payload

    /** REAL IMPL: bilinear resize to (w,h). Stub: deterministic stride
      * sample down to w*h bytes (keeps "output size depends on target
      * dims" property). */
    def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, math.min(pixels.length, w * h))
      val stride = math.max(1, pixels.length / target)
      pixels.indices.by(stride).take(target).map(pixels).toArray
    }

    /** REAL IMPL: decode video, sample every `everyMs` frame. Stub: split
      * payload into `n` equal chunks ("frames"). */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty || n <= 0) Seq.empty
      else {
        val sz = math.max(1, payload.length / n)
        payload.grouped(sz).take(n).toSeq
      }
    }
  }

  /** Per-item features via partition-batched extraction. The per-partition
    * prologue is where a real decoder context (thread-local codec handles,
    * GPU stream, ...) would be initialized once per task, not per row. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val px = StubCodecs.decode(m.payload)
        val n = px.length
        val mean = if (n == 0) 0.0 else px.map(b => (b & 0xff).toDouble).sum / n
        val hist = new Array[Long](256)
        px.foreach(b => hist(b & 0xff) += 1)
        val entropy =
          if (n == 0) 0.0
          else -hist.filter(_ > 0).map { c =>
            val p = c.toDouble / n; p * math.log(p) / math.log(2)
          }.sum
        // FNV-1a over payload: cheap content fingerprint for exact dedup
        var fp = 0xcbf29ce484222325L
        px.foreach { b => fp ^= (b & 0xffL); fp *= 0x100000001b3L }
        MediaFeatures(m.id, m.mediaType, n, mean, entropy, fp)
      }
    }
  }

  /** Resize stage: payload-to-payload transform, same batching story. */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      m.copy(payload = StubCodecs.resize(StubCodecs.decode(m.payload), w, h),
        width = w, height = h)))
  }

  /** One sampled frame of a video/audio payload. */
  case class FrameRecord(
      id: Long,
      mediaType: String,
      frameIndex: Int,
      frame: Array[Byte])

  /** Frame-sampling stage: one media row explodes to `n` frame rows
    * (flatMap over the partition batch — the row count grows, which is
    * why this is its own stage and not a column: downstream repartitions
    * see the post-explosion cardinality). A real build replaces
    * [[StubCodecs.sampleFrames]] with an ffmpeg keyframe walk. */
  def explodeFrames(media: Dataset[MediaRecord], n: Int): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      StubCodecs.sampleFrames(StubCodecs.decode(m.payload), n)
        .zipWithIndex.map { case (f, i) => FrameRecord(m.id, m.mediaType, i, f) }
    })
  }

  /** Column-level binary helpers (no decode needed — pure metadata): */
  def payloadBytes(payload: Column): Column = octet_length(payload)
  def payloadMd5(payload: Column): Column = md5(payload)
  /** text → utf-8 binary payload (used to fabricate payloads in tests and
    * to treat text as just another modality). */
  def textAsPayload(text: Column): Column = encode(text, "UTF-8")

  /** Lift a DataFrame with (id, mediaType, payload, width, height,
    * durationMs) into the typed Dataset. */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col("id").cast("long"), col("mediaType"), col("payload"),
      col("width").cast("int"), col("height").cast("int"),
      col("durationMs").cast("long"))
      .as[MediaRecord]
  }
}
