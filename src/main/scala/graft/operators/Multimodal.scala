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
  * decoder — the Scala analogue of arrow-batched UDFs. IMAGE decode/resize
  * is REAL (in-JDK `javax.imageio`, see [[ImageCodec]]): `image/…` rows
  * dispatch to it in [[extractFeatures]] and [[resizeAll]]. UNCOMPRESSED
  * AUDIO decode is REAL too (in-JDK `javax.sound.sampled`, see
  * [[AudioCodec]]): `audio/…` rows yield true sample rate / channels /
  * duration and PCM stats. Compressed audio (mp3/ogg) and video codecs
  * are not in the JDK: those types first consult the [[MediaCodecSpi]]
  * ServiceLoader registry (the seam where a production build plugs in an
  * ffmpeg-class decoder jar with zero graft changes), and only if no
  * registered codec claims them do they fall back to [[StubCodecs]] —
  * ALWAYS flagged (`decoded = false` features, `decoded = false` frames,
  * unchanged payloads in resize) so stub output can never masquerade as
  * real measurements downstream.
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

  /** Extracted features (decoder output). For `image/…` rows that decode,
    * the stats are over the normalized RGB pixel buffer and
    * (width, height, channels, decoded=true) are real; for `audio/…` rows
    * the JDK's sampled-audio reader yields the raw PCM stream and
    * (channels, sampleRate, durationMs, decoded=true) are real; for other
    * modalities and undecodable payloads the stats are over the raw bytes
    * with decoded=false — the quarantine path: a corrupt blob degrades one
    * row to byte-level features, it never fails the task. */
  case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Int,
      byteSum: Long,
      byteMean: Double,
      byteEntropy: Double,
      fingerprint: Long,
      width: Int,
      height: Int,
      channels: Int,
      sampleRate: Int,
      durationMs: Long,
      decoded: Boolean)

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
    // Byte-array decodes must never hit disk: ImageIO's default cache
    // writes every decode through a temp file — pure overhead in a
    // mapPartitions hot loop, and a task-killer if java.io.tmpdir isn't
    // writable on an executor. Class-init runs once per JVM.
    ImageIO.setUseCache(false)

    /** Pixel budget: dimensions are read from the image HEADER before any
      * pixel allocation, and payloads declaring more than this many pixels
      * are rejected as undecodable. Without it, a kilobyte "decompression
      * bomb" declaring a huge w×h allocates w*h buffers and dies with
      * OutOfMemoryError — an Error, not an Exception, so it would kill the
      * whole task instead of quarantining the row. 2^24 px covers
      * 4096×4096; the transient int[] + rgb byte[] stay under ~120 MB. */
    val DefaultMaxPixels: Long = 1L << 24

    /** Decoded image normalized to packed RGB (3 bytes/pixel, row-major).
      * `channels` reports the *source* color model's component count
      * (1=gray, 3=RGB, 4=RGBA/CMYK) before normalization. */
    case class DecodedImage(width: Int, height: Int, channels: Int, rgb: Array[Byte])

    /** Header-guarded read: pick the SPI reader for the payload's format,
      * read w×h from the header, reject oversized/absent dimensions, only
      * then decode pixels. None = not an image, corrupt, or over budget. */
    private def readGuarded(
        payload: Array[Byte], maxPixels: Long): Option[BufferedImage] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    }

    /** Decode any ImageIO-supported format to packed RGB. None = not an
      * image these SPIs understand, truncated/corrupt payload, or a
      * payload whose declared dimensions exceed `maxPixels`. */
    def decode(
        payload: Array[Byte],
        maxPixels: Long = DefaultMaxPixels): Option[DecodedImage] = {
      // a budget past this would let w*h*3 overflow Int inside the RGB
      // buffer allocation, silently quarantining legitimately large
      // images as "undecodable"; fail loudly at the config site instead
      require(maxPixels <= Int.MaxValue / 3,
        s"maxPixels=$maxPixels exceeds Int.MaxValue/3=${Int.MaxValue / 3} " +
          "(packed-RGB buffer would overflow Int)")
      try {
        readGuarded(payload, maxPixels).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          // bulk ARGB grab: one color-model conversion pass, not w*h
          // per-pixel getRGB calls (10-50x slower on large images)
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val out = new Array[Byte](w * h * 3) // w*h <= maxPixels: no overflow
          var i = 0
          var j = 0
          while (j < argb.length) {
            val p = argb(j)
            out(i) = ((p >> 16) & 0xff).toByte
            out(i + 1) = ((p >> 8) & 0xff).toByte
            out(i + 2) = (p & 0xff).toByte
            i += 3
            j += 1
          }
          DecodedImage(w, h, img.getColorModel.getNumComponents, out)
        }
      } catch { case _: Exception => None }
    }

    /** Bilinear resize; re-encodes as PNG (lossless, in-JDK writer).
      * None = input not decodable (same header guard as [[decode]]). */
    def resize(
        payload: Array[Byte],
        w: Int,
        h: Int,
        maxPixels: Long = DefaultMaxPixels): Option[Array[Byte]] =
      try {
        val srcOpt = if (w <= 0 || h <= 0) None else readGuarded(payload, maxPixels)
        srcOpt.map { src =>
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
          bos.toByteArray
        }
      } catch { case _: Exception => None }

    /** 64-bit perceptual difference hash (dHash): downscale to 9×8
      * grayscale (bilinear, via the same header-guarded read), then one
      * bit per horizontally adjacent pixel pair — bit set iff the right
      * pixel is brighter. Robust to re-encoding, scaling, and mild
      * noise; flipped/inverted images land far away. The standard cheap
      * image near-dup fingerprint; pair it with
      * [[Dedup.hammingPairs]] for corpus-scale image dedup. */
    def dHash(
        payload: Array[Byte],
        maxPixels: Long = DefaultMaxPixels): Option[Long] =
      try {
        readGuarded(payload, maxPixels).map { src =>
          val dst = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, 9, 8, null)
          } finally g.dispose()
          val argb = dst.getRGB(0, 0, 9, 8, null, 0, 9)
          def gray(x: Int, y: Int): Int = {
            val p = argb(y * 9 + x)
            (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
          }
          var h = 0L
          var bit = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(x + 1, y) > gray(x, y)) h |= 1L << bit
              bit += 1
              x += 1
            }
            y += 1
          }
          h
        }
      } catch { case _: Exception => None }

    /** Encode packed RGB back to PNG bytes (fixture generation, tests,
      * synthetic corpora). */
    def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "encodePng: rgb length != w*h*3")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      // bulk ARGB write — one color-model pass, mirroring decode's bulk grab
      val argb = new Array[Int](width * height)
      var i = 0
      var j = 0
      while (j < argb.length) {
        argb(j) = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
        i += 3
        j += 1
      }
      img.setRGB(0, 0, width, height, argb, 0, width)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Real audio codec on `javax.sound.sampled` (in-JDK, no external
    * libs). Handles WAV/AIFF/AU — the formats the JDK's audio SPI
    * registry reads. Same total-function contract as [[ImageCodec]]:
    * undecodable or over-budget payloads yield `None`, quarantining one
    * row, never a task. Compressed formats (mp3, ogg, aac) have no JDK
    * SPI and stay with [[StubCodecs]]/ffmpeg in a production build. */
  object AudioCodec {
    /** PCM byte budget, mirroring [[ImageCodec.DefaultMaxPixels]]: the
      * frame count is read from the HEADER before any allocation, and a
      * payload declaring more PCM than this is rejected — a tiny
      * "bomb" header cannot allocate its claimed buffer. 2^26 B = 64 MB
      * ≈ 6 min of 44.1 kHz stereo 16-bit. */
    val DefaultMaxBytes: Long = 1L << 26

    /** Decoded audio: raw PCM sample bytes as stored plus format facts. */
    case class DecodedAudio(
        sampleRate: Int,
        channels: Int,
        bitsPerSample: Int,
        durationMs: Long,
        pcm: Array[Byte])

    def decode(
        payload: Array[Byte],
        maxBytes: Long = DefaultMaxBytes): Option[DecodedAudio] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          val frameSize = f.getFrameSize
          if (frames <= 0 || frameSize <= 0 || f.getSampleRate <= 0 ||
              frames * frameSize > maxBytes) None
          else {
            val buf = new Array[Byte]((frames * frameSize).toInt)
            var off = 0
            var r = 0
            while (off < buf.length && r >= 0) {
              r = ais.read(buf, off, buf.length - off)
              if (r > 0) off += r
            }
            if (off != buf.length) None // truncated payload: header lied
            else Some(DecodedAudio(
              f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
              math.round(frames * 1000.0 / f.getSampleRate), buf))
          }
        } finally ais.close()
      } catch { case _: Exception => None }

    /** 64-bit perceptual audio hash — the audio analogue of
      * [[ImageCodec.dHash]]: mean byte-magnitude (|b − 128|, exact for
      * 8-bit unsigned PCM; a deterministic proxy for deeper formats) over
      * 65 equal-time bins, one bit per adjacent bin pair (set iff the
      * later bin is louder). Invariant to any within-bin waveform
      * permutation and robust to mild noise; silence-vs-loud structure is
      * what survives. Pair with [[Dedup.hammingPairs]] for corpus-scale
      * audio dedup. */
    def aHash(
        payload: Array[Byte],
        maxBytes: Long = DefaultMaxBytes): Option[Long] =
      decode(payload, maxBytes).flatMap { a =>
        val n = a.pcm.length
        // too short to fill the 65 energy bins: drop the clip from the
        // hash relation entirely (a constant 0L would make every short
        // clip a Hamming-0 "near-dup" of every other short clip)
        if (n < 65) None
        else Some {
          val sums = new Array[Long](65)
          val counts = new Array[Long](65)
          var i = 0
          while (i < n) {
            val bin = (i.toLong * 65 / n).toInt
            sums(bin) += math.abs((a.pcm(i) & 0xff) - 128)
            counts(bin) += 1
            i += 1
          }
          var h = 0L
          var k = 0
          while (k < 64) {
            // cross-multiplied mean compare: no float division
            if (sums(k + 1) * counts(k) > sums(k) * counts(k + 1)) h |= 1L << k
            k += 1
          }
          h
        }
      }

    /** Encode raw 8-bit unsigned mono PCM as a WAV container (fixture
      * generation, tests, synthetic corpora) — the audio analogue of
      * [[ImageCodec.encodePng]]; decode returns these bytes verbatim. */
    def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      finally ais.close()
      bos.toByteArray
    }
  }

  /** Real video-container codec for MJPEG-in-AVI — the one video format
    * decodable with nothing but the JDK: the AVI RIFF container is a
    * plain chunk walk, and each frame is a JPEG the `javax.imageio` SPI
    * already reads, so frame extraction (THE video op of a training-data
    * pipeline) needs no ffmpeg. Same total-function contract as the
    * other codecs: junk, truncation past a header boundary, or
    * over-budget payloads yield `None`. Inter-frame-compressed formats
    * (h264/vp9/av1 in mp4/webm) have no JDK decoder and stay with
    * [[StubCodecs]]/ffmpeg in a production build. */
  object VideoCodec {
    /** Total frame-byte budget, same role as the image/audio budgets:
      * chunk sizes are read from headers and summed BEFORE any frame
      * array is materialized. */
    val DefaultMaxBytes: Long = 1L << 26

    private def le32(b: Array[Byte], off: Int): Long = Riff.le32(b, off)
    private def fourcc(b: Array[Byte], off: Int): String = Riff.fourcc(b, off)

    /** Extract the MJPEG frame payloads ('00dc'/'00db' chunks inside the
      * 'movi' LIST) in stream order. None = not a RIFF/AVI payload, a
      * malformed chunk walk, or frames past `maxBytes` total. */
    def frames(
        payload: Array[Byte],
        maxBytes: Long = DefaultMaxBytes): Option[Seq[Array[Byte]]] =
      try {
        if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
            fourcc(payload, 8) != "AVI ") None
        else {
          val riffEnd = math.min(payload.length.toLong, 8L + le32(payload, 4))
          // locate the movi LIST, skipping unknown top-level chunks
          var off = 12L
          var movi: Option[(Long, Long)] = None // (dataStart, dataEnd)
          while (movi.isEmpty && off + 8 <= riffEnd) {
            val id = fourcc(payload, off.toInt)
            val sz = le32(payload, off.toInt + 4)
            if (id == "LIST" && off + 12 <= riffEnd &&
                fourcc(payload, off.toInt + 8) == "movi")
              movi = Some((off + 12, math.min(riffEnd, off + 8 + sz)))
            off += 8 + sz + (sz & 1) // chunks are word-aligned
          }
          movi.flatMap { case (start, end) =>
            val out = Seq.newBuilder[Array[Byte]]
            var total = 0L
            var p = start
            var ok = true
            while (ok && p + 8 <= end) {
              val id = fourcc(payload, p.toInt)
              val sz = le32(payload, p.toInt + 4)
              if (p + 8 + sz > end) ok = false // header lies: truncated
              else {
                if (id.endsWith("dc") || id.endsWith("db")) {
                  total += sz
                  if (total > maxBytes) ok = false
                  else out += java.util.Arrays.copyOfRange(
                    payload, (p + 8).toInt, (p + 8 + sz).toInt)
                }
                p += 8 + sz + (sz & 1)
              }
            }
            if (ok) Some(out.result()) else None
          }
        }
      } catch { case _: Exception => None }

    /** Package JPEG frames as a minimal MJPEG AVI (RIFF + movi LIST) —
      * fixture generation and synthetic corpora; [[frames]] returns the
      * frame bytes verbatim. */
    def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
        bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
      }
      def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      val moviData = jpegFrames.map(f => 8L + f.length + (f.length & 1)).sum + 4
      tag("RIFF"); w32(4 + 8 + moviData); tag("AVI ")
      tag("LIST"); w32(moviData); tag("movi")
      jpegFrames.foreach { f =>
        tag("00dc"); w32(f.length.toLong); bos.write(f)
        if ((f.length & 1) == 1) bos.write(0) // pad to word boundary
      }
      bos.toByteArray
    }

    /** Encode packed RGB as a JPEG (in-JDK writer) — frame fixture
      * helper; dims survive JPEG exactly even though pixels are lossy. */
    def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "encodeJpeg: rgb length != w*h*3")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val argb = new Array[Int](width * height)
      var i = 0
      var j = 0
      while (j < argb.length) {
        argb(j) = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
        i += 3
        j += 1
      }
      img.setRGB(0, 0, width, height, argb, 0, width)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
  }

  /** Deterministic stand-ins for the codec calls the JDK can't do
    * (compressed audio, inter-frame-compressed video). Each function is
    * where a production build would call into libsndfile/ffmpeg; the
    * fakes preserve the data-flow shape (bytes in, bytes/features out)
    * and are pure, so tests are reproducible. Images go through the real
    * [[ImageCodec]], WAV/AIFF/AU audio through the real [[AudioCodec]],
    * MJPEG-AVI video through the real [[VideoCodec]]. */
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

  /** Per-item features via partition-batched extraction. `image/…` rows
    * decode through the real [[ImageCodec]] and report pixel stats over
    * the normalized RGB buffer plus true (width, height, channels); other
    * modalities — and image rows whose bytes don't decode (the quarantine
    * path) — fall back to raw-byte stats with decoded=false. The
    * per-partition prologue is where a real decoder context (thread-local
    * codec handles, GPU stream, ...) would be initialized once per task,
    * not per row. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val mt = Option(m.mediaType).getOrElse("")
        val img = if (mt.startsWith("image/")) ImageCodec.decode(m.payload) else None
        val aud =
          if (img.isEmpty && mt.startsWith("audio/")) AudioCodec.decode(m.payload)
          else None
        // SPI codecs (the ffmpeg seam) get the types the in-JDK defaults
        // declined: compressed audio/video, or any claimed custom format
        val spi =
          if (img.isEmpty && aud.isEmpty)
            MediaCodecSpi.forType(mt).flatMap(_.decode(mt, m.payload))
          else None
        val (px, width, height, channels, sampleRate, durationMs) = (img, aud, spi) match {
          case (Some(d), _, _) => (d.rgb, d.width, d.height, d.channels, 0, 0L)
          case (_, Some(a), _) => (a.pcm, 0, 0, a.channels, a.sampleRate, a.durationMs)
          case (_, _, Some(s)) =>
            (s.data, s.width, s.height, s.channels, s.sampleRate, s.durationMs)
          case _ => (StubCodecs.decode(m.payload), 0, 0, 0, 0, 0L)
        }
        val n = px.length
        val hist = new Array[Long](256)
        var sum = 0L
        // FNV-1a over the pixel/byte buffer: cheap content fingerprint
        var fp = 0xcbf29ce484222325L
        var i = 0
        while (i < n) {
          val v = px(i) & 0xff
          sum += v
          hist(v) += 1
          fp ^= v.toLong
          fp *= 0x100000001b3L
          i += 1
        }
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        val entropy =
          if (n == 0) 0.0
          else -hist.filter(_ > 0).map { c =>
            val p = c.toDouble / n; p * math.log(p) / math.log(2)
          }.sum
        MediaFeatures(m.id, m.mediaType, n, sum, mean, entropy, fp,
          width, height, channels, sampleRate, durationMs,
          decoded = img.isDefined || aud.isDefined || spi.isDefined)
      }
    }
  }

  /** Resize stage: payload-to-payload transform, same batching story.
    * `image/…` payloads get a real bilinear resize (PNG out); other types
    * go to a claiming [[MediaCodecSpi]] codec if one is registered. A row
    * no codec can resize — an undecodable image, or a type with no codec —
    * rides through UNCHANGED (quarantine: its width/height still betray
    * that it was never resized; the old behavior of stride-sampling raw
    * bytes through [[StubCodecs.resize]] fabricated a payload that looked
    * resized downstream). */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val out =
        if (m.mediaType != null && m.mediaType.startsWith("image/"))
          ImageCodec.resize(m.payload, w, h)
        else
          MediaCodecSpi.forType(m.mediaType)
            .flatMap(_.resize(m.mediaType, m.payload, w, h))
      out match {
        case Some(p) => m.copy(payload = p, width = w, height = h)
        case None => m
      }
    })
  }

  /** Per-image perceptual fingerprints: (id, dhash) for every `image/…`
    * row whose payload decodes — undecodable rows are dropped here (the
    * pair relation has nothing to say about them; quarantine them via
    * [[extractFeatures]]'s decoded flag). Map-only, no shuffle. */
  def imageDHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.mediaType != null && m.mediaType.startsWith("image/"))
        ImageCodec.dHash(m.payload).map(h => (m.id, h))
      else None
    }).toDF("id", "dhash")
  }

  /** Corpus-scale image near-dup pairs: perceptual dHash per image
    * (map-only), then EXACT Hamming-banded pairing via
    * [[Dedup.hammingPairs]] — the same pigeonhole machinery as text
    * SimHash, so candidates form on (block, value) equi-joins, never an
    * image-by-image cross join. Output: (a_id, b_id, hamming). */
  def imageNearDupPairs(
      media: Dataset[MediaRecord],
      maxHamming: Int = 4,
      maxBucket: Option[Int] = None): DataFrame =
    Dedup.hammingPairs(imageDHashes(media), "id", "dhash",
      bits = 64, maxHamming = maxHamming, maxBucket = maxBucket)

  /** Per-clip perceptual fingerprints: (id, ahash) for every `audio/…`
    * row whose payload decodes (undecodable rows dropped, as in
    * [[imageDHashes]]). Map-only, no shuffle. */
  def audioAHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.mediaType != null && m.mediaType.startsWith("audio/"))
        AudioCodec.aHash(m.payload).map(h => (m.id, h))
      else None
    }).toDF("id", "ahash")
  }

  /** Corpus-scale audio near-dup pairs: energy-profile aHash per clip
    * (map-only) + EXACT Hamming banding via [[Dedup.hammingPairs]] —
    * same machinery as [[imageNearDupPairs]]. Output: (a_id, b_id,
    * hamming). */
  def audioNearDupPairs(
      media: Dataset[MediaRecord],
      maxHamming: Int = 4,
      maxBucket: Option[Int] = None): DataFrame =
    Dedup.hammingPairs(audioAHashes(media), "id", "ahash",
      bits = 64, maxHamming = maxHamming, maxBucket = maxBucket)

  /** One sampled frame of a video/audio payload. `decoded` = the frame
    * came out of a real codec (in-JDK MJPEG walk or an SPI codec) rather
    * than [[StubCodecs]] byte-chunking — filter on it before treating
    * `frame` as an image. */
  case class FrameRecord(
      id: Long,
      mediaType: String,
      frameIndex: Int,
      frame: Array[Byte],
      decoded: Boolean)

  /** Frame-sampling stage: one media row explodes to at most `n` frame
    * rows (flatMap over the partition batch — the row count grows, which
    * is why this is its own stage and not a column: downstream
    * repartitions see the post-explosion cardinality). `video/…` rows
    * that parse as MJPEG-AVI get REAL frames ([[VideoCodec.frames]],
    * stride-sampled down to `n` — each an ImageIO-decodable JPEG, so
    * [[extractFeatures]]/[[imageDHashes]] compose downstream); any other
    * type a [[MediaCodecSpi]] codec claims (animated `image/gif` via
    * [[GifFramesCodec]], production h264 via an ffmpeg-class SPI jar)
    * gets that codec's frame walk; the rest fall back to
    * [[StubCodecs.sampleFrames]]. `frameIndex` is the index in the
    * SOURCE stream, so sampling stride stays auditable. */
  def explodeFrames(media: Dataset[MediaRecord], n: Int): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val real =
        if (m.mediaType != null && n > 0) {
          val viaJdk =
            if (m.mediaType.startsWith("video/")) VideoCodec.frames(m.payload)
            else None
          viaJdk.orElse(
            MediaCodecSpi.forType(m.mediaType).flatMap(_.frames(m.mediaType, m.payload)))
        } else None
      real match {
        case Some(fs) if fs.nonEmpty =>
          // ceiling stride: sampled indices span the whole stream (a
          // floor stride head-biases whenever n <= frames < 2n)
          val step = math.max(1, (fs.size + n - 1) / n)
          fs.indices.by(step).take(n)
            .map(i => FrameRecord(m.id, m.mediaType, i, fs(i), decoded = true))
        case Some(_) => Seq.empty
        case None =>
          StubCodecs.sampleFrames(StubCodecs.decode(m.payload), n)
            .zipWithIndex.map { case (f, i) =>
              FrameRecord(m.id, m.mediaType, i, f, decoded = false)
            }
      }
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
