package graft.operators

/** Pluggable media-codec seam for the formats the JDK can't decode
  * (MP3/OGG audio, MP4/H.264 video, ...).
  *
  * A production deployment drops an ffmpeg-class implementation on the
  * executor classpath with a
  * `META-INF/services/graft.operators.MediaCodecSpi` entry and every
  * multimodal operator ([[Multimodal.extractFeatures]],
  * [[Multimodal.resizeAll]], [[Multimodal.explodeFrames]]) picks it up
  * with zero graft code changes. The in-JDK codecs
  * ([[Multimodal.ImageCodec]], [[Multimodal.AudioCodec]],
  * [[Multimodal.VideoCodec]]) remain the compiled-in defaults; the SPI
  * is consulted only for payloads the defaults decline.
  *
  * Scale contract: implementations are looked up PER EXECUTOR JVM (the
  * registry is a lazily-initialized per-JVM singleton, resolved inside
  * the `mapPartitions` batch, never captured in a driver closure — codec
  * handles don't serialize). Implementations must be thread-safe across
  * the executor's task threads and must be TOTAL: return `None` for
  * bytes they can't decode rather than throwing, so one corrupt blob in
  * a 100 TB corpus quarantines one row, not one partition.
  */
trait MediaCodecSpi {

  /** Whether this codec handles `mediaType` (e.g. "audio/mpeg"). The
    * registry asks before every decode; keep it a cheap string check. */
  def claims(mediaType: String): Boolean

  /** Decode to a raw buffer + format facts. None = corrupt/undecodable
    * payload (the row is quarantined, never the task). */
  def decode(mediaType: String, payload: Array[Byte]): Option[MediaCodecSpi.Media]

  /** Re-encode the payload at (w, h) — image-like types. None =
    * unsupported operation for this type or undecodable payload. */
  def resize(
      mediaType: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]]

  /** Extract the frame sequence — video-like types. Each frame should be
    * independently decodable (a keyframe walk in a production codec) so
    * downstream image ops compose. None = unsupported/undecodable. */
  def frames(mediaType: String, payload: Array[Byte]): Option[Seq[Array[Byte]]]
}

object MediaCodecSpi {

  /** Decoded buffer + format facts — the union of the image shape
    * (width/height/channels over a pixel buffer) and the audio shape
    * (channels/sampleRate/durationMs over a PCM buffer); leave the
    * fields that don't apply at their zero defaults. */
  case class Media(
      data: Array[Byte],
      width: Int = 0,
      height: Int = 0,
      channels: Int = 0,
      sampleRate: Int = 0,
      durationMs: Long = 0L)

  // Per-JVM registry: each executor resolves its own codec instances on
  // first use (double-checked; ServiceLoader scans META-INF/services
  // once). Both the context classloader (sbt/REPL layered loaders, where
  // test fakes live) and this class's own loader are consulted, deduped
  // by implementation class.
  @volatile private var cached: Seq[MediaCodecSpi] = _

  def registered: Seq[MediaCodecSpi] = {
    var r = cached
    if (r == null) synchronized {
      r = cached
      if (r == null) {
        import scala.jdk.CollectionConverters._
        val loaders = Seq(
          Option(Thread.currentThread.getContextClassLoader),
          Option(classOf[MediaCodecSpi].getClassLoader)).flatten.distinct
        r = loaders
          .flatMap(cl =>
            java.util.ServiceLoader.load(classOf[MediaCodecSpi], cl)
              .iterator().asScala.toSeq)
          .groupBy(_.getClass.getName).values.map(_.head).toSeq
          .sortBy(_.getClass.getName)
        cached = r
      }
    }
    r
  }

  /** First registered codec claiming `mediaType`, if any. */
  def forType(mediaType: String): Option[MediaCodecSpi] =
    if (mediaType == null) None else registered.find(_.claims(mediaType))
}
