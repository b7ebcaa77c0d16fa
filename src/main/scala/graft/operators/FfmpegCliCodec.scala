package graft.operators

import java.nio.file.{Files, Path}

/** ffmpeg-CLI-backed [[MediaCodecSpi]] for the compressed formats this
  * library deliberately ships no decoder for (MP3/OGG/AAC/FLAC audio,
  * MP4/WebM/MKV video — the licensing/jar-policy boundary in the
  * README): instead of bundling native codec jars, it shells out to a
  * HOST-PROVIDED `ffmpeg` binary. Nothing GPL/LGPL is distributed with
  * the library; on a host without ffmpeg, [[claims]] is false for every
  * type and the quarantine behavior (`decoded=false`) is unchanged —
  * the stubs stay honest stubs.
  *
  * Resolution order for the binary: `-Dgraft.ffmpeg.bin=...` system
  * property, `GRAFT_FFMPEG` env var, then a PATH scan — evaluated per
  * claims() call but cached per configured value, so executors resolve
  * once and tests can point it at a fake.
  *
  * Audio decode transcodes to a temp-file WAV (a pipe is NOT used on
  * purpose: MP4's moov atom can trail the payload, which breaks
  * non-seekable stdin, and WAV written to a pipe carries unknown-size
  * headers) and parses the PCM result locally. Video [[frames]] samples
  * one frame per second as JPEGs via `image2pipe` and splits on
  * SOI/EOI markers, so downstream image ops compose unchanged.
  *
  * Scale/cost contract: one process spawn per payload (~5-20 ms) —
  * negligible against the decode itself for real media blobs, and the
  * per-row isolation means a crash-looping payload kills its process,
  * returns None, and quarantines ONE row, never a task (the SPI's total-
  * function contract). Throughput-critical deployments can swap in a
  * JNI/JavaCV implementation through the same ServiceLoader seam.
  * Stateless: every call owns its process and temp files → thread-safe
  * across executor task threads.
  */
final class FfmpegCliCodec extends MediaCodecSpi {
  import FfmpegCliCodec._

  override def claims(mediaType: String): Boolean =
    (AudioTypes.contains(mediaType) || VideoTypes.contains(mediaType)) &&
      binary.isDefined

  override def decode(
      mediaType: String, payload: Array[Byte]): Option[MediaCodecSpi.Media] =
    if (!AudioTypes.contains(mediaType)) None
    else binary.flatMap { bin =>
      withTempFiles(suffixOf(mediaType), ".wav") { (in, out) =>
        Files.write(in, payload)
        if (!run(bin, Seq("-v", "error", "-y", "-i", in.toString,
            "-f", "wav", "-acodec", "pcm_s16le", out.toString))) None
        else parseWav(Files.readAllBytes(out))
      }
    }

  override def resize(
      mediaType: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    None // images stay with the in-JDK ImageIO codec

  override def frames(
      mediaType: String, payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    if (!VideoTypes.contains(mediaType)) None
    else binary.flatMap { bin =>
      withTempFiles(suffixOf(mediaType), ".mjpeg") { (in, out) =>
        Files.write(in, payload)
        // 1 fps sampling: frame features want coverage, not every frame;
        // callers needing denser sampling plug their own SPI variant
        if (!run(bin, Seq("-v", "error", "-y", "-i", in.toString,
            "-vf", "fps=1", "-f", "image2pipe", "-c:v", "mjpeg", out.toString)))
          None
        else {
          val fs = splitJpegs(Files.readAllBytes(out))
          if (fs.isEmpty) None else Some(fs)
        }
      }
    }
}

object FfmpegCliCodec {

  private[graft] val AudioTypes = Set(
    "audio/mpeg", "audio/mp3", "audio/ogg", "audio/vorbis", "audio/opus",
    "audio/aac", "audio/mp4", "audio/flac", "audio/x-flac")
  private[graft] val VideoTypes = Set(
    "video/mp4", "video/webm", "video/quicktime", "video/x-matroska",
    "video/mpeg")

  private def suffixOf(mediaType: String): String =
    "." + mediaType.split("/").last.stripPrefix("x-")

  // binary resolution, cached per configured override so a changed
  // -Dgraft.ffmpeg.bin (tests; operator reconfiguration) re-resolves
  @volatile private var cached: (Option[String], Option[String]) = null
  private[graft] def binary: Option[String] = {
    val conf = sys.props.get("graft.ffmpeg.bin")
      .orElse(sys.env.get("GRAFT_FFMPEG"))
    val c = cached
    if (c != null && c._1 == conf) c._2
    else {
      val resolved = conf match {
        case Some(p) =>
          Some(p).filter(x => Files.isExecutable(java.nio.file.Paths.get(x)))
        case None =>
          sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
            .iterator.map(d => java.nio.file.Paths.get(d, "ffmpeg"))
            .find(Files.isExecutable).map(_.toString)
      }
      cached = (conf, resolved)
      resolved
    }
  }

  private def withTempFiles[A](inSuffix: String, outSuffix: String)(
      f: (Path, Path) => Option[A]): Option[A] = {
    val in = Files.createTempFile("graft-ffmpeg-in", inSuffix)
    val out = Files.createTempFile("graft-ffmpeg-out", outSuffix)
    try f(in, out)
    catch { case _: Exception => None } // total function: corrupt row, not task
    finally {
      Files.deleteIfExists(in)
      Files.deleteIfExists(out)
    }
  }

  /** Per-payload decode budget, seconds. Configurable because a fixed
    * cap conflates HUNG with legitimately SLOW: a 2 h MP4's 1 fps frame
    * walk can exceed a small budget on a loaded executor, and silently
    * quarantining the largest real assets as if corrupt is the wrong
    * default to bake in. 300 s covers feature-extraction over real
    * media; deployments with huge assets raise it. */
  private def timeoutSec: Long =
    sys.props.get("graft.ffmpeg.timeoutSec")
      .orElse(sys.env.get("GRAFT_FFMPEG_TIMEOUT_SEC"))
      .map(_.toLong).getOrElse(300L)

  /** Run the binary; true iff it exits 0 within [[timeoutSec]]. A hung
    * process is killed (one bad payload must never wedge a task slot);
    * the kill is LOGGED so a timed-out-but-valid payload is
    * distinguishable from a corrupt one in executor stderr. */
  private def run(bin: String, args: Seq[String]): Boolean = {
    import scala.jdk.CollectionConverters._
    val pb = new ProcessBuilder((bin +: args).asJava)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    p.getOutputStream.close()
    val done = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) {
      p.destroyForcibly()
      System.err.println(s"[graft][FfmpegCliCodec] killed ffmpeg after " +
        s"$timeoutSec s (graft.ffmpeg.timeoutSec to raise); payload " +
        "quarantined as undecodable — may be slow, not corrupt")
      false
    } else p.exitValue() == 0
  }

  /** Minimal RIFF/WAVE reader for ffmpeg's own output (PCM s16le): walk
    * the chunks for fmt (channels, sampleRate, 16-bit PCM) and data. */
  private[graft] def parseWav(bytes: Array[Byte]): Option[MediaCodecSpi.Media] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var channels = 0
    var sampleRate = 0
    var ok16bitPcm = false
    var pcm: Array[Byte] = null
    while (off + 8 <= bytes.length && (pcm == null || channels == 0)) {
      val id = tag(off)
      val size = math.min(u32(off + 4), (bytes.length - off - 8).toLong).toInt
      if (id == "fmt " && size >= 16) {
        ok16bitPcm = u16(off + 8) == 1 && u16(off + 8 + 14) == 16
        channels = u16(off + 8 + 2)
        sampleRate = u32(off + 8 + 4).toInt
      } else if (id == "data") {
        pcm = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!ok16bitPcm || channels <= 0 || sampleRate <= 0 || pcm == null) None
    else Some(MediaCodecSpi.Media(
      data = pcm, channels = channels, sampleRate = sampleRate,
      durationMs = pcm.length.toLong * 1000L / (2L * channels * sampleRate)))
  }

  /** Split an image2pipe MJPEG byte stream into whole JPEGs on the
    * SOI (FFD8) / EOI (FFD9) markers. */
  private[graft] def splitJpegs(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    var start = -1
    while (i + 1 < bytes.length) {
      val m = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      if (m == 0xffd8 && start < 0) { start = i; i += 2 }
      else if (m == 0xffd9 && start >= 0) {
        out += java.util.Arrays.copyOfRange(bytes, start, i + 2)
        start = -1
        i += 2
      } else i += 1
    }
    out.result()
  }
}
