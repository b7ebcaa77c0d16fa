package graft

import graft.operators.MediaCodecSpi

/** SPI test fake standing in for an ffmpeg-class production codec: a
  * synthetic "compressed" format pair whose decode is a deterministic
  * XOR transform. Registered through the real `java.util.ServiceLoader`
  * seam (`src/test/resources/META-INF/services/...`), so these tests
  * exercise exactly the path a production deployment uses to plug in
  * MP3/MP4 support: drop a jar on the executor classpath, change no
  * graft code.
  */
class FakeCompressedCodec extends MediaCodecSpi {
  import FakeCompressedCodec._

  override def claims(mediaType: String): Boolean =
    mediaType == AudioType || mediaType == VideoType

  override def decode(
      mediaType: String, payload: Array[Byte]): Option[MediaCodecSpi.Media] =
    mediaType match {
      // "compressed audio": XOR-0x5A "decompression" to PCM; payloads
      // under 2 bytes are "corrupt" so the quarantine path is testable
      case AudioType if payload.length >= 2 =>
        Some(MediaCodecSpi.Media(payload.map(b => (b ^ 0x5a).toByte),
          channels = 2, sampleRate = 44100, durationMs = payload.length.toLong))
      case VideoType =>
        frames(mediaType, payload).map(fs =>
          MediaCodecSpi.Media(fs.flatten.toArray, width = FrameBytes, height = 1,
            channels = 1))
      case _ => None
    }

  override def resize(
      mediaType: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    if (mediaType == VideoType && payload.nonEmpty && w > 0 && h > 0)
      Some(payload.take(w * h))
    else None

  override def frames(
      mediaType: String, payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    if (mediaType == VideoType && payload.nonEmpty)
      Some(payload.grouped(FrameBytes).toSeq)
    else None
}

object FakeCompressedCodec {
  val AudioType = "audio/x-graft-cmp"
  val VideoType = "video/x-graft-cmp"
  val FrameBytes = 3
}
