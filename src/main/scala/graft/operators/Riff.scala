package graft.operators

/** RIFF container primitives shared by the codecs that walk RIFF files
  * ([[Multimodal.VideoCodec]] for AVI, [[AdpcmWavCodec]] for WAVE):
  * little-endian field reads and FOURCC tags. The chunk WALKS stay in
  * their codecs — AVI nests LISTs, WAVE is flat — but the byte-level
  * primitives must not fork. */
private[operators] object Riff {

  def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
}
