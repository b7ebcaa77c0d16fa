package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}

/** [[MediaCodecSpi]] implementation for animated GIF — the multi-frame
  * format web crawls actually contain in volume. The JDK's ImageIO GIF
  * reader enumerates every frame natively; each extracted frame is
  * re-encoded as PNG so the downstream image operators
  * ([[Multimodal.ImageCodec]], dHash, resize) compose unchanged.
  *
  * Honesty note on GIF's inter-frame deltas: frames are returned as the
  * reader yields them. Full-frame GIFs (each frame replaces the canvas,
  * the overwhelmingly common case for generated/converted media)
  * reconstruct exactly; delta-optimized GIFs yield the stored frame
  * rects without canvas compositing — still real decoded pixels, and
  * the stored-rect sequence is what perceptual dedup wants anyway (the
  * changing region IS the signal). Same total-function quarantine
  * contract as every codec here: corrupt or over-budget payloads are a
  * None, never a thrown task.
  */
final class GifFramesCodec extends MediaCodecSpi {

  override def claims(mediaType: String): Boolean =
    mediaType == "image/gif" || mediaType == "video/gif"

  override def decode(
      mediaType: String, payload: Array[Byte]): Option[MediaCodecSpi.Media] =
    // first frame only — walking frames() here would decode and PNG
    // re-encode EVERY frame of a long GIF to keep one
    Multimodal.ImageCodec.decode(payload).map { d =>
      MediaCodecSpi.Media(d.rgb, width = d.width, height = d.height,
        channels = d.channels)
    }

  override def resize(
      mediaType: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    None // single-image resize of image/gif is already ImageCodec's job

  override def frames(
      mediaType: String, payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    GifFramesCodec.frames(payload)
}

object GifFramesCodec {

  /** Frame-count cap and total decoded-pixel budget (header-checked
    * before any frame allocation, like every codec budget here). */
  val MaxFrames = 512
  val MaxTotalPixels: Long = 1L << 26

  /** All frames of a GIF payload as PNGs; None unless the payload is a
    * GIF within budget. */
  def frames(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          // header-guarded budget: logical-screen dims times frame count
          val w0 = reader.getWidth(0)
          val h0 = reader.getHeight(0)
          if (n <= 0 || n > MaxFrames || w0 <= 0 || h0 <= 0 ||
              w0.toLong * h0 * n > MaxTotalPixels) None
          else Some((0 until n).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val h = img.getHeight
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val px = img.getRGB(x, y)
                val o = (y * w + x) * 3
                rgb(o) = ((px >> 16) & 0xFF).toByte
                rgb(o + 1) = ((px >> 8) & 0xFF).toByte
                rgb(o + 2) = (px & 0xFF).toByte
                x += 1
              }
              y += 1
            }
            Multimodal.ImageCodec.encodePng(w, h, rgb)
          })
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Encode RGB frames as an animated GIF via the JDK's sequence writer
    * (fixtures, tests, synthetic corpora). */
  def encodeAnimatedGif(
      width: Int, height: Int, rgbFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(rgbFrames.nonEmpty && rgbFrames.forall(_.length == width * height * 3),
      "each frame must be width*height*3 RGB bytes")
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      rgbFrames.foreach { rgb =>
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val o = (y * width + x) * 3
            img.setRGB(x, y,
              ((rgb(o) & 0xFF) << 16) | ((rgb(o + 1) & 0xFF) << 8) | (rgb(o + 2) & 0xFF))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }
}
