package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdpcmWavCodec, MediaCodecSpi, Multimodal}
import graft.operators.Multimodal.MediaRecord

/** IMA-ADPCM codec: a REAL compressed audio format decoded through the
  * MediaCodecSpi seam (javax.sound declines format tag 0x11, dispatch
  * falls through to the ServiceLoader-registered codec). */
class AdpcmSpec extends AnyFunSuite with SparkFixture {

  private def sine(n: Int, freq: Double, rate: Double, amp: Double): Array[Short] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freq * i / rate)).toShort)

  /** Signal-to-noise ratio in dB of decoded vs original. */
  private def snrDb(orig: Array[Short], dec: Array[Short]): Double = {
    require(orig.length == dec.length)
    var sig = 0.0; var err = 0.0
    orig.indices.foreach { i =>
      sig += orig(i).toDouble * orig(i)
      val e = orig(i).toDouble - dec(i)
      err += e * e
    }
    10 * math.log10(sig / math.max(err, 1e-12))
  }

  private def pcm16(bytes: Array[Byte]): Array[Short] =
    Array.tabulate(bytes.length / 2) { i =>
      ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
    }

  test("mono sine survives 4:1 compression with high SNR") {
    val orig = sine(505 * 4, freq = 440, rate = 16000, amp = 12000)
    val wav = AdpcmWavCodec.encode(16000, 1, orig)
    // 4 bits/sample + headers: ~4x smaller than the 16-bit original
    assert(wav.length < orig.length * 2 / 3)
    val dec = AdpcmWavCodec.decode(wav).get
    assert(dec.sampleRate == 16000 && dec.channels == 1)
    assert(dec.samplesPerChannel == orig.length)
    val snr = snrDb(orig, pcm16(dec.pcm))
    assert(snr > 25, s"SNR $snr dB too low for IMA ADPCM on a sine")
  }

  test("stereo channels decode independently with no bleed") {
    val n = 505 * 2
    val left = sine(n, 300, 16000, 10000)
    val right = sine(n, 520, 16000, 9000) // different frequency entirely
    val interleaved = Array.tabulate(n * 2)(i =>
      if (i % 2 == 0) left(i / 2) else right(i / 2))
    val wav = AdpcmWavCodec.encode(16000, 2, interleaved)
    val dec = AdpcmWavCodec.decode(wav).get
    assert(dec.channels == 2 && dec.samplesPerChannel == n)
    val out = pcm16(dec.pcm)
    val outL = Array.tabulate(n)(i => out(2 * i))
    val outR = Array.tabulate(n)(i => out(2 * i + 1))
    // absolute floors are the codec's quantization limit for each signal
    // (measured: mono == stereo to the hundredth of a dB)
    assert(snrDb(left, outL) > 24, "left channel")
    assert(snrDb(right, outR) > 20, "right channel")
    // bleed check: decoding right against the LEFT signal must be noise
    assert(snrDb(left, outR) < 5, "right output must not carry the left signal")
    // interleave check: each channel must reconstruct as well in the
    // stereo stream as the same signal does encoded alone (the absolute
    // SNR is codec quantization; parity isolates the word interleave)
    val monoR = pcm16(AdpcmWavCodec.decode(
      AdpcmWavCodec.encode(16000, 1, right)).get.pcm)
    assert(math.abs(snrDb(right, outR) - snrDb(right, monoR)) < 2.0,
      "stereo right must match its mono reconstruction quality")
  }

  test("non-ADPCM and corrupt payloads are declined, not thrown") {
    // a plain PCM WAV (format tag 1) belongs to javax.sound, not this codec
    val pcmWav = Multimodal.AudioCodec.encodeWav(8000,
      Array.tabulate(256)(i => (128 + 60 * math.sin(i / 5.0)).toByte))
    assert(AdpcmWavCodec.decode(pcmWav).isEmpty)
    assert(AdpcmWavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    // truncated: header promises more data than the payload carries
    val good = AdpcmWavCodec.encode(16000, 1, sine(505, 440, 16000, 8000))
    assert(AdpcmWavCodec.decode(good.take(good.length - 50)).isEmpty)
  }

  test("a hostile samplesPerBlock header is rejected, not read past the block") {
    val good = AdpcmWavCodec.encode(16000, 1, sine(505 * 2, 440, 16000, 8000))
    assert(AdpcmWavCodec.decode(good).isDefined)
    // locate the fmt extension's samplesPerBlock (offset fmt+18) and
    // inflate it beyond the block's nibble capacity
    val idx = good.indexOfSlice("fmt ".getBytes("US-ASCII"))
    val spbOff = idx + 8 + 18
    val evil = good.clone()
    evil(spbOff) = 0xF9.toByte // 2041 = 0x7F9: capacity is 505
    evil(spbOff + 1) = 0x07.toByte
    assert(AdpcmWavCodec.decode(evil).isEmpty,
      "declared samples exceeding blockAlign capacity must quarantine the row")
  }

  test("ServiceLoader registers the codec and dispatch reaches it end-to-end") {
    assert(MediaCodecSpi.forType("audio/adpcm").exists(_.isInstanceOf[AdpcmWavCodec]))
    val s = spark
    import s.implicits._
    val orig = sine(505 * 2, 440, 16000, 12000)
    val wav = AdpcmWavCodec.encode(16000, 1, orig)
    val media = Seq(
      MediaRecord(1L, "audio/adpcm", wav, 0, 0, 0L),
      MediaRecord(2L, "audio/adpcm", "corrupt".getBytes, 0, 0, 0L)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    val ok = feats(0)
    assert(ok.decoded, "ADPCM row must decode through the SPI")
    assert(ok.sampleRate == 16000 && ok.channels == 1)
    assert(ok.durationMs == math.round(505 * 2 * 1000.0 / 16000))
    assert(ok.nBytes == 505 * 2 * 2) // decoded 16-bit PCM, not the 4-bit payload
    assert(!feats(1).decoded, "corrupt row is quarantined, not fabricated")
  }

  test("an ADPCM WAV under audio/wav falls through javax.sound to the SPI") {
    val s = spark
    import s.implicits._
    val wav = AdpcmWavCodec.encode(16000, 1, sine(505, 440, 16000, 12000))
    // javax.sound has no ADPCM provider -> AudioCodec declines ->
    // the SPI claims audio/wav and recognizes tag 0x11
    val feats = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, "audio/wav", wav, 0, 0, 0L)).toDS()).collect()
    assert(feats.head.decoded && feats.head.sampleRate == 16000)
  }
}
