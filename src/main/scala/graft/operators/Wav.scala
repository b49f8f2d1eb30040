package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM WAV codec: canonical 44-byte RIFF/WAVE header + mono
  * 16-bit PCM — the audio analog of [[Bmp]]: a real container format with
  * no native dependency, so the multimodal audio path decodes genuine
  * samples instead of stubbing.
  *
  * Layout (little-endian):
  *  - 'RIFF', riff size (= file size − 8), 'WAVE'
  *  - 'fmt ' chunk (16 B): PCM=1, channels=1, sample rate, byte rate,
  *    block align, 16 bits/sample
  *  - 'data' chunk: n·2 bytes of signed 16-bit samples
  *
  * `decode` walks chunks (skipping unknown ones, as the format requires)
  * rather than assuming a fixed offset, so files with extra chunks (LIST,
  * fact) still parse.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short]) {
    def durationSec: Double = samples.length.toDouble / sampleRate
    /** Root-mean-square amplitude normalized to [0, 1]. */
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length) / 32768.0
    def peak: Int = if (samples.isEmpty) 0 else samples.map(s => math.abs(s.toInt)).max
  }

  private val HeaderSize = 44

  def encodedSize(nSamples: Int): Int = HeaderSize + nSamples * 2

  def encode(audio: Audio): Array[Byte] = {
    require(audio.sampleRate > 0, "sample rate must be positive")
    val dataLen = audio.samples.length * 2
    val buf = ByteBuffer.allocate(HeaderSize + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(audio.sampleRate).putInt(audio.sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Header sniff for payload ROUTING: magic plus a declared RIFF size
    * consistent with the actual byte length, so text that merely starts
    * with the magic characters can't be misrouted into the strict decoder.
    */
  def looksLikeWav(bytes: Array[Byte]): Boolean = {
    if (!isWav(bytes) || bytes.length < HeaderSize) return false
    val riffSize = ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt()
    riffSize >= 36 && riffSize + 8 <= bytes.length
  }

  /** Decode a mono 16-bit PCM WAV. Fails loudly on other encodings — a
    * silent fallback would masquerade corrupt media as data.
    */
  def decode(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV (missing RIFF/WAVE magic)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val tag = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val len = buf.getInt()
      tag match {
        case "fmt " =>
          val start = buf.position()
          val fmt = buf.getShort()
          val channels = buf.getShort()
          require(fmt == 1, s"unsupported WAV encoding $fmt (PCM only)")
          require(channels == 1, s"unsupported channel count $channels (mono only)")
          sampleRate = buf.getInt()
          require(sampleRate > 0, s"invalid sample rate $sampleRate")
          buf.getInt() // byte rate
          buf.getShort() // block align
          val bits = buf.getShort()
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
          buf.position(start + len + (len & 1)) // chunks are word-aligned
        case "data" =>
          require(len % 2 == 0 && buf.remaining() >= len, "truncated WAV data chunk")
          val out = new Array[Short](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort(); i += 1 }
          samples = out
        case _ => // skip unknown chunk (word-aligned)
          require(buf.remaining() >= len, s"truncated WAV chunk '$tag'")
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0, "WAV has no fmt chunk")
    require(samples != null, "WAV has no data chunk")
    Audio(sampleRate, samples)
  }

  /** Nearest-neighbor resample to `targetRate` — the dependency-free
    * rate conversion (a production codec would low-pass first).
    */
  def resample(audio: Audio, targetRate: Int): Audio = {
    require(targetRate > 0, "target rate must be positive")
    val n = math.max(1,
      (audio.samples.length.toLong * targetRate / audio.sampleRate).toInt)
    val out = new Array[Short](if (audio.samples.isEmpty) 0 else n)
    var i = 0
    while (i < out.length) {
      out(i) = audio.samples((i.toLong * audio.sampleRate / targetRate).toInt)
      i += 1
    }
    Audio(targetRate, out)
  }
}
