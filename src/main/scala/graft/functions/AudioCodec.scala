package graft.functions

import java.io.ByteArrayInputStream

/** Real audio decode, JDK-only (`javax.sound.sampled` — the RIFF/WAV
  * parser ships with every JRE, no jar): the audio sibling of
  * [[ImageCodec]], closing the audio half of the multimodal decode
  * gap. Parses the container (chunked RIFF, PCM format block), streams
  * the sample frames, and computes ALL-INTEGER per-clip statistics
  * (abs-sum, energy, peak, zero crossings) so results are exact across
  * engines and execution orders — the committed-corpus oracle
  * hash-matches against a sidecar derived from the generator's sample
  * formulas, never from this decoder.
  *
  * Decode failures (bad magic, truncated header, unsupported codec)
  * return None — surfaced as audio_ok=false rows, never a thrown scan.
  * Only MONO signed 16-bit PCM is accepted: that's what the corpus
  * commits, and rejecting the rest loudly beats mis-decoding it (the
  * zero-crossing statistic is only meaningful per channel).
  */
object AudioCodec {

  final case class Decoded(
      nChannels: Int, sampleRate: Int, nSamples: Long,
      sumAbs: Long, energy: Long, peak: Long, zeroCrossings: Long)

  final case class Samples(nChannels: Int, sampleRate: Int, samples: Array[Int])

  /** Decode the full PCM sample sequence (mono signed 16-bit only,
    * same acceptance contract as [[decode]]) — for consumers that need
    * the waveform itself, like block-frame sampling
    * (Multimodal.mmFrameSample). The clip corpus is small per file;
    * a huge-file deployment would stream frames instead of
    * materializing, which is what [[decode]] does for its statistics.
    */
  def decodeSamples(bytes: Array[Byte]): Option[Samples] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!ok) None
        else {
          val le = !fmt.isBigEndian
          val outBuf = scala.collection.mutable.ArrayBuilder.make[Int]
          val buf = new Array[Byte](8192)
          // AudioInputStream reads whole FRAMES: only -1 is
          // end-of-stream (0 means retry), and every successful read is
          // frame-aligned — asserted, since a split sample would
          // otherwise be silently mis-decoded
          var read = in.read(buf)
          while (read != -1) {
            require(read % 2 == 0, s"non-frame-aligned read: $read bytes")
            var i = 0
            while (i < read) {
              val s = if (le) ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                      else ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
              outBuf += s.toInt
              i += 2
            }
            read = in.read(buf)
          }
          Some(Samples(fmt.getChannels, fmt.getSampleRate.toInt, outBuf.result()))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // mono only: the zero-crossing state below runs sample-to-
        // sample, so interleaved stereo frames would count meaningless
        // inter-channel sign flips — reject loudly rather than emit a
        // wrong statistic (the per-channel variant is a deliberate
        // non-goal until a corpus needs it)
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
        if (!ok) None
        else {
          val le = !fmt.isBigEndian
          val channels = fmt.getChannels
          var sumAbs = 0L; var energy = 0L; var peak = 0L
          var zc = 0L; var n = 0L
          var prevNeg = false
          val buf = new Array[Byte](8192)
          // frame-aligned reads, -1-only end-of-stream — same contract
          // as decodeSamples above
          var read = in.read(buf)
          while (read != -1) {
            require(read % 2 == 0, s"non-frame-aligned read: $read bytes")
            var i = 0
            while (i < read) {
              val s = if (le) ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                      else ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
              val v = s.toLong
              val a = math.abs(v)
              sumAbs += a; energy += v * v; if (a > peak) peak = a
              if (n > 0 && (v < 0) != prevNeg) zc += 1
              prevNeg = v < 0; n += 1
              i += 2
            }
            read = in.read(buf)
          }
          Some(Decoded(channels, fmt.getSampleRate.toInt, n / channels,
            sumAbs, energy, peak, zc))
        }
      } finally in.close()
    } catch { case _: Exception => None }
}
