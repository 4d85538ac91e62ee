package graft

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

import org.apache.spark.sql.functions.col

import graft.functions.AudioCodec

/** The real-WAV decode chain: the codec against JVM-encoded clips
  * (AudioSystem.write — an encoder the stdlib-Python corpus generator
  * shares no code with), then the whole committed corpus against the
  * sample-formula sidecar — two independent routes to the same PCM.
  */
class AudioCodecSpec extends SparkTestBase {

  private def wavOf(xs: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false) // PCM16 mono LE
    val pcm = new Array[Byte](xs.length * 2)
    xs.indices.foreach { i =>
      pcm(i * 2) = (xs(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((xs(i) >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, xs.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("round-trip: JVM-encoded WAV decodes to exact integer stats") {
    val xs = Array[Short](0, 100, -200, 3000, -3000, 32767, -32768, 5, -5, 0)
    val d = AudioCodec.decode(wavOf(xs)).get
    assert(d.nChannels == 1 && d.sampleRate == 8000 && d.nSamples == 10L)
    assert(d.sumAbs == xs.map(v => math.abs(v.toLong)).sum)
    assert(d.energy == xs.map(v => v.toLong * v).sum)
    assert(d.peak == 32768L)
    val zc = xs.sliding(2).count(w => (w(0) < 0) != (w(1) < 0))
    assert(d.zeroCrossings == zc, s"zc: ${d.zeroCrossings} vs $zc")
  }

  test("AU round-trips through the same decode path (big-endian PCM16)") {
    // encode with the JVM's own AU writer — shares no code with the
    // stdlib-Python generator that built the committed .au corpus;
    // identical samples through AU and WAV must give identical stats
    val xs = Array[Short](0, 100, -200, 3000, -3000, 32767, -32768, 5, -5, 0)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](xs.length * 2)
    xs.indices.foreach { i =>
      pcm(i * 2) = (xs(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((xs(i) >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, xs.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.AU, bos)
    val au = AudioCodec.decode(bos.toByteArray).get
    val wav = AudioCodec.decode(wavOf(xs)).get
    assert(au == wav, s"AU vs WAV stat divergence:\n  au  $au\n  wav $wav")
  }

  test("stereo is rejected: inter-channel zero crossings would be meaningless") {
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    // L=+1000 / R=-1000 per frame: per-channel zc is 0, but a naive
    // interleaved count would see a sign flip at every sample
    val pcm = new Array[Byte](8 * 4)
    (0 until 8).foreach { f =>
      pcm(f * 4) = (1000 & 0xff).toByte; pcm(f * 4 + 1) = (1000 >> 8).toByte
      pcm(f * 4 + 2) = (-1000 & 0xff).toByte; pcm(f * 4 + 3) = ((-1000 >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8L)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    assert(AudioCodec.decode(bos.toByteArray).isEmpty,
      "multi-channel PCM must be rejected, not mis-summarized")
  }

  test("corrupt containers decode to None, never throw") {
    assert(AudioCodec.decode("definitely not audio".getBytes).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    val good = wavOf(Array[Short](1, 2, 3, -4))
    assert(AudioCodec.decode(good.take(20)).isEmpty,
      "truncated header must fail cleanly")
  }

  test("committed corpus matches the sample-formula sidecar row-for-row") {
    val got = operators.Multimodal.mmAudioDecode(spark, sfDir).collect()
    val want = spark.read
      .parquet(operators.Multimodal.audioDir + "/expected.parquet")
      .select(col("file_name"), col("audio_ok"), col("n_channels"),
        col("sample_rate"), col("n_samples"), col("sum_abs"),
        col("energy"), col("peak"), col("zero_crossings"))
      .orderBy(col("file_name")).collect()
    assert(got.length == want.length && got.length == 55,
      s"corpus should be 55 files (42 WAV leg + 13 AU leg): " +
        s"got=${got.length} want=${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"decode diverged from sidecar:\n  got  $g\n  want $w")
    }
  }
}
