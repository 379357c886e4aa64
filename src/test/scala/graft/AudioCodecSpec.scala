package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal.AudioCodec
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Sample-level pinning of the real audio decode (the gate row
  * `q_audio_features` covers square waves, where RMS degenerates to
  * the amplitude; this pins the waveform math on NON-uniform samples
  * and the big-endian container path). */
class AudioCodecSpec extends AnyFunSuite {

  private def pcm(samples: Array[Int], bigEndian: Boolean): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      val v = samples(i)
      if (bigEndian) {
        out(2 * i) = ((v >> 8) & 0xff).toByte
        out(2 * i + 1) = (v & 0xff).toByte
      } else {
        out(2 * i) = (v & 0xff).toByte
        out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    out
  }

  private def container(samples: Array[Int], tpe: AudioFileFormat.Type,
      bigEndian: Boolean): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm(samples, bigEndian)),
      fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, out)
    out.toByteArray
  }

  test("non-uniform wave: exact RMS, crossings and peak from a WAV") {
    // samples 100, -200, 300, 0, -50: sumSq = 142500, rms = sqrt(28500)
    // crossings: +100/-200, -200/+300, 0 is non-negative so -50 adds one
    val s = Array(100, -200, 300, 0, -50)
    val f = AudioCodec.decode(container(s, AudioFileFormat.Type.WAVE,
      bigEndian = false))
    assert(f(0) == 8000f && f(1) == 5f)
    assert(f(2) == math.sqrt(142500.0 / 5).toFloat, s"rms ${f(2)}")
    assert(f(3) == 3f, s"crossings ${f(3)}")
    assert(f(4) == 300f)
  }

  test("big-endian container (AIFF) decodes to the same features") {
    val s = Array(100, -200, 300, 0, -50)
    val wav = AudioCodec.decode(container(s, AudioFileFormat.Type.WAVE,
      bigEndian = false))
    val aiff = AudioCodec.decode(container(s, AudioFileFormat.Type.AIFF,
      bigEndian = true))
    assert(aiff.toSeq == wav.toSeq)
  }

  test("negative extreme survives the byte reassembly (sign extension)") {
    val s = Array(-32768, 32767)
    val f = AudioCodec.decode(container(s, AudioFileFormat.Type.WAVE,
      bigEndian = false))
    assert(f(1) == 2f && f(3) == 1f && f(4) == 32768f)
  }

  test("undecodable payload and unsupported format yield the zero vector") {
    assert(AudioCodec.decode(Array[Byte](7, 7, 7)).toSeq
      == Seq(0f, 0f, 0f, 0f, 0f))
    // stereo is unsupported by this codec: zero vector, not garbage
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](8)), fmt, 2L)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    assert(AudioCodec.decode(out.toByteArray).toSeq
      == Seq(0f, 0f, 0f, 0f, 0f))
  }
}
