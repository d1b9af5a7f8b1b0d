package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal PCM16 WAV ENCODER (RIFF/WAVE, the canonical `fmt `+`data`
  * layout every recorder writes; format documented in the public
  * RIFF/WAVE spec). Public-knowledge container, zero codec
  * dependencies — PCM16 is raw little-endian samples.
  *
  * Deliberately the DUAL of [[graft.functions.WavPcmUtil]]'s decoder
  * (the [[Png]] / PngPixelUtil pattern): the test suite and the q115
  * oracle fixture round-trip samples through encode→decode against
  * first-principles sample formulas, so the decoder's chunk walk and
  * LE16 sample reads are pinned against arithmetic, never against
  * themselves. Ancillary chunks (with RIFF's odd-length pad byte) can
  * be injected to exercise the walk. Real use beyond fixtures:
  * writing small diagnostic tones/markers from a pipeline without an
  * audio stack. */
object Wav {

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def chunk(out: ByteArrayOutputStream, id: String,
                    data: Array[Byte]): Unit = {
    require(id.length == 4, s"RIFF chunk id must be 4 bytes: '$id'")
    out.write(id.getBytes("US-ASCII"))
    le32(out, data.length)
    out.write(data)
    if ((data.length & 1) == 1) out.write(0) // RIFF word-alignment pad
  }

  /** Encode `frames` frames of `channels`-interleaved PCM16.
    * `sample(frame, ch)` returns the sample value (low 16 bits kept,
    * two's complement). `ancillary` chunks are written between
    * `fmt ` and `data` — decoders must skip them (including the pad
    * byte after an odd-length body), which the fixtures exercise. */
  def encodePcm16(channels: Int, sampleRate: Int, frames: Int,
                  sample: (Int, Int) => Int,
                  ancillary: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    require(frames >= 0, s"bad frame count $frames")
    val blockAlign = channels * 2

    val fmt = new ByteArrayOutputStream()
    le16(fmt, 1) // PCM
    le16(fmt, channels)
    le32(fmt, sampleRate)
    le32(fmt, sampleRate * blockAlign) // byte rate
    le16(fmt, blockAlign)
    le16(fmt, 16) // bits per sample

    val data = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) { le16(data, sample(f, c) & 0xffff); c += 1 }
      f += 1
    }

    val body = new ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    chunk(body, "fmt ", fmt.toByteArray)
    ancillary.foreach { case (id, d) => chunk(body, id, d) }
    chunk(body, "data", data.toByteArray)

    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, body.size())
    body.writeTo(out)
    out.toByteArray
  }
}
