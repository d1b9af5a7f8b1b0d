package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal JFIF/JPEG HEADER encoder (ITU-T T.81 §B; the JFIF APP0
  * convention of ECMA TR/98): SOI + marker segments with big-endian
  * lengths + SOS + token entropy bytes + EOI. Public-knowledge
  * format, zero codec dependencies.
  *
  * This is the fixture DUAL of [[graft.functions.JpegHeaderUtil]]'s
  * segment walk (the [[Png]]/[[Wav]] discipline): the suite and the
  * q200 oracle derive every expected field from the PARAMETERS alone,
  * so the decoder's marker walk is pinned against first-principles
  * byte formulas, not against itself. The entropy-coded image data is
  * deliberately token garbage — the parser's contract is header
  * metadata only and it must stop at SOS, which the fixtures verify
  * by putting nothing parseable after it. */
object Jpeg {

  private def be16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def seg(out: ByteArrayOutputStream, marker: Int,
                  payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    be16(out, payload.length + 2) // length includes its own two bytes
    out.write(payload, 0, payload.length)
  }

  /** Encode a structurally valid JPEG header stream for a `w`×`h`
    * image: SOI, optional JFIF APP0, optional COM, `nDqt` DQT
    * segments, SOF0 (baseline) or SOF2 (`progressive`), one DHT, SOS,
    * a few entropy bytes, EOI. `components` is 1 (grayscale) or 3
    * (YCbCr). The segment universe covers every branch of the parser:
    * recognized APP0, skipped ancillary segments (COM/DQT/DHT), the
    * SOF of interest, and the SOS stop. */
  def encodeHeader(w: Int, h: Int, components: Int = 3,
                   progressive: Boolean = false, withJfif: Boolean = true,
                   nDqt: Int = 1, commentLen: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(components == 1 || components == 3, "components must be 1 or 3")
    require(nDqt >= 0 && commentLen >= 0, "negative segment params")
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    if (withJfif) {
      val p = new ByteArrayOutputStream()
      p.write("JFIF".getBytes("US-ASCII")); p.write(0)
      p.write(1); p.write(1)  // version 1.1
      p.write(0)              // density units: none
      be16(p, 1); be16(p, 1)  // x/y density
      p.write(0); p.write(0)  // no thumbnail
      seg(out, 0xe0, p.toByteArray)
    }
    if (commentLen > 0)
      seg(out, 0xfe, Array.fill(commentLen)('x'.toByte))
    for (t <- 0 until nDqt) {
      val p = new ByteArrayOutputStream()
      p.write(t & 0x0f) // 8-bit table, id t
      for (i <- 0 until 64) p.write((i * 7 + t + 3) % 255 + 1)
      seg(out, 0xdb, p.toByteArray)
    }
    val sof = new ByteArrayOutputStream()
    sof.write(8)      // sample precision
    be16(sof, h); be16(sof, w)
    sof.write(components)
    for (c <- 1 to components) {
      sof.write(c)    // component id
      sof.write(0x11) // 1x1 sampling
      sof.write(0)    // quant table 0
    }
    seg(out, if (progressive) 0xc2 else 0xc0, sof.toByteArray)
    val dht = new ByteArrayOutputStream()
    dht.write(0)                       // class 0, id 0
    for (_ <- 0 until 16) dht.write(0) // no codes (token table)
    seg(out, 0xc4, dht.toByteArray)
    val sos = new ByteArrayOutputStream()
    sos.write(components)
    for (c <- 1 to components) { sos.write(c); sos.write(0) }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection
    seg(out, 0xda, sos.toByteArray)
    out.write(0x12); out.write(0x34) // token entropy-coded bytes
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
