package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Minimal RGB8 PNG ENCODER (RFC 2083 / PNG spec): IHDR + IDAT(s) +
  * IEND with correct CRCs, zlib-deflated scanlines, and a
  * caller-chosen filter type per row. Public-knowledge format, zero
  * codec dependencies — `java.util.zip` is the whole toolchain.
  *
  * This is deliberately the DUAL of [[graft.functions.PngPixelUtil]]'s
  * decoder: the test suite and the q114 oracle fixture round-trip
  * pixels through encode→decode with every filter type (0-4) exercised,
  * so the decoder's inflate and per-scanline unfilter paths are pinned
  * against first-principles pixel formulas, not against themselves.
  * Real use beyond fixtures: writing small diagnostic images (masks,
  * heat tiles) from a pipeline without pulling in an imaging stack. */
object Png {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(out: ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(t); out.write(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** Paeth predictor (PNG spec §6.6) — shared with the decoder's
    * unfilter by construction of the tests, not by shared code: an
    * encode-side bug and a decode-side bug cannot cancel out against
    * the formula-derived oracle. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a `w`×`h` RGB8 image. `px(x, y)` returns (r, g, b) in
    * 0-255; `filterForRow(y)` picks the scanline filter (0=None 1=Sub
    * 2=Up 3=Average 4=Paeth — encode applies the filter so decode must
    * invert it); `idatChunkSize` splits the compressed stream into
    * multiple IDAT chunks (the spec allows any split; decoders must
    * concatenate — exercised deliberately by the fixtures). */
  def encodeRgb(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
                filterForRow: Int => Int = _ % 5,
                idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride)) // filter byte + pixels per row
    val cur = new Array[Int](stride)            // current row, unfiltered
    val above = new Array[Int](stride)          // previous row, unfiltered
    var y = 0
    var o = 0
    while (y < h) {
      val ft = filterForRow(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw(o) = ft.toByte; o += 1
      var i = 0
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        cur(i) = r & 0xff; cur(i + 1) = g & 0xff; cur(i + 2) = b & 0xff
        i += 3; x += 1
      }
      i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) else 0        // left
        val b = if (y > 0) above(i) else 0           // up
        val c = if (i >= 3 && y > 0) above(i - 3) else 0 // up-left
        val v = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case 4 => cur(i) - paeth(a, b, c)
        }
        raw(o) = (v & 0xff).toByte
        o += 1; i += 1
      }
      System.arraycopy(cur, 0, above, 0, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = zout.toByteArray

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(w)); ihdr.write(be32(h))
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor RGB
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    var off = 0
    while (off < z.length) {
      val n = math.min(idatChunkSize, z.length - off)
      chunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
