package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal GIF87a/89a HEADER encoder (CompuServe GSD / W3C GIF89a
  * specification): signature + version, little-endian Logical Screen
  * Descriptor, optional Global Color Table, comment extensions,
  * image descriptors with token LZW data, trailer. Public-knowledge
  * format, zero codec dependencies.
  *
  * The fixture DUAL of [[graft.functions.GifHeaderUtil]]'s block walk
  * (the [[Jpeg]]/[[Png]]/[[Wav]] discipline): the suite and the q319
  * oracle derive every expected field from the PARAMETERS alone, so
  * the decoder's little-endian block walk is pinned against
  * first-principles byte formulas, not against itself. The LZW image
  * data is deliberately token garbage — the parser's contract is
  * header metadata only and it must skip sub-block chains by their
  * length prefixes, which the fixtures verify by putting nothing
  * parseable inside them. */
object Gif {

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** Encode a structurally valid GIF for a `w`×`h` logical screen:
    * optional Global Color Table of 2^(gctExp+1) entries
    * (gctExp 0–7), `nExtensions` comment extensions (GIF89a blocks —
    * pass 0 for 87a fixtures), `nImages` image descriptors with token
    * 2-byte LZW sub-blocks and no Local Color Table, then the
    * trailer. */
  def encodeHeader(w: Int, h: Int, version89: Boolean = true,
                   gctExp: Int = -1, bgIndex: Int = 0,
                   nImages: Int = 1, nExtensions: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(gctExp >= -1 && gctExp <= 7, "gctExp must be -1 (none) or 0-7")
    require(nImages >= 0 && nExtensions >= 0 && bgIndex >= 0 && bgIndex <= 255,
      "negative block counts or bad background index")
    val out = new ByteArrayOutputStream()
    out.write("GIF".getBytes("US-ASCII"))
    out.write((if (version89) "89a" else "87a").getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(if (gctExp >= 0) 0x80 | gctExp else 0x00) // packed
    out.write(bgIndex)
    out.write(0) // pixel aspect ratio: none
    if (gctExp >= 0) {
      val entries = 1 << (gctExp + 1)
      for (i <- 0 until entries) {
        out.write(i * 31 % 256); out.write(i * 57 % 256); out.write(i * 89 % 256)
      }
    }
    for (x <- 0 until nExtensions) {
      out.write(0x21); out.write(0xfe) // comment extension
      out.write(3) // one 3-byte sub-block
      out.write('c'); out.write('0' + x % 10); out.write('!')
      out.write(0) // sub-block terminator
    }
    for (i <- 0 until nImages) {
      out.write(0x2c)
      le16(out, 0); le16(out, 0) // left, top
      le16(out, w); le16(out, h)
      out.write(0x00) // no Local Color Table, no interlace
      out.write(2)    // LZW minimum code size (token)
      out.write(2); out.write(0x4c + i % 16); out.write(0x01) // token data
      out.write(0)    // sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Animated-GIF fixture for the per-frame inventory
    * ([[graft.functions.GifFrameUtil]]): `nFrames` image descriptors
    * whose geometry, palette, and Graphic Control Extension fields
    * all follow FIXED index formulas, so the suite and the oracle
    * derive every expected row from (w, h, version89, nFrames, i)
    * alone — frame i is `(1 + i mod w) × (1 + i mod h)` at
    * `(2i mod 2^16, 3i mod 2^16)`, carries a Local Color Table of
    * `2^((i mod 7) + 1)` entries when `i mod 3 = 0`, and (GIF89a
    * only) a GCE with `delay = 4 + 3i` cs and `disposal = i mod 4`
    * EXCEPT every fifth frame (`i mod 5 = 4`), which omits the GCE
    * to pin the 0/0 spec default. GIF87a fixtures have no GCEs at
    * all (the extension block postdates 87a). */
  def encodeAnimation(w: Int, h: Int, nFrames: Int,
                      version89: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    require(nFrames >= 1, "nFrames must be >= 1")
    val out = new ByteArrayOutputStream()
    out.write("GIF".getBytes("US-ASCII"))
    out.write((if (version89) "89a" else "87a").getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(0x00) // no Global Color Table
    out.write(0)    // background index
    out.write(0)    // pixel aspect ratio: none
    for (i <- 0 until nFrames) {
      if (version89 && i % 5 != 4) {
        out.write(0x21); out.write(0xf9) // Graphic Control Extension
        out.write(4)
        out.write((i % 4) << 2) // disposal in packed bits 2-4
        le16(out, 4 + 3 * i)    // delay centiseconds
        out.write(0)            // transparent index (flag off)
        out.write(0)            // sub-block terminator
      }
      out.write(0x2c)
      le16(out, (2 * i) & 0xffff); le16(out, (3 * i) & 0xffff) // left, top
      le16(out, 1 + i % w); le16(out, 1 + i % h)
      val hasLct = i % 3 == 0
      val lctExp = i % 7
      out.write(if (hasLct) 0x80 | lctExp else 0x00)
      if (hasLct) {
        val entries = 1 << (lctExp + 1)
        for (j <- 0 until entries) {
          out.write(j * 13 % 256); out.write(j * 29 % 256); out.write(j * 43 % 256)
        }
      }
      out.write(2) // LZW minimum code size (token)
      out.write(2); out.write(0x4c + i % 16); out.write(0x01) // token data
      out.write(0) // sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
