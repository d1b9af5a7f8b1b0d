package graft.multimodal

/** Minimal ISO-BMFF (MP4) writer for fixtures — the byte-level
  * counterpart of [[Mp4HeaderUtil]]'s box walk, public-spec only
  * (ISO/IEC 14496-12: a file is a sequence of boxes, each
  * `[size:u32][type:4cc][payload]`, with `size == 1` promoting to a
  * 64-bit `largesize` after the type and `size == 0` meaning
  * "to end of file", legal only for the last top-level box).
  * Synthesizes `ftyp` + optional `free` + `moov(mvhd, trak*)` +
  * `mdat`, with both mvhd versions (v0: u32 times, v1: u64) so the
  * parser's offset arithmetic is exercised on both layouts. No codec
  * payloads — this is the CONTAINER level a curation pipeline filters
  * on before paying for any decode. */
object Mp4 {

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars, got '$s'")
    s.getBytes("US-ASCII")
  }

  /** One box; `largesize = true` writes the 16-byte header form. */
  def box(tpe: String, payload: Array[Byte],
          largesize: Boolean = false): Array[Byte] =
    if (largesize)
      u32(1) ++ fourcc(tpe) ++ u64(16L + payload.length) ++ payload
    else u32(8L + payload.length) ++ fourcc(tpe) ++ payload

  /** mvhd payload (spec sizes: v0 = 100 bytes, v1 = 112): version +
    * flags, creation/modification (fixed 3600 — fields the parser
    * skips over, so wrong offsets surface as garbage timescale),
    * timescale, duration, then rate/volume/matrix/next-track zeros. */
  def mvhd(timescale: Long, duration: Long, v1: Boolean): Array[Byte] = {
    val head =
      if (v1) Array[Byte](1, 0, 0, 0) ++ u64(3600) ++ u64(3600) ++
        u32(timescale) ++ u64(duration)
      else Array[Byte](0, 0, 0, 0) ++ u32(3600) ++ u32(3600) ++
        u32(timescale) ++ u32(duration)
    box("mvhd", head ++ Array.fill[Byte](80)(0))
  }

  /** tkhd payload (spec sizes: v0 = 84 bytes, v1 = 96): version +
    * flags (flags = 7: enabled|in-movie|in-preview, the common case),
    * creation/modification, track_ID, reserved, duration, reserved×2,
    * layer/alternate-group/volume/reserved shorts, unity matrix,
    * width/height in 16.16 fixed point. */
  def tkhd(trackId: Long, duration: Long, widthPx: Long, heightPx: Long,
           v1: Boolean): Array[Byte] = {
    val matrix = u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)
    val head =
      if (v1) Array[Byte](1, 0, 0, 7) ++ u64(3600) ++ u64(3600) ++
        u32(trackId) ++ u32(0) ++ u64(duration)
      else Array[Byte](0, 0, 0, 7) ++ u32(3600) ++ u32(3600) ++
        u32(trackId) ++ u32(0) ++ u32(duration)
    box("tkhd", head ++ u32(0) ++ u32(0) ++
      Array[Byte](0, 0, 0, 1, 0, 0, 0, 0) ++ // layer, alt_group, volume, reserved
      matrix ++ u32(widthPx << 16) ++ u32(heightPx << 16))
  }

  /** mdhd payload (spec sizes: v0 = 24 bytes, v1 = 36): version +
    * flags, creation/modification, media timescale, media duration,
    * then language/pre_defined zeros. */
  def mdhd(timescale: Long, duration: Long, v1: Boolean): Array[Byte] = {
    val head =
      if (v1) Array[Byte](1, 0, 0, 0) ++ u64(3600) ++ u64(3600) ++
        u32(timescale) ++ u64(duration)
      else Array[Byte](0, 0, 0, 0) ++ u32(3600) ++ u32(3600) ++
        u32(timescale) ++ u32(duration)
    box("mdhd", head ++ Array.fill[Byte](4)(0))
  }

  /** stts (decoding time-to-sample, §8.6.1.2): run-length encoded
    * (sample_count, sample_delta) pairs. */
  def stts(runs: Seq[(Long, Long)]): Array[Byte] =
    box("stts", Array[Byte](0, 0, 0, 0) ++ u32(runs.length) ++
      runs.flatMap { case (c, d) => u32(c) ++ u32(d) }.toArray)

  /** stss (sync-sample table, §8.6.2): 1-based keyframe numbers.
    * ABSENCE of the box means every sample is sync, per the spec. */
  def stss(syncs: Seq[Long]): Array[Byte] =
    box("stss", Array[Byte](0, 0, 0, 0) ++ u32(syncs.length) ++
      syncs.flatMap(s => u32(s).toSeq).toArray)

  /** stsz (sample sizes, §8.7.3.2): uniform `sample_size != 0` form
    * (no table) or per-sample u32 table. The `sample_count` field is
    * written in BOTH forms (the spec requires it to equal the stts
    * total — fixtures override it to plant that mismatch). */
  def stsz(sampleSize: Long, sampleCount: Long,
           sizes: Seq[Long] = Nil): Array[Byte] =
    box("stsz", Array[Byte](0, 0, 0, 0) ++ u32(sampleSize) ++
      u32(sampleCount) ++ sizes.flatMap(s => u32(s).toSeq).toArray)

  /** A full trak with its sample tables: tkhd + mdia(mdhd +
    * minf(nmhd + stbl(stsd + stts [+ stss] + stsz))) — the nmhd and
    * empty stsd are deliberate unknown-sibling boxes the walk must
    * skip over. `uniformSize > 0` writes the no-table stsz form;
    * `stszCountOverride` plants a count ≠ the stts total. */
  def sampledTrak(trackId: Long, duration: Long, widthPx: Long,
                  heightPx: Long, v1: Boolean, mediaTimescale: Long,
                  mediaDuration: Long, runs: Seq[(Long, Long)],
                  syncs: Option[Seq[Long]], uniformSize: Long,
                  sizes: Seq[Long] = Nil,
                  stszCountOverride: Option[Long] = None): Array[Byte] = {
    val total = runs.map(_._1).sum
    val count = stszCountOverride.getOrElse(total)
    val stblKids =
      box("stsd", Array[Byte](0, 0, 0, 0) ++ u32(0)) ++
        stts(runs) ++
        syncs.map(stss).getOrElse(Array.empty[Byte]) ++
        (if (uniformSize > 0) stsz(uniformSize, count)
         else stsz(0, count, sizes))
    val minf = box("minf",
      box("nmhd", Array[Byte](0, 0, 0, 0)) ++ box("stbl", stblKids))
    val mdia = box("mdia",
      mdhd(mediaTimescale, mediaDuration, v1) ++ minf)
    box("trak", tkhd(trackId, duration, widthPx, heightPx, v1) ++ mdia)
  }

  /** ftyp + moov(mvhd + the given traks) + mdat — the movie wrapper
    * for [[sampledTrak]] fixtures. */
  def encodeMovie(majorBrand: String, timescale: Long, duration: Long,
                  traks: Seq[Array[Byte]], mvhdV1: Boolean = false,
                  mdatBytes: Int = 8): Array[Byte] = {
    val ftyp = box("ftyp",
      fourcc(majorBrand) ++ u32(0) ++ fourcc("isom") ++ fourcc("mp41"))
    val moov = box("moov", mvhd(timescale, duration, mvhdV1) ++
      traks.foldLeft(Array.empty[Byte])(_ ++ _))
    ftyp ++ moov ++ box("mdat", Array.fill[Byte](mdatBytes)(0x55))
  }

  /** A structurally-valid header: ftyp(major brand + minor + two
    * compatible brands), optional free box, moov(mvhd + nTracks
    * trak(tkhd with deterministic per-track fields: track_ID = i+1,
    * the movie duration, 320+16i × 240+8i px)), mdat (optionally with
    * the 64-bit largesize header, optionally written as size = 0 =
    * "to EOF"). */
  def encodeHeader(majorBrand: String, timescale: Long, duration: Long,
                   nTracks: Int, mvhdV1: Boolean = false,
                   freeBefore: Boolean = false, mdatBytes: Int = 8,
                   mdatLargesize: Boolean = false,
                   mdatToEof: Boolean = false): Array[Byte] = {
    require(nTracks >= 0 && mdatBytes >= 0)
    val ftyp = box("ftyp",
      fourcc(majorBrand) ++ u32(0) ++ fourcc("isom") ++ fourcc("mp41"))
    val free =
      if (freeBefore) box("free", Array.fill[Byte](4)(0))
      else Array.empty[Byte]
    val traks = (0 until nTracks)
      .map(i => box("trak", tkhd(i + 1L, duration, 320L + 16 * i,
        240L + 8 * i, v1 = mvhdV1)))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    val moov = box("moov", mvhd(timescale, duration, mvhdV1) ++ traks)
    val mdatPayload = Array.fill[Byte](mdatBytes)(0x55)
    val mdat =
      if (mdatToEof) u32(0) ++ fourcc("mdat") ++ mdatPayload
      else box("mdat", mdatPayload, largesize = mdatLargesize)
    ftyp ++ free ++ moov ++ mdat
  }
}
