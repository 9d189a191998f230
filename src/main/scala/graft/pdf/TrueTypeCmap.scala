package graft.pdf

/** Minimal TrueType/OpenType `cmap` reader (the public sfnt format: Apple
  * TrueType Reference / OpenType spec §5.2, same layout in both): locate a
  * Unicode subtable and return its char → glyph-id mapping.
  *
  * Purpose here: an Identity-H composite font WITHOUT /ToUnicode shows raw
  * glyph ids (ISO 32000 §9.7.4: CID = code, /CIDToGIDMap /Identity makes
  * gid = CID). The embedded font program's own cmap maps unicode → gid for
  * shaping; REVERSING it recovers text the reference analog would read off
  * the page — the last-resort mapping pdfminer/MuPDF also fall back to.
  * Supports format 4 (segment mapping to delta, the BMP workhorse) and
  * format 12 (segmented coverage, supplementary planes). Anything else —
  * truncated tables, absurd counts, unsupported formats — returns None and
  * the caller keeps the honest drop-and-flag path (never mojibake).
  */
object TrueTypeCmap {

  private final class Reader(b: Array[Byte]) {
    def u8(i: Int): Int = { require(i >= 0 && i < b.length); b(i) & 0xff }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    def tag(i: Int): String =
      new String(Array(u8(i), u8(i + 1), u8(i + 2), u8(i + 3)).map(_.toByte), "US-ASCII")
  }

  /** char → gid from the raw font-program bytes (sfnt container), or None
    * when no parsable Unicode cmap subtable exists. Deterministic: subtable
    * preference is fixed (format 12 over format 4, then record order). */
  def charToGid(font: Array[Byte]): Option[Map[Int, Int]] =
    try {
      val r = new Reader(font)
      // sfnt header: version u32 (0x00010000 | 'OTTO' | 'true'), numTables
      val ver = r.u32(0)
      if (ver != 0x00010000L && ver != 0x4f54544fL && ver != 0x74727565L) return None
      val numTables = r.u16(4)
      if (numTables <= 0 || numTables > 512) return None
      var cmapOff = -1
      var t = 0
      while (t < numTables && cmapOff < 0) {
        val rec = 12 + 16 * t
        if (r.tag(rec) == "cmap") cmapOff = r.u32(rec + 8).toInt
        t += 1
      }
      if (cmapOff < 0) return None
      val nSub = r.u16(cmapOff + 2)
      if (nSub <= 0 || nSub > 64) return None
      // collect (platform, encoding, subtableOffset); prefer format 12
      var best: Map[Int, Int] = null
      var bestFormat = -1
      var s = 0
      while (s < nSub) {
        val rec = cmapOff + 4 + 8 * s
        val plat = r.u16(rec)
        val enc = r.u16(rec + 2)
        val subOff = cmapOff + r.u32(rec + 4).toInt
        // Unicode-semantics records only: platform 0 (Unicode) or 3/1, 3/10
        val unicodeish = plat == 0 || (plat == 3 && (enc == 1 || enc == 10))
        if (unicodeish) {
          val fmt = r.u16(subOff)
          if (fmt == 12 && bestFormat < 12)
            parseFormat12(r, subOff).foreach { m => best = m; bestFormat = 12 }
          else if (fmt == 4 && bestFormat < 4)
            parseFormat4(r, subOff).foreach { m => best = m; bestFormat = 4 }
        }
        s += 1
      }
      Option(best).filter(_.nonEmpty)
    } catch { case _: Exception => None } // truncated/corrupt → no mapping

  /** Format 4: parallel endCode/startCode/idDelta/idRangeOffset segments. */
  private def parseFormat4(r: Reader, off: Int): Option[Map[Int, Int]] = {
    val segCount = r.u16(off + 6) / 2
    if (segCount <= 0 || segCount > 8192) return None
    val endBase = off + 14
    val startBase = endBase + 2 * segCount + 2 // +2: reservedPad
    val deltaBase = startBase + 2 * segCount
    val rangeBase = deltaBase + 2 * segCount
    val out = Map.newBuilder[Int, Int]
    var total = 0L // expansion guard: the BMP bounds total work anyway
    var seg = 0
    while (seg < segCount) {
      val end = r.u16(endBase + 2 * seg)
      val start = r.u16(startBase + 2 * seg)
      val delta = r.u16(deltaBase + 2 * seg)
      val rangeOff = r.u16(rangeBase + 2 * seg)
      total += (if (start <= end) end - start + 1 else 0)
      if (total > (1 << 20)) return None
      // A legitimate FINAL segment may end at 0xFFFF and carry real
      // mappings (spec requires the last endCode to be 0xFFFF); only the
      // code point 0xFFFF itself is the terminator char (maps to missing
      // glyph) — exclude the char, never the whole segment.
      val last = math.min(end, 0xfffe)
      if (start <= last) {
        var c = start
        while (c <= last) {
          val gid =
            if (rangeOff == 0) (c + delta) & 0xffff
            else {
              // spec: address arithmetic relative to the idRangeOffset slot
              val g = r.u16(rangeBase + 2 * seg + rangeOff + 2 * (c - start))
              if (g == 0) 0 else (g + delta) & 0xffff
            }
          if (gid != 0) out += c -> gid
          c += 1
        }
      }
      seg += 1
    }
    Some(out.result())
  }

  /** Format 12: (startChar, endChar, startGlyph) groups, u32 throughout. */
  private def parseFormat12(r: Reader, off: Int): Option[Map[Int, Int]] = {
    val nGroups = r.u32(off + 12)
    if (nGroups <= 0 || nGroups > 8192) return None
    val out = Map.newBuilder[Int, Int]
    var total = 0L
    var g = 0
    while (g < nGroups) {
      val rec = off + 16 + 12 * g
      val start = r.u32(rec)
      val end = r.u32(rec + 4)
      val gid0 = r.u32(rec + 8)
      if (start > end || end > 0x10ffffL) return None // malformed
      total += end - start + 1
      if (total > (1 << 20)) return None // absurd expansion guard
      var c = start
      while (c <= end) {
        val gid = (gid0 + (c - start)) & 0xffffL
        if (gid != 0) out += c.toInt -> gid.toInt
        c += 1
      }
      g += 1
    }
    Some(out.result())
  }

  /** The Identity-H reverse map: gid → unicode string. Collisions (two chars
    * sharing a glyph) keep the SMALLEST char — deterministic, and the common
    * collision (space/nbsp, case-folded smallcaps) reads naturally. */
  def gidToText(font: Array[Byte]): Option[Map[Int, String]] =
    charToGid(font).map { fwd =>
      val rev = scala.collection.mutable.HashMap.empty[Int, Int]
      for ((c, gid) <- fwd)
        rev.get(gid) match {
          case Some(prev) if prev <= c => ()
          case _ => rev(gid) = c
        }
      rev.iterator.map { case (gid, c) => gid -> new String(Character.toChars(c)) }.toMap
    }
}
