package graft.core.text

import java.text.Normalizer

/**
 * Unicode hygiene for web text — the ftfy-class cleanup stage every
 * webtext pipeline runs before tokenization (the reference engine has no
 * text surface; this extends the LLM-pipeline family):
 *
 *  - NFC / NFKC normalization (UAX #15 via the JDK; `nfc` is replayed
 *    independently by DuckDB's `nfc_normalize` in the oracle gate);
 *  - mojibake detection + repair: undo UTF-8-bytes-read-as-windows-1252
 *    ("Ã©" -> "é"), iterated for double/triple encoding.
 *
 * The repair uses "sloppy windows-1252": the real cp1252 table with its
 * five undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) passed through to the
 * C1 controls U+0081.. — the same totalization ftfy uses, because broken
 * decoders emit exactly those C1 chars. Encoding back is PARTIAL: any
 * char outside the 256-entry table aborts the repair (the string cannot
 * have come from a cp1252 read, so it is left untouched). The second
 * guard is a STRICT UTF-8 decode (malformed -> abort). Legitimate
 * extended-Latin text ("À bientôt") never forms valid UTF-8 sequences
 * through cp1252, so it passes through unchanged; text that survives
 * both guards is overwhelmingly mojibake (ftfy's core assumption).
 *
 * Everything here is a pure function of the input string — deterministic
 * under any partitioning, no locale dependence.
 */
object UnicodeClean {

  /** byte -> char for sloppy windows-1252 (identity except 0x80-0x9F;
    * the five holes 81/8D/8F/90/9D pass through as C1 controls). */
  private val B2C: Array[Char] = {
    val t = Array.tabulate[Char](256)(_.toChar) // latin-1 identity
    val row89: Array[Int] = Array(
      0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
      0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    var i = 0
    while (i < 32) { t(0x80 + i) = row89(i).toChar; i += 1 }
    t
  }

  /** char -> byte (boxed in an int; -1 = not encodable). Sparse over the
    * BMP: a 0x2200-entry array covers every cp1252 target (max U+2122). */
  private val C2B: Array[Int] = {
    val t = Array.fill(0x2200)(-1)
    var b = 0
    while (b < 256) { t(B2C(b)) = b; b += 1 }
    t
  }

  @inline private def cpByte(c: Char): Int = if (c < 0x2200) C2B(c) else -1

  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  def nfkc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFKC)

  /** Mojibake evidence count: positions where adjacent chars, seen
    * through cp1252, form a valid UTF-8 lead byte (0xC2-0xF4) followed
    * by a continuation byte (0x80-0xBF) — plus any U+FFFD replacement
    * chars a lossy decode already planted. Clean text of ANY language
    * scores 0 except astronomically unlikely char runs. */
  def mojibakeScore(s: String): Int = {
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c == '�') n += 1
      else if (i + 1 < len) {
        val b = cpByte(c)
        if (b >= 0xc2 && b <= 0xf4) {
          val b2 = cpByte(s.charAt(i + 1))
          if (b2 >= 0x80 && b2 <= 0xbf) n += 1
        }
      }
      i += 1
    }
    n
  }

  /** One repair round: re-encode through sloppy cp1252, strict-decode as
    * UTF-8. Returns null when the string is not a clean single layer of
    * mojibake (unencodable char, malformed UTF-8, or pure ASCII). */
  private def undoOnce(s: String): String = {
    val len = s.length
    val bytes = new Array[Byte](len)
    var i = 0
    var sawHigh = false
    while (i < len) {
      val b = cpByte(s.charAt(i))
      if (b < 0) return null
      if (b >= 0x80) sawHigh = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!sawHigh) return null // ASCII: round-trip is identity, stop
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Undo up to 3 layers of UTF-8-as-cp1252 mojibake; not-mojibake text
    * (incl. all pure-ASCII and legitimate extended-Latin) is returned
    * unchanged. Idempotent: fixMojibake(fixMojibake(s)) == fixMojibake(s)
    * because a fully repaired string no longer strict-decodes. */
  def fixMojibake(s: String): String = {
    var cur = s
    var round = 0
    while (round < 3) {
      val next = undoOnce(cur)
      if (next == null || next == cur) return cur
      cur = next
      round += 1
    }
    cur
  }
}
