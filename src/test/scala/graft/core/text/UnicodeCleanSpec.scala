package graft.core.text

import org.scalatest.funsuite.AnyFunSuite

class UnicodeCleanSpec extends AnyFunSuite {

  // classic ftfy vectors: UTF-8 bytes of the clean string read as cp1252
  private def mojify(clean: String, layers: Int = 1): String = {
    var s = clean
    (0 until layers).foreach { _ =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new StringBuilder(bytes.length)
      bytes.foreach { b =>
        val u = b & 0xff
        // sloppy cp1252 decode (holes -> C1), mirrors the table under test
        // via the authoritative unicode.org cp1252 mapping
        sb.append(Cp1252Ref(u))
      }
      s = sb.toString
    }
    s
  }

  // independent copy of the cp1252 best-fit table (unicode.org
  // CP1252.TXT + C1 pass-through for the five holes) — NOT the one in
  // UnicodeClean, so a table typo fails these tests
  private val Cp1252Ref: Array[Char] = {
    val t = Array.tabulate[Char](256)(_.toChar)
    val m = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    m.foreach { case (b, cp) => t(b) = cp.toChar }
    t
  }

  test("nfc composes; matches JDK semantics on standard vectors") {
    assert(UnicodeClean.nfc("é") === "é") // e + combining acute -> é
    assert(UnicodeClean.nfc("Å") === "Å") // A + ring -> Å
    assert(UnicodeClean.nfc("Å") === "Å") // Angstrom sign -> Å
    assert(UnicodeClean.nfc("ﬁ") === "ﬁ") // fi ligature: NFC keeps
    val ascii = "plain ascii stays identical"
    assert(UnicodeClean.nfc(ascii) eq ascii) // isNormalized fast path
  }

  test("nfkc folds compatibility forms NFC keeps") {
    assert(UnicodeClean.nfkc("ﬁ") === "fi") // fi ligature
    assert(UnicodeClean.nfkc("Ｈｉ") === "Hi") // full-width
    assert(UnicodeClean.nfkc("①") === "1") // circled one
    assert(UnicodeClean.nfkc("²") === "2") // superscript two
    assert(UnicodeClean.nfkc("é") === "é") // NFKC includes NFC
  }

  test("fixMojibake undoes 1, 2 and 3 layers of UTF-8-as-cp1252") {
    val cases = Seq(
      "café", // é: the canonical Ã© case
      "naïve résumé",
      "“smart quotes” and — dashes …",
      "€ 9,99 • 50°", // € bullet degree
      "日本語テキスト", // CJK: 3-byte sequences
      "emoji 😀 supplementary") // 4-byte sequences
    cases.foreach { clean =>
      assert(mojify(clean) !== clean)
      assert(UnicodeClean.fixMojibake(mojify(clean)) === clean, s"1 layer: $clean")
      assert(UnicodeClean.fixMojibake(mojify(clean, 2)) === clean, s"2 layers: $clean")
      assert(UnicodeClean.fixMojibake(mojify(clean, 3)) === clean, s"3 layers: $clean")
    }
  }

  test("fixMojibake leaves clean and legitimate extended-Latin text alone") {
    val keep = Seq(
      "pure ascii, nothing to do",
      "À bientôt, café crème", // real French: À + space is invalid UTF-8
      "Straße für München", // real German
      "“clean curly quotes” already fine",
      "日本語", // CJK outside the cp1252 image: unencodable, untouched
      "mixed ascii + 😀 emoji")
    keep.foreach { s => assert(UnicodeClean.fixMojibake(s) === s, s) }
  }

  test("fixMojibake is idempotent and deterministic") {
    val m = mojify("café — naïve", 2)
    val once = UnicodeClean.fixMojibake(m)
    assert(UnicodeClean.fixMojibake(once) === once)
    assert(UnicodeClean.fixMojibake(m) === once)
  }

  test("mojibakeScore: positive on mojibake, 0 on clean text of any script") {
    assert(UnicodeClean.mojibakeScore(mojify("café résumé")) >= 3)
    assert(UnicodeClean.mojibakeScore("� lossy �") === 2)
    assert(UnicodeClean.mojibakeScore("plain ascii") === 0)
    assert(UnicodeClean.mojibakeScore("café crème brûlée") === 0)
    assert(UnicodeClean.mojibakeScore("日本語テキ") === 0)
    // score drops to 0 after repair
    val m = mojify("“quoted” — café")
    assert(UnicodeClean.mojibakeScore(m) > 0)
    assert(UnicodeClean.mojibakeScore(UnicodeClean.fixMojibake(m)) === 0)
  }
}
