package graft.core.cbor

import java.io.ByteArrayOutputStream

/**
 * Minimal CBOR (RFC 8949) codec — exactly the subset the reference's
 * `.dnsmag` interchange format needs (schema: /root/reference/schema/
 * dataset.cddl; written by /root/reference/internal/store.go:63-86 via
 * fxamacker/cbor's preferred/shortest-form encoding):
 * unsigned ints, byte strings, text strings, maps, tags. The reader is a
 * pull decoder that also accepts negative ints, arrays, floats and
 * indefinite-length items far enough to SKIP unknown map values, so future
 * schema additions don't break decoding.
 *
 * Deliberately dependency-free: the sandbox has no CBOR library, and the
 * format subset is ~200 lines. Golden byte vectors for the exact reference
 * layout are pinned in DnsMagCodecSpec.
 */
object Cbor {

  // ------------------------------- writer -------------------------------

  final class Writer {
    private val out = new ByteArrayOutputStream()

    /** Major type + shortest-form unsigned argument (preferred encoding). */
    private def head(major: Int, value: Long): Unit = {
      require(value >= 0, s"cbor argument must be non-negative: $value")
      val m = major << 5
      if (value < 24) out.write(m | value.toInt)
      else if (value < 0x100) { out.write(m | 24); out.write(value.toInt) }
      else if (value < 0x10000) {
        out.write(m | 25); out.write((value >> 8).toInt); out.write(value.toInt)
      } else if (value < 0x100000000L) {
        out.write(m | 26)
        var s = 24
        while (s >= 0) { out.write((value >> s).toInt); s -= 8 }
      } else {
        out.write(m | 27)
        var s = 56
        while (s >= 0) { out.write((value >> s).toInt); s -= 8 }
      }
    }

    def uint(v: Long): Writer = { head(0, v); this }
    def bytes(b: Array[Byte]): Writer = { head(2, b.length); out.write(b, 0, b.length); this }
    def text(s: String): Writer = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      head(3, b.length); out.write(b, 0, b.length); this
    }
    def mapHeader(n: Int): Writer = { head(5, n); this }
    def tag(n: Long): Writer = { head(6, n); this }
    def result(): Array[Byte] = out.toByteArray
  }

  // ------------------------------- reader -------------------------------

  /** Pull decoder over a byte array (sequence-aware: `pos`/`hasMore` let the
    * caller decode back-to-back top-level items, the reference's
    * dataset-sequence file layout, store.go:109-172). */
  final class Reader(buf: Array[Byte], var pos: Int = 0) {
    def hasMore: Boolean = pos < buf.length

    private def u8(): Int = {
      require(pos < buf.length, "cbor: truncated input")
      val b = buf(pos) & 0xff; pos += 1; b
    }

    /** (major, argument); argument of -1 marks indefinite length. */
    def header(): (Int, Long) = {
      val b = u8()
      val major = b >> 5
      val info = b & 0x1f
      val arg: Long = info match {
        case 24 => u8().toLong
        case 25 => (u8().toLong << 8) | u8()
        case 26 => (u8().toLong << 24) | (u8().toLong << 16) | (u8().toLong << 8) | u8()
        case 27 =>
          var v = 0L; var i = 0
          while (i < 8) { v = (v << 8) | u8(); i += 1 }
          require(v >= 0, "cbor: uint64 argument exceeds Long range")
          v
        case 31 => -1L
        case n if n < 24 => n.toLong
        case n => throw new IllegalArgumentException(s"cbor: reserved additional info $n")
      }
      (major, arg)
    }

    private def take(n: Long): Array[Byte] = {
      require(n >= 0 && pos + n <= buf.length, s"cbor: truncated string of $n bytes")
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt)
      pos += n.toInt
      r
    }

    def readUInt(): Long = {
      val (m, v) = header()
      require(m == 0, s"cbor: expected uint, got major $m")
      v
    }

    def readBytes(): Array[Byte] = {
      val (m, v) = header()
      require(m == 2 && v >= 0, s"cbor: expected definite byte string, got major $m")
      take(v)
    }

    def readText(): String = {
      val (m, v) = header()
      require(m == 3 && v >= 0, s"cbor: expected definite text string, got major $m")
      new String(take(v), java.nio.charset.StandardCharsets.UTF_8)
    }

    def readMapHeader(): Long = {
      val (m, v) = header()
      require(m == 5, s"cbor: expected map, got major $m")
      v
    }

    /** Reads a tag head, returning the tag number (content follows). */
    def readTag(): Long = {
      val (m, v) = header()
      require(m == 6, s"cbor: expected tag, got major $m")
      v
    }

    /** Skip one complete data item of any type (for unknown map keys). */
    def skipItem(): Unit = {
      val (major, arg) = header()
      major match {
        case 0 | 1 => ()
        case 2 | 3 =>
          if (arg >= 0) take(arg)
          else { // indefinite: chunks until break
            var done = false
            while (!done) {
              val b = buf(pos) & 0xff
              if (b == 0xff) { pos += 1; done = true } else skipItem()
            }
          }
        case 4 =>
          if (arg >= 0) { var i = 0L; while (i < arg) { skipItem(); i += 1 } }
          else skipUntilBreak()
        case 5 =>
          if (arg >= 0) { var i = 0L; while (i < arg * 2) { skipItem(); i += 1 } }
          else skipUntilBreak()
        case 6 => skipItem()
        case 7 => arg match {
          case -1 => throw new IllegalArgumentException("cbor: unexpected break")
          case _ => () // simple values / floats: argument already consumed
        }
      }
    }

    private def skipUntilBreak(): Unit = {
      var done = false
      while (!done) {
        val b = buf(pos) & 0xff
        if (b == 0xff) { pos += 1; done = true } else skipItem()
      }
    }
  }
}
