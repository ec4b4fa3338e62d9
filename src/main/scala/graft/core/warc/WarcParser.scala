package graft.core.warc

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/**
 * Streaming WARC (Web ARChive, ISO 28500 / WARC 1.0-1.1) record parser —
 * the container format Common-Crawl-style page corpora arrive in. Reads
 * records one at a time from an InputStream (memory is O(one record),
 * never O(file) — real WARC files are ~1 GB), tolerating both canonical
 * CRLF and bare-LF header line endings. Gzip is sniffed from the magic
 * bytes; the standard `.warc.gz` layout (one gzip MEMBER per record,
 * concatenated) and whole-file gzip both decode through the JDK's
 * multi-member GZIPInputStream.
 *
 * Record grammar (spec §4): version line `WARC/1.x`, header lines
 * `Name: value` up to an empty line, exactly Content-Length payload
 * bytes, then CRLF CRLF before the next record.
 */
object WarcParser {

  /** One parsed record: headers as given (names case-preserved; lookup is
    * case-insensitive via [[header]]) + raw payload bytes.
    * `contentLength` is always the record's true length — `payload` is
    * empty when the caller asked [[records]] to skip payload bytes. */
  final case class WarcRecord(version: String, headers: Map[String, String],
                              contentLength: Long, payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def warcType: String = header("WARC-Type").getOrElse("")
    def url: String = header("WARC-Target-URI").orNull
    def recordId: String = header("WARC-Record-ID").orNull
    def contentType: String = header("Content-Type").orNull
    /** WARC-Date (ISO 8601, e.g. 2017-03-22T17:43:20Z) as epoch MICROS —
      * full sub-second precision survives a write/read round trip. */
    def dateMicros: Option[Long] = header("WARC-Date").flatMap { s =>
      try {
        val i = java.time.Instant.parse(s)
        Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L))
      } catch {
        case _: java.time.format.DateTimeParseException => None
        case _: ArithmeticException => None
      }
    }
  }

  /** Wrap `raw` with gzip decoding iff it starts with the gzip magic
    * (sniffed, not extension-guessed — same routing rule as the engine's
    * record readers). The stream must support mark/reset or is buffered
    * here. */
  def maybeGunzip(raw: InputStream): InputStream = {
    val in = if (raw.markSupported()) raw else new BufferedInputStream(raw)
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(in, 1 << 16) else in
  }

  /** Lazily parse every record of a (possibly gzipped) WARC stream. The
    * iterator owns the stream and closes it at the end (or on error).
    * `maxRecordBytes` is a fail-fast guard against corrupt Content-Length
    * values allocating unbounded buffers. `keepPayload = false` SKIPS
    * payload bytes in the stream instead of buffering them — the
    * column-pruned metadata scan path (contentLength still reports the
    * true size). `typeFilter` is the WARC-Type pushdown: records whose
    * type fails it are dropped HERE, after headers but before the payload
    * is buffered, so their bodies always take the skip path — a
    * `types=response` scan of a mixed crawl never allocates
    * request/warcinfo payloads. */
  def records(raw: InputStream, maxRecordBytes: Long = 256L << 20,
              keepPayload: Boolean = true,
              typeFilter: String => Boolean = null): Iterator[WarcRecord] = {
    val in = maybeGunzip(raw)
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private def advance(): Unit = {
        if (nextRec != null || done) return
        try {
          while (nextRec == null && !done) {
            var line = readLine(in)
            // skip inter-record blank lines (the record terminator CRLFs)
            while (line != null && line.isEmpty) line = readLine(in)
            if (line == null) { done = true; in.close(); return }
            if (!line.startsWith("WARC/"))
              throw new java.io.IOException(
                s"warc: expected version line, got '${line.take(40)}'")
            val version = line
            val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
            var lastKey: String = null
            var h = readLine(in)
            while (h != null && h.nonEmpty) {
              if (h.charAt(0) == ' ' || h.charAt(0) == '\t') {
                // spec §4: a header value may fold onto continuation lines
                // beginning with space/tab
                if (lastKey == null)
                  throw new java.io.IOException(s"warc: continuation before any header")
                hdrs(lastKey) = hdrs(lastKey) + " " + h.trim
              } else {
                val i = h.indexOf(':')
                if (i <= 0) throw new java.io.IOException(s"warc: bad header '${h.take(60)}'")
                lastKey = h.substring(0, i).trim
                hdrs(lastKey) = h.substring(i + 1).trim
              }
              h = readLine(in)
            }
            if (h == null) throw new java.io.IOException("warc: EOF inside header block")
            val len = hdrs.collectFirst {
              case (k, v) if k.equalsIgnoreCase("Content-Length") => v.toLong
            }.getOrElse(throw new java.io.IOException("warc: record without Content-Length"))
            // Int.MaxValue cap is structural (byte[] indexing), not tunable
            if (len < 0 || len > maxRecordBytes || len > Int.MaxValue - 8)
              throw new java.io.IOException(
                s"warc: Content-Length $len outside [0, min($maxRecordBytes, " +
                  s"${Int.MaxValue - 8})] — corrupt record or raise maxRecordBytes")
            val wanted = typeFilter == null || typeFilter(
              hdrs.collectFirst {
                case (k, v) if k.equalsIgnoreCase("WARC-Type") => v
              }.getOrElse(""))
            val payload =
              if (wanted && keepPayload) {
                val buf = new Array[Byte](len.toInt)
                var off = 0
                while (off < len) {
                  val n = in.read(buf, off, len.toInt - off)
                  if (n < 0) throw new EOFException(s"warc: EOF at $off of $len payload bytes")
                  off += n
                }
                buf
              } else {
                var left = len
                val scratch = new Array[Byte](8192)
                while (left > 0) {
                  val n = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
                  if (n < 0) throw new EOFException(s"warc: EOF with $left payload bytes left")
                  left -= n
                }
                Array.emptyByteArray
              }
            if (wanted) nextRec = WarcRecord(version, hdrs.toMap, len, payload)
          }
        } catch {
          case e: Throwable => try in.close() catch { case _: Throwable => () }; throw e
        }
      }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("warc: past end")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Longest header line the parser will buffer. Real WARC header lines
    * are tens to hundreds of bytes (the longest in the wild are long
    * Target-URIs); a "line" beyond this is a binary/non-WARC input with no
    * LF, and failing fast here keeps memory O(one record's headers)
    * instead of O(file) before the version-line check can fire. */
  private val MaxHeaderLineBytes = 64 << 10

  /** Read one header line: bytes to LF, trailing CR stripped (CRLF per
    * spec; bare LF tolerated). null at EOF before any byte. Fails fast
    * past [[MaxHeaderLineBytes]] — corrupt or non-WARC input. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (buf.size() >= MaxHeaderLineBytes)
        throw new java.io.IOException(
          s"warc: header line exceeds $MaxHeaderLineBytes bytes — " +
            "corrupt or non-WARC input")
      buf.write(c); c = in.read()
    }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  /** For `response` records whose payload is an HTTP message: split the
    * HTTP header block from the body (the page bytes). Returns the body
    * unchanged when no HTTP status line leads the payload (e.g.
    * `resource` records carry the content directly). */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
        !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' && payload(3) == 'P'))
      return payload
    // ONE left-to-right scan for the EARLIEST header terminator of either
    // form (CRLF CRLF canonical, LF LF bare-LF tolerance). Two sequential
    // scans would be wrong: bare-LF headers over a CRLF-bodied page have
    // no CRLFCRLF in the header block but plenty in the body, and a
    // CRLFCRLF-first scan would split mid-body and silently discard the
    // front of the page.
    var i = 0
    val n = payload.length
    while (i + 1 < n) {
      if (payload(i) == '\r' && i + 3 < n && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, n)
      if (payload(i) == '\n' && payload(i + 1) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 2, n)
      i += 1
    }
    payload
  }

  // ---------- writer (tests + exporting page tables as WARC) ----------

  /** Header values must not smuggle line structure: a crawl-derived URL
    * with an embedded newline would split its header line (corrupting the
    * record, or forging headers). Control characters collapse to a single
    * space — header values are METADATA; the byte-exactness contract is on
    * payloads. */
  private def sanitizeHeader(v: String): String = {
    var i = 0
    var clean = true
    while (i < v.length && clean) { clean = v.charAt(i) >= ' '; i += 1 }
    if (clean) v else v.map(c => if (c < ' ') ' ' else c)
  }

  /** Serialize one record (canonical CRLF form; header values sanitized). */
  def writeRecord(out: java.io.OutputStream, warcType: String, headers: Seq[(String, String)],
                  payload: Array[Byte]): Unit = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(sanitizeHeader(warcType)).append("\r\n")
    headers.foreach { case (k, v) =>
      sb.append(sanitizeHeader(k)).append(": ").append(sanitizeHeader(v)).append("\r\n")
    }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }
}
