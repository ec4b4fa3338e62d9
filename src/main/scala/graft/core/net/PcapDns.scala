package graft.core.net

import java.nio.charset.StandardCharsets

/**
 * Minimal pcap + DNS-question decoder — the reference's primary input
 * (/root/reference/internal/pcap.go:15-64 via gopacket): every packet with
 * a DNS layer contributes one record per question (name, source IP, 1);
 * packets whose source IP can't be extracted count as invalid records.
 *
 * Supported framing, matching what DNS captures actually contain: classic
 * pcap (both endiannesses, micro/nanosecond magics) AND pcapng (SHB/IDB/
 * EPB/SPB blocks, per-section endianness, if_tsresol option), gzip by
 * magic bytes, link types Ethernet (1, incl. 802.1Q VLAN tags) and raw IP
 * (101/12), IPv4/IPv6 (with the skippable v6 extension headers), DNS over
 * UDP port 53 and over TCP port 53 (2-byte length framing, WITH cross-
 * segment reassembly: per-flow byte streams rebuilt in sequence-number
 * order within a capture, so messages split across TCP segments decode —
 * the reference's per-packet gopacket loop drops those). DNS names follow
 * RFC 1035 labels with compression pointers; bytes are preserved 1:1
 * (ISO-8859-1) for the downstream escape/normalize pass.
 *
 * Deliberately a per-file decoder: pcap is not a splittable format (records
 * are not self-synchronizing), so distribution happens at file granularity
 * — see [[graft.sources.RecordsPcap]].
 */
object PcapDns {

  /** One decoded record: micros since epoch, source IP text (null when the
    * packet had a DNS layer but no parseable IP — the reference's
    * invalid-record path), query name (labels joined with '.', no trailing
    * dot; "" for the root). */
  final case class Record(tsMicros: Long, srcIp: String, qname: String)

  def decode(raw: Array[Byte]): Seq[Record] = {
    val data =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) gunzip(raw)
      else raw
    require(data.length >= 12, "pcap: truncated header")
    // pcapng starts with an SHB block type 0x0A0D0D0A
    if ((data(0) & 0xff) == 0x0a && (data(1) & 0xff) == 0x0d &&
        (data(2) & 0xff) == 0x0d && (data(3) & 0xff) == 0x0a)
      return decodePcapng(data)
    require(data.length >= 24, "pcap: truncated global header")
    decodeClassic(data)
  }

  private def decodeClassic(data: Array[Byte]): Seq[Record] = {

    val magic = ((data(0) & 0xffL) << 24) | ((data(1) & 0xffL) << 16) |
      ((data(2) & 0xffL) << 8) | (data(3) & 0xffL)
    val (littleEndian, nanos) = magic match {
      case 0xa1b2c3d4L => (false, false)
      case 0xd4c3b2a1L => (true, false)
      case 0xa1b23c4dL => (false, true)
      case 0x4d3cb2a1L => (true, true)
      case m => throw new IllegalArgumentException(f"pcap: bad magic 0x$m%08x")
    }
    def u16(p: Int): Int =
      if (littleEndian) (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
      else ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (littleEndian)
        (data(p) & 0xffL) | ((data(p + 1) & 0xffL) << 8) |
          ((data(p + 2) & 0xffL) << 16) | ((data(p + 3) & 0xffL) << 24)
      else
        ((data(p) & 0xffL) << 24) | ((data(p + 1) & 0xffL) << 16) |
          ((data(p + 2) & 0xffL) << 8) | (data(p + 3) & 0xffL)

    val linkType = u32(20).toInt
    val out = Seq.newBuilder[Record]
    val flows = new TcpFlows
    var pos = 24
    while (pos + 16 <= data.length) {
      val ts = u32(pos)
      val tsSub = u32(pos + 4)
      val incl = u32(pos + 8).toInt
      pos += 16
      if (incl < 0 || pos + incl > data.length) {
        pos = data.length // truncated trailing record: stop
      } else {
        val micros = ts * 1000000L + (if (nanos) tsSub / 1000 else tsSub)
        decodePacket(data, pos, incl, linkType, micros, out, flows)
        pos += incl
      }
    }
    flows.flush(out)
    out.result()
  }

  // ------------------------------ pcapng ------------------------------

  /** pcapng: Section Header (endianness per section), Interface Description
    * (link type + if_tsresol), Enhanced/Simple Packet blocks; every other
    * block type is skipped by its length. */
  private def decodePcapng(data: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    val flows = new TcpFlows
    var pos = 0
    var le = true
    // per-interface (linkType, ticksPerSec, snaplen 0=unlimited)
    var ifaces = Vector.empty[(Int, Long, Long)]
    def u16(p: Int): Int =
      if (le) (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
      else ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (le)
        (data(p) & 0xffL) | ((data(p + 1) & 0xffL) << 8) |
          ((data(p + 2) & 0xffL) << 16) | ((data(p + 3) & 0xffL) << 24)
      else
        ((data(p) & 0xffL) << 24) | ((data(p + 1) & 0xffL) << 16) |
          ((data(p + 2) & 0xffL) << 8) | (data(p + 3) & 0xffL)

    while (pos + 12 <= data.length) {
      // block type is endianness-sensitive EXCEPT the SHB's palindrome
      val rawType = ((data(pos) & 0xffL) << 24) | ((data(pos + 1) & 0xffL) << 16) |
        ((data(pos + 2) & 0xffL) << 8) | (data(pos + 3) & 0xffL)
      val isShb = rawType == 0x0a0d0d0aL
      if (isShb) {
        // byte-order magic decides this section's endianness
        val bom = ((data(pos + 8) & 0xffL) << 24) | ((data(pos + 9) & 0xffL) << 16) |
          ((data(pos + 10) & 0xffL) << 8) | (data(pos + 11) & 0xffL)
        le = bom == 0x4d3c2b1aL // 0x1A2B3C4D stored little-endian
        require(le || bom == 0x1a2b3c4dL, f"pcapng: bad byte-order magic 0x$bom%08x")
        ifaces = Vector.empty
      }
      val totalLen = u32(pos + 4).toInt
      require(totalLen >= 12 && (totalLen & 3) == 0 && pos + totalLen <= data.length,
        s"pcapng: bad block length $totalLen at $pos")
      val blockType = u32(pos).toInt
      blockType match {
        case 0x00000001 => // IDB: linktype(2) reserved(2) snaplen(4) options
          val link = u16(pos + 8)
          val snap = u32(pos + 12)
          var ticks = 1000000L // default resolution 10^-6
          var op = pos + 16
          val end = pos + totalLen - 4
          var done = false
          while (!done && op + 4 <= end) {
            val code = u16(op); val olen = u16(op + 2)
            if (code == 0) done = true
            else {
              if (code == 9 && olen >= 1) { // if_tsresol
                val b = data(op + 4) & 0xff
                ticks =
                  if ((b & 0x80) == 0) math.pow(10, b & 0x7f).toLong
                  else 1L << (b & 0x7f)
              }
              op += 4 + ((olen + 3) & ~3)
            }
          }
          ifaces = ifaces :+ ((link, ticks, snap))
        case 0x00000006 => // EPB: ifid(4) tsHigh(4) tsLow(4) capLen(4) origLen(4) data
          val ifId = u32(pos + 8).toInt
          val ts = (u32(pos + 12) << 32) | u32(pos + 16)
          val capLen = u32(pos + 20).toInt
          val (link, ticks, _) =
            if (ifId >= 0 && ifId < ifaces.size) ifaces(ifId) else (1, 1000000L, 0L)
          val micros =
            if (ticks == 1000000L) ts
            else ((ts.toDouble / ticks) * 1e6).toLong
          // packet data is bounded by the BLOCK (28 header + 4 trailing
          // length), not the file: a corrupt capLen must not read into
          // following blocks
          if (capLen >= 0 && capLen <= totalLen - 32)
            decodePacket(data, pos + 28, capLen, link, micros, out, flows)
        case 0x00000003 => // SPB: origLen(4) data (no timestamp)
          val (link, _, snap) = ifaces.headOption.getOrElse((1, 1000000L, 0L))
          // data region is totalLen-16 INCLUDING up to 3 bytes of 32-bit
          // padding; the real packet length is min(origLen, snaplen) —
          // feeding padding into the DNS parser corrupts trailing questions
          val origLen = u32(pos + 8)
          var capLen = math.min(origLen, (totalLen - 16).toLong)
          if (snap > 0) capLen = math.min(capLen, snap)
          if (capLen > 0)
            decodePacket(data, pos + 12, capLen.toInt, link, 0L, out, flows)
        case _ => () // SHB, name resolution, statistics, unknown: skip
      }
      pos += totalLen
    }
    flows.flush(out)
    out.result()
  }

  // ---------------------------- packet layers ----------------------------

  private def decodePacket(d: Array[Byte], start: Int, len: Int, linkType: Int,
                           micros: Long, out: scala.collection.mutable.Builder[Record, Seq[Record]],
                           flows: TcpFlows): Unit = {
    var p = start
    val end = start + len
    var etherType = -1
    linkType match {
      case 1 => // Ethernet
        if (end - p < 14) return
        etherType = ((d(p + 12) & 0xff) << 8) | (d(p + 13) & 0xff)
        p += 14
        while ((etherType == 0x8100 || etherType == 0x88a8) && end - p >= 4) {
          etherType = ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)
          p += 4
        }
      case 101 | 12 => // raw IP: version nibble decides
        if (end - p < 1) return
        etherType = if (((d(p) & 0xf0) >> 4) == 6) 0x86dd else 0x0800
      case _ => return // unsupported link type: no DNS layer -> skipped
    }

    var srcIp: String = null
    var dstIp: String = null
    var proto = -1
    // `end` narrows to the IP datagram's own length below: Ethernet pads
    // frames to 60 bytes, and padding bytes after a short segment would
    // otherwise be injected into the TCP flow stream (corrupting the
    // length-framed parse) or trail a UDP message
    var ipEnd = end
    etherType match {
      case 0x0800 => // IPv4
        if (end - p < 20) return
        val ihl = (d(p) & 0x0f) * 4
        if (ihl < 20 || end - p < ihl) return
        val totalLen = ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)
        if (totalLen >= ihl && p + totalLen <= end) ipEnd = p + totalLen
        proto = d(p + 9) & 0xff
        srcIp = s"${d(p + 12) & 0xff}.${d(p + 13) & 0xff}.${d(p + 14) & 0xff}.${d(p + 15) & 0xff}"
        dstIp = s"${d(p + 16) & 0xff}.${d(p + 17) & 0xff}.${d(p + 18) & 0xff}.${d(p + 19) & 0xff}"
        p += ihl
      case 0x86dd => // IPv6
        if (end - p < 40) return
        val payloadLen = ((d(p + 4) & 0xff) << 8) | (d(p + 5) & 0xff)
        if (payloadLen > 0 && p + 40 + payloadLen <= end) ipEnd = p + 40 + payloadLen
        proto = d(p + 6) & 0xff
        srcIp = ipv6Text(d, p + 8)
        dstIp = ipv6Text(d, p + 24)
        p += 40
        // skippable extension headers: hop-by-hop(0), routing(43), dstopts(60)
        var guard = 0
        while ((proto == 0 || proto == 43 || proto == 60) && ipEnd - p >= 8 && guard < 8) {
          val next = d(p) & 0xff
          val hlen = 8 + (d(p + 1) & 0xff) * 8
          p += hlen
          proto = next
          guard += 1
        }
      case _ => return
    }

    if (proto == 17) { // UDP
      if (ipEnd - p < 8) return
      val sport = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
      val dport = ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)
      p += 8
      if (sport != 53 && dport != 53) return // no DNS layer
      parseDnsQuestions(d, p, ipEnd, micros, srcIp, out)
    } else if (proto == 6) { // TCP: DNS rides a 2-byte length prefix
      if (ipEnd - p < 20) return
      val sport = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
      val dport = ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)
      val seq = ((d(p + 4) & 0xffL) << 24) | ((d(p + 5) & 0xffL) << 16) |
        ((d(p + 6) & 0xffL) << 8) | (d(p + 7) & 0xffL)
      val syn = (d(p + 13) & 0x02) != 0
      val dataOff = ((d(p + 12) & 0xf0) >> 4) * 4
      if (dataOff < 20 || ipEnd - p < dataOff) return
      p += dataOff
      if (sport != 53 && dport != 53) return
      // a SYN opens a NEW stream epoch for this 4-tuple even with no
      // payload: port reuse within one capture must not merge two
      // connections' seq spaces into one relative stream. The ISN
      // disambiguates a RETRANSMITTED SYN (same ISN, nothing sent since
      // — common under loss, both copies usually captured) from genuine
      // reuse: double-bumping the epoch would split one connection's
      // payload across two streams, and the second stream's mid-message
      // start would kill its length-framed parse
      if (syn) flows.newEpoch(s"$srcIp|$dstIp|$sport|$dport", seq)
      if (ipEnd <= p) return // empty segment (pure ACK etc.)
      // buffer the payload for per-flow reassembly: the length-framed
      // message stream parses after the packet walk, so messages split
      // across segments decode too (see TcpFlows)
      flows.add(s"$srcIp|$dstIp|$sport|$dport", seq, micros, srcIp,
        java.util.Arrays.copyOfRange(d, p, ipEnd))
    }
  }

  /** DNS header + questions of the message at [p, end): one record per
    * question. A packet with a DNS layer but no parseable source IP becomes
    * one invalid record (pcap.go:45-49); with our layer walk srcIp is always
    * set by now, but keep the contract explicit. */
  private def parseDnsQuestions(d: Array[Byte], p: Int, end: Int, micros: Long,
                                srcIp: String,
                                out: scala.collection.mutable.Builder[Record, Seq[Record]]): Unit = {
    if (end - p < 12) return
    val qd = ((d(p + 4) & 0xff) << 8) | (d(p + 5) & 0xff)
    var q = p + 12
    var i = 0
    while (i < qd && q < end) {
      val (name, nextPos) = readName(d, q, p, end)
      if (nextPos < 0 || nextPos + 4 > end) return
      out += Record(micros, srcIp, name)
      q = nextPos + 4 // skip qtype + qclass
      i += 1
    }
  }

  /**
   * Per-flow TCP reassembly WITHIN one capture file. Segments buffer by
   * (src, dst, sport, dport); at flush each flow's payloads sort by
   * sequence number (relative to the first-seen segment, signed so
   * out-of-order earlier segments and 32-bit wraparound inside a ±2 GiB
   * window order correctly), duplicate-seq retransmissions keep the first
   * copy, and the contiguous prefix of the stream parses as the RFC 1035
   * 2-byte-length-framed message sequence. Parsing stops at the first gap
   * (a hole makes every later length prefix unreliable). Each message gets
   * the timestamp of the segment its first byte arrived in. Memory is
   * bounded by the capture's TCP/53 payload bytes — the decoder already
   * holds the whole (per-task) file.
   */
  private final class TcpFlows {
    private val flows = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Long, String, Array[Byte])]]
    // 4-tuple reuse: each NEW-connection SYN bumps the tuple's epoch so two
    // connections on the same ports become two independent streams
    // (otherwise the second connection's unrelated ISN reads as a
    // gap/overlap of the first). A retransmitted SYN — same ISN, no payload
    // buffered since the last SYN — does NOT bump: both copies belong to
    // one connection
    private val epochs = scala.collection.mutable.Map.empty[String, Int]
    private val lastSyn = scala.collection.mutable.Map.empty[String, Long]
    private val sentSinceSyn = scala.collection.mutable.Set.empty[String]

    def newEpoch(key: String, isn: Long): Unit = {
      val retransmit = lastSyn.get(key).contains(isn) && !sentSinceSyn(key)
      if (!retransmit) {
        epochs.update(key, epochs.getOrElse(key, 0) + 1)
        lastSyn.update(key, isn)
        sentSinceSyn -= key
      }
    }

    def add(key: String, seq: Long, micros: Long, srcIp: String, payload: Array[Byte]): Unit = {
      sentSinceSyn += key
      flows.getOrElseUpdate(s"$key#${epochs.getOrElse(key, 0)}",
        scala.collection.mutable.ArrayBuffer.empty) += ((seq, micros, srcIp, payload))
    }

    def flush(out: scala.collection.mutable.Builder[Record, Seq[Record]]): Unit = {
      flows.valuesIterator.foreach { segs =>
        val base = segs.head._1
        // signed relative offset from the first-seen seq (handles wrap)
        def rel(seq: Long): Long = {
          val r = (seq - base) & 0xffffffffL
          if (r > 0x7fffffffL) r - 0x100000000L else r
        }
        val ordered = segs.sortBy(s => rel(s._1))
        val bytes = new java.io.ByteArrayOutputStream()
        // (streamOffset, micros) of each appended segment, for message ts
        val marks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var expected = rel(ordered.head._1)
        var srcIp: String = ordered.head._3
        var stop = false
        ordered.foreach { case (seq, micros, sip, payload) =>
          if (!stop) {
            val r = rel(seq)
            if (r == expected) { // next contiguous segment
              marks += ((bytes.size, micros))
              bytes.write(payload)
              expected = r + payload.length
              srcIp = sip
            } else if (r < expected) {
              // retransmission / overlap: keep the first copy, append any
              // genuinely new suffix
              val skip = (expected - r).toInt
              if (skip < payload.length) {
                marks += ((bytes.size, micros))
                bytes.write(payload, skip, payload.length - skip)
                expected = r + payload.length
              }
            } else stop = true // gap: later lengths are unreliable
          }
        }
        val d = bytes.toByteArray
        def tsAt(off: Int): Long =
          marks.takeWhile(_._1 <= off).lastOption.map(_._2).getOrElse(0L)
        var p = 0
        while (p + 2 <= d.length) {
          val msgLen = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
          val msgStart = p + 2
          if (msgLen < 12 || msgStart + msgLen > d.length) { p = d.length }
          else {
            parseDnsQuestions(d, msgStart, msgStart + msgLen, tsAt(p), srcIp, out)
            p = msgStart + msgLen
          }
        }
      }
      flows.clear()
      epochs.clear()
      lastSyn.clear()
      sentSinceSyn.clear()
    }
  }

  /** RFC 1035 name at `pos` (message origin `msgStart` for compression
    * pointers). Returns (name, position after the name in the ORIGINAL
    * stream) or ("", -1) on malformed input. */
  private def readName(d: Array[Byte], pos: Int, msgStart: Int, end: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var p = pos
    var after = -1 // set at the first pointer jump
    var jumps = 0
    var first = true
    while (true) {
      if (p >= end || jumps > 64) return ("", -1)
      val len = d(p) & 0xff
      if (len == 0) {
        val endPos = if (after >= 0) after else p + 1
        return (sb.toString, endPos)
      } else if ((len & 0xc0) == 0xc0) {
        if (p + 1 >= end) return ("", -1)
        if (after < 0) after = p + 2
        p = msgStart + (((len & 0x3f) << 8) | (d(p + 1) & 0xff))
        jumps += 1
      } else {
        if (p + 1 + len > end) return ("", -1)
        if (!first) sb.append('.')
        sb.append(new String(d, p + 1, len, StandardCharsets.ISO_8859_1))
        first = false
        p += 1 + len
      }
    }
    ("", -1) // unreachable
  }

  /** Plain 8-hextet text form. Deliberately NOT java.net.InetAddress, which
    * collapses v4-mapped bytes (::ffff:a.b.c.d) to a plain IPv4 string —
    * the reference keeps such packets on the IPv6 branch, where /48
    * truncation merges them all into `::` (the pinned v4-mapped quirk,
    * ip_address.go:26-52); a ':' in the text keeps that branch here too. */
  private def ipv6Text(d: Array[Byte], off: Int): String = {
    val sb = new java.lang.StringBuilder(39)
    var g = 0
    while (g < 8) {
      if (g > 0) sb.append(':')
      sb.append(Integer.toHexString(((d(off + 2 * g) & 0xff) << 8) | (d(off + 2 * g + 1) & 0xff)))
      g += 1
    }
    sb.toString
  }

  private def gunzip(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
    try in.readAllBytes()
    finally in.close()
  }
}
