package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.hash.XXH3
import graft.core.net.{DomainUtil, IpUtil}
import graft.core.sketch.Hll

/**
 * Replays the reference's golden end-to-end fixtures through the core fold
 * (truncate-IP -> XXH3 -> HLL; normalize-domain -> per-domain agg), pinning
 * the exact counts and HLL estimates the reference tests pin:
 *  - test1 (decoded pcap records): 100 queries, com=17 net=20 org=24 arpa=16,
 *    estimate 70 (/root/reference/internal/pcap_test.go:23-38)
 *  - test2.tsv: 200 queries over 7 TLDs, 26 unique clients
 *    (/root/reference/internal/csv_test.go:446-467)
 *  - test1 ⊕ test2 union: 300 queries, 7 domains, estimate 92
 *    (/root/reference/app/cmd/aggregate_test.go:62-72)
 *  - test3.tsv (escaped garbage): 16 queries, 0 valid domains
 *    (/root/reference/internal/csv_test.go:469-489)
 */
class FixtureReplaySpec extends AnyFunSuite {

  case class Agg(
      global: Hll = Hll(),
      domains: collection.mutable.Map[String, (Hll, Long)] = collection.mutable.Map(),
      var queries: Long = 0L)

  private def fold(agg: Agg, ip: String, domain: String, count: Long): Unit = {
    if (count == 0) return
    val trunc = IpUtil.truncate(ip)
    assert(trunc != null, s"ip $ip")
    val h = XXH3.hash(trunc)
    agg.queries += count
    agg.global.addRaw(h)
    val norm = DomainUtil.normalize(domain, 1)
    if (norm == null || norm == ".") return // invalid/root: global-only
    val (dHll, dQ) = agg.domains.getOrElseUpdate(norm, (Hll(), 0L))
    dHll.addRaw(h)
    agg.domains(norm) = (dHll, dQ + count)
  }

  private def loadTsv(resource: String, unescape: Boolean = false): Seq[(String, String, Long)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/$resource"), "ISO-8859-1")
    try src.getLines()
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        val f = l.split("\t")
        val dom = if (unescape) DomainUtil.unescape(f(1)) else f(1)
        (f(0), dom, if (f.length > 2) f(2).toLong else 1L)
      }.toSeq
    finally src.close()
  }

  private def replay(rows: Seq[(String, String, Long)]): Agg = {
    val agg = Agg()
    rows.foreach { case (ip, d, c) => fold(agg, ip, d, c) }
    agg
  }

  lazy val agg1: Agg = replay(loadTsv("test1_records.tsv"))
  lazy val agg2: Agg = replay(loadTsv("test2.tsv"))

  test("test1: counts, domains, and global HLL estimate 70") {
    assert(agg1.queries === 100L)
    assert(agg1.domains.view.mapValues(_._2).toMap ===
      Map("com" -> 17L, "net" -> 20L, "org" -> 24L, "arpa" -> 16L))
    assert(agg1.global.estimate === 70L) // 69 true clients (68 /24s + ::)
  }

  test("test2.tsv: 200 queries, 7 TLDs, 26 unique clients") {
    assert(agg2.queries === 200L)
    assert(agg2.domains.keySet ===
      Set("uk", "local", "org", "arpa", "me", "net", "com"))
    assert(agg2.domains.view.mapValues(_._2).toMap ===
      Map("uk" -> 19L, "local" -> 18L, "org" -> 23L, "arpa" -> 10L,
          "me" -> 10L, "net" -> 68L, "com" -> 52L))
    // 26 true clients; linear counting gives ceil(16384*ln(16384/16358)) = 27
    assert(agg2.global.estimate === 27L)
  }

  test("aggregate test1 ⊕ test2: 300 queries, 7 domains, estimate 92") {
    val merged = Hll.fromBytes(agg1.global.toBytes)
    merged.union(agg2.global)
    assert(agg1.queries + agg2.queries === 300L)
    assert((agg1.domains.keySet ++ agg2.domains.keySet).size === 7)
    assert(merged.estimate === 92L)
  }

  test("test3.tsv: garbage domains count globally, zero valid domains") {
    val agg3 = replay(loadTsv("test3.tsv", unescape = true))
    assert(agg3.queries === 16L)
    assert(agg3.domains.isEmpty)
  }

  test("magnitude formula vectors (reference dataset_test.go:17-144)") {
    def mag(clients: Long, total: Long): Double =
      math.log(clients.toDouble) / math.log(total.toDouble) * 10
    assert(mag(1, 1000) === 0.0)
    assert(math.abs(mag(10, 1000) - 3.3333333333333335) < 1e-12)
    assert(math.abs(mag(100, 1000) - 6.666666666666667) < 1e-12)
    assert(mag(1000, 1000) === 10.0)
    assert(math.abs(mag(25, 100) - 6.989700043360187) < 1e-12)
    assert(math.abs(mag(50, 100) - 8.494850021680094) < 1e-12)
  }
}
