package graft.core.cbor

import org.scalacheck.{Gen, Prop, Properties}
import graft.core.cbor.DnsMagCodec.{Dataset, DomainData}

/** ScalaCheck properties for the CBOR codec: arbitrary datasets roundtrip
  * field-exactly through encodeSeq/decodeSeq, and the head encoder uses the
  * shortest form at every unsigned boundary (RFC 8949 preferred encoding —
  * what fxamacker/cbor emits, so byte-compat depends on it). */
object CborPropertySpec extends Properties("cbor") {

  private val domainName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(20))

  private val blob: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
      .map(_.toArray)

  private val domainData: Gen[DomainData] = for {
    h <- blob
    c <- Gen.choose(0L, Long.MaxValue)
    q <- Gen.choose(0L, Long.MaxValue)
  } yield DomainData(h, c, q)

  private val dataset: Gen[Dataset] = for {
    id <- Gen.alphaNumStr.map(_.take(36))
    gen <- Gen.alphaNumStr.map(_.take(24))
    y <- Gen.choose(1990, 2100)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    hll <- blob
    ac <- Gen.choose(0L, Long.MaxValue)
    aq <- Gen.choose(0L, Long.MaxValue)
    doms <- Gen.mapOf(Gen.zip(domainName, domainData)).map(_.take(12))
  } yield Dataset(DnsMagCodec.Version, id, gen, f"$y%04d-$m%02d-$d%02d",
    hll, ac, aq, doms)

  private def eqDs(a: Dataset, b: Dataset): Boolean =
    a.version == b.version && a.id == b.id && a.generator == b.generator &&
      a.date == b.date &&
      java.util.Arrays.equals(a.allClientsHll, b.allClientsHll) &&
      a.allClientsCount == b.allClientsCount &&
      a.allQueriesCount == b.allQueriesCount &&
      a.domains.keySet == b.domains.keySet &&
      a.domains.forall { case (k, v) =>
        val w = b.domains(k)
        java.util.Arrays.equals(v.hll, w.hll) && v.clients == w.clients &&
          v.queries == w.queries
      }

  property("dataset sequences roundtrip field-exactly") =
    Prop.forAll(Gen.listOfN(3, dataset)) { ds =>
      val back = DnsMagCodec.decodeSeq(DnsMagCodec.encodeSeq(ds))
      back.size == ds.size && back.zip(ds).forall { case (a, b) => eqDs(a, b) }
    }

  property("uint head encoding is shortest-form at every boundary") = {
    val boundaries = Seq(0L, 1L, 23L, 24L, 255L, 256L, 65535L, 65536L,
      4294967295L, 4294967296L, Long.MaxValue)
    Prop.all(boundaries.map { v =>
      val bytes = new Cbor.Writer().uint(v).result()
      val expectLen =
        if (v < 24) 1 else if (v < 0x100) 2 else if (v < 0x10000) 3
        else if (v < 0x100000000L) 5 else 9
      val r = new Cbor.Reader(bytes)
      Prop.propBoolean(bytes.length == expectLen && r.readUInt() == v && !r.hasMore)
    }: _*)
  }

  property("reader skips arbitrary unknown items without losing position") =
    Prop.forAll(blob, Gen.choose(0L, Long.MaxValue)) { (b, v) =>
      val w = new Cbor.Writer()
      w.mapHeader(3)
      w.text("junk1"); w.bytes(b)
      w.text("junk2"); w.mapHeader(1); w.text("inner"); w.uint(v)
      w.text("keep"); w.uint(7)
      val r = new Cbor.Reader(w.result())
      val n = r.readMapHeader()
      var kept = -1L
      (0L until n).foreach { _ =>
        r.readText() match {
          case "keep" => kept = r.readUInt()
          case _ => r.skipItem()
        }
      }
      kept == 7L && !r.hasMore
    }
}
