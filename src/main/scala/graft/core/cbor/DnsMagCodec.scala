package graft.core.cbor

/**
 * The reference's on-disk interchange format: a CBOR sequence of
 * magnitude_dataset maps (/root/reference/schema/dataset.cddl:3-20, written
 * by /root/reference/internal/store.go:16-86). This codec closes the
 * interop loop: a `.dnsmag` file produced by an existing dnsmag deployment
 * decodes into sketch-state rows (the HLL payload bytes are already
 * byte-exact AK spec), and state written here is readable by `dnsmag
 * aggregate`/`view`.
 *
 * Field layout (struct order, preferred/shortest-form encodings — the same
 * bytes fxamacker/cbor emits for the Go structs in dataset.go:27-49):
 *   {version: uint, id: tstr, generator: tstr, date: #6.1004(tstr),
 *    all_clients_hll: bstr, all_clients_count: uint, all_queries_count: uint,
 *    domains: {tstr => {clients_hll: bstr, clients_count: uint,
 *                       queries_count: uint}}}
 * The decoder accepts any key order and skips unknown keys.
 */
object DnsMagCodec {

  final val Version = 1L

  final case class DomainData(hll: Array[Byte], clients: Long, queries: Long)

  final case class Dataset(
      version: Long,
      id: String,
      generator: String,
      date: String, // RFC 3339 full-date (YYYY-MM-DD)
      allClientsHll: Array[Byte],
      allClientsCount: Long,
      allQueriesCount: Long,
      domains: Map[String, DomainData])

  // ------------------------------- encode -------------------------------

  def encode(ds: Dataset): Array[Byte] = {
    val w = new Cbor.Writer
    w.mapHeader(8)
    w.text("version"); w.uint(ds.version)
    w.text("id"); w.text(ds.id)
    w.text("generator"); w.text(ds.generator)
    w.text("date"); w.tag(1004); w.text(ds.date)
    w.text("all_clients_hll"); w.bytes(ds.allClientsHll)
    w.text("all_clients_count"); w.uint(ds.allClientsCount)
    w.text("all_queries_count"); w.uint(ds.allQueriesCount)
    w.text("domains"); w.mapHeader(ds.domains.size)
    // deterministic output: sort domains (the reference writes Go map order,
    // which is random — any order is valid CBOR; sorted makes ours stable)
    ds.domains.toSeq.sortBy(_._1).foreach { case (name, d) =>
      w.text(name)
      w.mapHeader(3)
      w.text("clients_hll"); w.bytes(d.hll)
      w.text("clients_count"); w.uint(d.clients)
      w.text("queries_count"); w.uint(d.queries)
    }
    w.result()
  }

  /** Encode a CBOR sequence (the multi-dataset file layout the reference's
    * incremental loader consumes, store.go:109-172). */
  def encodeSeq(ds: Seq[Dataset]): Array[Byte] =
    ds.map(encode).foldLeft(Array.emptyByteArray)(_ ++ _)

  // ------------------------------- decode -------------------------------

  def decodeSeq(bytes: Array[Byte]): Seq[Dataset] = {
    val r = new Cbor.Reader(bytes)
    val out = Seq.newBuilder[Dataset]
    while (r.hasMore) out += decodeOne(r)
    out.result()
  }

  private def decodeOne(r: Cbor.Reader): Dataset = {
    var version = -1L
    var id = ""
    var generator = ""
    var date: String = null
    var allHll: Array[Byte] = null
    var allClients = 0L
    var allQueries = 0L
    val domains = Map.newBuilder[String, DomainData]

    val n = r.readMapHeader()
    var i = 0L
    while (i < n) {
      r.readText() match {
        case "version" => version = r.readUInt()
        case "id" => id = r.readText()
        case "generator" => generator = r.readText()
        case "date" =>
          val tag = r.readTag()
          require(tag == 1004 || tag == 0, s"dnsmag: unexpected date tag $tag")
          date = r.readText()
        case "all_clients_hll" => allHll = r.readBytes()
        case "all_clients_count" => allClients = r.readUInt()
        case "all_queries_count" => allQueries = r.readUInt()
        case "domains" =>
          val m = r.readMapHeader()
          var j = 0L
          while (j < m) {
            val name = r.readText()
            domains += name -> decodeDomain(r)
            j += 1
          }
        case _ => r.skipItem() // forward-compat: unknown field
      }
      i += 1
    }
    // the reference refuses to merge datasets of unknown versions
    // (/root/reference/internal/dataset.go:238-247)
    require(version == Version,
      s"dnsmag: unsupported dataset version $version (supported: $Version)")
    require(date != null && allHll != null, "dnsmag: missing date or all_clients_hll")
    Dataset(version, id, generator, date, allHll, allClients, allQueries,
      domains.result())
  }

  private def decodeDomain(r: Cbor.Reader): DomainData = {
    var hll: Array[Byte] = null
    var clients = 0L
    var queries = 0L
    val n = r.readMapHeader()
    var i = 0L
    while (i < n) {
      r.readText() match {
        case "clients_hll" => hll = r.readBytes()
        case "clients_count" => clients = r.readUInt()
        case "queries_count" => queries = r.readUInt()
        case _ => r.skipItem()
      }
      i += 1
    }
    require(hll != null, "dnsmag: domain entry missing clients_hll")
    DomainData(hll, clients, queries)
  }
}
