package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.cbor.DnsMagCodec
import graft.core.cbor.DnsMagCodec.{Dataset, DomainData}

/**
 * Reference-compatible `.dnsmag` dataset file interop (CBOR sequence of
 * magnitude datasets — /root/reference/internal/store.go:63-86 write,
 * :109-172 incremental sequence read, schema/dataset.cddl). The HLL payload
 * bytes are the byte-exact AK storage spec already used by the engine, so a
 * file written by an existing dnsmag deployment loads directly into
 * sketch-state rows (and vice versa: state written here is consumable by
 * `dnsmag aggregate` / `dnsmag view`).
 *
 * Representation mapping: the CBOR dataset stores per-domain sketches PLUS
 * the global all-clients sketch (which also covers clients that only ever
 * queried the root "." or invalid names). The engine's sketch_state derives
 * global totals by merging all rows of a date, so the residual is carried
 * as the NULL-domain bucket row:
 *   hll     = all_clients_hll  (register-wise max is idempotent: merging it
 *             with every per-domain sketch reproduces all_clients EXACTLY)
 *   queries = all_queries_count - sum(domain queries)
 */
object DnsMagCbor {

  private val stateSchema = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("domain", StringType, nullable = true),
    StructField("hll", BinaryType, nullable = false),
    StructField("queries", LongType, nullable = false)))

  /** Read one or many .dnsmag files into sketch-state rows. Files load in
    * parallel (one task per file via binaryFile); each file may itself be a
    * CBOR sequence of datasets. Dataset files are driver-CLI-sized by
    * construction (the reference holds them in memory and truncates to
    * top-N domains), so per-file decode inside a task is the right shape. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .rdd.flatMap { r =>
        DnsMagCodec.decodeSeq(r.getAs[Array[Byte]](0)).flatMap(datasetToRows)
      }
    spark.createDataFrame(rows, stateSchema)
  }

  /** Dataset -> sketch-state tuples (date ISO string, domain or null, hll
    * bytes, queries) — the single mapping shared by [[read]] and the
    * `spark.read.format("dnsmag")` DataSource V2 path
    * ([[graft.sources.DnsMagDataSource]]), so the two can never drift. */
  private[graft] def datasetToState(ds: Dataset): Seq[(String, String, Array[Byte], Long)] = {
    val domainRows = ds.domains.toSeq.sortBy(_._1).map { case (name, d) =>
      (ds.date, name, d.hll, d.queries)
    }
    val residualQueries = ds.allQueriesCount - ds.domains.valuesIterator.map(_.queries).sum
    require(residualQueries >= 0,
      s"dnsmag: corrupt dataset ${ds.id}: per-domain query counts exceed all_queries_count")
    domainRows :+ ((ds.date, null, ds.allClientsHll, residualQueries))
  }

  private def datasetToRows(ds: Dataset): Seq[Row] =
    datasetToState(ds).map { case (date, domain, hll, queries) =>
      Row(java.sql.Date.valueOf(date), domain, hll, queries)
    }

  /** Write sketch-state rows as a reference-consumable .dnsmag file (one
    * dataset per date, CBOR sequence if several dates). Deliberately
    * driver-side: dataset files are the reference CLI's in-memory,
    * top-N-truncated exchange format — cap the state with
    * Magnitude/DnsMagnitude top-N before exporting huge states.
    *
    * `maxExportRows` enforces that contract: exporting an untruncated
    * crawl-scale state would OOM the driver with an opaque error, so the
    * collect is bounded (limit cap+1 — at most cap+1 rows ever reach the
    * driver) and over-cap states fail fast with an actionable message. At
    * the default 100k rows a worst-case all-dense state is ~1.6 GB of HLL
    * bytes — within a default driver heap. */
  def write(state: DataFrame, path: String,
            generator: String = "graft-spark 0.1.0",
            maxExportRows: Int = 100000): Unit = {
    val rows = state.select(col("date"), col("domain"), col("hll"), col("queries"))
      .limit(maxExportRows + 1)
      .collect()
    require(rows.length <= maxExportRows,
      s"dnsmag export: state has more than $maxExportRows rows — .dnsmag is " +
        "the reference CLI's in-memory top-N exchange format, not a bulk " +
        "store. Truncate first (aggregate --chunked --top N / " +
        "DnsMagnitude.truncateState) or raise maxExportRows.")
    val datasets = rows.groupBy(_.getAs[java.sql.Date]("date")).toSeq
      .sortBy(_._1.toString).map { case (date, rs) =>
        val (nullRows, domRows) = rs.partition(_.isNullAt(1))
        val domains = domRows.map { r =>
          val hllBytes = r.getAs[Array[Byte]]("hll")
          r.getAs[String]("domain") -> DomainData(
            hllBytes,
            clients = graft.core.sketch.Hll.fromBytes(hllBytes).estimate,
            queries = r.getAs[Long]("queries"))
        }.toMap
        // global sketch = merge of every row of the date (incl. NULL bucket)
        val global = graft.core.sketch.Hll()
        rs.foreach(r => global.union(graft.core.sketch.Hll.fromBytes(r.getAs[Array[Byte]]("hll"))))
        val allQueries = domRows.map(_.getAs[Long]("queries")).sum +
          nullRows.map(_.getAs[Long]("queries")).sum
        Dataset(
          version = DnsMagCodec.Version,
          id = java.util.UUID.nameUUIDFromBytes(
            (date.toString + generator).getBytes).toString,
          generator = generator,
          date = date.toString,
          allClientsHll = global.toBytes,
          allClientsCount = global.estimate,
          allQueriesCount = allQueries,
          domains = domains)
      }
    writeBytes(state.sparkSession, path, DnsMagCodec.encodeSeq(datasets))
  }

  /** Hadoop-FS write (works on local paths, HDFS and object stores alike). */
  private def writeBytes(spark: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes)
    finally out.close()
  }
}
