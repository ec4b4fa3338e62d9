package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * DataSource V2 provider making the reference's `.dnsmag` dataset files a
 * FIRST-CLASS Spark source: `spark.read.format("dnsmag").load(path)` (the
 * reference CLI treats dataset files as its primary input —
 * /root/reference/internal/store.go:109-172 reads them as an incremental
 * CBOR sequence). Produces exactly the sketch-state rows of
 * [[graft.io.DnsMagCbor.read]] — both paths share
 * [[graft.io.DnsMagCbor.datasetToState]], pinned by test on the golden
 * fixtures (estimate 92 through `spark.read.format`).
 *
 * Scale shape: one input partition per file (dataset files are
 * CLI-exchange-sized by construction — the reference truncates them to
 * top-N domains in memory — so per-file decode inside one task is right;
 * a directory of thousands of daily exports parallelizes per file), with
 * required-column pruning pushed into the reader (`select(domain)` never
 * materializes the HLL byte arrays). Directories expand non-recursively,
 * skipping hidden/metadata entries (`_SUCCESS`, dotfiles), and glob
 * patterns work as in any file source.
 */
class DnsMagDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dnsmag"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DnsMagDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    require(schema == DnsMagDataSource.Schema,
      s"dnsmag source has a fixed schema ${DnsMagDataSource.Schema.simpleString}; " +
        s"user-specified schema ${schema.simpleString} is not supported")
    new DnsMagTable(DnsMagDataSource.pathsFrom(properties))
  }
}

object DnsMagDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("domain", StringType, nullable = true),
    StructField("hll", BinaryType, nullable = false),
    StructField("queries", LongType, nullable = false)))

  /** `load(p)` passes "path"; `load(p1, p2, ...)` passes "paths" as a JSON
    * string array (Spark's own convention, written with Jackson). */
  private[sources] def pathsFrom(properties: util.Map[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readValue(json, classOf[Array[String]]).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(properties.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "dnsmag source requires a path: " +
      "spark.read.format(\"dnsmag\").load(\"/path/to/file.dnsmag\")")
    all
  }
}

private[sources] class DnsMagTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"dnsmag ${paths.mkString(", ")}"
  override def schema(): StructType = DnsMagDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DnsMagScanBuilder(paths)
}

private[sources] class DnsMagScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DnsMagDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new DnsMagScan(paths, required)
}

private[sources] class DnsMagScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"dnsmag ${paths.mkString(", ")}"

  override def planInputPartitions(): Array[InputPartition] =
    DataFileListing.listDataFiles(paths,
        SparkSession.active.sessionState.newHadoopConf(), "dnsmag")
      .map(f => DnsMagInputPartition(f.getPath.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    DnsMagReaderFactory(required.fieldNames, conf)
  }
}

private[sources] case class DnsMagInputPartition(path: String) extends InputPartition

private[sources] case class DnsMagReaderFactory(
    fields: Array[String], conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DnsMagPartitionReader(
      partition.asInstanceOf[DnsMagInputPartition].path, fields, conf)
}

private[sources] class DnsMagPartitionReader(
    path: String, fields: Array[String], conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  // one file = one CBOR sequence, decoded lazily per dataset row batch
  private val iter: Iterator[InternalRow] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue,
      s"dnsmag file $path is ${len}B — dataset files are the reference CLI's " +
        "in-memory exchange format and are never GB-scale; refusing to decode")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    graft.core.cbor.DnsMagCodec.decodeSeq(bytes).iterator
      .flatMap(ds => graft.io.DnsMagCbor.datasetToState(ds).iterator)
      .map { case (date, domain, hll, queries) =>
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) = fields(i) match {
            case "date" => java.time.LocalDate.parse(date).toEpochDay.toInt
            case "domain" => if (domain == null) null else UTF8String.fromString(domain)
            case "hll" => hll
            case "queries" => queries
            case other => throw new IllegalStateException(s"unknown column $other")
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (iter.hasNext) { current = iter.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
