package graft.sources

import java.util

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.core.warc.WarcParser

/**
 * DataSource V2 provider for WARC (ISO 28500) web-archive files — the
 * container Common-Crawl-style page corpora arrive in, and the ingestion
 * step that BUILDS the engine's pages table:
 * `spark.read.format("warc").load("hdfs://crawl/segment-*.warc.gz")`.
 *
 * Scale shape: one input partition per file — the Common Crawl convention
 * is ~1 GB per .warc.gz and tens of thousands of files per crawl, so
 * per-file tasks parallelize a crawl across any cluster while records
 * stream through each task in O(one record) memory (never O(file):
 * payloads decode lazily from the open FS stream, and gzip members
 * decompress through the JDK's multi-member stream). Column pruning
 * reaches the reader: a metadata-only query (`select url, warc_ts`) SKIPS
 * payload bytes instead of buffering them.
 *
 * Options: `types` — comma-separated WARC-Type filter applied inside the
 * reader (e.g. "response"; default: all records);
 * `maxRecordBytes` — fail-fast guard on corrupt Content-Length (default
 * 256 MiB).
 */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  // writes arrive with the DataFrame's own (pages-shaped) schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(DnsMagDataSource.pathsFrom(properties),
      Option(properties.get("types")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty),
      Option(properties.get("maxRecordBytes")).map(_.toLong).getOrElse(256L << 20),
      schema)
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** WARC files -> the engine's pages shape (url, warc_ts, html, text):
    * response/resource records, HTTP headers stripped from the payload,
    * text extracted — the standard ingestion head of the magnitude and
    * training-data pipelines. */
  def pages(spark: SparkSession, path: String): DataFrame = {
    import graft.functions.GraftFunctions.{extract_text, http_body}
    spark.read.format("warc").option("types", "response,resource").load(path)
      .filter(col("url").isNotNull)
      // only RESPONSE payloads carry an HTTP message to strip; resource
      // records hold content directly — an exported document that happens
      // to BEGIN with the bytes "HTTP" must come back untouched
      .select(col("url"), col("warc_ts"),
        when(col("warc_type") === "response", http_body(col("payload")))
          .otherwise(col("payload")).as("html"))
      .withColumn("text", extract_text(col("html")))
  }
}

private[sources] class WarcTable(paths: Seq[String], types: Seq[String],
                                 maxRecordBytes: Long, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"warc ${paths.mkString(", ")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(tableSchema == WarcDataSource.Schema,
      s"warc reads have a fixed schema ${WarcDataSource.Schema.simpleString}; " +
        "drop the user-specified .schema(...)")
    new WarcScanBuilder(paths, types, maxRecordBytes)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new WarcWriteBuilder(info, paths)
}

private[sources] class WarcScanBuilder(paths: Seq[String], types: Seq[String],
                                       maxRecordBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new WarcScan(paths, types, maxRecordBytes, required)
}

private[sources] class WarcScan(paths: Seq[String], types: Seq[String],
                                maxRecordBytes: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"warc ${paths.mkString(", ")}"

  override def planInputPartitions(): Array[InputPartition] =
    DataFileListing.listDataFiles(paths,
        SparkSession.active.sessionState.newHadoopConf(), "warc")
      .map(f => WarcInputPartition(f.getPath.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required.fieldNames, types.toArray, maxRecordBytes,
      new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class WarcInputPartition(path: String) extends InputPartition

private[sources] case class WarcReaderFactory(
    fields: Array[String], types: Array[String], maxRecordBytes: Long,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].path,
      fields, types, maxRecordBytes, conf)
}

private[sources] class WarcPartitionReader(
    path: String, fields: Array[String], types: Array[String],
    maxRecordBytes: Long, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val needPayload = fields.contains("payload")
  private val stream = {
    val p = new Path(path)
    p.getFileSystem(conf.value).open(p)
  }
  // when `payload` is pruned, record bodies are SKIPPED in the stream —
  // never allocated — and content_length still reports the true size; the
  // `types` option is pushed INTO the parser so rejected records (e.g.
  // large request/warcinfo payloads on a mixed crawl) also take the skip
  // path instead of being buffered then dropped
  private val iter = WarcParser.records(stream, maxRecordBytes, keepPayload = needPayload,
    typeFilter = if (types.isEmpty) null
                 else t => types.exists(_.equalsIgnoreCase(t)))

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (!iter.hasNext) return false
    val r = iter.next()
    val vals = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      vals(i) = fields(i) match {
        case "warc_type" => UTF8String.fromString(r.warcType)
        case "record_id" => Option(r.recordId).map(UTF8String.fromString).orNull
        case "url" => Option(r.url).map(UTF8String.fromString).orNull
        case "warc_ts" => r.dateMicros.map(Long.box).orNull
        case "content_type" => Option(r.contentType).map(UTF8String.fromString).orNull
        case "content_length" => r.contentLength
        case "payload" => r.payload
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      i += 1
    }
    current = new GenericInternalRow(vals)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
