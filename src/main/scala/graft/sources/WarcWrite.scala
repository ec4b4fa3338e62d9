package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.core.warc.WarcParser

/**
 * DataSource V2 WRITE path for the `warc` format:
 * `df.write.format("warc").mode("append" | "overwrite").save(dir)` turns a
 * pages-shaped DataFrame back into spec-layout web archives — the export
 * side of the crawl interchange (ship a filtered/deduped corpus to any
 * WARC consumer).
 *
 * Input contract: a `url` string column, ONE binary payload column named
 * `payload` or `html`, an optional `warc_ts` timestamp (WARC-Date;
 * records without one get the Unix epoch — the header is mandatory per
 * spec §5.4) and an optional `content_type` string (default
 * application/octet-stream). Rows with a NULL url or payload are
 * rejected fail-fast (silently dropping rows from an export is data
 * loss). Records are written as `resource` records (content carried
 * directly, no fabricated HTTP preamble) so `WarcDataSource.pages` reads
 * an export back byte-identically.
 *
 * Commit protocol: each task streams its partition into
 * `_temporary_warc/<jobUuid>/<uuid>` as a member-per-record .warc.gz
 * (O(record) memory, Deflater released per member); the driver commit
 * renames the temp files to `part-NNNNN-<uuid>.warc.gz` and drops a
 * `_SUCCESS` marker; abort (or a losing speculative attempt, via Spark's
 * commit coordinator) deletes its temp file. The temp subdir is PER JOB:
 * commit/abort sweep only their own job's subdir, so two concurrent
 * append jobs into the same output directory cannot delete each other's
 * in-flight files. Overwrite mode truncates committed part files before
 * renaming the new ones. Empty partitions produce no file.
 */
private[sources] class WarcWriteBuilder(info: LogicalWriteInfo, paths: Seq[String])
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      require(paths.length == 1,
        s"warc write needs exactly one output directory, got $paths")
      WarcWrite.validateSchema(info.schema())
      new WarcBatchWrite(paths.head, info.schema(), doTruncate)
    }
    // streaming sink (append mode): each micro-batch commits its own
    // part-e<epoch>-NNNNN.warc.gz files — the continuous
    // crawl->filter->export topology. Target names are DETERMINISTIC per
    // (epoch, partition) and commit replaces an existing target: a
    // replayed epoch (driver died between sink commit and offset-log
    // write) overwrites its own previous files instead of adding
    // duplicates — idempotent epoch commit, exactly-once at file
    // granularity. Task-attempt races are handled by Spark's commit
    // coordinator (one winning attempt per partition).
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(paths.length == 1,
        s"warc write needs exactly one output directory, got $paths")
      WarcWrite.validateSchema(info.schema())
      new WarcStreamingWrite(paths.head, info.schema())
    }
  }
}

private[sources] class WarcStreamingWrite(dir: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  // one temp namespace per query run: concurrent streams into the same
  // output directory never touch each other's in-flight files
  private val streamUuid = UUID.randomUUID().toString

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    WarcStreamingWriterFactory(dir, streamUuid, schema, conf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    fs.mkdirs(base)
    messages.collect { case m: WarcCommit if m.tempPath != null => m }.foreach { m =>
      // deterministic target; replace any copy a previous attempt of this
      // SAME epoch committed (idempotent replay, no duplicates)
      val target = new Path(base, f"part-e$epochId-${m.partitionId}%05d.warc.gz")
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(new Path(m.tempPath), target))
        throw new java.io.IOException(s"warc streaming write: failed to commit $target")
    }
    // epoch-encoded temp layout lets commit PRUNE: every temp subdir of
    // this stream at epoch <= the one just committed holds only orphans —
    // files from task attempts that died without abort() (executor loss)
    // or losing speculative attempts. Without this the temp dir grows for
    // the lifetime of a continuous query.
    val parent = new Path(base, "_temporary_warc")
    val streamTmp = new Path(parent, streamUuid)
    if (fs.exists(streamTmp)) {
      fs.listStatus(streamTmp).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("e") &&
            scala.util.Try(n.drop(1).toLong).toOption.exists(_ <= epochId))
          fs.delete(st.getPath, true)
      }
      // drop empty dirs so a finished stream leaves no skeleton behind
      // (best-effort; the next epoch recreates them on first write)
      try {
        if (fs.listStatus(streamTmp).isEmpty) fs.delete(streamTmp, false)
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty) fs.delete(parent, false)
      } catch { case _: java.io.IOException => () }
    }
    // reclaim dead sibling runs (a RESTARTED stream gets a fresh uuid, so
    // a crashed run's subdir would otherwise linger forever). ONCE per
    // stream instance, not per epoch: the sweep's verdict can only change
    // on a ~24 h horizon, and a short-trigger query would otherwise pay a
    // full recursive listing of every leftover on every microbatch
    if (!sweptOnce) {
      sweptOnce = true
      WarcWrite.sweepStaleTemp(fs, base, keep = streamUuid)
    }
  }

  @volatile private var sweptOnce = false

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    // the whole epoch subdir is this epoch's in-flight state (including
    // files of tasks that died without reporting a commit message)
    val epochTmp = new Path(new Path(new Path(base, "_temporary_warc"), streamUuid),
      s"e$epochId")
    if (fs.exists(epochTmp)) fs.delete(epochTmp, true)
  }
}

private[sources] case class WarcStreamingWriterFactory(
    dir: String, streamUuid: String, schema: StructType, conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, s"_temporary_warc/$streamUuid/e$epochId",
      schema, conf, partitionId, taskId)
}

private[sources] object WarcWrite {
  /** Crash-leftover horizon: a temp subdir whose NEWEST entry hasn't
    * changed in this long belongs to a job or stream that died without
    * abort() (per-job/per-stream subdirs mean nothing else ever reclaims
    * it). 24 h is far beyond any real flush interval, so a live writer
    * can't be swept; correctness never depends on the sweep. */
  private[sources] val StaleTempMs: Long = 24L * 3600 * 1000

  /** Best-effort reclaim of OTHER jobs'/streams' dead temp subdirs under
    * `_temporary_warc`, called from commit paths. `keep` is the caller's
    * own subdir name (never touched). */
  private[sources] def sweepStaleTemp(fs: org.apache.hadoop.fs.FileSystem,
                                      base: Path, keep: String): Unit = {
    val parent = new Path(base, "_temporary_warc")
    try {
      if (!fs.exists(parent)) return
      val horizon = System.currentTimeMillis() - StaleTempMs
      fs.listStatus(parent).foreach { st =>
        if (st.isDirectory && st.getPath.getName != keep) {
          var newest = st.getModificationTime
          val it = fs.listFiles(st.getPath, true)
          while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
          if (newest < horizon) fs.delete(st.getPath, true)
        }
      }
    } catch { case _: java.io.IOException => () }
  }

  def payloadCol(schema: StructType): String = {
    val cands = schema.fieldNames.filter(n => n == "payload" || n == "html")
    require(cands.length == 1,
      if (cands.isEmpty)
        s"warc write needs a binary 'payload' or 'html' column; got " +
          schema.fieldNames.mkString(", ")
      else
        "warc write: BOTH 'payload' and 'html' present — drop one so the " +
          "exported bytes are unambiguous")
    cands.head
  }

  def validateSchema(schema: StructType): Unit = {
    require(schema.fieldNames.contains("url"),
      s"warc write needs a 'url' column; got ${schema.fieldNames.mkString(", ")}")
    val p = payloadCol(schema)
    require(schema(p).dataType == BinaryType, s"column '$p' must be binary")
    require(schema("url").dataType == StringType, "column 'url' must be string")
    schema.fieldNames.find(_ == "warc_ts").foreach(c =>
      require(schema(c).dataType == TimestampType, "'warc_ts' must be timestamp"))
    schema.fieldNames.find(_ == "content_type").foreach(c =>
      require(schema(c).dataType == StringType, "'content_type' must be string"))
  }
}

private[sources] class WarcBatchWrite(dir: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  // per-job temp subdir: commit/abort sweep ONLY this job's in-flight
  // files — a concurrent append job into the same directory keeps its own
  private val jobUuid = UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    WarcWriterFactory(dir, s"_temporary_warc/$jobUuid", schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(conf.value)
    // overwrite truncates ALL visible files (matching Spark's file-source
    // overwrite semantics — leaving non-part-named archives behind would
    // silently mix stale records into the new export); hidden entries and
    // the in-flight temp dir stay
    if (truncate && fs.exists(base))
      fs.listStatus(base).filter(st => st.isFile &&
          !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_temporary"))
        .foreach(st => fs.delete(st.getPath, false))
    fs.mkdirs(base)
    messages.collect { case m: WarcCommit if m.tempPath != null => m }.foreach { m =>
      val target = new Path(base, f"part-${m.partitionId}%05d-${m.uuid}.warc.gz")
      if (!fs.rename(new Path(m.tempPath), target))
        throw new java.io.IOException(s"warc write: failed to commit $target")
    }
    cleanupTemp(fs, base)
    fs.create(new Path(base, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val base = new Path(dir)
    cleanupTemp(base.getFileSystem(conf.value), base)
  }

  /** Remove THIS job's temp subdir, reclaim stale leftovers of jobs that
    * died without abort (see [[WarcWrite.sweepStaleTemp]]), and drop the
    * shared `_temporary_warc` parent when no other job is mid-flight in it
    * (best-effort — a racing job recreates it on its first write). */
  private def cleanupTemp(fs: org.apache.hadoop.fs.FileSystem, base: Path): Unit = {
    val parent = new Path(base, "_temporary_warc")
    val mine = new Path(parent, jobUuid)
    if (fs.exists(mine)) fs.delete(mine, true)
    WarcWrite.sweepStaleTemp(fs, base, keep = jobUuid)
    try {
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty) fs.delete(parent, false)
    } catch { case _: java.io.IOException => () }
  }
}

private[sources] case class WarcCommit(partitionId: Int, uuid: String, tempPath: String)
    extends WriterCommitMessage

private[sources] case class WarcWriterFactory(dir: String, tempSub: String,
                                              schema: StructType,
                                              conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, tempSub, schema, conf, partitionId, taskId)
}

private[sources] class WarcDataWriter(dir: String, tempSub: String, schema: StructType,
                                      conf: SerializableConfiguration,
                                      partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val uuid = UUID.randomUUID().toString
  private val iUrl = schema.fieldIndex("url")
  private val iPayload = schema.fieldIndex(WarcWrite.payloadCol(schema))
  private val iTs = schema.fieldNames.indexOf("warc_ts")
  private val iCt = schema.fieldNames.indexOf("content_type")

  private var tempPath: Path = _
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var shield: java.io.OutputStream = _
  private var n = 0L

  private def ensureOpen(): Unit = if (out == null) {
    tempPath = new Path(new Path(dir, tempSub), s"$uuid-$partitionId-$taskId")
    val fs = tempPath.getFileSystem(conf.value)
    out = fs.create(tempPath, true)
    shield = new java.io.FilterOutputStream(out) {
      override def close(): Unit = flush()
      override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    }
  }

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(iUrl) || row.isNullAt(iPayload))
      throw new IllegalArgumentException(
        "warc write: NULL url or payload — silently dropping export rows is " +
          "data loss; filter them explicitly first")
    ensureOpen()
    // full microsecond precision (floorDiv/floorMod: correct pre-1970 too);
    // Instant.toString omits a zero fraction, so whole-second dates stay in
    // the WARC/1.0 canonical second-granularity form
    val tsMicros = if (iTs >= 0 && !row.isNullAt(iTs)) row.getLong(iTs) else 0L
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(tsMicros, 1000000L), Math.floorMod(tsMicros, 1000000L) * 1000L)
    val ct = if (iCt >= 0 && !row.isNullAt(iCt)) row.getUTF8String(iCt).toString
             else "application/octet-stream"
    val m = new java.util.zip.GZIPOutputStream(shield, 1 << 16)
    WarcParser.writeRecord(m, "resource", Seq(
      "WARC-Record-ID" -> s"<urn:uuid:${UUID.nameUUIDFromBytes(
        (uuid + n).getBytes("UTF-8"))}>",
      "WARC-Target-URI" -> row.getUTF8String(iUrl).toString,
      "WARC-Date" -> inst.toString,
      "Content-Type" -> ct),
      row.getBinary(iPayload))
    m.close() // ends the gzip member and releases its Deflater; shield keeps the file open
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    WarcCommit(partitionId, uuid, if (tempPath == null) null else tempPath.toString)
  }

  override def abort(): Unit = {
    if (out != null) {
      out.close()
      val fs = tempPath.getFileSystem(conf.value)
      if (fs.exists(tempPath)) fs.delete(tempPath, false)
    }
  }

  override def close(): Unit = ()
}
