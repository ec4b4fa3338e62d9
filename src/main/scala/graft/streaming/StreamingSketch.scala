package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions._

/** One closed user session (sessionization output row). */
case class SessionOut(user_id: Long, n_events: Int, start_ts: Long, end_ts: Long)
/** Sessionization state carried between micro-batches. */
case class SessionState(n: Int, start: Long, last: Long)
/** Typed event view for stateful processing. */
case class EventIn(user_id: Long, ts: java.sql.Timestamp)

/**
 * Structured Streaming extensions (SURVEY.md §2.7). The reference is
 * batch-only; its stream-shaped mechanisms (chunked incremental collection,
 * incremental CBOR-sequence folding) map naturally onto micro-batch
 * streaming because the sketch aggregates are mergeable — the streaming
 * state store holds exactly the serialized aggregation buffers the batch
 * path shuffles.
 */
object StreamingSketch {

  /**
   * Windowed sketch build over a stream: per (tumbling window, key), the
   * HLL of hashed entities plus the event count — the streaming twin of
   * Magnitude.collect. Late data beyond `watermark` is dropped and windows
   * finalize (append mode works); the sketch state is the aggregation
   * buffer in the state store.
   */
  def windowedHll(events: DataFrame, tsCol: String, keyCol: String,
                  entityCol: String, windowLen: String,
                  watermark: String): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp")) // NTZ -> event-time type
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(hll_build(xxh3_64(col(entityCol).cast("string"))).as("hll"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol),
        hll_est(col("hll")).as("est_entities"), col("n"))

  /**
   * Streaming sketch-STATE builder: per (tumbling window, host) HLL + count
   * rows in the Magnitude sketch_state shape, suitable for an append-mode
   * parquet sink. This is the production topology for streaming magnitude:
   * the stream maintains only per-key sketch buffers (bounded state, windows
   * finalize at the watermark), the sink parquet IS the checkpointed state
   * table, and `Magnitude.report` runs in batch over it — identical results
   * to batch collect over the same rows, because the aggregates merge.
   */
  def pagesSketchState(pages: DataFrame, windowLen: String, watermark: String): DataFrame =
    pages
      .withColumn("warc_ts", col("warc_ts").cast("timestamp"))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen),
        host_of_url(col("url")).as("host"))
      .agg(hll_build(xxh3_64(col("url"))).as("hll"), count(lit(1)).as("queries"))
      .select(to_date(col("window.start")).as("date"), col("host"),
        col("hll"), col("queries"))

  /**
   * Streaming exact dedup by content signature — the streaming twin of
   * [[graft.operators.Dedup.exact]]: each distinct text's FIRST arrival is
   * emitted, later duplicates are dropped. State is BOUNDED:
   * `dropDuplicatesWithinWatermark` keys the state store by the 128-bit
   * content signature (16 bytes/doc, never the text) and expires entries
   * once the watermark passes, so a continuous crawl ingest can run
   * forever. The documented contract: duplicates arriving farther apart
   * than the watermark delay can re-emit — dedupe across longer horizons
   * by batch [[graft.operators.Dedup.exact]] over the sink.
   */
  def dedupExact(docs: DataFrame, tsCol: String, watermark: String,
                 textCol: String = "text"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .withColumn("__h1", xxh3_64(col(textCol)))
      .withColumn("__h2", fingerprint64(col(textCol)))
      .dropDuplicatesWithinWatermark("__h1", "__h2")
      .drop("__h1", "__h2")

  /**
   * Gap-based sessionization via flatMapGroupsWithState — the custom-state
   * path for semantics windows can't express. A session row is emitted when
   * a later event arrives past `gapMs`, AND when the user simply goes idle:
   * event-time timeout fires once the watermark passes last_event + gapMs,
   * closing (and emitting) the open session without needing another event
   * from that user — otherwise idle users' state lives forever and their
   * final sessions are lost.
   *
   * Requires a watermark on the input (`events.withWatermark(...)`) as
   * Structured Streaming mandates for EventTimeTimeout.
   */
  def sessionize(events: Dataset[EventIn], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: the open session is closed
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.n, st.start, st.last))
          } else {
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(0, -1L, -1L))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            for (t <- sorted) {
              if (st.n == 0) st = SessionState(1, t, t)
              else if (t - st.last > gapMs) {
                out += SessionOut(user, st.n, st.start, st.last)
                st = SessionState(1, t, t)
              } else st = SessionState(st.n + 1, st.start, t)
            }
            if (st.n > 0) {
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            } else state.remove()
            out.iterator
          }
        })
  }
}
