package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions._

/** Streaming LSH: a doc with its per-row minhash signature. */
case class LshDocIn(id: Long, ts: java.sql.Timestamp, sig: Seq[Long])
/** Streaming LSH: a doc replicated into one of its band buckets. */
case class LshBandDoc(band: Int, bucket: Long, id: Long,
                      ts: java.sql.Timestamp, sig: Seq[Long])
/** Streaming LSH bucket state: docs seen in this (band, bucket). */
case class LshDocSig(id: Long, sig: Seq[Long])
case class LshBucketState(docs: List[LshDocSig])
/** Streaming LSH candidate pair (id_a < id_b) with the signature-estimated
  * Jaccard (matching minhash fraction). */
case class LshPairOut(id_a: Long, id_b: Long, est_jaccard: Double)

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
   * Windowed value-distribution sketches: per (tumbling window, key), the
   * mergeable KLL and t-digest of a numeric column plus the count — the
   * streaming twin of the batch quantile suite. Returns the SKETCH columns
   * (not point estimates): windows finalize at the watermark, the sink rows
   * merge downstream with `kll_merge`/`tdigest_merge` across windows, keys
   * or days, and callers take `kll_quantile`/`tdigest_quantile` where they
   * read. Order caveat: KLL compaction and t-digest centroiding are
   * arrival-order-dependent, so streamed sketch BYTES can differ from a
   * batch build over the same rows — estimates agree within each family's
   * published rank/centroid error (pinned by StreamingSpec; CMS below has
   * no such caveat).
   */
  def windowedQuantiles(events: DataFrame, tsCol: String, keyCol: String,
                        valCol: String, windowLen: String,
                        watermark: String): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(kll_build(col(valCol).cast("double")).as("kll"),
        tdigest_build(col(valCol).cast("double")).as("tdigest"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol), col("kll"), col("tdigest"), col("n"))

  /**
   * Windowed Count-Min frequency sketch: ONE sketch row per tumbling
   * window, probeable for any key's count with `cms_est` — per-window
   * heavy-hitter auditing with O(sketch) state instead of O(distinct keys)
   * (the exact streaming `groupBy(key).count()` keeps a state-store row per
   * key; this keeps one counter matrix per window). CMS merge is a
   * counter-wise SUM, so unlike KLL/t-digest the streamed sketch bytes are
   * IDENTICAL to a batch build over the same rows regardless of arrival
   * order or micro-batch boundaries (pinned by StreamingSpec).
   */
  def windowedCms(events: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String, watermark: String): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(cms_build(xxh3_64(col(keyCol).cast("string")), lit(1L)).as("cms"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("cms"), col("n"))

  /**
   * Windowed heavy hitters + distinct sketch: per tumbling window, ONE
   * Misra-Gries sketch of key frequencies (CMS above answers point
   * probes; MG ENUMERATES the heavy keys via `freq_items` — the
   * "what dominated this window" stream) and ONE KMV bottom-k over the
   * same keys (mergeable distinct count, coordinated sample, and
   * window-over-window `kmv_jaccard` churn). O(k) state per window
   * instead of O(distinct keys); both columns merge downstream with
   * `freq_merge`/`kmv_merge`.
   *
   * Determinism: KMV union is a lattice join, so streamed bytes are
   * BIT-IDENTICAL to a batch build over the same rows regardless of
   * arrival order or micro-batch boundaries. MG contents at capacity
   * depend on arrival order (its BOUNDS never do); below capacity
   * (distinct keys <= k in the window) no decrement fires and the sorted
   * serialization is byte-identical to batch too. Both pinned by
   * StreamingSpec.
   */
  def windowedTopKeys(events: DataFrame, tsCol: String, keyCol: String,
                      windowLen: String, watermark: String,
                      k: Int = 256, kmvK: Int = 1024): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(freq_build(xxh3_64(col(keyCol).cast("string")), lit(1L), k).as("top_keys"),
        kmv_build(xxh3_64(col(keyCol).cast("string")), kmvK).as("key_kmv"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("top_keys"), col("key_kmv"), col("n"))

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
   * Streaming MinHash-LSH near-dedup — the streaming twin of
   * [[graft.operators.Dedup.minhashLshPairs]]'s candidate stage: each doc's
   * k-permutation minhash signature is computed PER ROW (codegen'd
   * `minhash_sig`, bit-identical to the batch aggregation — pinned by
   * test), cut into `bands`, and routed to (band, bucket) keyed state;
   * every arrival is compared against the bucket's buffered signatures and
   * pairs whose signature-estimated Jaccard (matching minhash fraction)
   * reaches `minEstJaccard` are emitted. Estimation replaces batch's exact
   * verify because exact Jaccard needs the shingle sets — unbounded state;
   * signatures are the standard bounded sufficient statistic
   * (E[match fraction] = J, sd ~ sqrt(J(1-J)/k)).
   *
   * State is BOUNDED two ways: `maxPerBucket` caps each bucket's buffer
   * (first-arrival wins, matching the dedup-survivor convention — an
   * over-cap bucket is near-duplicate spam by construction, since unrelated
   * docs collide in a band bucket with probability 2^-64), and event-time
   * timeout drops buckets idle past `stateTtl` once the watermark passes —
   * so a continuous crawl ingest runs forever. Contract (as
   * [[dedupExact]]): duplicates arriving farther apart than the
   * watermark/TTL horizon can be missed; run batch LSH over the sink for
   * longer horizons. A pair sharing several bands can be emitted once per
   * band (different state keys cannot coordinate), and an at-least-once
   * source replaying a doc that was compared but NOT buffered (its bucket
   * was at `maxPerBucket`) re-emits that doc's pairs — BUFFERED docs are
   * replay-guarded, but remembering over-cap arrivals would need exactly
   * the unbounded state the cap exists to avoid. Both cases are duplicate
   * EMISSIONS of true pairs, never wrong pairs: `.dropDuplicates` the sink
   * or tolerate idempotent pair handling downstream.
   */
  def minhashLshPairsStream(docs: DataFrame, tsCol: String, watermark: String,
                            stateTtlMs: Long, n: Int = 3, numHashes: Int = 32,
                            bands: Int = 8, minEstJaccard: Double = 0.5,
                            maxPerBucket: Int = 128,
                            idCol: String = "doc_id",
                            textCol: String = "text"): Dataset[LshPairOut] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(stateTtlMs > 0, "stateTtlMs must be positive")
    val r = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val withSig = docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      // null id/ts/text rows cannot be processed (the batch twin's explode
      // drops them silently); without this filter ONE dirty row would NPE
      // the always-on query, and a checkpoint restart replays the same
      // micro-batch — a permanent crash loop
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.functions.GraftFunctions.minhash_sig(
          graft.operators.Dedup.shingles(col(textCol), n), numHashes).as("sig"))
      .as[LshDocIn]
    // stateless band replication (the streaming analogue of the bucket
    // explode): bucket id folds the band's minhashes through the same
    // seeded XXH64 chain the batch band hash uses. The WATERMARK attaches
    // AFTER the typed flatMap: the event-time tag does not survive an
    // object-deserialization boundary, and EventTimeTimeout requires the
    // marked column on the stateful operator's direct input
    val banded = withSig.flatMap { d =>
      (0 until bands).map { b =>
        var h = 42L
        var i = b * r
        while (i < (b + 1) * r) {
          h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(d.sig(i), h)
          i += 1
        }
        LshBandDoc(b, h, d.id, d.ts, d.sig)
      }
    }.withWatermark("ts", watermark)
    implicit val stEnc = Encoders.product[LshBucketState]
    implicit val outEnc = Encoders.product[LshPairOut]
    banded
      .groupByKey(x => (x.band, x.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), rows: Iterator[LshBandDoc], state: GroupState[LshBucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(LshBucketState(Nil))
            val out = scala.collection.mutable.ArrayBuffer.empty[LshPairOut]
            var maxTs = 0L
            // deterministic intra-batch order: event time, then id
            rows.toSeq.sortBy(x => (x.ts.getTime, x.id)).foreach { d =>
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
              // at-least-once replay guard: a doc already buffered in this
              // bucket (retried micro-batch, replayed source offsets) must
              // neither consume a second maxPerBucket slot nor re-emit its
              // pairs on every later arrival
              if (!st.docs.exists(_.id == d.id)) {
                st.docs.foreach { prev =>
                  var m = 0
                  var i = 0
                  while (i < numHashes) {
                    if (prev.sig(i) == d.sig(i)) m += 1
                    i += 1
                  }
                  val est = m.toDouble / numHashes
                  if (est >= minEstJaccard)
                    out += LshPairOut(math.min(prev.id, d.id),
                      math.max(prev.id, d.id), est)
                }
                if (st.docs.length < maxPerBucket)
                  st = LshBucketState(LshDocSig(d.id, d.sig) :: st.docs)
              }
            }
            state.update(st)
            if (maxTs > 0L) state.setTimeoutTimestamp(maxTs + stateTtlMs)
            out.iterator
          }
        })
  }

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
