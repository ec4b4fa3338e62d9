package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization — the gap-timeout session assignment the engine's
 * streaming side does with flatMapGroupsWithState
 * ([[graft.streaming.StreamingSketch]] sessions), for stored event logs:
 * consecutive events of the same key belong to one session while the gap
 * between them stays under `gapSeconds`; a larger gap starts the next
 * session.
 *
 * Plan shape: ONE shuffle+sort per key (lag + running sum over the same
 * window — Spark evaluates both in a single WindowExec pass), no joins,
 * no driver state; cost is |rows| log(rows-per-key) regardless of session
 * count. Arithmetic is integer microseconds end to end, so session
 * boundaries are exact and SQL-replayable (no float time deltas).
 *
 * Rows with a NULL key or NULL timestamp are dropped (a session is
 * meaningless without both; count them upstream if they matter).
 */
object Sessionize {

  /** `df` plus `session_idx` (0-based per key, in time order). Events of
    * one key with equal timestamps share a session (gap 0 < any positive
    * timeout) and order within the session does not affect indexing. */
  def byGap(df: DataFrame, keyCol: String, tsCol: String,
            gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "sessionize: gapSeconds must be > 0")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(micros, 1).over(w)
    val isNew = when(prev.isNull, 0L)
      .when(micros - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("session_idx",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** One row per (key, session): start/end timestamps, event count and
    * duration in seconds — the session-level features (dwell time,
    * events-per-visit) fed to engagement/quality models. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long): DataFrame =
    byGap(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))) / 1000000.0)
          .as("duration_sec"))
}
