package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed change-rate aggregation with watermarked late-data
  * handling.
  *
  * The reference has no event-time windowing — WAL total order makes
  * "late" impossible (SURVEY §2.11) — but the moment CDC events transit a
  * broker (the Debezium path), per-partition reordering appears and
  * watermarks become the correct tool. This operator is the engine's
  * change-rate telemetry: events per (table, op) per tumbling window,
  * tolerating `lateness` of disorder, emitting finalized windows only
  * (append mode — safe for downstream sinks).
  *
  * Scale: state is |tables × ops × open windows|, independent of event
  * volume; the watermark bounds open windows, so state is O(tables).
  */
object EventRates {

  /** envelope stream → windowed rates. Append-mode compatible. */
  def windowed(envelope: DataFrame, window_ : String = "1 minute",
               lateness: String = "2 minutes"): DataFrame =
    envelope
      .filter(col("op").isin("c", "u", "d", "t"))
      .withWatermark("commitTs", lateness)
      .groupBy(
        window(col("commitTs"), window_).as("w"),
        col("table"), col("op"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("txid").as("approx_txns"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("table"), col("op"), col("n_events"), col("approx_txns"))

  /** Per-table activity sessions via Spark's native `session_window`:
    * events closer than `gap` merge into one dynamic-length session
    * (write bursts become one row; the quiet table shows none). The
    * watermark finalizes sessions whose gap has passed, so streaming
    * state is O(open sessions per table), independent of event volume.
    *
    * The same expression runs unchanged over a static DataFrame (the
    * watermark is a no-op there), which is what the parity test
    * asserts — one definition, both execution modes. */
  def sessionized(envelope: DataFrame, gap: String = "5 minutes",
                  lateness: String = "2 minutes"): DataFrame =
    envelope
      .filter(col("op").isin("c", "u", "d", "t"))
      .withWatermark("commitTs", lateness)
      .groupBy(session_window(col("commitTs"), gap).as("w"), col("table"))
      .agg(count(lit(1)).as("n_events"),
        min("lsn").as("first_lsn"), max("lsn").as("last_lsn"))
      .select(col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("table"), col("n_events"), col("first_lsn"), col("last_lsn"))

  /** Deterministic key rendering for the join: the key columns' values
    * (after-image first — deletes may carry the key only in `before`),
    * pipe-joined in keyColumns order. Tiny per-event arrays — the
    * interpreted lambdas are not a bulk-scan cost. */
  private def keyRepr: Column = {
    val img = when(size(col("after")) > 0, col("after")).otherwise(col("before"))
    concat_ws("|", transform(col("keyColumns"), k =>
      element_at(map_from_entries(transform(img,
        c => struct(c("name"), c("value")))), k)))
  }

  /** Short-lived-row telemetry: a stream-stream INTERVAL join — every
    * insert matched with a delete of the same (table, key) arriving
    * within `horizon` of it. Churn like this (rows created then deleted
    * moments later) is invisible to per-op rates but dominates replica
    * write amplification, so it is the signal to alert on.
    *
    * Both sides are watermarked and the join condition bounds `d_ts`
    * inside `[i_ts, i_ts + horizon]`, so Spark evicts join state as the
    * watermark passes — state is O(events inside the horizon), never the
    * stream's history. Inner join: matches emit as they arrive (append
    * mode), no watermark wait. */
  def shortLived(envelope: DataFrame, horizon: String = "10 minutes",
                 lateness: String = "2 minutes"): DataFrame = {
    val ins = envelope.filter(col("op") === "c")
      .select(col("table").as("i_table"), keyRepr.as("i_key"),
        col("commitTs").as("i_ts"), col("lsn").as("i_lsn"))
      .withWatermark("i_ts", lateness)
    val del = envelope.filter(col("op") === "d")
      .select(col("table").as("d_table"), keyRepr.as("d_key"),
        col("commitTs").as("d_ts"), col("lsn").as("d_lsn"))
      .withWatermark("d_ts", lateness)
    ins.join(del,
      col("i_table") === col("d_table") && col("i_key") === col("d_key") &&
        col("d_lsn") > col("i_lsn") &&
        col("d_ts") >= col("i_ts") &&
        col("d_ts") <= col("i_ts") + expr(s"INTERVAL $horizon"))
      .select(col("i_table").as("table"), col("i_key").as("key"),
        col("i_ts"), col("d_ts"), col("i_lsn"), col("d_lsn"),
        (unix_millis(col("d_ts")) - unix_millis(col("i_ts"))).as("lifetime_ms"))
  }
}
