package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
