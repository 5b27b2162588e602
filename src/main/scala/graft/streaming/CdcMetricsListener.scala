package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** E4: observable-rate parity with the reference's Prometheus metrics
  * (monitoring/metrics.rs:13-132). Metric names kept 1:1 where they still
  * mean something under Spark's execution model; values come from
  * `StreamingQueryProgress`, the engine's native instrumentation.
  *
  * Export path: scrape `snapshot()` from any HTTP endpoint or bridge into
  * Spark's metrics system; kept dependency-free here.
  */
class CdcMetricsListener extends StreamingQueryListener {

  val eventsProcessedTotal = new AtomicLong(0)
  val transactionsProcessedTotal = new AtomicLong(0) // batches ≙ txn groups
  val errorsTotal = new AtomicLong(0)
  private val lastEventsPerSecond = new AtomicReference[Double](0.0)
  private val lastBatchDurationMs = new AtomicLong(0)
  private val startedAtMs = new AtomicLong(System.currentTimeMillis())

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    startedAtMs.set(System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    eventsProcessedTotal.addAndGet(p.numInputRows)
    transactionsProcessedTotal.incrementAndGet()
    lastEventsPerSecond.set(p.processedRowsPerSecond)
    lastBatchDurationMs.set(
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (event.exception.isDefined) errorsTotal.incrementAndGet()

  /** Prometheus-style snapshot (names from metrics.rs:34-38, README). */
  def snapshot(): Map[String, Double] = Map(
    "pg2any_events_processed_total" -> eventsProcessedTotal.get.toDouble,
    "pg2any_transactions_processed_total" -> transactionsProcessedTotal.get.toDouble,
    "pg2any_events_per_second" -> lastEventsPerSecond.get,
    "pg2any_event_processing_duration_ms" -> lastBatchDurationMs.get.toDouble,
    "pg2any_errors_total" -> errorsTotal.get.toDouble,
    "pg2any_uptime_seconds" ->
      (System.currentTimeMillis() - startedAtMs.get) / 1000.0)
}
