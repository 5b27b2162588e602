package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import java.util.concurrent.ConcurrentHashMap

/** E4: observable parity with the reference's Prometheus metrics
  * (monitoring/metrics.rs:13-132, README.md:319-330). Metric names kept
  * 1:1; values come from two engine-native feeds, both zero-cost:
  *
  *  - `StreamingQueryProgress` — rates, batch durations, and the
  *    source's own offset bookkeeping (`endOffset` IS the received LSN
  *    for the cdcwal source, so `pg2any_current_received_lsn` needs no
  *    side channel);
  *  - OBSERVED metrics ([[CdcPipeline]] attaches `observe("graft_cdc")`
  *    to the event stream) — max applied LSN, newest commit timestamp,
  *    and per-{event_type,table} counts, all folded into the batch's
  *    existing pass by Spark's CollectMetrics operator. No second scan,
  *    no driver collect.
  *
  * `pg2any_replication_lag_seconds` (BASELINE.md's explicit target) =
  * wall time at batch completion minus the newest applied event's commit
  * timestamp — the reference's definition: how far behind the source's
  * committed WAL the destination is. Idle batches keep the last value
  * (no events ⇒ no new commit to lag behind).
  *
  * Connection-status gauges follow the reference's semantics (1 =
  * connected): source flips with the streaming query's lifecycle, the
  * destination is set by the wiring once its sink initializes
  * ([[GraftApp]]) and cleared on shutdown.
  *
  * Export path: scrape `snapshot()` via [[MetricsServer]]; labeled names
  * render as `name{label="v"}` samples under one TYPE family.
  */
class CdcMetricsListener extends StreamingQueryListener {

  val eventsProcessedTotal = new AtomicLong(0)
  val transactionsProcessedTotal = new AtomicLong(0) // batches ≙ txn groups
  val errorsTotal = new AtomicLong(0)
  private val lastEventsPerSecond = new AtomicReference[Double](0.0)
  private val lastBatchDurationMs = new AtomicLong(0)
  private val startedAtMs = new AtomicLong(System.currentTimeMillis())

  // reference metrics.rs:47-57 — LSN position gauges
  private val lastProcessedLsn = new AtomicLong(0)
  private val currentReceivedLsn = new AtomicLong(0)
  // README.md:323 / BASELINE.md lag target — seconds, fractional
  private val replicationLagSeconds = new AtomicReference[Double](0.0)
  // metrics.rs:71-81 — connection-status gauges
  private val sourceConnected = new AtomicLong(0)
  private val destinationStatus = new ConcurrentHashMap[String, java.lang.Double]()
  // metrics.rs:28-32 — per-{event_type,table} counters; key "type<SEP>table" (LabelSep)
  private val eventsByType = new ConcurrentHashMap[String, AtomicLong]()

  /** Wiring hook: destination sink initialized (1) / shut down (0). */
  def setDestinationConnected(destinationType: String, connected: Boolean): Unit =
    destinationStatus.put(destinationType, if (connected) 1.0 else 0.0)

  /** Shutdown hook: every destination gauge drops to 0. */
  def markDestinationsDisconnected(): Unit =
    destinationStatus.replaceAll((_, _) => 0.0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    startedAtMs.set(System.currentTimeMillis())
    sourceConnected.set(1)
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    eventsProcessedTotal.addAndGet(p.numInputRows)
    transactionsProcessedTotal.incrementAndGet()
    lastEventsPerSecond.set(p.processedRowsPerSecond)
    lastBatchDurationMs.set(
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    sourceConnected.set(1)
    // received LSN: the source's commit-snapped tip for this batch —
    // cdcwal offsets serialize as {"lsn":N} (LsnOffset.json)
    p.sources.headOption
      .flatMap(s => parseLsnOffset(s.endOffset)).foreach { lsn =>
        if (lsn > currentReceivedLsn.get) currentReceivedLsn.set(lsn)
      }
    val om = p.observedMetrics
    if (om != null && om.containsKey("graft_cdc")) {
      val row = om.get("graft_cdc")
      if (!row.isNullAt(row.fieldIndex("max_lsn"))) {
        val lsn = row.getAs[Long]("max_lsn")
        if (lsn > lastProcessedLsn.get) lastProcessedLsn.set(lsn)
      }
      if (!row.isNullAt(row.fieldIndex("max_commit_ts_micros"))) {
        val micros = row.getAs[Long]("max_commit_ts_micros")
        replicationLagSeconds.set(
          math.max(0.0, (System.currentTimeMillis() - micros / 1000L) / 1000.0))
      }
      if (!row.isNullAt(row.fieldIndex("events_by_type"))) {
        row.getAs[Map[String, Long]]("events_by_type").foreach { case (k, n) =>
          eventsByType.computeIfAbsent(k, _ => new AtomicLong(0)).addAndGet(n)
        }
      }
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    sourceConnected.set(0)
    if (event.exception.isDefined) errorsTotal.incrementAndGet()
  }

  private def parseLsnOffset(json: String): Option[Long] =
    Option(json).flatMap { j =>
      val m = """"lsn"\s*:\s*(\d+)""".r.findFirstMatchIn(j)
      m.map(_.group(1).toLong)
    }

  private def escapeLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Prometheus-style snapshot (names from metrics.rs:13-132, README). */
  def snapshot(): Map[String, Double] = {
    val base = Map(
      "pg2any_events_processed_total" -> eventsProcessedTotal.get.toDouble,
      "pg2any_transactions_processed_total" -> transactionsProcessedTotal.get.toDouble,
      "pg2any_events_per_second" -> lastEventsPerSecond.get,
      "pg2any_event_processing_duration_ms" -> lastBatchDurationMs.get.toDouble,
      "pg2any_errors_total" -> errorsTotal.get.toDouble,
      "pg2any_replication_lag_seconds" -> replicationLagSeconds.get,
      "pg2any_last_processed_lsn" -> lastProcessedLsn.get.toDouble,
      "pg2any_current_received_lsn" -> currentReceivedLsn.get.toDouble,
      "pg2any_source_connection_status" -> sourceConnected.get.toDouble,
      "pg2any_uptime_seconds" ->
        (System.currentTimeMillis() - startedAtMs.get) / 1000.0)
    val dest = {
      import scala.jdk.CollectionConverters._
      destinationStatus.asScala.map { case (t, v) =>
        s"""pg2any_destination_connection_status{destination_type="${escapeLabel(t)}"}""" ->
          v.doubleValue
      }.toMap
    }
    val byType = {
      import scala.jdk.CollectionConverters._
      eventsByType.asScala.map { case (k, n) =>
        val (et, tbl) = k.split('\u0001') match {
          case Array(a, b) => (a, b)
          case _ => (k, "unknown")
        }
        s"""pg2any_events_by_type_total{event_type="${escapeLabel(et)}",table_name="${escapeLabel(tbl)}"}""" ->
          n.get.toDouble
      }.toMap
    }
    base ++ dest ++ byType
  }
}
