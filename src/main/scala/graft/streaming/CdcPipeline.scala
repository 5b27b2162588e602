package graft.streaming

import graft.model.{CdcEvent, CdcSchema}
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E1/E2 analog: wire source → transform → exactly-once sink.
  *
  * The reference's producer/consumer pair with its filesystem queue
  * (D1-D9, ~2.3k LoC) collapses into Structured Streaming's checkpointed
  * micro-batches: source offsets + WAL live in `checkpointLocation`,
  * epoch replay after crash re-delivers the same batchId, and the sink's
  * batchId gate (JdbcApplier) makes the replay a no-op — the same
  * exactly-once contract as flush_lsn tracking (lsn_tracker.rs:201-460).
  */
object CdcPipeline {

  implicit val eventEnc: Encoder[CdcEvent] = Encoders.product[CdcEvent]

  /** envelope DataFrame → typed event stream (F1 filter applied). */
  def toEvents(envelope: DataFrame): Dataset[CdcEvent] =
    envelope
      .filter(col("op").isin("c", "u", "d", "t"))
      .as[CdcEvent]

  /** Start the apply pipeline into a JDBC destination. */
  def startJdbc(
      envelope: DataFrame,
      ctx: RenderContext,
      url: String,
      checkpointDir: String,
      appId: String = "graft",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val applier = new JdbcApplier(url, ctx, appId)
    applier.init()
    toEvents(envelope).writeStream
      .queryName(s"graft-cdc-$appId")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
        applier.applyBatch(batch, batchId)
      }
      .start()
  }

  /** Kafka-envelope pipeline: envelope → Debezium topic/key/value rows.
    * Attach .format("kafka") + bootstrap options to go to a real broker;
    * tests use the memory sink. */
  def debeziumRows(envelope: DataFrame, topicPrefix: String): DataFrame =
    graft.render.DebeziumEnvelope.project(envelope, topicPrefix)
}

/** E5: CDC_* environment parity (reference env.rs:58-173). Only the
  * engine-relevant knobs — queue/file-layout vars are obsolete here. */
final case class GraftConfig(
    batchSize: Int = 1000,
    bulkInsertThreshold: Int = 500,
    maxRowsPerInsert: Int = Int.MaxValue,
    segmentBytes: Long = 64L * 1024 * 1024,
    heartbeatSeconds: Int = 10,
    schemaMappings: Map[String, String] = Map.empty)

object GraftConfig {
  /** Parse `public:cdc_db,sales:sales_db` (env.rs:180-208). */
  def parseSchemaMappings(s: String): Map[String, String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).flatMap { pair =>
      pair.split(":", 2) match {
        case Array(a, b) => Some(a.trim -> b.trim)
        case _ => None
      }
    }.toMap

  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = GraftConfig(
    batchSize = env.get("CDC_BATCH_SIZE").map(_.toInt).getOrElse(1000),
    bulkInsertThreshold =
      env.get("CDC_BULK_INSERT_THRESHOLD").map(_.toInt).getOrElse(500),
    maxRowsPerInsert =
      env.get("CDC_MAX_ROWS_PER_INSERT").map(_.toInt).getOrElse(Int.MaxValue),
    segmentBytes = env.get("CDC_TRANSACTION_SEGMENT_SIZE_MB")
      .map(_.toLong * 1024 * 1024).getOrElse(64L * 1024 * 1024),
    heartbeatSeconds =
      env.get("CDC_HEARTBEAT_INTERVAL").map(_.toInt).getOrElse(10),
    schemaMappings = env.get("CDC_SCHEMA_MAPPINGS")
      .map(parseSchemaMappings).getOrElse(Map.empty))
}
