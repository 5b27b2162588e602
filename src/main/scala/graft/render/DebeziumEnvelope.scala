package graft.render

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11: Debezium-style Kafka envelope as native Spark columns
  * (reference destinations/kafka.rs:236-292,215-234,166-213).
  *
  * Input: the CDC envelope DataFrame (graft.model.CdcSchema.envelope).
  * Output columns: `topic` ({prefix}.{schema}.{table}), `key` (JSON of
  * key columns from the appropriate image), `value` (Debezium payload
  * JSON). Everything is `to_json(struct(...))` — codegen'd, no UDFs —
  * so the built-in kafka sink consumes it directly:
  * df.writeStream.format("kafka") with topic/key/value columns.
  */
object DebeziumEnvelope {

  val connectorName = "pg2anyspark"
  val connectorVersion = "0.1.0"

  /** before/after arrays of (name,value,isBinary) → JSON object string.
    * map_from_entries keeps the dynamic per-event column set
    * (kafka.rs:128-164 infers schema per (table, column-set)).
    * Binary values go out base64-encoded (kafka.rs:109-117) — hex-form
    * payloads ("\\x...") are decoded first. */
  private def imageJson(image: Column): Column = {
    def jsonValue(c: Column): Column = {
      val v = c.getField("value")
      when(c.getField("isBinary") && v.isNotNull,
        when(v.startsWith("\\x"), base64(unhex(v.substr(lit(3), length(v)))))
          .otherwise(base64(v.cast("binary"))))
        .otherwise(v)
    }
    when(image.isNull.or(size(image) === 0), lit(null).cast("string"))
      .otherwise(to_json(map_from_entries(
        transform(image, c => struct(c.getField("name"), jsonValue(c).as("value"))))))
  }

  /** Key = JSON of key columns taken from before (u/d) else after (c) —
    * the insert-key fallback of kafka.rs:294-344. */
  def keyJson: Column = {
    val src = when(col("op").isin("u", "d") && size(col("before")) > 0,
      col("before")).otherwise(col("after"))
    to_json(map_from_entries(
      transform(filter(src, c => array_contains(col("keyColumns"), c.getField("name"))),
        c => struct(c.getField("name"), c.getField("value")))))
  }

  /** Topic routing {prefix}.{schema}.{table} (kafka.rs:215-234). */
  def topic(prefix: String): Column =
    concat_ws(".", lit(prefix), coalesce(col("schema"), lit("public")), col("table"))

  /** The payload: {before, after, source{...}, op, ts_ms}. */
  def valueJson: Column =
    to_json(struct(
      imageJson(col("before")).as("before"),
      imageJson(col("after")).as("after"),
      struct(
        lit(connectorVersion).as("version"),
        lit(connectorName).as("connector"),
        coalesce(col("schema"), lit("public")).as("schema"),
        col("table").as("table"),
        col("txid").as("txId"),
        col("lsn").as("lsn")).as("source"),
      col("op").as("op"),
      (unix_timestamp(col("commitTs")) * 1000).as("ts_ms")))

  /** Full Kafka-ready projection. */
  def project(df: DataFrame, topicPrefix: String): DataFrame =
    df.filter(col("op").isin("c", "u", "d"))
      .select(topic(topicPrefix).as("topic"), keyJson.as("key"), valueJson.as("value"))
}
