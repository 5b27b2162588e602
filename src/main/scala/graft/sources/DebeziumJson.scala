package graft.sources

import graft.model.CdcSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-capture ingestion path (SURVEY §7.1 source alternative
  * sanctioned by BASELINE.json): consume Debezium-format JSON (e.g. from
  * the built-in kafka source's `value` column) and normalize it into the
  * graft CDC envelope. The pgoutput decode itself stays external — this
  * is the boundary where someone running Debezium/pg2any-Kafka today
  * plugs into this engine.
  */
object DebeziumJson {

  /** Debezium payload schema (the subset the reference emits,
    * kafka.rs:236-292). before/after are kept as raw JSON to stay
    * schema-fluid per table. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", StructType(Seq(
      StructField("version", StringType),
      StructField("connector", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("txId", LongType),
      StructField("lsn", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("payload", payloadSchema)))

  /** JSON object string → ordered (name,value,isBinary) array matching
    * CdcSchema.columnType. JSON objects lose declared column order, so
    * entries are sorted by name for determinism. */
  private def jsonToImage(j: Column): Column =
    when(j.isNull, lit(null).cast(ArrayType(CdcSchema.columnType)))
      .otherwise(array_sort(transform(
        map_entries(from_json(j, MapType(StringType, StringType))),
        e => struct(e.getField("key").as("name"), e.getField("value").as("value"),
          lit(false).as("isBinary")))))

  /** Parse a DataFrame bearing Debezium JSON in `jsonCol` into the graft
    * CDC envelope. `keyCols` supplies key columns per table (Debezium
    * carries them in the message key / schema registry; here a static
    * map option, default "id"). */
  def parse(df: DataFrame, jsonCol: String = "value",
            keyColumns: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val keyMapCol: Column = {
      val entries = keyColumns.toSeq.flatMap { case (t, ks) =>
        Seq(lit(t), array(ks.map(lit(_)): _*))
      }
      if (entries.isEmpty) map() else map(entries: _*)
    }
    // accept both the schemas.enable=true wrapper {"schema":…,"payload":…}
    // and a bare payload object (schemas disabled — what our own envelope
    // emits)
    val wrapped = from_json(col(jsonCol), envelopeSchema).getField("payload")
    val bare = from_json(col(jsonCol), payloadSchema)
    val p = when(wrapped.isNotNull.and(wrapped.getField("op").isNotNull), wrapped)
      .otherwise(bare)
    df.select(
      p.getField("op").as("op"),
      p.getField("source").getField("lsn").as("lsn"),
      p.getField("source").getField("txId").as("txid"),
      timestamp_millis(p.getField("ts_ms")).as("commitTs"),
      p.getField("source").getField("schema").as("schema"),
      p.getField("source").getField("table").as("table"),
      jsonToImage(p.getField("before")).as("before"),
      jsonToImage(p.getField("after")).as("after"),
      lit("DEFAULT").as("replicaIdentity"),
      coalesce(element_at(keyMapCol, p.getField("source").getField("table")),
        array(lit("id"))).as("keyColumns"),
      lit(null).cast(ArrayType(StringType)).as("truncateTables"),
      lit(true).as("isFinalBatch"))
  }
}
