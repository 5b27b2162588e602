package graft.model

import org.apache.spark.sql.types._

/** Core CDC data model.
  *
  * Re-expresses the reference's change-event envelope
  * (pg2any-lib/src/types.rs:4, producer.rs:139-342) as a Spark-friendly
  * case-class + StructType pair. Values are type-erased text/binary/null,
  * exactly as PostgreSQL logical decoding delivers them
  * (pg2any-lib/src/destinations/dialects/ansi.rs:41-73).
  */
object Op {
  val Insert = "c"
  val Update = "u"
  val Delete = "d"
  val Truncate = "t"
  /** Ops that produce destination statements (reference F1 filter,
    * pg2any-lib/src/sql_renderer.rs:124-128). */
  val dml: Seq[String] = Seq(Insert, Update, Delete, Truncate)
}

/** Which columns identify a row for UPDATE/DELETE
  * (pg2any-lib/src/sql_renderer.rs:331-375). */
object ReplicaIdentity {
  val Default = "DEFAULT"
  val Index = "INDEX"
  val Full = "FULL"
  val Nothing = "NOTHING"
}

/** PostgreSQL XLogRecPtr position, formatted "X/Y"
  * (pg2any-lib/src/lib.rs:103-106). */
final case class Lsn(value: Long) extends AnyVal with Ordered[Lsn] {
  def compare(that: Lsn): Int = java.lang.Long.compareUnsigned(value, that.value)
  override def toString: String =
    f"${(value >>> 32).toHexString.toUpperCase}%s/${(value & 0xffffffffL).toHexString.toUpperCase}%s"
}

object Lsn {
  def parse(s: String): Lsn = {
    val Array(hi, lo) = s.split("/", 2)
    Lsn((java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16))
  }
}

/** One (columnName, value) pair. `value == null` means SQL NULL; `isBinary`
  * selects hex/base64 rendering. Order within a row is preserved — the
  * reference generates INSERT column lists by iteration order
  * (pg2any-lib/src/sql_renderer.rs:161-173). */
final case class CdcColumn(name: String, value: String, isBinary: Boolean = false)

/** A single change event — the "row" of the engine. `origin` is the
  * replication origin that produced the change (null = locally
  * originated) — the F4 filter's discriminator (config.rs:228-236). */
final case class CdcEvent(
    op: String,
    lsn: Long,
    txid: Long,
    commitTs: java.sql.Timestamp,
    schema: String,
    table: String,
    before: Seq[CdcColumn],
    after: Seq[CdcColumn],
    replicaIdentity: String = ReplicaIdentity.Default,
    keyColumns: Seq[String] = Seq.empty,
    truncateTables: Seq[String] = Seq.empty,
    isFinalBatch: Boolean = true,
    origin: String = null) {

  def get(cols: Seq[CdcColumn], name: String): Option[CdcColumn] =
    cols.find(_.name == name)
}

/** A sealed transaction: ordered events sharing a commit
  * (pg2any-lib/src/types.rs:51-71). */
final case class CdcTransaction(
    txid: Long,
    commitLsn: Long,
    commitTs: java.sql.Timestamp,
    events: Seq[CdcEvent],
    isFinalBatch: Boolean = true)

object CdcSchema {
  val columnType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("isBinary", BooleanType, nullable = false)))

  /** Envelope StructType — the streaming DataFrame row shape. */
  val envelope: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("txid", LongType, nullable = false),
    StructField("commitTs", TimestampType, nullable = true),
    StructField("schema", StringType, nullable = true),
    StructField("table", StringType, nullable = true),
    StructField("before", ArrayType(columnType), nullable = true),
    StructField("after", ArrayType(columnType), nullable = true),
    StructField("replicaIdentity", StringType, nullable = false),
    StructField("keyColumns", ArrayType(StringType), nullable = true),
    StructField("truncateTables", ArrayType(StringType), nullable = true),
    StructField("isFinalBatch", BooleanType, nullable = false),
    StructField("origin", StringType, nullable = true)))
}
