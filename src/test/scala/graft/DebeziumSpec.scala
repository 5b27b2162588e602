package graft

import graft.model._
import graft.render.DebeziumEnvelope
import graft.sources.DebeziumJson
import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._

/** P11 envelope + external-capture ingestion round trip. */
class DebeziumSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def events = Seq(
    CdcEvent("c", 10, 1, ts, "public", "users", Nil,
      Seq(CdcColumn("id", "1"), CdcColumn("name", "alice")), keyColumns = Seq("id")),
    CdcEvent("u", 11, 1, ts, "public", "users",
      Seq(CdcColumn("id", "1"), CdcColumn("name", "alice")),
      Seq(CdcColumn("id", "1"), CdcColumn("name", "bob")), keyColumns = Seq("id")),
    CdcEvent("d", 12, 2, ts, "sales", "orders",
      Seq(CdcColumn("order_id", "9")), Nil, keyColumns = Seq("order_id")))

  test("topic routing {prefix}.{schema}.{table} (kafka.rs:215-234)") {
    import spark.implicits._
    val df = DebeziumEnvelope.project(events.toDF(), "pg2any")
    val topics = df.select("topic").as[String].collect().toSeq
    assert(topics == Seq("pg2any.public.users", "pg2any.public.users", "pg2any.sales.orders"))
  }

  test("key JSON uses before-image for u/d, after for c (kafka.rs:294-344)") {
    import spark.implicits._
    val df = DebeziumEnvelope.project(events.toDF(), "p")
    val keys = df.select("key").as[String].collect().toSeq
    assert(keys(0) == """{"id":"1"}""")
    assert(keys(1) == """{"id":"1"}""")
    assert(keys(2) == """{"order_id":"9"}""")
  }

  test("value payload carries op, images, source block (kafka.rs:236-292)") {
    import spark.implicits._
    val df = DebeziumEnvelope.project(events.toDF(), "p")
    val v = df.select("value").as[String].collect()
    assert(v(0).contains(""""op":"c""""))
    assert(v(0).contains(""""connector":"pg2anyspark""""))
    assert(v(0).contains(""""lsn":10"""))
    // insert has no before
    assert(v(0).contains(""""after":"{\"id\":\"1\",\"name\":\"alice\"}""""))
    assert(!v(0).contains(""""before":"{"""))
    // update carries both images
    assert(v(1).contains(""""before":"{\"id\":\"1\",\"name\":\"alice\"}""""))
    assert(v(1).contains(""""after":"{\"id\":\"1\",\"name\":\"bob\"}""""))
  }

  test("Debezium JSON round-trip: envelope → json → parsed envelope → events") {
    import spark.implicits._
    val kafkaRows = DebeziumEnvelope.project(events.toDF(), "p")
    val parsed = DebeziumJson.parse(kafkaRows, "value",
      keyColumns = Map("orders" -> Seq("order_id")))
    val back = CdcPipeline.toEvents(parsed).collect().sortBy(_.lsn)
    assert(back.length == 3)
    assert(back(0).op == "c" && back(0).table == "users" && back(0).lsn == 10)
    assert(back(0).after.map(c => c.name -> c.value).toMap ==
      Map("id" -> "1", "name" -> "alice"))
    assert(back(1).op == "u")
    assert(back(1).before.map(_.value).nonEmpty)
    assert(back(2).op == "d" && back(2).keyColumns == Seq("order_id"))
    assert(back(2).before.map(c => c.name -> c.value).toMap == Map("order_id" -> "9"))
  }

  test("binary image values go out base64 (kafka.rs:109-117)") {
    import spark.implicits._
    val e = CdcEvent("c", 20, 3, ts, "public", "blobs", Nil,
      Seq(CdcColumn("id", "1"), CdcColumn("payload", "\\xdeadbeef", isBinary = true)),
      keyColumns = Seq("id"))
    val v = DebeziumEnvelope.project(Seq(e).toDF(), "p")
      .select("value").as[String].first()
    val b64 = java.util.Base64.getEncoder.encodeToString(
      Array(0xde, 0xad, 0xbe, 0xef).map(_.toByte))
    // the image is a JSON string inside the payload JSON → escaped quotes
    assert(v.contains(s"""\\"payload\\":\\"$b64\\""""), v)
    assert(v.contains("""\"id\":\"1\""""))
  }

  test("whole-stage codegen covers the envelope projection (no UDFs)") {
    import spark.implicits._
    val plan = DebeziumEnvelope.project(events.toDF(), "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
