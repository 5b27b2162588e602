package graft

import graft.expressions.GraftFunctions
import graft.model._
import graft.operators.{ColumnTransform, ColumnTransforms, Retry, TableMapping}
import graft.streaming.GraftConfig
import org.apache.spark.sql.functions._

/** Column transforms (§2.10 made real), retry/backoff (O3), error
  * taxonomy (E6), env config (E5), native expressions. */
class OperatorsSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val ev = CdcEvent("c", 1, 1, ts, "public", "users", Nil,
    Seq(CdcColumn("id", "1"), CdcColumn("name", "alice"),
      CdcColumn("ssn", "123-45-6789"), CdcColumn("email", "A@B.COM")),
    keyColumns = Seq("id"))

  test("column transforms: rename, exclude, uppercase/static/null (config.rs:238-293)") {
    val mapping = Map("public.users" -> TableMapping(
      targetSchema = Some("cdc"),
      targetTable = Some("users_v2"),
      excludedColumns = Set("ssn"),
      transforms = Map(
        "name" -> ColumnTransform.Uppercase,
        "email" -> ColumnTransform.Lowercase)))
    val out = ColumnTransforms.apply(mapping)(ev)
    assert(out.schema == "cdc" && out.table == "users_v2")
    assert(!out.after.exists(_.name == "ssn"))
    assert(out.after.find(_.name == "name").get.value == "ALICE")
    assert(out.after.find(_.name == "email").get.value == "a@b.com")
    assert(out.after.find(_.name == "id").get.value == "1") // identity
  }

  test("column transforms: static and nullify") {
    val mapping = Map("users" -> TableMapping(transforms = Map(
      "name" -> ColumnTransform.StaticValue("REDACTED"),
      "email" -> ColumnTransform.Nullify)))
    val out = ColumnTransforms.apply(mapping)(ev)
    assert(out.after.find(_.name == "name").get.value == "REDACTED")
    assert(out.after.find(_.name == "email").get.value == null)
  }

  test("unmapped tables pass through untouched") {
    assert(ColumnTransforms.apply(Map.empty)(ev) == ev)
  }

  test("bulk-path imageColumn equals the event-level transform") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val m = TableMapping(
      excludedColumns = Set("ssn"),
      transforms = Map(
        "name" -> ColumnTransform.Uppercase,
        "email" -> ColumnTransform.Lowercase,
        "id" -> ColumnTransform.StaticValue("X")))
    // event-level (typed) result
    val expected = ColumnTransforms.apply(Map("public.users" -> m))(ev)
      .after.map(c => (c.name, c.value))
    // bulk-path (Column DSL) result over the same image
    val img = array(ev.after.map(c => struct(
      lit(c.name).as("name"), lit(c.value).as("value"),
      lit(c.isBinary).as("isBinary"))): _*)
    val got = Seq(1).toDF("x")
      .select(explode(ColumnTransforms.imageColumn(img, m)).as("c"))
      .select(col("c.name"), col("c.value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    // Fn transforms cannot codegen — rejected at plan-build time
    intercept[IllegalArgumentException] {
      ColumnTransforms.imageColumn(img,
        TableMapping(transforms = Map("name" -> ColumnTransform.Fn(identity))))
    }
  }

  test("retry: backoff schedule 2^n capped at 30 (consumer.rs:260-269)") {
    assert((0 to 6).map(Retry.backoffSeconds) == Seq(1, 2, 4, 8, 16, 32, 32).map(
      s => math.min(s, 30)))
  }

  test("retry: transient errors retried, permanent rethrown immediately (E6)") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = Retry.withRetry(maxAttempts = 4, sleep = s => slept += s) {
      calls += 1
      if (calls < 3) throw new java.net.SocketTimeoutException("transient")
      42
    }
    assert(out == 42 && calls == 3 && slept.toSeq == Seq(1, 2))

    var permCalls = 0
    assertThrows[java.sql.SQLSyntaxErrorException] {
      Retry.withRetry(maxAttempts = 4, sleep = _ => ()) {
        permCalls += 1
        throw new java.sql.SQLSyntaxErrorException("bad sql")
      }
    }
    assert(permCalls == 1)
  }

  test("error taxonomy: SQLSTATE 08xxx/40xxx transient, others permanent") {
    assert(Retry.classify(new java.sql.SQLException("conn", "08001")) == Retry.Transient)
    assert(Retry.classify(new java.sql.SQLException("deadlock", "40001")) == Retry.Transient)
    assert(Retry.classify(new java.sql.SQLException("constraint", "23505")) == Retry.Permanent)
    assert(Retry.classify(new InterruptedException) == Retry.Cancelled)
  }

  test("config env parity: schema mappings format (env.rs:180-208)") {
    assert(GraftConfig.parseSchemaMappings("public:cdc_db,sales:sales_db") ==
      Map("public" -> "cdc_db", "sales" -> "sales_db"))
    assert(GraftConfig.parseSchemaMappings("") == Map.empty)
    val c = GraftConfig.fromEnv(Map("CDC_BATCH_SIZE" -> "500",
      "CDC_SCHEMA_MAPPINGS" -> "a:b"))
    assert(c.batchSize == 500 && c.schemaMappings == Map("a" -> "b"))
    assert(c.bulkInsertThreshold == 500 && c.heartbeatSeconds == 10)
    // reference spelling (env.rs:180) also accepted
    assert(GraftConfig.fromEnv(Map("CDC_SCHEMA_MAPPING" -> "x:y"))
      .schemaMappings == Map("x" -> "y"))
  }

  test("config validation truth table (config.rs:617-663)") {
    val ok = GraftConfig()
    assert(ok.validate() == Right(ok))
    // protocol bounds
    assert(ok.copy(protocolVersion = 0).validate().isLeft)
    assert(ok.copy(protocolVersion = 5).validate().isLeft)
    (1 to 4).foreach(v => assert(ok.copy(protocolVersion = v).validate().isRight))
    // streaming ⇒ v2+
    assert(ok.copy(streaming = true, protocolVersion = 1).validate() ==
      Left("Streaming requires protocol version 2 or higher"))
    assert(ok.copy(streaming = true, protocolVersion = 2).validate().isRight)
    // two-phase ⇒ v3+
    assert(ok.copy(twoPhase = true, protocolVersion = 2).validate() ==
      Left("Two-phase commit requires protocol version 3 or higher"))
    assert(ok.copy(twoPhase = true, protocolVersion = 3).validate().isRight)
    // sizes
    assert(ok.copy(batchSize = 0).validate().isLeft)
    assert(ok.copy(segmentBytes = 0).validate().isLeft)
    // publication required
    assert(ok.copy(publication = "").validate() == Left("Publication name is required"))
  }

  test("slot-name injection guard (slot.rs:99-115)") {
    assert(GraftConfig.validateSlotName("my_slot_01").isEmpty)
    assert(GraftConfig.validateSlotName("").isDefined)
    assert(GraftConfig.validateSlotName("My_Slot").isDefined) // upper case
    assert(GraftConfig.validateSlotName("slot-1").isDefined) // dash
    assert(GraftConfig.validateSlotName("s'; DROP TABLE x--").isDefined)
    assert(GraftConfig.fromEnv(Map("CDC_REPLICATION_SLOT" -> "bad name"))
      .validate().isLeft)
  }

  test("origin filter semantics (F4, config.rs:228-236)") {
    import spark.implicits._
    import graft.streaming.{CdcPipeline, OriginFilter}
    assert(OriginFilter.parse("none") == OriginFilter.NoOrigin)
    assert(OriginFilter.parse("any") == OriginFilter.Any)
    assert(OriginFilter.parse("upstream_a") == OriginFilter.Origin("upstream_a"))
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def e(lsn: Long, origin: String) =
      CdcEvent("c", lsn, 1L, ts, "public", "t1", Nil,
        Seq(CdcColumn("id", lsn.toString)), keyColumns = Seq("id"), origin = origin)
    val df = Seq(e(1, null), e(2, "up_a"), e(3, "up_b")).toDF()
    def lsns(f: OriginFilter): Set[Long] =
      CdcPipeline.toEvents(df, f).collect().map(_.lsn).toSet
    assert(lsns(OriginFilter.Any) == Set(1L, 2L, 3L))
    assert(lsns(OriginFilter.NoOrigin) == Set(1L))
    assert(lsns(OriginFilter.Origin("up_a")) == Set(2L))
  }

  test("md5_prefix60 native expression matches the composed form") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("hello", "world", "", "日本語テスト", "a b c").toDF("s")
    val both = df.select(
      GraftFunctions.md5_prefix60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"),
      expr("md5_prefix60(s)").as("sqlform"))
    both.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"native != composed for $r")
      assert(r.getLong(0) == r.getLong(2))
    }
    // codegen: the expression must not fall back to interpreted eval
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"))
  }

  test("dot_q and hyperplane_buckets SQL surface matches the Column forms") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Seq(1L, 2L, 3L), Seq(4L, -5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("vec_probe")
    val r = spark.sql(
      "SELECT dot_q(a, b) AS d, hyperplane_buckets(a, 1069, 2, 4) AS hb FROM vec_probe")
      .collect().head
    assert(r.getLong(0) == 1L * 4 - 2 * 5 + 3 * 6)
    val viaCol = Seq((Seq(1L, 2L, 3L), Seq(4L, -5L, 6L))).toDF("a", "b")
      .select(GraftFunctions.hyperplane_buckets(col("a"), 1069L, 2, 4).as("hb"))
      .collect().head.getSeq[Long](0)
    assert(r.getSeq[Long](1) == viaCol)
    assert(viaCol.size == 2)
  }

  test("cdc_to_sql native expression: SQL surface, codegen, renderer parity") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, "alice"), (2L, "it's bob")).toDF("id", "name")
    val ev = struct(
      lit("c").as("op"), col("id").as("lsn"),
      lit("public").as("schema"), lit("t1").as("table"),
      array(struct(lit("id").as("name"), col("id").cast("string").as("value"),
          lit(false).as("isBinary")),
        struct(lit("name").as("name"), col("name").as("value"),
          lit(false).as("isBinary"))).as("after"),
      array(lit("id")).as("keyColumns"))
    val out = df.select(
      GraftFunctions.cdc_to_sql(ev, "ansi").as("col_form"),
      GraftFunctions.cdc_to_sql(ev, "mysql").as("mysql_form"))
    val rows = out.collect()
    assert(rows(0).getString(0) ==
      """INSERT INTO "public"."t1" ("id", "name") VALUES ('1', 'alice');""")
    assert(rows(1).getString(0) ==
      """INSERT INTO "public"."t1" ("id", "name") VALUES ('2', 'it''s bob');""")
    assert(rows(1).getString(1) ==
      "INSERT INTO `public`.`t1` (`id`, `name`) VALUES ('2', 'it''s bob');")
    // renderer parity: the expression and the library renderer agree
    val viaLib = graft.render.SqlRenderer.render(
      graft.render.RenderContext(graft.dialect.AnsiDialect),
      graft.model.CdcEvent("c", 1L, 0L, null, "public", "t1", Nil,
        Seq(graft.model.CdcColumn("id", "1"), graft.model.CdcColumn("name", "alice")),
        keyColumns = Seq("id"))).get
    assert(rows(0).getString(0) == viaLib)
    // non-DML renders null; SQL registration works
    df.createOrReplaceTempView("cdc_expr_probe")
    val sqlOut = spark.sql(
      """SELECT cdc_to_sql(named_struct('op', 'r'), 'ansi') AS s FROM cdc_expr_probe""")
      .collect()
    assert(sqlOut.forall(_.isNullAt(0)))
    // plan stays codegen-compatible: no object serialization boundary
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapElements"),
      plan.take(500))
  }

  test("ZOrder.layout fails fast on distributed input, works per rewrite task") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, i * 7 % 100)).toDF("a", "b")
    // misuse: a multi-partition table would be silently single-tasked by
    // the rank windows — must refuse instead
    val multi = df.repartition(8)
    val e = intercept[IllegalArgumentException] {
      graft.operators.ZOrder.layout(multi, Seq("a", "b"))
    }
    assert(e.getMessage.contains("one partition"))
    // the supported shape: one rewrite task per bucket
    val laid = graft.operators.ZOrder.layout(df.repartition(1), Seq("a", "b"))
    val rows = laid.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getInt(0)).toSet == (1 to 100).toSet)
  }
}
