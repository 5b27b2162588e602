package graft

import graft.dialect._
import graft.model._
import graft.render._
import org.scalatest.funsuite.AnyFunSuite

class RendererSpec extends AnyFunSuite {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def insertEvent = CdcEvent(
    Op.Insert, lsn = 100L, txid = 1L, commitTs = ts,
    schema = "public", table = "users",
    before = Seq.empty,
    after = Seq(CdcColumn("id", "1"), CdcColumn("name", "alice")),
    keyColumns = Seq("id"))

  private def updateEvent = CdcEvent(
    Op.Update, lsn = 101L, txid = 1L, commitTs = ts,
    schema = "public", table = "users",
    before = Seq(CdcColumn("id", "1"), CdcColumn("name", "alice")),
    after = Seq(CdcColumn("id", "1"), CdcColumn("name", "bob")),
    keyColumns = Seq("id"))

  test("INSERT rendering, ordered columns (sql_renderer.rs:148-177)") {
    val ctx = RenderContext(MySqlDialect)
    assert(SqlRenderer.render(ctx, insertEvent).get ==
      "INSERT INTO `public`.`users` (`id`, `name`) VALUES ('1', 'alice');")
  }

  test("UPDATE uses old_data for WHERE (where_clause_fix_tests.rs regression)") {
    val ctx = RenderContext(AnsiDialect)
    // before has name=alice; WHERE must key on before's id, SET on after
    assert(SqlRenderer.render(ctx, updateEvent).get ==
      """UPDATE "public"."users" SET "id" = '1', "name" = 'bob' WHERE "id" = '1';""")
  }

  test("DELETE with Default identity keys from before (sql_renderer.rs:263-289)") {
    val ctx = RenderContext(SqlServerDialect)
    val e = updateEvent.copy(op = Op.Delete, after = Seq.empty)
    assert(SqlRenderer.render(ctx, e).get ==
      "DELETE FROM [public].[users] WHERE [id] = '1';")
  }

  test("replica identity FULL: all columns, IS NULL for nulls (sql_renderer.rs:347-369)") {
    val e = updateEvent.copy(
      op = Op.Delete, after = Seq.empty,
      replicaIdentity = ReplicaIdentity.Full,
      before = Seq(CdcColumn("id", "1"), CdcColumn("note", null)))
    val ctx = RenderContext(AnsiDialect)
    assert(SqlRenderer.render(ctx, e).get ==
      """DELETE FROM "public"."users" WHERE "id" = '1' AND "note" IS NULL;""")
  }

  test("replica identity NOTHING hard-fails (sql_renderer.rs:370-374)") {
    val e = updateEvent.copy(replicaIdentity = ReplicaIdentity.Nothing)
    assertThrows[RenderException] {
      SqlRenderer.render(RenderContext(AnsiDialect), e)
    }
  }

  test("missing key columns hard-fails") {
    val e = updateEvent.copy(keyColumns = Seq("nope"))
    assertThrows[RenderException] {
      SqlRenderer.render(RenderContext(AnsiDialect), e)
    }
  }

  test("TRUNCATE: multi-table → one statement per table (JDBC rejects multi-statement strings)") {
    val e = CdcEvent(Op.Truncate, 1L, 1L, ts, "public", "t1",
      Seq.empty, Seq.empty, truncateTables = Seq("public.t1", "public.t2"))
    assert(SqlRenderer.renderStatements(RenderContext(MySqlDialect), e) ==
      Seq("TRUNCATE TABLE `public`.`t1`;", "TRUNCATE TABLE `public`.`t2`;"))
    assert(SqlRenderer.renderStatements(RenderContext(SqliteDialect), e) ==
      Seq("DELETE FROM \"t1\";", "DELETE FROM \"t2\";"))
    assert(SqlRenderer.renderStatements(RenderContext(KafkaDialect), e).isEmpty)
    // and the coalescer path emits one RawSql per table
    import graft.operators.EventToStmt
    assert(EventToStmt.toStmts(RenderContext(MySqlDialect), e).size == 2)
  }

  test("schema mapping: config rename, null→public (sql_renderer.rs:28-37)") {
    val ctx = RenderContext(AnsiDialect, Map("public" -> "cdc_db"))
    assert(SqlRenderer.render(ctx, insertEvent).get.startsWith(
      """INSERT INTO "cdc_db"."users""""))
    val noSchema = insertEvent.copy(schema = null)
    assert(SqlRenderer.render(ctx, noSchema).get.startsWith(
      """INSERT INTO "cdc_db"."users""""))
  }

  test("non-DML events render to nothing (F1, sql_renderer.rs:124-128)") {
    val e = insertEvent.copy(op = "begin")
    assert(SqlRenderer.render(RenderContext(AnsiDialect), e).isEmpty)
  }

  test("bool rewrite flows through full statements") {
    val e = insertEvent.copy(after = Seq(CdcColumn("id", "2"), CdcColumn("active", "t")))
    assert(SqlRenderer.render(RenderContext(MySqlDialect), e).get ==
      "INSERT INTO `public`.`users` (`id`, `active`) VALUES ('2', 1);")
  }

  test("Lsn format/parse round-trip (lib.rs:103-106)") {
    val l = Lsn((0x16L << 32) | 0xB374D848L)
    assert(l.toString == "16/B374D848")
    assert(Lsn.parse("16/B374D848") == l)
    assert(Lsn.parse("0/0").value == 0L)
  }
}
