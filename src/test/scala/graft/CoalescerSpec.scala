package graft

import graft.coalesce._
import graft.dialect._
import org.scalatest.funsuite.AnyFunSuite

class CoalescerSpec extends AnyFunSuite {

  private val cfg = CoalesceConfig()

  private def ins(id: Int, name: String) =
    InsertRow("`t1`", Seq("`id`", "`name`"), Seq(id.toString, s"'$name'"))

  test("A1: consecutive same-shape INSERTs merge to one multi-VALUES") {
    val out = Coalescer.coalesce(Seq(ins(1, "a"), ins(2, "b"), ins(3, "c")), MySqlDialect, cfg)
    assert(out == Seq(
      "INSERT INTO `t1` (`id`, `name`) VALUES (1, 'a'), (2, 'b'), (3, 'c');"))
  }

  test("A1: shape change cuts the run (order-preserving run-length semantics)") {
    val other = InsertRow("`t2`", Seq("`id`"), Seq("9"))
    val out = Coalescer.coalesce(Seq(ins(1, "a"), other, ins(2, "b")), MySqlDialect, cfg)
    assert(out.size == 3)
    assert(out(1) == "INSERT INTO `t2` (`id`) VALUES (9);")
  }

  test("A7: row cap chunks (SQL Server 1000-row cap)") {
    val rows = (1 to 2500).map(i => ins(i, s"n$i"))
    val out = Coalescer.coalesce(rows, SqlServerDialect, cfg)
    assert(out.size == 3)
    assert(out.forall(_.startsWith("INSERT INTO `t1`")))
    // 1000 + 1000 + 500 value tuples
    assert(out.map(s => s.sliding(8).count(_ == "), (".padTo(8, ' ').take(8))).sum >= 0)
    val counts = out.map(_.split("\\), \\(").length)
    assert(counts == Seq(1000, 1000, 500))
  }

  test("A7: byte cap chunks") {
    val small = cfg.copy(maxStatementBytes = 120)
    val rows = (1 to 10).map(i => ins(i, "x" * 20))
    val out = Coalescer.coalesce(rows, MySqlDialect, small)
    assert(out.size > 1)
    assert(out.forall(_.length <= 140)) // prefix + one row may overflow slightly
  }

  test("key-mutating updates (SET∩KEY≠∅) never merge — sequential-exact") {
    // `SET id=… WHERE id=…` can move a row into a later statement's WHERE;
    // no combined statement (CASE-WHEN included, which evaluates against the
    // pre-statement snapshot) reproduces sequential apply. Emit one-per-event.
    val u1 = UpdateRow("`t1`", Seq("`id`", "`v`"), Seq("10", "'a'"), Seq("`id`" -> Some("1")))
    val u2 = UpdateRow("`t1`", Seq("`id`", "`v`"), Seq("20", "'b'"), Seq("`id`" -> Some("2")))
    val out = Coalescer.coalesce(Seq(u1, u2), MySqlDialect, cfg)
    assert(out == Seq(
      "UPDATE `t1` SET `id` = 10, `v` = 'a' WHERE `id` = 1;",
      "UPDATE `t1` SET `id` = 20, `v` = 'b' WHERE `id` = 2;"))
  }

  test("A2: CASE-WHEN update when the dialect lacks UPDATE-JOIN") {
    import graft.dialect.AnsiDialect
    val u1 = UpdateRow("\"t1\"", Seq("\"v\""), Seq("'a'"), Seq("\"id\"" -> Some("1")))
    val u2 = UpdateRow("\"t1\"", Seq("\"v\""), Seq("'b'"), Seq("\"id\"" -> Some("2")))
    val out = Coalescer.coalesce(Seq(u1, u2), AnsiDialect, cfg)
    assert(out.size == 1)
    val sql = out.head
    assert(sql.startsWith(
      "UPDATE \"t1\" SET \"v\" = CASE WHEN \"id\" = 1 THEN 'a' WHEN \"id\" = 2 THEN 'b' ELSE \"v\" END"))
    assert(sql.endsWith("WHERE (\"id\" = 1) OR (\"id\" = 2);"))
  }

  test("UPDATE/DELETE runs are chunked by maxStatementBytes (coalescing.rs:1010-1062)") {
    val small = CoalesceConfig(maxStatementBytes = 120)
    val ups = (1 to 40).map(i =>
      UpdateRow("`t`", Seq("`v`"), Seq(s"'val$i'"), Seq("`id`" -> Some(i.toString))))
    val upOut = Coalescer.coalesce(ups, MySqlDialect, small)
    assert(upOut.size > 1, "update run must split under the byte cap")
    assert(upOut.forall(_.length < 4 * 120), "no unbounded UPDATE statement")
    val dels = (1 to 40).map(i => DeleteRow("`t`", Seq("`id`" -> Some(i.toString))))
    val delOut = Coalescer.coalesce(dels, MySqlDialect, small)
    assert(delOut.size > 1, "delete run must split under the byte cap")
    assert(delOut.forall(_.length <= 2 * 120), "no unbounded DELETE statement")
    // and chunked apply is still last-wins-equivalent: all ids covered once
    assert(delOut.mkString(" ").split("`id` = ").length == 41)
  }

  test("A3: VALUES-JOIN rewrite when WHERE is pure key equality (MySQL shape)") {
    val u1 = UpdateRow("`t1`", Seq("`v`"), Seq("'a'"), Seq("`id`" -> Some("1")))
    val u2 = UpdateRow("`t1`", Seq("`v`"), Seq("'b'"), Seq("`id`" -> Some("2")))
    val out = Coalescer.coalesce(Seq(u1, u2), MySqlDialect, cfg)
    assert(out == Seq(
      "UPDATE `t1` AS t JOIN (SELECT 1 AS k0, 'a' AS s0 UNION ALL SELECT 2, 'b') AS src " +
        "ON t.`id` = src.k0 SET t.`v` = src.s0;"))
  }

  test("A3: SQL Server and SQLite UPDATE-FROM shapes") {
    val u1 = UpdateRow("[t1]", Seq("[v]"), Seq("'a'"), Seq("[id]" -> Some("1")))
    val u2 = UpdateRow("[t1]", Seq("[v]"), Seq("'b'"), Seq("[id]" -> Some("2")))
    val ss = Coalescer.coalesce(Seq(u1, u2), SqlServerDialect, cfg).head
    assert(ss == "UPDATE t SET t.[v] = src.s0 FROM [t1] AS t JOIN " +
      "(SELECT 1 AS k0, 'a' AS s0 UNION ALL SELECT 2, 'b') AS src ON t.[id] = src.k0;")
    val v1 = UpdateRow("\"t1\"", Seq("\"v\""), Seq("'a'"), Seq("\"id\"" -> Some("1")))
    val v2 = UpdateRow("\"t1\"", Seq("\"v\""), Seq("'b'"), Seq("\"id\"" -> Some("2")))
    val sl = Coalescer.coalesce(Seq(v1, v2), SqliteDialect, cfg).head
    assert(sl == "UPDATE \"t1\" AS t SET \"v\" = src.s0 FROM " +
      "(SELECT 1 AS k0, 'a' AS s0 UNION ALL SELECT 2, 'b') AS src WHERE t.\"id\" = src.k0;")
  }

  test("A3 precondition: NULL key value falls back to CASE-WHEN") {
    val u1 = UpdateRow("`t1`", Seq("`v`"), Seq("'a'"), Seq("`id`" -> Some("1")))
    val u2 = UpdateRow("`t1`", Seq("`v`"), Seq("'b'"), Seq("`id`" -> None))
    val out = Coalescer.coalesce(Seq(u1, u2), MySqlDialect, cfg)
    assert(out.head.contains("CASE WHEN"))
    assert(out.head.contains("`id` IS NULL"))
  }

  test("A4: consecutive DELETEs OR-combine") {
    val d1 = DeleteRow("`t1`", Seq("`id`" -> Some("1")))
    val d2 = DeleteRow("`t1`", Seq("`id`" -> Some("2")))
    val d3 = DeleteRow("`t1`", Seq("`id`" -> Some("3")))
    val out = Coalescer.coalesce(Seq(d1, d2, d3), MySqlDialect, cfg)
    assert(out == Seq(
      "DELETE FROM `t1` WHERE (`id` = 1) OR (`id` = 2) OR (`id` = 3);"))
  }

  test("single statements pass through unwrapped") {
    val u = UpdateRow("`t1`", Seq("`v`"), Seq("'a'"), Seq("`id`" -> Some("1")))
    val d = DeleteRow("`t1`", Seq("`id`" -> Some("1")))
    assert(Coalescer.coalesce(Seq(u), MySqlDialect, cfg) ==
      Seq("UPDATE `t1` SET `v` = 'a' WHERE `id` = 1;"))
    assert(Coalescer.coalesce(Seq(d), MySqlDialect, cfg) ==
      Seq("DELETE FROM `t1` WHERE `id` = 1;"))
  }

  test("A6: bulk detection requires homogeneous run over threshold (bulk_insert.rs:25-61)") {
    val rows: Seq[DmlStmt] = (1 to 600).map(i => ins(i, "x"))
    val det = Coalescer.detectBulkInsert(rows, 500)
    assert(det.isDefined)
    assert(det.get._3.size == 600)
    assert(Coalescer.detectBulkInsert(rows.take(100), 500).isEmpty)
    val mixed = rows.take(550) :+ DeleteRow("`t1`", Seq("`id`" -> Some("1")))
    assert(Coalescer.detectBulkInsert(mixed, 500).isEmpty)
  }

  test("packet bound: 80% with 1KB floor (coalescing.rs:925-929)") {
    assert(CoalesceConfig.packetBound(1000) == 1024)
    assert(CoalesceConfig.packetBound(10 * 1024 * 1024) == 8 * 1024 * 1024)
  }

  test("RawSql passes through in order") {
    val out = Coalescer.coalesce(
      Seq(ins(1, "a"), RawSql("`t1`", "TRUNCATE TABLE `t1`;"), ins(2, "b")),
      MySqlDialect, cfg)
    assert(out == Seq(
      "INSERT INTO `t1` (`id`, `name`) VALUES (1, 'a');",
      "TRUNCATE TABLE `t1`;",
      "INSERT INTO `t1` (`id`, `name`) VALUES (2, 'b');"))
  }
}
