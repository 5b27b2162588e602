package graft

import graft.dialect._
import graft.model.CdcColumn
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("identifier quoting per dialect (dialects/*.rs goldens)") {
    assert(MySqlDialect.quoteIdentifier("col") == "`col`")
    assert(MySqlDialect.quoteIdentifier("we`ird") == "`we``ird`")
    assert(AnsiDialect.quoteIdentifier("col") == "\"col\"")
    assert(AnsiDialect.quoteIdentifier("we\"ird") == "\"we\"\"ird\"")
    assert(SqlServerDialect.quoteIdentifier("col") == "[col]")
    assert(SqlServerDialect.quoteIdentifier("we]ird") == "[we]]ird]")
    assert(SqliteDialect.quoteIdentifier("col") == "\"col\"")
  }

  test("qualified table names; SQLite/Kafka drop the schema (sqlite.rs:13-16)") {
    assert(MySqlDialect.qualifyTable("public", "t1") == "`public`.`t1`")
    assert(SqlServerDialect.qualifyTable("dbo", "t1") == "[dbo].[t1]")
    assert(AnsiDialect.qualifyTable(null, "t1") == "\"t1\"")
    assert(SqliteDialect.qualifyTable("public", "t1") == "\"t1\"")
    assert(KafkaDialect.qualifyTable("public", "t1") == "\"t1\"")
  }

  test("NULL / bool / text literal rendering (ansi.rs:41-73)") {
    val d = AnsiDialect
    assert(d.renderValue(CdcColumn("c", null)) == "NULL")
    assert(d.renderValue(CdcColumn("c", "t")) == "1")
    assert(d.renderValue(CdcColumn("c", "f")) == "0")
    assert(d.renderValue(CdcColumn("c", "hello")) == "'hello'")
    assert(d.renderValue(CdcColumn("c", "it's")) == "'it''s'")
  }

  test("MySQL backslash escaping (mysql.rs:50-63)") {
    assert(MySqlDialect.renderValue(CdcColumn("c", """a\b""")) == """'a\\b'""")
    assert(MySqlDialect.renderValue(CdcColumn("c", """it's a\""")) == """'it''s a\\'""")
    // ANSI does NOT backslash-escape
    assert(AnsiDialect.renderValue(CdcColumn("c", """a\b""")) == """'a\b'""")
  }

  test("binary hex forms: lowercase X'..' vs 0x.. (dialect.rs:74-81, sqlserver.rs:30-33)") {
    val bin = CdcColumn("c", "\\xdeadBEEF", isBinary = true)
    assert(AnsiDialect.renderValue(bin) == "X'deadbeef'")
    assert(MySqlDialect.renderValue(bin) == "X'deadbeef'")
    assert(SqliteDialect.renderValue(bin) == "X'deadbeef'")
    assert(KafkaDialect.renderValue(bin) == "X'deadbeef'")
    assert(SqlServerDialect.renderValue(bin) == "0xdeadbeef")
  }

  test("truncate forms (sqlite.rs:26-33, kafka.rs:25-27)") {
    assert(AnsiDialect.truncateSql("\"t\"").contains("TRUNCATE TABLE \"t\";"))
    assert(SqliteDialect.truncateSql("\"t\"").contains("DELETE FROM \"t\";"))
    assert(KafkaDialect.truncateSql("\"t\"").isEmpty)
  }

  test("property: quoting never leaves a lone quote char inside") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val q = MySqlDialect.quoteIdentifier(s)
      val interior = q.substring(1, q.length - 1)
      q.head == '`' && q.last == '`' &&
        !interior.replace("``", "").contains('`')
    })
  }

  test("property: rendered text literal never contains an unescaped quote") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val r = AnsiDialect.renderValue(CdcColumn("c", s))
      if (s == "t" || s == "f") r == "1" || r == "0"
      else r.head == '\'' && r.last == '\'' &&
        !r.substring(1, r.length - 1).replace("''", "").contains('\'')
    })
  }
}
