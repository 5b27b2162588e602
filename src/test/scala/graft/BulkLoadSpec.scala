package graft

import graft.sinks.BulkLoad
import graft.sinks.BulkLoad._
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.sql.DriverManager

/** Golden tests for the native bulk-load fast-path conversions, ported
  * from the reference's own unit expectations (mysql.rs:491-599 TSV
  * generation, sqlserver.rs:379-477 typed value coercion), plus a
  * Derby-executed check that typed binding round-trips through JDBC. */
class BulkLoadSpec extends AnyFunSuite {

  private def tsvString(rows: Seq[Seq[String]]): String =
    new String(generateTsvBuffer(rows), "UTF-8")

  // --- MySQL TSV generation (mysql.rs:504-599) ---

  test("tsv generation basic: quoted strings, NULL marker, bare values") {
    val rows = Seq(Seq("1", "'hello'", "NULL"), Seq("2", "'world'", "42"))
    assert(tsvString(rows) == "1\thello\t\\N\n2\tworld\t42\n")
  }

  test("tsv generation unescapes doubled quotes") {
    assert(tsvString(Seq(Seq("3", "'it''s escaped'"))).contains("it's escaped"))
  }

  test("tsv null handling alongside values") {
    val out = tsvString(Seq(Seq("1", "NULL", "'text'"), Seq("2", "'value'", "NULL")))
    assert(out.contains("\\N") && out.contains("text") && out.contains("value"))
  }

  test("tsv special characters: escape sequences pass through") {
    val rows = Seq(
      Seq("1", "'hello\\tworld'"),
      Seq("2", "'line1\\nline2'"),
      Seq("3", "'back\\\\slash'"))
    val lines = tsvString(rows).split("\n")
    assert(lines(0) == "1\thello\\tworld")
    assert(lines(1) == "2\tline1\\nline2")
    assert(lines(2) == "3\tback\\\\slash")
  }

  test("tsv hex literal decodes to raw bytes") {
    val tsv = generateTsvBuffer(Seq(Seq("1", "X'deadbeef'", "'text'")))
    assert(tsv.toSeq == "1\t".getBytes.toSeq ++
      Seq(0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte) ++
      "\ttext\n".getBytes.toSeq)
  }

  test("tsv hex literal lowercase form") {
    val tsv = generateTsvBuffer(Seq(Seq("1", "x'cafe'")))
    assert(tsv.toSeq == "1\t".getBytes.toSeq ++
      Seq(0xca.toByte, 0xfe.toByte) ++ Seq('\n'.toByte))
  }

  test("tsv hex literal with special bytes gets TSV-escaped") {
    val tsv = generateTsvBuffer(Seq(Seq("1", "X'090a5c00'")))
    assert(new String(tsv, "UTF-8") == "1\t\\t\\n\\\\\\0\n")
  }

  test("invalid hex literals are rejected without output") {
    val out = new ByteArrayOutputStream()
    assert(!BulkLoad.decodeHexInto("hello", out))
    assert(!BulkLoad.decodeHexInto("X'zz'", out))
    assert(!BulkLoad.decodeHexInto("X'abc'", out)) // odd length
    assert(!BulkLoad.decodeHexInto("0xdead", out)) // wrong prefix family
    assert(out.size() == 0)
  }

  test("tsv combined row: hex, NULL, tab-bearing string, bare number") {
    val tsv = generateTsvBuffer(Seq(Seq("X'48656C6C6F'", "NULL", "'a\tb'", "42")))
    assert(new String(tsv, "UTF-8") == "Hello\t\\N\ta\\tb\t42\n")
  }

  test("load data statement shape") {
    assert(loadDataSql("`public`.`t1`", Seq("`id`", "`val`")) ==
      "LOAD DATA LOCAL INFILE 'data.tsv' INTO TABLE `public`.`t1` " +
        "FIELDS TERMINATED BY '\\t' LINES TERMINATED BY '\\n' (`id`, `val`)")
  }

  // --- SQL Server typed coercion (sqlserver.rs:384-477) ---

  test("parse NULL → typed null") { assert(parseSqlValue("NULL") == SqlNull) }

  test("parse integers") {
    assert(parseSqlValue("42") == SqlI64(42))
    assert(parseSqlValue("-123") == SqlI64(-123))
  }

  test("parse float") { assert(parseSqlValue("3.14") == SqlF64(3.14)) }

  test("parse quoted strings with escape") {
    assert(parseSqlValue("'hello world'") == SqlString("hello world"))
    assert(parseSqlValue("'it''s escaped'") == SqlString("it's escaped"))
  }

  test("parse unquoted non-numeric falls back to string") {
    assert(parseSqlValue("some_value") == SqlString("some_value"))
  }

  test("parse hex binary both cases") {
    assert(parseSqlValue("0xDEADBEEF") ==
      SqlBinary(Vector(0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte)))
    assert(parseSqlValue("0xcafe") == SqlBinary(Vector(0xCA.toByte, 0xFE.toByte)))
  }

  test("parse booleans") {
    assert(parseSqlValue("true") == SqlBit(true))
    assert(parseSqlValue("false") == SqlBit(false))
  }

  test("decode_hex_0x rejects invalid forms") {
    assert(decodeHex0x("hello").isEmpty)
    assert(decodeHex0x("0x").isEmpty)
    assert(decodeHex0x("0xZZ").isEmpty)
    assert(decodeHex0x("0xABC").isEmpty) // odd length
  }

  test("i64 overflow falls to f64, Rust-parse-shaped doubles only") {
    assert(parseSqlValue("9223372036854775808") == SqlF64(9.223372036854776e18))
    assert(parseSqlValue("1e3") == SqlF64(1000.0))
    // parseDouble would accept these; Rust's f64 parse does not
    assert(parseSqlValue("42f") == SqlString("42f"))
    assert(parseSqlValue("0x1p3") == SqlString("0x1p3"))
  }

  // --- typed binding executes against a real JDBC engine ---

  test("typed binding round-trips through Derby") {
    val dir = Files.createTempDirectory("graft-bulk-derby").toFile.getAbsolutePath
    val c = DriverManager.getConnection(s"jdbc:derby:$dir/bulk;create=true")
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE typed_t (i BIGINT, f DOUBLE, s VARCHAR(64), " +
        "b BOOLEAN, bin BLOB, n VARCHAR(8))")
      st.close()
      val ps = c.prepareStatement("INSERT INTO typed_t VALUES (?, ?, ?, ?, ?, ?)")
      bindTyped(ps, 1, parseSqlValue("42"))
      bindTyped(ps, 2, parseSqlValue("3.5"))
      bindTyped(ps, 3, parseSqlValue("'it''s'"))
      bindTyped(ps, 4, parseSqlValue("true"))
      bindTyped(ps, 5, parseSqlValue("0xdead"))
      bindTyped(ps, 6, parseSqlValue("NULL"))
      ps.executeUpdate()
      ps.close()
      val rs = c.createStatement().executeQuery("SELECT * FROM typed_t")
      assert(rs.next())
      assert(rs.getLong(1) == 42L)
      assert(rs.getDouble(2) == 3.5)
      assert(rs.getString(3) == "it's")
      assert(rs.getBoolean(4))
      assert(rs.getBytes(5).toSeq == Seq(0xde.toByte, 0xad.toByte))
      rs.getString(6)
      assert(rs.wasNull())
    } finally c.close()
  }
}
