package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Native bulk-load fast-path value conversion, as pure functions.
  *
  * Two behavioral contracts recovered from the reference:
  *
  *  - MySQL `LOAD DATA LOCAL INFILE`: rendered SQL literal values →
  *    escaped TSV bytes streamed to the server
  *    (pg2any-lib/src/destinations/mysql.rs:348-489). NULL → `\N`,
  *    true/false → 1/0, quoted strings are unquoted with their escape
  *    sequences normalized, X'..' hex literals decode to raw bytes, and
  *    tab/newline/CR/NUL/backslash bytes are TSV-escaped.
  *  - SQL Server TDS bulk load: rendered SQL literal values → typed
  *    column data (pg2any-lib/src/destinations/sqlserver.rs:326-361).
  *    Precedence: NULL, quoted string (`''` unescaped), 0x.. binary,
  *    true/false bit, i64, f64, fallback string.
  *
  * Both operate on *rendered* literals (the output of
  * `Dialect.renderValue`) — the same render-then-coerce boundary the
  * reference has, which lets its unit expectations port as goldens
  * (mysql.rs:491-599, sqlserver.rs:379-477). Wire-level execution sits
  * behind `JdbcApplier.tryBulkInsert`; on connectors without the native
  * path (e.g. embedded Derby in tests) it falls back to the generic
  * PreparedStatement batch.
  */
object BulkLoad {

  // ---------------------------------------------------------------
  // MySQL LOAD DATA TSV generation (mysql.rs:348-489)
  // ---------------------------------------------------------------

  /** The LOAD DATA statement paired with [[generateTsvBuffer]]'s bytes
    * (mysql.rs:259-264). `columns` must already be dialect-quoted. */
  def loadDataSql(table: String, columns: Seq[String]): String =
    s"LOAD DATA LOCAL INFILE 'data.tsv' INTO TABLE $table " +
      s"FIELDS TERMINATED BY '\\t' LINES TERMINATED BY '\\n' (${columns.mkString(", ")})"

  /** Rendered-literal rows → TSV bytes (mysql.rs:348-378). */
  def generateTsvBuffer(rows: Seq[Seq[String]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(rows.size * 128)
    rows.foreach { row =>
      var colIdx = 0
      row.foreach { value =>
        if (colIdx > 0) out.write('\t')
        colIdx += 1
        val trimmed = value.trim
        if (trimmed.equalsIgnoreCase("NULL")) { out.write('\\'); out.write('N') }
        else if (trimmed.equalsIgnoreCase("true")) out.write('1')
        else if (trimmed.equalsIgnoreCase("false")) out.write('0')
        else if (trimmed.length >= 2 && trimmed.startsWith("'") && trimmed.endsWith("'"))
          tsvEscapeString(trimmed.substring(1, trimmed.length - 1).getBytes(UTF_8), out)
        else if (!decodeHexInto(trimmed, out))
          tsvEscapeRaw(trimmed.getBytes(UTF_8), out)
      }
      out.write('\n')
    }
    out.toByteArray
  }

  /** X'..'/x'..' hex literal → decoded bytes, TSV-escaped, written to
    * `out`; false (nothing written) if not a valid hex literal
    * (mysql.rs:380-411). */
  private[graft] def decodeHexInto(s: String, out: ByteArrayOutputStream): Boolean = {
    if (s.length < 3) return false
    if (!(s.startsWith("X'") || s.startsWith("x'")) || !s.endsWith("'")) return false
    val hex = s.substring(2, s.length - 1)
    if (hex.length % 2 != 0 || !hex.forall(isHexDigit)) return false
    var i = 0
    while (i < hex.length) {
      tsvEscapeByte(((hexVal(hex.charAt(i)) << 4) | hexVal(hex.charAt(i + 1))).toByte, out)
      i += 2
    }
    true
  }

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else if (c >= 'a') c - 'a' + 10 else c - 'A' + 10

  /** Unquoted string-literal bytes → TSV: `''` collapses to `'`;
    * backslash escape sequences `\\ \n \t \r \0 \b \Z` pass through as
    * two bytes, a backslash before any other byte drops (the escaped
    * byte stands alone), a trailing backslash doubles; raw
    * tab/LF/CR/NUL are escaped (mysql.rs:413-462). */
  private def tsvEscapeString(bytes: Array[Byte], out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      b match {
        case '\'' =>
          if (i + 1 < bytes.length && bytes(i + 1) == '\'') i += 1
          out.write('\'')
        case '\\' =>
          if (i + 1 < bytes.length) {
            val next = bytes(i + 1)
            next match {
              case '\\' | 'n' | 't' | 'r' | '0' | 'b' | 'Z' =>
                out.write('\\'); out.write(next)
              case _ => out.write(next)
            }
            i += 1
          } else { out.write('\\'); out.write('\\') }
        case '\t' => out.write('\\'); out.write('t')
        case '\n' => out.write('\\'); out.write('n')
        case '\r' => out.write('\\'); out.write('r')
        case 0 => out.write('\\'); out.write('0')
        case _ => out.write(b)
      }
      i += 1
    }
  }

  private def tsvEscapeByte(b: Byte, out: ByteArrayOutputStream): Unit = b match {
    case '\\' => out.write('\\'); out.write('\\')
    case '\t' => out.write('\\'); out.write('t')
    case '\n' => out.write('\\'); out.write('n')
    case '\r' => out.write('\\'); out.write('r')
    case 0 => out.write('\\'); out.write('0')
    case _ => out.write(b)
  }

  private def tsvEscapeRaw(bytes: Array[Byte], out: ByteArrayOutputStream): Unit =
    bytes.foreach(tsvEscapeByte(_, out))

  // ---------------------------------------------------------------
  // SQL Server typed bulk coercion (sqlserver.rs:326-361)
  // ---------------------------------------------------------------

  sealed trait TypedValue extends Serializable
  case object SqlNull extends TypedValue
  final case class SqlString(s: String) extends TypedValue
  final case class SqlBinary(bytes: Vector[Byte]) extends TypedValue
  final case class SqlBit(b: Boolean) extends TypedValue
  final case class SqlI64(v: Long) extends TypedValue
  final case class SqlF64(v: Double) extends TypedValue

  /** Rust's `str::parse::<f64>` surface: decimal/exponent forms plus
    * inf/infinity/nan (case-insensitive, optional sign) — deliberately
    * narrower than `Double.parseDouble` (no hex floats, no `42f`). */
  private val F64Pattern =
    "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r
  private val F64Keywords = Set("inf", "infinity", "nan")

  /** One rendered literal → typed value; precedence mirrors
    * sqlserver.rs:326-361 exactly. */
  def parseSqlValue(value: String): TypedValue = {
    val t = value.trim
    if (t.equalsIgnoreCase("NULL")) return SqlNull
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      return SqlString(t.substring(1, t.length - 1).replace("''", "'"))
    decodeHex0x(t) match {
      case Some(bytes) => return SqlBinary(bytes.toVector)
      case None => ()
    }
    if (t.equalsIgnoreCase("true")) return SqlBit(true)
    if (t.equalsIgnoreCase("false")) return SqlBit(false)
    try return SqlI64(java.lang.Long.parseLong(t))
    catch { case _: NumberFormatException => () }
    val core = t.stripPrefix("+").stripPrefix("-").toLowerCase
    if (F64Keywords.contains(core))
      return SqlF64(
        if (core == "nan") Double.NaN
        else if (t.startsWith("-")) Double.NegativeInfinity
        else Double.PositiveInfinity)
    if (F64Pattern.findFirstIn(t).isDefined) {
      try return SqlF64(java.lang.Double.parseDouble(t))
      catch { case _: NumberFormatException => () }
    }
    SqlString(t)
  }

  /** 0xDEADBEEF (even-length, all hex) → bytes (sqlserver.rs:364-378). */
  def decodeHex0x(s: String): Option[Array[Byte]] = {
    if (s.length < 4 || !(s.startsWith("0x") || s.startsWith("0X"))) return None
    val hex = s.substring(2)
    if (hex.length % 2 != 0 || !hex.forall(isHexDigit)) return None
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < hex.length) {
      out(i / 2) = ((hexVal(hex.charAt(i)) << 4) | hexVal(hex.charAt(i + 1))).toByte
      i += 2
    }
    Some(out)
  }

  /** JDBC binding for a typed value — the `TokenRow` analog. */
  def bindTyped(ps: java.sql.PreparedStatement, idx: Int, v: TypedValue): Unit = v match {
    case SqlNull => ps.setNull(idx, java.sql.Types.VARCHAR)
    case SqlString(s) => ps.setString(idx, s)
    case SqlBinary(b) => ps.setBytes(idx, b.toArray)
    case SqlBit(b) => ps.setBoolean(idx, b)
    case SqlI64(l) => ps.setLong(idx, l)
    case SqlF64(d) => ps.setDouble(idx, d)
  }
}
