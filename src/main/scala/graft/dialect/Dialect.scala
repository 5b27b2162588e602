package graft.dialect

import graft.model.CdcColumn

/** Destination SQL dialect: identifier quoting + value literal rendering.
  *
  * Behavioral contract recovered from the reference's dialect trait and its
  * five implementations (pg2any-lib/src/destinations/dialect.rs:50-69,
  * dialects/{ansi,mysql,sqlserver,sqlite,kafka}.rs). Byte-identical output is
  * the correctness bar — the golden tests mirror the reference's own unit
  * expectations.
  */
sealed trait Dialect extends Serializable {
  def name: String

  /** Quote one identifier part (pg2any-lib/src/destinations/dialects). */
  def quoteIdentifier(ident: String): String

  /** schema-qualified table name; `schema == null` → bare table. */
  def qualifyTable(schema: String, table: String): String =
    if (schema == null || schema.isEmpty) quoteIdentifier(table)
    else s"${quoteIdentifier(schema)}.${quoteIdentifier(table)}"

  /** Hex literal for binary payloads: X'...' (ANSI/MySQL/SQLite/Kafka)
    * vs 0x... (SQL Server); lowercase digits match the reference's
    * push_hex_ascii (dialect.rs:74-81, ansi.rs:35-39, sqlserver.rs:30-33). */
  def renderHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2 + 3)
    sb.append("X'")
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.append('\'')
    sb.toString
  }

  /** Escape the inside of a single-quoted string literal: '' doubling;
    * MySQL additionally backslash-escapes (dialects/mysql.rs:50-63). */
  protected def escapeString(s: String): String = s.replace("'", "''")

  /** Render one value literal.
    * null → NULL; "t"/"f" → 1/0 (PG bool); binary → hex; else quoted text
    * (dialects/ansi.rs:41-73). */
  def renderValue(col: CdcColumn): String =
    if (col.value == null) "NULL"
    else if (col.isBinary) renderHex(hexOrUtf8Bytes(col.value))
    else col.value match {
      case "t" => "1"
      case "f" => "0"
      case other => "'" + escapeString(other) + "'"
    }

  protected def hexOrUtf8Bytes(v: String): Array[Byte] =
    if (v.startsWith("\\x"))
      v.drop(2).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    else v.getBytes("UTF-8")

  /** TRUNCATE statement for one (already-qualified) table; None = sink has
    * no truncate concept (dialects/kafka.rs:25-27). */
  def truncateSql(qualifiedTable: String): Option[String] =
    Some(s"TRUNCATE TABLE $qualifiedTable;")

  /** Hard row cap per multi-value INSERT (SQL Server 1000,
    * destinations/sqlserver.rs:19). */
  def maxRowsPerInsert: Int = Int.MaxValue

  /** Whether the dialect has a derived-table UPDATE-JOIN shape for the
    * A3 VALUES-JOIN rewrite (coalescing.rs:644-678: MySQL JOIN-SET,
    * SQL Server UPDATE-FROM-JOIN, SQLite UPDATE-FROM); ANSI/Kafka have
    * no portable form and fall back to CASE-WHEN. */
  def supportsUpdateJoin: Boolean = false
}

/** ANSI default: "ident" quoting, '' escape (dialects/ansi.rs:11-27). */
case object AnsiDialect extends Dialect {
  val name = "ansi"
  def quoteIdentifier(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
}

/** MySQL: backtick quoting, backslash escaping in strings
  * (dialects/mysql.rs:8-22,50-63). */
case object MySqlDialect extends Dialect {
  override def supportsUpdateJoin: Boolean = true
  val name = "mysql"
  def quoteIdentifier(ident: String): String =
    "`" + ident.replace("`", "``") + "`"
  override protected def escapeString(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")
}

/** SQL Server: [ident] quoting with ]] escape, 0x... binary, 1000-row
  * multi-VALUES cap (dialects/sqlserver.rs:8-33, sqlserver.rs:19). */
case object SqlServerDialect extends Dialect {
  override def supportsUpdateJoin: Boolean = true
  val name = "sqlserver"
  def quoteIdentifier(ident: String): String =
    "[" + ident.replace("]", "]]") + "]"
  override def renderHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2 + 2)
    sb.append("0x")
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
  override def maxRowsPerInsert: Int = 1000
}

/** SQLite: ANSI quoting; no namespaces — the schema is dropped
  * (dialects/sqlite.rs:13-16); TRUNCATE unsupported → DELETE FROM
  * (dialects/sqlite.rs:26-33). */
case object SqliteDialect extends Dialect {
  override def supportsUpdateJoin: Boolean = true
  val name = "sqlite"
  def quoteIdentifier(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  override def qualifyTable(schema: String, table: String): String =
    quoteIdentifier(table)
  override def truncateSql(qualifiedTable: String): Option[String] =
    Some(s"DELETE FROM $qualifiedTable;")
}

/** Kafka "dialect": ANSI quoting, schema dropped (topic routing carries
  * it instead, dialects/kafka.rs qualify_table), X'' hex like ANSI; no
  * TRUNCATE statement (dialects/kafka.rs:25-27). Base64 for binary
  * exists only inside the JSON envelope (kafka.rs:109-117), which is
  * DebeziumEnvelope's concern, not the SQL dialect's. */
case object KafkaDialect extends Dialect {
  val name = "kafka"
  def quoteIdentifier(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  override def qualifyTable(schema: String, table: String): String =
    quoteIdentifier(table)
  override def truncateSql(qualifiedTable: String): Option[String] = None
}

object Dialect {
  val all: Seq[Dialect] =
    Seq(AnsiDialect, MySqlDialect, SqlServerDialect, SqliteDialect, KafkaDialect)
  def forName(n: String): Dialect = all.find(_.name == n.toLowerCase).getOrElse(
    throw new IllegalArgumentException(s"unknown dialect: $n"))
}
