package graft.coalesce

import graft.dialect.{Dialect, MySqlDialect, SqlServerDialect, SqliteDialect}
import scala.collection.mutable.ArrayBuffer

/** Micro-batch DML coalescing (reference operators A1-A4, A6-A7).
  *
  * The reference coalesces *SQL text* with a quote-aware micro-parser
  * (pg2any-lib/src/destinations/coalescing.rs). Here statements stay
  * structured end-to-end (the design the reference was migrating toward,
  * sql_renderer.rs:389-458), which deletes the parser class entirely (A5/D6)
  * while preserving the run-length, order-preserving semantics:
  * consecutive same-shape statements merge; any shape change cuts the run.
  *
  * Values are pre-rendered dialect literals (graft.dialect.Dialect), so
  * building merged SQL is pure string assembly.
  */
sealed trait DmlStmt extends Serializable { def table: String }

/** INSERT row: `values` are rendered literals aligned with `columns`. */
final case class InsertRow(table: String, columns: Seq[String], values: Seq[String])
    extends DmlStmt

/** UPDATE: SET pairs + key-equality WHERE; `None` literal = IS NULL. */
final case class UpdateRow(
    table: String,
    setColumns: Seq[String],
    setValues: Seq[String],
    where: Seq[(String, Option[String])]) extends DmlStmt

/** DELETE by key-equality WHERE. */
final case class DeleteRow(table: String, where: Seq[(String, Option[String])])
    extends DmlStmt

/** Anything that must pass through unmerged (e.g. TRUNCATE). */
final case class RawSql(table: String, sql: String) extends DmlStmt

/** Byte/row-capped coalescing config (coalescing.rs:915-944: 80% of
  * max_allowed_packet floor 1 KB; bulk_insert.rs:88: 4 MB default). */
final case class CoalesceConfig(
    maxStatementBytes: Int = 4 * 1024 * 1024,
    maxRowsPerInsert: Int = Int.MaxValue,
    /** ≥ this many consecutive same-shape INSERTs → bulk path
      * (config.rs:363, default 500). */
    bulkInsertThreshold: Int = 500)

object CoalesceConfig {
  /** Packet-bounded cap: 80% of maxAllowedPacket, floor 1 KB
    * (coalescing.rs:925-929). */
  def packetBound(maxAllowedPacket: Long): Int =
    math.max(1024L, (maxAllowedPacket * 8) / 10).min(Int.MaxValue).toInt
}

object Coalescer {

  /** Coalesce an ordered statement run into merged SQL statements.
    * Order-preserving: only *consecutive* statements with an identical
    * shape merge (coalescing.rs:953-1087). */
  def coalesce(stmts: Seq[DmlStmt], dialect: Dialect,
               cfg: CoalesceConfig = CoalesceConfig()): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = stmts.size
    val arr = stmts.toIndexedSeq
    while (i < n) {
      arr(i) match {
        case first: InsertRow =>
          var j = i
          while (j < n && (arr(j) match {
            case r: InsertRow => r.table == first.table && r.columns == first.columns
            case _ => false
          })) j += 1
          out ++= buildInserts(
            first.table, first.columns,
            arr.slice(i, j).map(_.asInstanceOf[InsertRow].values), dialect, cfg)
          i = j
        case first: UpdateRow =>
          var j = i
          while (j < n && (arr(j) match {
            case r: UpdateRow =>
              r.table == first.table && r.setColumns == first.setColumns &&
                r.where.map(_._1) == first.where.map(_._1)
            case _ => false
          })) j += 1
          out ++= buildUpdates(arr.slice(i, j).map(_.asInstanceOf[UpdateRow]), dialect, cfg)
          i = j
        case first: DeleteRow =>
          var j = i
          while (j < n && (arr(j) match {
            case r: DeleteRow =>
              r.table == first.table && r.where.map(_._1) == first.where.map(_._1)
            case _ => false
          })) j += 1
          out ++= buildDeletes(arr.slice(i, j).map(_.asInstanceOf[DeleteRow]), cfg)
          i = j
        case RawSql(_, sql) =>
          out += sql
          i += 1
      }
    }
    out.toSeq
  }

  /** A1/A7: chunked multi-value INSERT, capped by rows and bytes
    * (bulk_insert.rs:88-142; SQL Server 1000-row cap sqlserver.rs:19). */
  def buildInserts(table: String, columns: Seq[String], rows: Seq[Seq[String]],
                   dialect: Dialect, cfg: CoalesceConfig): Seq[String] = {
    val rowCap = math.min(cfg.maxRowsPerInsert, dialect.maxRowsPerInsert)
    val prefix = s"INSERT INTO $table (${columns.mkString(", ")}) VALUES "
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var count = 0
    def flush(): Unit = if (count > 0) {
      sb.append(';'); out += sb.toString; sb.clear(); count = 0
    }
    rows.foreach { r =>
      val tuple = r.mkString("(", ", ", ")")
      if (count > 0 &&
          (count >= rowCap || sb.length + tuple.length + 2 > cfg.maxStatementBytes))
        flush()
      if (count == 0) sb.append(prefix) else sb.append(", ")
      sb.append(tuple)
      count += 1
    }
    flush()
    out.toSeq
  }

  private def pred(kv: (String, Option[String])): String = kv match {
    case (c, Some(v)) => s"$c = $v"
    case (c, None) => s"$c IS NULL"
  }

  private def singleUpdate(u: UpdateRow): String = {
    val sets = u.setColumns.zip(u.setValues)
      .map { case (c, v) => s"$c = $v" }.mkString(", ")
    s"UPDATE ${u.table} SET $sets WHERE ${u.where.map(pred).mkString(" AND ")};"
  }

  /** A2/A3: same-shape UPDATE run → VALUES-JOIN when every WHERE is pure
    * non-NULL key equality and SET∩KEY=∅ (coalescing.rs:777-871); else
    * CASE-WHEN (coalescing.rs:570-642). Single statement passes through.
    *
    * Two deliberate fixes over the reference, both found by the
    * equivalence property test (CoalesceEquivalenceSpec):
    *
    * 1. Duplicate-key squash: two updates to the SAME key inside one run
    *    must apply last-wins, but a CASE picks its FIRST matching WHEN —
    *    the reference emits WHENs in arrival order and silently applies
    *    first-wins (coalescing.rs:618-626, no dedup in its grouping). We
    *    keep only the last update per WHERE signature.
    *
    * 2. Key-mutating runs never merge: when SET columns overlap WHERE key
    *    columns, a statement can move a row INTO a later statement's WHERE
    *    (`SET k=2 WHERE k=1; SET v=9 WHERE k=2`), which no single combined
    *    statement — CASE-WHEN included, since it evaluates against the
    *    pre-statement snapshot — can reproduce. Such runs are emitted as
    *    one UPDATE per event, sequential-exact.
    *
    * Output is additionally chunked so no statement's estimated size
    * exceeds cfg.maxStatementBytes, mirroring the reference's
    * 80%-of-max_allowed_packet group accounting for UPDATE groups
    * (coalescing.rs:1010-1025). */
  def buildUpdates(rawRun: Seq[UpdateRow], dialect: Dialect,
                   cfg: CoalesceConfig = CoalesceConfig()): Seq[String] = {
    val keyCols = rawRun.head.where.map(_._1)
    if (rawRun.head.setColumns.intersect(keyCols).nonEmpty)
      return rawRun.map(singleUpdate) // fix 2: sequential-exact
    val run: Seq[UpdateRow] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[(String, Option[String])], UpdateRow]
      rawRun.foreach(u => m += (u.where -> u)) // fix 1: later statement wins
      m.values.toSeq
    }
    if (run.size == 1) return Seq(singleUpdate(run.head))
    val valuesJoin = run.forall(_.where.forall(_._2.isDefined)) &&
      dialect.supportsUpdateJoin
    // Per-row rendered-size estimate for the chosen shape (upper bound).
    def rowCost(r: UpdateRow): Int = {
      val whereLen = r.where.map { case (c, v) => c.length + v.map(_.length).getOrElse(8) + 8 }.sum
      val setLen = r.setValues.map(_.length + 8).sum
      if (valuesJoin) whereLen + setLen + 24
      else r.setColumns.size * (whereLen + 16) + setLen + whereLen + 8
    }
    chunkBy(run, rowCost, cfg.maxStatementBytes).map { chunk =>
      if (chunk.size == 1) singleUpdate(chunk.head)
      else if (valuesJoin) buildValuesJoin(chunk, dialect)
      else buildCaseWhen(chunk)
    }
  }

  /** Greedy run-cutting by estimated statement bytes (always admits at
    * least one row per chunk so oversized single rows still emit). */
  private def chunkBy[T](run: Seq[T], cost: T => Int, cap: Int): Seq[Seq[T]] = {
    val out = ArrayBuffer.empty[Seq[T]]
    val cur = ArrayBuffer.empty[T]
    var acc = 0
    run.foreach { r =>
      val c = cost(r)
      if (cur.nonEmpty && acc + c > cap) {
        out += cur.toSeq; cur.clear(); acc = 0
      }
      cur += r; acc += c
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  private def buildCaseWhen(run: Seq[UpdateRow]): String = {
    val h = run.head
    val wheres = run.map(r => r.where.map(pred).mkString(" AND "))
    val sets = h.setColumns.zipWithIndex.map { case (c, ci) =>
      val whens = run.zip(wheres)
        .map { case (r, w) => s"WHEN $w THEN ${r.setValues(ci)}" }
        .mkString(" ")
      s"$c = CASE $whens ELSE $c END"
    }.mkString(", ")
    val orWhere = wheres.map(w => s"($w)").mkString(" OR ")
    s"UPDATE ${h.table} SET $sets WHERE $orWhere;"
  }

  /** Derived-table join UPDATE — O(rows) instead of O(rows×cols) CASE
    * evaluation; three dialect shapes (coalescing.rs:644-678). */
  private def buildValuesJoin(run: Seq[UpdateRow], dialect: Dialect): String = {
    val h = run.head
    val keyCols = h.where.map(_._1)
    // key literals then set literals, aliased k0.., s0.. (identifier-safe
    // regardless of source column quoting)
    val keyAlias = keyCols.indices.map(i => s"k$i")
    val setAlias = h.setColumns.indices.map(i => s"s$i")
    def selectRow(r: UpdateRow, first: Boolean): String = {
      val kv = r.where.map(_._2.get).zip(keyAlias)
      val sv = r.setValues.zip(setAlias)
      val cols = (kv ++ sv).map { case (v, a) => if (first) s"$v AS $a" else v }
      s"SELECT ${cols.mkString(", ")}"
    }
    val derived = run.zipWithIndex
      .map { case (r, i) => selectRow(r, i == 0) }
      .mkString(" UNION ALL ")
    val on = keyCols.zip(keyAlias)
      .map { case (c, a) => s"t.$c = src.$a" }.mkString(" AND ")
    val t = h.table
    dialect match {
      case MySqlDialect =>
        val sets = h.setColumns.zip(setAlias)
          .map { case (c, a) => s"t.$c = src.$a" }.mkString(", ")
        s"UPDATE $t AS t JOIN ($derived) AS src ON $on SET $sets;"
      case SqlServerDialect =>
        val sets = h.setColumns.zip(setAlias)
          .map { case (c, a) => s"t.$c = src.$a" }.mkString(", ")
        s"UPDATE t SET $sets FROM $t AS t JOIN ($derived) AS src ON $on;"
      case SqliteDialect =>
        val sets = h.setColumns.zip(setAlias)
          .map { case (c, a) => s"$c = src.$a" }.mkString(", ")
        s"UPDATE $t AS t SET $sets FROM ($derived) AS src WHERE $on;"
      case _ => buildCaseWhen(run) // ANSI/Kafka: no portable UPDATE-JOIN
    }
  }

  /** A4: OR-combined DELETE (coalescing.rs:332-357), chunked so no
    * statement's estimated size exceeds cfg.maxStatementBytes (mirrors
    * the reference's DELETE group accounting, coalescing.rs:1055-1062). */
  def buildDeletes(run: Seq[DeleteRow],
                   cfg: CoalesceConfig = CoalesceConfig()): Seq[String] = {
    def rowCost(r: DeleteRow): Int =
      r.where.map { case (c, v) => c.length + v.map(_.length).getOrElse(8) + 8 }.sum + 6
    chunkBy(run, rowCost, cfg.maxStatementBytes).map { chunk =>
      val h = chunk.head
      if (chunk.size == 1)
        s"DELETE FROM ${h.table} WHERE ${h.where.map(pred).mkString(" AND ")};"
      else {
        val orWhere = chunk
          .map(r => s"(${r.where.map(pred).mkString(" AND ")})").mkString(" OR ")
        s"DELETE FROM ${h.table} WHERE $orWhere;"
      }
    }
  }

  /** A6: bulk-INSERT detection — a statement run that is 100% same-shape
    * INSERTs of at least `threshold` rows (bulk_insert.rs:25-61). */
  def detectBulkInsert(stmts: Seq[DmlStmt], threshold: Int)
      : Option[(String, Seq[String], Seq[Seq[String]])] = {
    if (stmts.size < threshold) return None
    stmts.head match {
      case first: InsertRow
          if stmts.forall {
            case r: InsertRow =>
              r.table == first.table && r.columns == first.columns
            case _ => false
          } =>
        Some((first.table, first.columns,
          stmts.map(_.asInstanceOf[InsertRow].values)))
      case _ => None
    }
  }
}
