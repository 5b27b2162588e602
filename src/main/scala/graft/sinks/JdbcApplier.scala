package graft.sinks

import graft.coalesce.CoalesceConfig
import graft.model.CdcEvent
import graft.operators.EventToStmt
import graft.render.RenderContext
import org.apache.spark.sql.Dataset
import java.sql.{Connection, DriverManager}

/** K1/F2: exactly-once transactional JDBC applier for `foreachBatch`.
  *
  * Reproduces the reference's pre-commit-hook protocol
  * (destination_factory.rs:60-93): the checkpoint (here: batchId) is
  * written *inside* the same destination transaction as the data, so a
  * crash between apply and Spark's own commit log leaves the destination
  * either fully behind (batch re-applied, gate skips it) or fully ahead
  * (gate skips the replay). Statements are coalesced (A1-A7) and applied
  * in LSN order — the destination connection is inherently serial, exactly
  * like the reference's single consumer (consumer.rs:26-123).
  *
  * Scale note: this sink is for OLTP destinations (MySQL/SQLServer/SQLite
  * semantics). The 100 TB path is ParquetReplicaSink's partitioned MERGE.
  */
class JdbcApplier(
    url: String,
    ctx: RenderContext,
    appId: String = "graft",
    cfg: CoalesceConfig = CoalesceConfig(),
    statementBatchSize: Int = 1000) extends Serializable {

  private val checkpointTable = "graft_checkpoint"

  /** K2/K3 bulk fast path: tables where bulk loading failed once are
    * memoized and permanently fall back to rendered SQL
    * (sqlserver.rs:20-21,197-200 failure memo). */
  @transient private lazy val bulkFailureMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Create checkpoint bookkeeping (idempotent). */
  def init(): Unit = withConn { c =>
    val st = c.createStatement()
    try st.execute(
      s"CREATE TABLE $checkpointTable (app VARCHAR(64) PRIMARY KEY, batch_id BIGINT)")
    catch { case _: java.sql.SQLException => () } // exists
    finally st.close()
  }

  def lastCommitted(): Long = withConn { c =>
    val ps = c.prepareStatement(
      s"SELECT batch_id FROM $checkpointTable WHERE app = ?")
    try {
      ps.setString(1, appId)
      val rs = ps.executeQuery()
      if (rs.next()) rs.getLong(1) else -1L
    } finally ps.close()
  }

  /** The foreachBatch body. Events ordered by (lsn) stream through the
    * structured coalescer into one destination transaction per statement
    * batch; the final batch carries the checkpoint update. */
  def applyBatch(events: Dataset[CdcEvent], batchId: Long): Unit = {
    if (batchId <= lastCommitted()) return // F2 dedup gate on replay
    val ordered = events.orderBy(events("lsn")).toLocalIterator()
    withConn { c =>
      c.setAutoCommit(false)
      try {
        val buf = new scala.collection.mutable.ArrayBuffer[CdcEvent](statementBatchSize)
        def flush(last: Boolean): Unit = {
          if (buf.nonEmpty || last) {
            if (!tryBulkInsert(c, buf.toSeq)) {
              val sqls = EventToStmt.renderBatch(ctx, buf.toSeq, cfg)
              val st = c.createStatement()
              try sqls.foreach(sql => st.execute(sql.stripSuffix(";")))
              finally st.close()
            }
            buf.clear()
          }
          if (last) {
            // pre-commit hook analog: checkpoint inside the same txn
            val up = c.prepareStatement(
              s"UPDATE $checkpointTable SET batch_id = ? WHERE app = ?")
            try {
              up.setLong(1, batchId); up.setString(2, appId)
              if (up.executeUpdate() == 0) {
                val ins = c.prepareStatement(
                  s"INSERT INTO $checkpointTable VALUES (?, ?)")
                try { ins.setString(1, appId); ins.setLong(2, batchId); ins.executeUpdate() }
                finally ins.close()
              }
            } finally up.close()
            c.commit()
          }
        }
        while (ordered.hasNext) {
          buf += ordered.next()
          if (buf.size >= statementBatchSize) flush(last = false)
        }
        flush(last = true)
      } catch {
        case e: Throwable => c.rollback(); throw e
      }
    }
  }

  /** E3 bulk detection (transaction_manager.rs:1274-1350): a statement
    * run that is 100% same-shape non-binary INSERTs of at least
    * `bulkInsertThreshold` rows takes a per-dialect bulk fast path:
    * MySQL attempts LOAD DATA LOCAL INFILE from an in-memory TSV
    * (mysql.rs:204-345), SQL Server binds typed values — the TDS
    * ColumnData analog (sqlserver.rs:326-361) — and everything else
    * uses the generic PreparedStatement batch. Returns false to fall
    * back to rendered SQL; a failure memoizes the table permanently
    * (K3 failure memo, sqlserver.rs:20-21,197-200) and lets the batch
    * retry take the fallback path. */
  private def tryBulkInsert(c: Connection, events: Seq[CdcEvent]): Boolean = {
    if (events.size < cfg.bulkInsertThreshold) return false
    val first = events.head
    val sameShape = first.op == "c" && events.forall { e =>
      e.op == "c" && e.schema == first.schema && e.table == first.table &&
        e.after.map(_.name) == first.after.map(_.name) &&
        !e.after.exists(_.isBinary)
    }
    if (!sameShape) return false
    val table = ctx.qualified(first.schema, first.table)
    if (bulkFailureMemo.contains(table)) return false
    val d = ctx.dialect
    val cols = first.after.map(col => d.quoteIdentifier(col.name))
    val sql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
      cols.map(_ => "?").mkString("(", ", ", ")")
    try {
      if (d == graft.dialect.MySqlDialect && tryMysqlLoadData(c, table, cols, events))
        return true
      val typed = d == graft.dialect.SqlServerDialect
      val ps = c.prepareStatement(sql)
      try {
        events.foreach { e =>
          e.after.zipWithIndex.foreach { case (col, i) =>
            if (typed)
              BulkLoad.bindTyped(ps, i + 1, BulkLoad.parseSqlValue(d.renderValue(col)))
            else col.value match {
              case null => ps.setNull(i + 1, java.sql.Types.VARCHAR)
              case "t" => ps.setString(i + 1, "1")
              case "f" => ps.setString(i + 1, "0")
              case v => ps.setString(i + 1, v)
            }
          }
          ps.addBatch()
        }
        ps.executeBatch()
      } finally ps.close()
      true
    } catch {
      case e: java.sql.SQLException =>
        bulkFailureMemo.add(table)
        throw e // rollback + retry takes the fallback path
    }
  }

  /** K2 fast path: render → TSV → LOAD DATA LOCAL INFILE streamed from
    * memory, inside the surrounding destination transaction. Connector/J
    * exposes the in-memory stream via `setLocalInfileInputStream` on its
    * Statement (URL needs allowLoadLocalInfile=true); connectors without
    * that method (embedded Derby in tests) return false and the generic
    * batch runs instead — the same graceful fallback as the reference's
    * local_infile probe (mysql.rs:204-258). */
  private def tryMysqlLoadData(c: Connection, table: String,
                               quotedCols: Seq[String], events: Seq[CdcEvent]): Boolean = {
    val st = c.createStatement()
    try {
      val target =
        try st.unwrap(classOf[java.sql.Statement]) catch { case _: Throwable => st }
      val m =
        try Some(target.getClass.getMethod(
          "setLocalInfileInputStream", classOf[java.io.InputStream]))
        catch { case _: NoSuchMethodException => None }
      m match {
        case Some(meth) =>
          val rows = events.map(_.after.map(col => ctx.dialect.renderValue(col)))
          val tsv = BulkLoad.generateTsvBuffer(rows)
          meth.invoke(target, new java.io.ByteArrayInputStream(tsv))
          target.execute(BulkLoad.loadDataSql(table, quotedCols))
          true
        case None => false
      }
    } finally st.close()
  }
}
