package graft

import graft.dialect.AnsiDialect
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.{CdcPipeline, TxnAssembler}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.DriverManager

/** Chaos-style correctness (reference tests/chaos, scenario4 shape):
  * a seeded mixed INSERT/UPDATE/DELETE workload over many transactions,
  * delivered across repeated query restarts with segments arriving
  * between runs. The destination must equal the reference semantics —
  * the fold of the event log — exactly, with zero loss or duplication. */
class ChaosSpec extends SparkSpecBase {

  private case class Ev(op: String, lsn: Long, txid: Long, id: Int, v: Int,
                        commit: Boolean) {
    def json: String = {
      val img = s"""[{"name":"id","value":"$id"},{"name":"val","value":"$v"}]"""
      val key = s"""[{"name":"id","value":"$id"}]"""
      op match {
        case "c" => s"""{"op":"c","lsn":$lsn,"txid":$txid,"commitTsMs":0,""" +
          s""""schema":null,"table":"t1","after":$img,"keyColumns":["id"],"commit":$commit}"""
        case "u" => s"""{"op":"u","lsn":$lsn,"txid":$txid,"commitTsMs":0,""" +
          s""""schema":null,"table":"t1","before":$key,"after":$img,"keyColumns":["id"],"commit":$commit}"""
        case "d" => s"""{"op":"d","lsn":$lsn,"txid":$txid,"commitTsMs":0,""" +
          s""""schema":null,"table":"t1","before":$key,"keyColumns":["id"],"commit":$commit}"""
        case "t" => s"""{"op":"t","lsn":$lsn,"txid":$txid,"commitTsMs":0,""" +
          s""""schema":null,"table":"t1","truncateTables":["t1"],"commit":$commit}"""
      }
    }
  }

  test("mixed workload over repeated restarts replicates exactly (scenario4)") {
    val rnd = new scala.util.Random(42)
    val live = scala.collection.mutable.Set.empty[Int] // ids present
    val expected = scala.collection.mutable.Map.empty[Int, Int] // id → val
    var lsn = 0L
    var nextId = 0

    // 40 transactions of 1-25 events each, referentially consistent
    val txs: Seq[Seq[Ev]] = (1 to 40).map { txid =>
      val n = 1 + rnd.nextInt(25)
      val evs = (1 to n).map { i =>
        lsn += 1
        val choice = rnd.nextInt(10)
        if (choice < 5 || live.isEmpty) { // insert
          nextId += 1; live += nextId
          expected(nextId) = nextId * 10
          Ev("c", lsn, txid, nextId, nextId * 10, commit = false)
        } else if (choice < 8) { // update an existing id
          val id = live.toSeq(rnd.nextInt(live.size))
          expected(id) = expected(id) + 1
          Ev("u", lsn, txid, id, expected(id), commit = false)
        } else { // delete an existing id
          val id = live.toSeq(rnd.nextInt(live.size))
          live -= id; expected.remove(id)
          Ev("d", lsn, txid, id, 0, commit = false)
        }
      }
      evs.init :+ evs.last.copy(commit = true)
    }

    val dir = Files.createTempDirectory("chaos-wal").toFile.getAbsolutePath
    val dbDir = Files.createTempDirectory("chaos-db").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("chaos-ckpt").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE SCHEMA \"public\"")
    conn.createStatement().execute(
      "CREATE TABLE \"public\".\"t1\" (\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(32))")
    val applier = new JdbcApplier(url, RenderContext(AnsiDialect), "chaos")
    applier.init()

    import spark.implicits._
    def runOnce(): Unit = {
      val q = TxnAssembler.assemble(CdcPipeline.toEvents(
        spark.readStream.format("graft.sources.cdcwal.CdcWalSource")
          .option("path", dir).load()))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[graft.model.CdcTransaction], id: Long) =>
          applier.applyBatch(
            b.orderBy($"commitLsn").flatMap(_.events)(CdcPipeline.eventEnc), id)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // deliver tx groups in 5 waves, restarting the query between each —
    // including one wave with NO new data (pure replay) and a duplicate
    // re-apply of an old batch (crash between destination commit and
    // Spark's commit log is simulated by the applier-level replay)
    val waves = txs.grouped(8).toSeq
    waves.zipWithIndex.foreach { case (wave, i) =>
      Files.write(Paths.get(dir, f"segment-$i%06d.jsonl"),
        wave.flatten.map(_.json).mkString("\n").getBytes(StandardCharsets.UTF_8))
      runOnce()
      if (i == 2) runOnce() // restart with nothing new: must be a no-op
    }

    val got = {
      val rs = conn.createStatement()
        .executeQuery("SELECT \"id\", \"val\" FROM \"public\".\"t1\"")
      val m = scala.collection.mutable.Map.empty[Int, Int]
      while (rs.next()) m(rs.getString(1).toInt) = rs.getString(2).toInt
      m
    }
    assert(got.size == expected.size,
      s"row count: got ${got.size}, expected ${expected.size}")
    assert(got == expected)
  }

  test("warehouse path: same chaos workload, replica equals the event-log fold") {
    val rnd = new scala.util.Random(1337)
    val live = scala.collection.mutable.Set.empty[Int]
    val expected = scala.collection.mutable.Map.empty[Int, Int]
    var lsn = 0L
    var nextId = 0
    val txs: Seq[Seq[Ev]] = (1 to 30).map { txid =>
      if (txid == 15) {
        // a TRUNCATE wave mid-workload: everything before it dies, the
        // same-tx inserts AFTER it must survive (reference P6)
        live.clear(); expected.clear()
        lsn += 1
        val t = Ev("t", lsn, txid, 0, 0, commit = false)
        val ins = (1 to 2).map { _ =>
          lsn += 1; nextId += 1; live += nextId
          expected(nextId) = nextId * 10
          Ev("c", lsn, txid, nextId, nextId * 10, commit = false)
        }
        (t +: ins.init) :+ ins.last.copy(commit = true)
      } else {
        val n = 1 + rnd.nextInt(20)
        val evs = (1 to n).map { _ =>
          lsn += 1
          val choice = rnd.nextInt(10)
          if (choice < 5 || live.isEmpty) {
            nextId += 1; live += nextId
            expected(nextId) = nextId * 10
            Ev("c", lsn, txid, nextId, nextId * 10, commit = false)
          } else if (choice < 8) {
            val id = live.toSeq(rnd.nextInt(live.size))
            expected(id) = expected(id) + 1
            Ev("u", lsn, txid, id, expected(id), commit = false)
          } else {
            val id = live.toSeq(rnd.nextInt(live.size))
            live -= id; expected.remove(id)
            Ev("d", lsn, txid, id, 0, commit = false)
          }
        }
        evs.init :+ evs.last.copy(commit = true)
      }
    }

    val dir = Files.createTempDirectory("chaos-wh-wal").toFile.getAbsolutePath
    val root = Files.createTempDirectory("chaos-wh").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("chaos-wh-ckpt").toFile.getAbsolutePath

    def runOnce(): Unit = {
      val q = CdcPipeline.startWarehouse(
        spark.readStream.format("graft.sources.cdcwal.CdcWalSource")
          .option("path", dir).load(),
        root, ckpt, numBuckets = 8, historyTables = Seq("t1"))
      q.awaitTermination()
    }

    val waves = txs.grouped(6).toSeq
    waves.zipWithIndex.foreach { case (wave, i) =>
      Files.write(Paths.get(dir, f"segment-$i%06d.jsonl"),
        wave.flatten.map(_.json).mkString("\n").getBytes(StandardCharsets.UTF_8))
      runOnce()
      if (i == 1) runOnce() // pure replay: must be a no-op
    }
    import spark.implicits._
    def toEvents(evs: Seq[Ev]) = evs
      .map(e => graft.model.CdcEvent(e.op, e.lsn, e.txid, null, null, "t1",
        if (e.op == "c") Nil else Seq(graft.model.CdcColumn("id", e.id.toString)),
        if (e.op == "d") Nil else Seq(graft.model.CdcColumn("id", e.id.toString),
          graft.model.CdcColumn("val", e.v.toString)),
        keyColumns = Seq("id")))
    // STALE replay: re-applying the FIRST wave after later deletes must
    // be refused by the batch gate (it would resurrect deleted rows)
    CdcPipeline.applyWarehouseBatch(toEvents(txs.take(6).flatten).toDS(),
      root, 8, batchId = 0)
    // crash-before-gate: gate lost, LATEST wave re-applied with its own
    // batchId — the MERGE apply itself must be idempotent (and the
    // history's Overwrite-own-dir discipline with it)
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_graft_last_batch"))
    CdcPipeline.applyWarehouseBatch(toEvents(txs.drop(24).flatten).toDS(),
      root, 8, batchId = 4, historyTables = Seq("t1"))

    val got = spark.read.option("mergeSchema", "true").parquet(s"$root/t1")
      .drop("bucket").collect()
      .map(r => r.getString(r.fieldIndex("id")).toInt ->
        r.getString(r.fieldIndex("val")).toInt).toMap
    assert(got.size == expected.size,
      s"row count: got ${got.size}, expected ${expected.size}")
    assert(got == expected)

    // SCD2 history through the SAME chaos (restarts, pure replay,
    // truncate wave, crash-before-gate replay): every committed DML
    // event is exactly one version, and time travel reconstructs any
    // prefix state — including across the truncate
    val hist = new graft.sinks.HistorySink(s"$root/_history/t1", Nil)
    def foldAt(l: Long): Map[Int, Int] = {
      val m = scala.collection.mutable.Map.empty[Int, Int]
      txs.flatten.filter(_.lsn <= l).foreach { e =>
        e.op match {
          case "c" | "u" => m(e.id) = e.v
          case "d" => m.remove(e.id)
          case _ => m.clear()
        }
      }
      m.toMap
    }
    def asOfMap(l: Long): Map[Int, Int] =
      hist.asOf(spark, l).collect().map(r =>
        r.getString(r.fieldIndex("id")).toInt ->
          r.getString(r.fieldIndex("val")).toInt).toMap
    val truncAt = txs.flatten.find(_.op == "t").get.lsn
    val versions = hist.history(spark).count()
    assert(versions == lsn - 1, // every event except the truncate marker
      s"expected ${lsn - 1} versions (one per DML event), got $versions")
    for (l <- Seq(truncAt - 1, truncAt, lsn / 3, lsn))
      assert(asOfMap(l) == foldAt(l), s"asOf($l) diverges from event fold")
    // compaction folds the accumulated batch dirs without changing any
    // of it
    assert(hist.compact(spark) > 0)
    assert(hist.history(spark).count() == versions)
    for (l <- Seq(truncAt - 1, lsn))
      assert(asOfMap(l) == foldAt(l), s"post-compact asOf($l) diverges")
  }
}
