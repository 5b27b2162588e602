package graft

import graft.model.{CdcColumn, CdcEvent}
import graft.streaming.{TxnSpill, TxnAssembler}
import graft.streaming.TxnAssembler.Ctl
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** Disk-spilled transaction resolution: large streamed transactions
  * seal via txid semi-joins against a parquet pending area — no
  * executor-memory buffering — with the same abort/commit semantics the
  * keyed assembler provides. */
class TxnSpillSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ctl(op: String, lsn: Long, txid: Long) =
    CdcEvent(op, lsn, txid, ts, null, null, Nil, Nil, isFinalBatch = false)
  private def ins(lsn: Long, txid: Long, id: Int, fin: Boolean = false) =
    CdcEvent("c", lsn, txid, ts, "public", "t1", Nil,
      Seq(CdcColumn("id", id.toString), CdcColumn("val", (id * 10).toString)),
      keyColumns = Seq("id"), isFinalBatch = fin)

  private def newSpill(): String =
    Files.createTempDirectory("txspill").toFile.getAbsolutePath

  private def readyIds(r: TxnSpill.Resolved): Seq[String] =
    r.ready.filter(col("op") === "c")
      .selectExpr("after[0].value").collect().map(_.getString(0)).sorted.toSeq

  test("DML parks until its commit arrives; aborts drop it; spill drains") {
    import spark.implicits._
    val spill = newSpill()
    // batch 1: open streamed tx 77 (no commit yet) + self-sealed tx 79
    val r1 = TxnSpill.resolve(Seq(
      ctl(Ctl.StreamStart, 1, 77), ins(2, 77, 999),
      ctl(Ctl.StreamStop, 3, 77),
      ins(4, 79, 2, fin = true)).toDS(), spill)
    assert(readyIds(r1) == Seq("2"))
    r1.commit()

    // batch 2: tx 77 aborts — parked DML must vanish, nothing applied
    val r2 = TxnSpill.resolve(Seq(ctl(Ctl.StreamAbort, 5, 77)).toDS(), spill)
    assert(readyIds(r2).isEmpty)
    r2.commit()

    // batch 3: fresh framed tx 78 commits; spill is empty of 77
    val r3 = TxnSpill.resolve(Seq(
      ctl(Ctl.Begin, 6, 78), ins(7, 78, 1), ctl(Ctl.Commit, 8, 78)).toDS(), spill)
    assert(readyIds(r3) == Seq("1"))
    r3.commit()
    val r4 = TxnSpill.resolve(spark.emptyDataset[CdcEvent], spill)
    assert(r4.ready.count() == 0)
  }

  test("a transaction larger than any batch seals across batches, memory-free") {
    import spark.implicits._
    val spill = newSpill()
    // 3 chunks of a single streamed tx 500, commit only in the last
    val r1 = TxnSpill.resolve(
      (ctl(Ctl.StreamStart, 1, 500) +: (1 to 4000).map(i => ins(10 + i, 500, i)))
        .toDS(), spill)
    assert(r1.ready.count() == 0); r1.commit()
    val r2 = TxnSpill.resolve(
      (4001 to 8000).map(i => ins(10 + i, 500, i)).toDS(), spill)
    assert(r2.ready.count() == 0); r2.commit()
    val r3 = TxnSpill.resolve(
      ((8001 to 10000).map(i => ins(10 + i, 500, i))
        :+ ctl(Ctl.StreamCommit, 99999, 500)).toDS(), spill)
    assert(r3.ready.count() == 10000, "whole tx seals when its commit lands")
    r3.commit()
    val drained = TxnSpill.resolve(spark.emptyDataset[CdcEvent], spill)
    assert(drained.ready.count() == 0)
  }

  test("replaying a batch against the pre-commit spill recomputes the same seal") {
    import spark.implicits._
    val spill = newSpill()
    val r1 = TxnSpill.resolve(Seq(
      ctl(Ctl.Begin, 1, 60), ins(2, 60, 7)).toDS(), spill)
    r1.commit()
    val batch2 = Seq(ctl(Ctl.Commit, 3, 60), ins(4, 61, 8, fin = true))
    // crash between apply and commit(): resolve runs twice on same spill
    val a = TxnSpill.resolve(batch2.toDS(), spill)
    val firstIds = readyIds(a) // apply happened, then crash — no commit()
    val b = TxnSpill.resolve(batch2.toDS(), spill)
    assert(readyIds(b) == firstIds && firstIds == Seq("7", "8"))
    b.commit()
  }

  test("append-only spill: a trigger writes O(new events), never rewrites the backlog") {
    import spark.implicits._
    val spill = newSpill()
    def spillBytes(): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      walk(new java.io.File(spill))
    }
    def fileMtimes(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      walk(new java.io.File(spill)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }

    // batch 1: park a LARGE chunk of streamed tx 500
    val r1 = TxnSpill.resolve(
      (ctl(Ctl.StreamStart, 1, 500) +: (1 to 5000).map(i => ins(10 + i, 500, i)))
        .toDS(), spill)
    r1.commit()
    val bigBytes = spillBytes()
    val bigFiles = fileMtimes()
    assert(bigBytes > 0)

    // batch 2: a SMALL increment of the same in-flight tx — the write
    // volume must be O(100 rows), and batch-1 files must be untouched
    val r2 = TxnSpill.resolve(
      (5001 to 5100).map(i => ins(10 + i, 500, i)).toDS(), spill)
    r2.commit()
    val added = spillBytes() - bigBytes
    assert(added > 0 && added < bigBytes / 4,
      s"trigger wrote $added bytes against a $bigBytes-byte backlog — " +
        "spill must not be rewritten per trigger")
    bigFiles.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.lastModified() == m,
        s"pre-existing spill file rewritten: $p")
    }

    // the whole tx still seals exactly once
    val r3 = TxnSpill.resolve(
      Seq(ctl(Ctl.StreamCommit, 99999, 500)).toDS(), spill)
    assert(r3.ready.count() == 5100)
    r3.commit()
    assert(TxnSpill.resolve(spark.emptyDataset[CdcEvent], spill).ready.count() == 0)
  }

  test("compactPending folds a long-lived txid's files; seal unchanged; heals crashes") {
    import spark.implicits._
    val spill = newSpill()
    // one tx streaming across 20 triggers → 20 appended files
    (0 until 20).foreach { k =>
      TxnSpill.resolve(Seq(ins(k.toLong + 1, txid = 7, id = k)).toDS(), spill)
    }
    val dir = new java.io.File(s"$spill/pending/txid=7")
    def nFiles = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 20)
    val folded = TxnSpill.compactPending(spark, spill, maxFilesPerTxid = 4)
    assert(folded == Seq(7L))
    assert(nFiles == 1, s"expected one folded file, got $nFiles")
    // below threshold → untouched on a second run
    assert(TxnSpill.compactPending(spark, spill, maxFilesPerTxid = 4).isEmpty)
    // crash simulation: committed fold staged, target dir gone → heal
    // rolls the fold forward and the rows survive
    val staged = new java.io.File(s"$spill/pending/_fold_txid=7")
    assert(dir.renameTo(staged))
    TxnSpill.compactPending(spark, spill)
    assert(dir.exists() && !staged.exists())
    // the seal still emits all 20 events exactly once
    val r = TxnSpill.resolve(
      Seq(ctl(TxnAssembler.Ctl.StreamCommit, 1000, txid = 7)).toDS(), spill)
    assert(readyIds(r).size == 20)
    r.commit()
  }

  test("heal rolls a committed fold FORWARD over a partially-deleted original") {
    import spark.implicits._
    val spill = newSpill()
    (0 until 8).foreach { k =>
      TxnSpill.resolve(Seq(ins(k.toLong + 1, txid = 9, id = k)).toDS(), spill)
    }
    assert(TxnSpill.compactPending(spark, spill, maxFilesPerTxid = 4) == Seq(9L))
    val dir = new java.io.File(s"$spill/pending/txid=9")
    val staged = new java.io.File(s"$spill/pending/_fold_txid=9")
    // crash window inside the fold's swap: the staging dir is complete
    // (committed, _SUCCESS present) AND the original still exists but the
    // recursive delete got partway — its data files are gone
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        if (f.isDirectory) copyDir(f, new java.io.File(dst, f.getName))
        else Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
      }
    }
    copyDir(dir, staged)
    assert(new java.io.File(staged, "_SUCCESS").exists())
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f => assert(f.delete()))
    // heal must prefer the guaranteed-complete staging copy — rolling
    // BACK here (keeping the gutted original) would silently lose the tx
    TxnSpill.compactPending(spark, spill)
    assert(dir.exists() && !staged.exists())
    val r = TxnSpill.resolve(
      Seq(ctl(TxnAssembler.Ctl.StreamCommit, 1000, txid = 9)).toDS(), spill)
    assert(readyIds(r).size == 8, "committed fold's rows must survive the heal")
    r.commit()
  }

  test("crash-replayed append before apply still seals each event exactly once") {
    import spark.implicits._
    val spill = newSpill()
    val batch1 = (ctl(Ctl.StreamStart, 1, 42) +: (1 to 50).map(i => ins(10 + i, 42, i)))
    // crash BEFORE apply: the same batch resolves twice against the same
    // spill — its rows are appended twice
    TxnSpill.resolve(batch1.toDS(), spill).commit()
    TxnSpill.resolve(batch1.toDS(), spill).commit()
    val sealedTx = TxnSpill.resolve(
      Seq(ctl(Ctl.StreamCommit, 999, 42)).toDS(), spill)
    assert(sealedTx.ready.count() == 50, "duplicate park must seal exactly once")
    sealedTx.commit()
  }

  test("reapAbandoned drops only dead-below-watermark txids") {
    import spark.implicits._
    val spill = newSpill()
    // tx 10: parked entirely below the watermark, no seal → abandoned
    // tx 20: parked but has an event AT/ABOVE the watermark → alive
    TxnSpill.resolve(Seq(
      ctl(Ctl.StreamStart, 1, 10), ins(2, 10, 1),
      ctl(Ctl.StreamStart, 3, 20), ins(4, 20, 2), ins(100, 20, 3)).toDS(),
      spill).commit()
    val reaped = TxnSpill.reapAbandoned(spark, spill, watermarkLsn = 50L)
    assert(reaped == Seq(10L))
    // the alive tx still seals completely after the reap
    val r = TxnSpill.resolve(Seq(ctl(Ctl.StreamCommit, 200, 20)).toDS(), spill)
    assert(readyIds(r).sorted == Seq("2", "3"))
    r.commit()
    // an abandoned commit arriving anyway seals an EMPTY tx — harmless
    val late = TxnSpill.resolve(Seq(ctl(Ctl.StreamCommit, 201, 10)).toDS(), spill)
    assert(late.ready.count() == 0)
  }

  test("e2e: spill warehouse chain discards aborted streamed txs (assembler parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = Files.createTempDirectory("wh-spill").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("wh-spill-ckpt").toFile.getAbsolutePath
    val mem = MemoryStream[CdcEvent]
    mem.addData(
      ctl(Ctl.StreamStart, 1, 77), ins(2, 77, 999),
      ctl(Ctl.StreamStop, 3, 77), ctl(Ctl.StreamAbort, 4, 77),
      ctl(Ctl.Begin, 5, 78), ins(6, 78, 1), ctl(Ctl.Commit, 7, 78),
      ins(8, 79, 2, fin = true))
    val q = TxnSpill.startWarehouseSpill(mem.toDF(), root, ckpt, numBuckets = 4)
    q.awaitTermination()
    val ids = spark.read.option("mergeSchema", "true").parquet(s"$root/public.t1")
      .select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("1", "2"), s"got $ids")
  }
}
