package graft.tools

import graft.model.{CdcColumn, CdcEvent}
import graft.streaming.{CdcPipeline, TxnAssembler, TxnSpill}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files

/** Reference-volume proof points, run at the reference's OWN capacity
  * numbers (SURVEY §6):
  *
  *  1. scenario5 analog — ONE streamed transaction of 3,000,000 rows
  *     (tests/chaos/scenarios/input/scenario5_input.sql:1-8 builds a 3M
  *     -row INSERT in a single transaction) through the TxnSpill →
  *     warehouse chain, committing only in the last chunk. Also proves
  *     the append-only spill contract AT volume: a trailing 1,000-row
  *     chunk against the 3M-row parked backlog must write O(new) bytes.
  *
  *  2. pgbench-chaos analog — 3,600,000 update rows against a 1,000,000
  *     -row table across 36 uniform batches
  *     (tests/chaos/scripts/run_pgbench_chaos_test.sh:54-63 drives
  *     3.6M pgbench rows under repeated restarts), with the chaos
  *     shapes injected as batch-API replays: a stale replay every 8th
  *     batch (gate must skip) and one crash-window replay (gate file
  *     removed, same batch re-applied — the idempotent MERGE absorbs
  *     it). End state is verified exactly: deterministic rotating key
  *     windows make every key's last-writer computable.
  *
  * Prints one summary line per proof; record them in SCALING.md.
  * Run: `sbt "runMain graft.tools.VolumeProof"`. */
object VolumeProof {

  private def dirBytes(root: String): Long = {
    def walk(f: File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new File(root))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(op: String, lsn: Long, id: Long, v: Long) =
      CdcEvent(op, lsn, 1L, ts, "public", "t1",
        if (op == "c") Nil else Seq(CdcColumn("id", id.toString)),
        if (op == "d") Nil
        else Seq(CdcColumn("id", id.toString), CdcColumn("val", v.toString)),
        keyColumns = Seq("id"), isFinalBatch = false)

    // ---- proof 1: scenario5 — a single 3,000,000-row streamed tx ----
    val bigTx = args.headOption.map(_.toInt).getOrElse(3000000)
    val root1 = Files.createTempDirectory("volproof-tx").toFile.getAbsolutePath
    val spill = s"$root1/_txspill"
    def chunk(lo: Long, hi: Long) = spark.range(lo, hi)
      .map(i => ev("c", 10 + i, i, i))
    def ctl(op: String, lsn: Long) = spark.createDataset(Seq(
      CdcEvent(op, lsn, 1L, ts, null, null, Nil, Nil, isFinalBatch = false)))
    val t0 = System.nanoTime()
    val r0 = TxnSpill.resolve(
      ctl(TxnAssembler.Ctl.StreamStart, 1).union(chunk(0, bigTx / 3)), spill)
    CdcPipeline.applyWarehouseBatch(r0.ready.as[CdcEvent], root1, 64, 0)
    r0.commit()
    val r1 = TxnSpill.resolve(chunk(bigTx / 3, 2L * bigTx / 3), spill)
    CdcPipeline.applyWarehouseBatch(r1.ready.as[CdcEvent], root1, 64, 1)
    r1.commit()
    // the append-only contract AT volume: a tiny chunk against the full
    // parked backlog must cost O(new events), never a spill rewrite
    val backlogBytes = dirBytes(spill)
    val rTiny = TxnSpill.resolve(
      spark.range(bigTx, bigTx + 1000L).map(i => ev("c", 10 + i, i, i)), spill)
    CdcPipeline.applyWarehouseBatch(rTiny.ready.as[CdcEvent], root1, 64, 2)
    rTiny.commit()
    val tinyAdded = dirBytes(spill) - backlogBytes
    require(tinyAdded > 0 && tinyAdded < backlogBytes / 100,
      s"1000-row trigger wrote $tinyAdded bytes against a $backlogBytes-byte backlog")
    val r2 = TxnSpill.resolve(
      chunk(2L * bigTx / 3, bigTx)
        .union(ctl(TxnAssembler.Ctl.StreamCommit, bigTx + 2000L)), spill)
    CdcPipeline.applyWarehouseBatch(r2.ready.as[CdcEvent], root1, 64, 3)
    r2.commit()
    val txSecs = (System.nanoTime() - t0) / 1e9
    val txRows = spark.read.parquet(s"$root1/public.t1").count()
    require(txRows == bigTx + 1000,
      s"scenario5 analog: expected ${bigTx + 1000} rows, got $txRows")
    println(f"scenario5 analog: single $bigTx%,d-row streamed tx sealed+applied " +
      f"in $txSecs%.1f s (${bigTx / txSecs}%.0f rows/s); " +
      f"peak spill $backlogBytes%,d bytes; trailing 1000-row trigger " +
      f"appended $tinyAdded%,d bytes (O(new), ${backlogBytes / tinyAdded}x under backlog)")

    // ---- proof 2: pgbench-shaped 3.6M-row chaos run ----
    val accounts = args.lift(1).map(_.toInt).getOrElse(1000000)
    val updates = args.lift(2).map(_.toInt).getOrElse(3600000)
    val perBatch = 100000
    val nBatches = updates / perBatch
    val root2 = Files.createTempDirectory("volproof-pgb").toFile.getAbsolutePath
    val t1 = System.nanoTime()
    CdcPipeline.applyWarehouseBatch(
      spark.range(accounts).map(i => ev("c", i, i, 0L)), root2, 64, 0)
    val seedSecs = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val gate = new File(s"$root2/_graft_last_batch")
    (0 until nBatches).foreach { b =>
      // rotating deterministic key window: batch b updates
      // [b*perBatch mod accounts, +perBatch) with val = b+1
      val lo = (b.toLong * perBatch) % accounts
      val batch = spark.range(lo, lo + perBatch)
        .map(i => ev("u", (b + 1L) * 10000000L + i, i % accounts, b + 1L))
      CdcPipeline.applyWarehouseBatch(batch, root2, 64, b + 1L)
      if (b % 8 == 7) // stale replay: the gate must skip it wholesale
        CdcPipeline.applyWarehouseBatch(batch, root2, 64, b.toLong)
      if (b == nBatches / 2) { // crash window: data written, gate lost
        require(gate.delete(), "gate file missing before crash injection")
        CdcPipeline.applyWarehouseBatch(batch, root2, 64, b + 1L)
      }
    }
    val chaosSecs = (System.nanoTime() - t2) / 1e9
    // exact end state: key zone z (of accounts/perBatch zones) was last
    // written by the highest batch b ≤ nBatches with (b-1) mod zones == z
    val zones = accounts / perBatch
    val snap = spark.read.option("mergeSchema", "true")
      .parquet(s"$root2/public.t1")
      .select(col("id").cast("long").as("id"), col("val").cast("long").as("val"))
    require(snap.count() == accounts, "row count drifted under chaos")
    val byZone = snap.groupBy((col("id") / perBatch).cast("int").as("zone"))
      .agg(countDistinct("val").as("nvals"), max("val").as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    byZone.foreach { case (z, nvals, v) =>
      val expect = (1 to nBatches).filter(b => (b - 1) % zones == z).max.toLong
      require(nvals == 1 && v == expect,
        s"zone $z: expected uniform val=$expect, got $nvals distinct (max $v)")
    }
    println(f"pgbench analog: $accounts%,d-row seed in $seedSecs%.1f s; " +
      f"$updates%,d update rows across $nBatches batches " +
      f"(+${nBatches / 8} stale replays, 1 crash-window replay) in " +
      f"$chaosSecs%.1f s (${updates / chaosSecs}%.0f rows/s); end state exact")
    spark.stop()
  }
}
