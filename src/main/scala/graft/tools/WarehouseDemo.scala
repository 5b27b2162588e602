package graft.tools

import graft.model.{CdcColumn, CdcEvent}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.SparkSession
import java.io.File
import java.nio.file.Files

/** Warehouse-path volume pass: a large initial batch MERGE'd into the
  * hash-bucketed parquet replica, then a SMALL batch — measuring both
  * throughput and the partition-pruning contract (the small batch must
  * rewrite only its touched buckets' files, not the snapshot).
  * Run: `sbt "runMain graft.tools.WarehouseDemo [nRows]"`. */
object WarehouseDemo {
  private def filesOf(root: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new File(root)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("wh-demo").toFile.getAbsolutePath
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(op: String, lsn: Long, id: Long, v: Long) =
      CdcEvent(op, lsn, 1L, ts, "public", "t1",
        if (op == "c") Nil else Seq(CdcColumn("id", id.toString)),
        if (op == "d") Nil
        else Seq(CdcColumn("id", id.toString), CdcColumn("val", v.toString)),
        keyColumns = Seq("id"))

    // initial load: n inserts
    val big = spark.range(n).map(i => ev("c", i, i, i * 10))
    val t0 = System.nanoTime()
    CdcPipeline.applyWarehouseBatch(big, root, numBuckets = 64, batchId = 0)
    val loadSecs = (System.nanoTime() - t0) / 1e9
    println(f"initial load: $n rows in $loadSecs%.2f s (${n / loadSecs}%.0f rows/s)")

    val before = filesOf(s"$root/public.t1")

    // small incremental batch confined to 2 of the 64 buckets — the
    // hot-partition shape where pruning pays (scattered keys would
    // legitimately touch every bucket)
    import org.apache.spark.sql.functions.{col, hash, pmod, lit}
    // the replica buckets on the flattened STRING key value
    val hotKeys = spark.range(n)
      .select(col("id"), pmod(hash(col("id").cast("string")), lit(64)).as("b"))
      .filter(col("b") < 2).limit(1100).select("id").as[Long].collect()
    val small = spark.createDataset(hotKeys.take(1000).zipWithIndex.map {
      case (k, i) => ev("u", n + i, k, 9999L)
    }).union(spark.createDataset(hotKeys.slice(1000, 1100).zipWithIndex.map {
      case (k, i) => ev("d", n + 2000 + i, k, 0L)
    }))
    val t1 = System.nanoTime()
    CdcPipeline.applyWarehouseBatch(small, root, numBuckets = 64, batchId = 1)
    val mergeSecs = (System.nanoTime() - t1) / 1e9

    val after = filesOf(s"$root/public.t1")
    val untouchedIntact = before.count { case (p, m) =>
      after.get(p).contains(m)
    }
    println(f"incremental MERGE: 1100 changes in $mergeSecs%.2f s; " +
      f"$untouchedIntact of ${before.size} pre-existing files untouched " +
      "(bucket-pruned rewrite)")

    val cnt = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/public.t1").count()
    println(s"final row count: $cnt (expect ${n - 100})")

    // SURVEY §6 capacity analog: ONE streamed (v2) transaction larger
    // than any sane executor buffer, sealed via the TxnSpill disk path —
    // DML chunks arrive across three batches, commit in the last, and
    // nothing scales with transaction size but parquet bytes.
    val bigTx = math.max(n * 5, 1000000)
    val root2 = Files.createTempDirectory("wh-demo-bigtx").toFile.getAbsolutePath
    val spill = s"$root2/_txspill"
    def chunk(lo: Long, hi: Long) = spark.range(lo, hi)
      .map(i => ev("c", 10 + i, i, i).copy(isFinalBatch = false))
    def ctl(op: String, lsn: Long) = spark.createDataset(Seq(
      CdcEvent(op, lsn, 1L, ts, null, null, Nil, Nil, isFinalBatch = false)))
    val t2 = System.nanoTime()
    val b0 = ctl(graft.streaming.TxnAssembler.Ctl.StreamStart, 1)
      .union(chunk(0, bigTx / 3))
    val r0 = graft.streaming.TxnSpill.resolve(b0, spill)
    graft.streaming.CdcPipeline.applyWarehouseBatch(r0.ready.as[CdcEvent], root2, 64, 0)
    r0.commit()
    val r1 = graft.streaming.TxnSpill.resolve(chunk(bigTx / 3, 2 * bigTx / 3), spill)
    graft.streaming.CdcPipeline.applyWarehouseBatch(r1.ready.as[CdcEvent], root2, 64, 1)
    r1.commit()
    val b2 = chunk(2 * bigTx / 3, bigTx)
      .union(ctl(graft.streaming.TxnAssembler.Ctl.StreamCommit, bigTx + 100))
    val r2 = graft.streaming.TxnSpill.resolve(b2, spill)
    graft.streaming.CdcPipeline.applyWarehouseBatch(r2.ready.as[CdcEvent], root2, 64, 2)
    r2.commit()
    val bigSecs = (System.nanoTime() - t2) / 1e9
    val bigCnt = spark.read.parquet(s"$root2/public.t1").count()
    println(f"single $bigTx-row streamed tx via TxnSpill: sealed+applied in " +
      f"$bigSecs%.2f s (${bigTx / bigSecs}%.0f rows/s); replica rows: $bigCnt")

    // Durable LSH dedup index: incremental corpus intake against the
    // persisted signature index (llmops.LshIndexStore) — batch 2 plants
    // exact copies of batch-1 docs and must catch them via the index,
    // reading only the touched part dirs.
    val idxRoot = Files.createTempDirectory("wh-demo-lsh").toFile.getAbsolutePath
    val store = new graft.llmops.LshIndexStore(s"$idxRoot/idx", simThreshold = 0.9)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val t3 = System.nanoTime()
    val h1 = store.addBatch(spark, docs.filter($"doc_id" < 2500), 0L).count()
    val dupes = docs.filter($"doc_id" >= 2500 && $"doc_id" < 2600)
    val h2 = store.addBatch(spark,
      docs.filter($"doc_id" < 100).withColumn("doc_id", $"doc_id" + 90000)
        .unionByName(dupes), 1L).count()
    val lshSecs = (System.nanoTime() - t3) / 1e9
    println(f"LSH index intake: 2500-doc seed + 200-doc increment in " +
      f"$lshSecs%.2f s; increment hits: $h2 (100 planted copies), " +
      s"planned dirs: ${store.lastPlannedDirs.size}")

    // Secondary projection: the same rows re-bucketed on a non-primary
    // column; a point query on it reads ONE bucket of 64
    import org.apache.spark.sql.functions.{col, lit, pmod, hash => shash}
    val projRoot = Files.createTempDirectory("wh-demo-proj").toFile.getAbsolutePath
    val proj = new graft.sinks.ProjectionSink(
      s"$projRoot/by_group", Seq("id"), "grp", numBuckets = 64)
    val t4 = System.nanoTime()
    proj.applyBatch(spark, spark.range(n)
      .select(col("id"), pmod(shash(col("id")), lit(5000)).as("grp"),
        (col("id") * 10).as("v"), lit("c").as("op"), col("id").as("lsn"),
        lit(null).cast("int").as("__old_idx")), 0)
    val projSecs = (System.nanoTime() - t4) / 1e9
    val probe = proj.lookup(spark, 42)
    val hits = probe.count()
    println(f"secondary projection: $n rows re-bucketed by grp in " +
      f"$projSecs%.2f s; point lookup grp=42 -> $hits rows from one bucket")
    spark.stop()
  }
}
