package graft

import java.io.File
import java.nio.file.Files
import graft.llmops.{Sketch, SketchStore}
import org.apache.spark.sql.functions._

/** The durable sketch store: persisted KMV/CMS state must equal the
  * batch sketch over everything ever ingested — across batches, across
  * a kill → resume, and across compaction. */
class SketchStoreSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus(n: Int, off: Int = 0) =
    (0 until n).map { i =>
      val src = s"src${(i + off) % 3}"
      (i.toLong + off, src,
        (0 until 20).map(j => s"tok${(i * 31 + off * 7 + j * 13) % 400}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")

  private def tokens(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), explode(split(col("text"), " ")).as("tok"))

  test("KMV: batched intake + compact equal the one-shot batch sketch") {
    val root = Files.createTempDirectory("sk-kmv").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(300)
    // three uneven batches
    Seq((0, 100), (100, 80), (180, 120)).zipWithIndex.foreach {
      case ((lo, n), id) =>
        store.addKmvBatch(
          tokens(full.filter(col("doc_id") >= lo && col("doc_id") < lo + n)),
          "source", col("tok"), id.toLong)
    }
    val expect = Sketch.kmvDistinct(tokens(full), "source", col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def got() = store.kmvEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got() == expect, s"merged store must equal batch sketch: " +
      s"${got()} vs $expect")

    // replay safety: re-adding an epoch (same id, same rows) is a no-op
    store.addKmvBatch(
      tokens(full.filter(col("doc_id") >= 100 && col("doc_id") < 180)),
      "source", col("tok"), 1L)
    assert(got() == expect, "replayed epoch must not change the sketch")

    // pruned per-group serving agrees with the full read
    val one = store.kmvEstimateFor(spark, Seq("src1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("src1" -> expect("src1")))

    // compact folds all but the NEWEST b-dir (a replayable uncommitted
    // epoch must never find the merged store under its own name);
    // estimates unchanged
    val folded = store.compact(spark)
    assert(folded("kmv") == 2, s"fold count: $folded")
    assert(new File(s"$root/kmv").listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("b")) == 2)
    assert(got() == expect, "compaction must preserve the sketch")
  }

  test("CMS: cells add across batches; estimates equal the batch table") {
    val root = Files.createTempDirectory("sk-cms").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(250)
    Seq((0, 100), (100, 100), (200, 50)).zipWithIndex.foreach {
      case ((lo, n), id) =>
        store.addCmsBatch(
          tokens(full.filter(col("doc_id") >= lo && col("doc_id") < lo + n)),
          col("tok"), id.toLong)
    }
    val expectCells = Sketch.cmsTable(tokens(full), col("tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotCells = store.cmsCells(spark)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCells == expectCells, "summed cells must equal the batch table")

    // point estimates from the stored sketch ≥ exact counts (CMS bound)
    val probes = Seq("tok1", "tok17", "tok399").toDF("tok")
    val est = store.cmsEstimate(spark, probes, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = tokens(full).filter(col("tok").isin("tok1", "tok17", "tok399"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t: estimate ${est(t)} below exact $n")
    }
    assert(store.compact(spark)("cms") == 2) // b0+b1 fold, b2 stays
    val afterFold = store.cmsCells(spark)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(afterFold == expectCells)
  }

  test("streaming intake: kill -> resume equals the batch sketch over the full input") {
    val root = Files.createTempDirectory("sk-rs").toFile.getAbsolutePath + "/sk"
    val srcDir = Files.createTempDirectory("sk-rs-src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("sk-rs-ck").toFile.getAbsolutePath
    val store = new SketchStore(root)

    // each landed batch is its own subdir — glob them (the file source
    // does not recurse), one file per trigger for several epochs per run
    def stream() = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")

    // run 1: two files, then the query STOPS (kill)
    corpus(120).write.mode("overwrite").parquet(s"$srcDir/f1")
    corpus(90, off = 120).write.mode("overwrite").parquet(s"$srcDir/f2")
    val q1 = store.startKmv(
      tokens(stream()), "source", col("tok"), ckpt)
    q1.awaitTermination()

    // more data lands while the intake is down
    corpus(140, off = 300).write.mode("overwrite").parquet(s"$srcDir/f3")

    // run 2: RESUME from the same checkpoint — only the new file runs
    val q2 = store.startKmv(
      tokens(stream()), "source", col("tok"), ckpt)
    q2.awaitTermination()

    val full = corpus(120)
      .unionByName(corpus(90, off = 120))
      .unionByName(corpus(140, off = 300))
    val expect = Sketch.kmvDistinct(tokens(full), "source", col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = store.kmvEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect,
      s"resumed store must equal the batch sketch: $got vs $expect")

    // the CMS side through the same kill -> resume shape
    val cmsCkpt = Files.createTempDirectory("sk-rs-ck2").toFile.getAbsolutePath
    val c1 = store.startCms(tokens(stream()).select("tok"), col("tok"), cmsCkpt)
    c1.awaitTermination()
    corpus(60, off = 440).write.mode("overwrite").parquet(s"$srcDir/f4")
    val c2 = store.startCms(tokens(stream()).select("tok"), col("tok"), cmsCkpt)
    c2.awaitTermination()
    val full4 = full.unionByName(corpus(60, off = 440))
    val expectCells = Sketch.cmsTable(tokens(full4), col("tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotCells = store.cmsCells(spark)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCells == expectCells,
      "resumed CMS cells must equal the batch table over the full input")
  }

  test("HLL: batched intake, replay, pruned serving, compact, kill -> resume") {
    val root = Files.createTempDirectory("sk-hll").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(300)
    Seq((0, 100), (100, 80), (180, 120)).zipWithIndex.foreach {
      case ((lo, n), id) =>
        store.addHllBatch(
          tokens(full.filter(col("doc_id") >= lo && col("doc_id") < lo + n)),
          "source", col("tok"), id.toLong)
    }
    val expect = Sketch.hllDistinct(tokens(full), "source", col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def got() = store.hllEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got() == expect,
      s"merged HLL store must equal batch sketch: ${got()} vs $expect")

    // replay: re-adding an epoch overwrites its own dir — no drift
    store.addHllBatch(
      tokens(full.filter(col("doc_id") >= 100 && col("doc_id") < 180)),
      "source", col("tok"), 1L)
    assert(got() == expect)

    // pruned per-group serving
    val one = store.hllEstimateFor(spark, Seq("src1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("src1" -> expect("src1")))

    // compact folds all but the newest; estimates unchanged
    assert(store.compact(spark)("hll") == 2)
    assert(new File(s"$root/hll").listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("b")) == 2)
    assert(got() == expect)

    // streaming intake with a kill -> resume equals one batch sketch
    val srcDir = Files.createTempDirectory("sk-hll-src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("sk-hll-ck").toFile.getAbsolutePath
    val root2 = Files.createTempDirectory("sk-hll2").toFile.getAbsolutePath + "/sk"
    val store2 = new SketchStore(root2)
    def stream() = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
    corpus(120).write.mode("overwrite").parquet(s"$srcDir/f1")
    val q1 = store2.startHll(tokens(stream()), "source", col("tok"), ckpt)
    q1.awaitTermination()
    corpus(140, off = 300).write.mode("overwrite").parquet(s"$srcDir/f2")
    val q2 = store2.startHll(tokens(stream()), "source", col("tok"), ckpt)
    q2.awaitTermination()
    val full2 = corpus(120).unionByName(corpus(140, off = 300))
    val expect2 = Sketch.hllDistinct(tokens(full2), "source", col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got2 = store2.hllEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == expect2,
      s"resumed HLL store must equal the batch sketch: $got2 vs $expect2")
  }

  test("hist: batched intake + compact + pruned quantiles equal the batch histogram") {
    val root = Files.createTempDirectory("sk-hist").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(300)
    val lenCol = length(col("text")).cast("long")
    Seq((0, 100), (100, 80), (180, 120)).zipWithIndex.foreach {
      case ((lo, n), id) =>
        store.addHistBatch(
          full.filter(col("doc_id") >= lo && col("doc_id") < lo + n),
          "source", lenCol, id.toLong)
    }
    val expectCells = Sketch.histTable(full, "source", lenCol)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def cells() = store.histCells(spark)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells() == expectCells)

    // replay overwrites its own dir — counts never double
    store.addHistBatch(
      full.filter(col("doc_id") >= 100 && col("doc_id") < 180),
      "source", lenCol, 1L)
    assert(cells() == expectCells)

    // quantile serving (full + part-pruned) equals the batch read-out
    val qs = Seq(500L, 900L)
    val expectQ = Sketch.histQuantiles(
        Sketch.histTable(full, "source", lenCol), "source", qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotQ = store.histQuantiles(spark, qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotQ == expectQ)
    val one = store.histQuantilesFor(spark, Seq("src2"), qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(one == expectQ.filter(_._1._1 == "src2"))

    // compact folds all but the newest; cells unchanged
    assert(store.compact(spark)("hist") == 2)
    assert(cells() == expectCells)
  }

  test("compact crash windows: committed staging rolls forward, partial rolls back") {
    val root = Files.createTempDirectory("sk-heal").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(120)
    (0 until 3).foreach { id =>
      store.addKmvBatch(tokens(full.filter(
          col("doc_id") >= id * 40 && col("doc_id") < (id + 1) * 40)),
        "source", col("tok"), id.toLong)
    }
    val expect = store.kmvEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    def copyDir(src: File, dst: File): Unit = {
      dst.mkdirs()
      Option(src.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isDirectory) copyDir(f, new File(dst, f.getName))
        else java.nio.file.Files.copy(f.toPath, new File(dst, f.getName).toPath)
      }
    }

    // COMMITTED crash window: a finished fold (staging + _SUCCESS +
    // _target) whose original b-dirs were only partially deleted —
    // compact must roll FORWARD (keep the folded copy, drop originals)
    val kmvDir = new File(s"$root/kmv")
    store.compact(spark) // produce the folded layout to replay from
    val folded = kmvDir.listFiles().filter(_.getName.startsWith("b"))
      .minBy(_.getName.stripPrefix("b").toLong) // the folded dir, not the live newest
    val staged = new File(kmvDir, "_fold")
    copyDir(folded, staged)
    val tgt = new File(staged, "_target")
    java.nio.file.Files.write(tgt.toPath, folded.getName.getBytes)
    assert(new File(staged, "_SUCCESS").exists())
    store.compact(spark)
    assert(!staged.exists(), "committed staging must be consumed")
    assert(store.kmvEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect,
      "roll-forward must preserve the sketch")

    // PARTIAL crash window: staging without _SUCCESS — discarded, the
    // original dirs untouched
    val staged2 = new File(kmvDir, "_fold")
    staged2.mkdirs()
    java.nio.file.Files.write(
      new File(staged2, "part-garbage.parquet").toPath, Array[Byte](1, 2))
    store.compact(spark)
    assert(!staged2.exists(), "partial staging must be rolled back")
    assert(store.kmvEstimates(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
  }

  test("maintenance verb: sketch-serve reads estimates and quantiles via env") {
    val root = Files.createTempDirectory("sk-serve").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    val full = corpus(200)
    store.addKmvBatch(tokens(full), "source", col("tok"), 0L)
    store.addHllBatch(tokens(full), "source", col("tok"), 0L)
    store.addHistBatch(full, "source", length(col("text")).cast("long"), 0L)
    val lines = graft.streaming.GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "sketch-serve", "GRAFT_SKETCH_STORE" -> root,
      "GRAFT_SKETCH_GROUPS" -> "src1", "GRAFT_SKETCH_QUANTILES" -> "500"))
    assert(lines.exists(_.startsWith("sketch-serve kmv: src1:")), lines.mkString("|"))
    assert(lines.exists(_.startsWith("sketch-serve hll: src1:")), lines.mkString("|"))
    assert(lines.exists(l => l.startsWith("sketch-serve hist: src1:500:")),
      lines.mkString("|"))
    // the pruned serve line carries the same estimate as the direct read
    val direct = store.kmvEstimateFor(spark, Seq("src1")).head().getLong(1)
    assert(lines.exists(_.contains(s"src1:$direct")), lines.mkString("|"))
  }

  test("maintenance verb: sketch-store folds via env") {
    val root = Files.createTempDirectory("sk-verb").toFile.getAbsolutePath + "/sk"
    val store = new SketchStore(root)
    (0 until 3).foreach { id =>
      store.addKmvBatch(tokens(corpus(50, off = id * 50)), "source",
        col("tok"), id.toLong)
    }
    val lines = graft.streaming.GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "sketch-store", "GRAFT_SKETCH_STORE" -> root))
    assert(lines.exists(_.startsWith("sketch-store: folded")), lines.mkString)
    assert(new File(s"$root/kmv").listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("b")) == 2)
  }
}
