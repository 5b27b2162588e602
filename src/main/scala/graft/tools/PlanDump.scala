package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Optimization-round measurement harness (guide §1): for every declared
  * query, capture `.explain("formatted")` to a file, and (with
  * GRAFT_PLAN_PROFILE=1) run the query once against the noop sink while a
  * SparkListener counts jobs / stages / tasks and shuffle bytes. The
  * profile table is the structural-overhead map: at bench scale every
  * Exchange materialization is a fixed-cost job, so a query's wall time
  * tracks its job+stage count, not its data volume.
  *
  * Usage: sbt "runMain graft.tools.PlanDump <outDir> [suffix]"
  *   GRAFT_PLAN_ONLY=q1_pricing,... to restrict
  *   GRAFT_PLAN_PROFILE=1 to also run+profile each query
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/plans/r15"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val profile = sys.env.get("GRAFT_PLAN_PROFILE").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val only = sys.env.get("GRAFT_PLAN_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // Structural counters: jobs/stages/tasks + shuffle bytes per query.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead)
        }
      }
    }
    if (profile) spark.sparkContext.addSparkListener(listener)

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        if (profile) {
          jobs.set(0); stages.set(0); tasks.set(0)
          shufWrite.set(0); shufRead.set(0)
          spark.sparkContext.setJobDescription(s"profile:$name")
          val t0 = System.nanoTime()
          // Fresh build: the builder itself may run jobs (collect/
          // checkpoint); counting them is the point.
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val secs = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150) // let listener events drain
          val exch = "Exchange".r.findAllIn(plan).size
          rows += f"$name%-28s $secs%7.2f s  jobs=${jobs.get}%-3d " +
            f"stages=${stages.get}%-3d tasks=${tasks.get}%-5d " +
            f"exch=$exch%-2d shufW=${shufWrite.get / 1024}%6d KiB " +
            f"shufR=${shufRead.get / 1024}%6d KiB"
        }
      } catch {
        case t: Throwable =>
          rows += f"$name%-28s FAILED: ${Option(t.getMessage).getOrElse(t.getClass.getName).take(120)}"
      }
    }
    if (profile) {
      val table = rows.mkString("\n") + "\n"
      print(table)
      Files.write(Paths.get(s"$outDir/_profile_$suffix.txt"),
        table.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
