package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (guide: lazy val, not per test). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session

  /** Wait for an async listener-bus-fed counter to go quiet: returns
    * its value once `read` is unchanged across `stablePolls`
    * consecutive `pollMs` sleeps. Shared by the job-count and
    * scan-count specs so the drain heuristic lives in one place. */
  def awaitQuiet(read: => Int, pollMs: Long = 200L,
                 stablePolls: Int = 3): Int = {
    var last = -1
    var same = 0
    while (same < stablePolls) {
      Thread.sleep(pollMs)
      val cur = read
      if (cur == last) same += 1 else { same = 0; last = cur }
    }
    read
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toFile.getAbsolutePath)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
