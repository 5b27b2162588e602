package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.llmops.VersionedDir

/** The versioned-publish protocol's single-publisher guard: two
  * publishers racing on one root must not clobber each other — the
  * loser fails cleanly, the winner's version and retention survive,
  * and a stale lease from a crashed publisher never wedges the root. */
class VersionedDirSpec extends SparkSpecBase {

  private def newRoot(): String =
    Files.createTempDirectory("vdir").toFile.getAbsolutePath + "/docs"

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def writeV(n: Long)(dir: String): Unit = {
    spark.range(n).select(col("id"))
      .write.mode("overwrite").parquet(dir)
  }

  test("a concurrent publisher fails cleanly; the holder's publish is intact") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(3)) == 1L)
    // simulate publisher A mid-publish: its lease is on disk
    fs.create(new Path(root, "_LEASE"), false).close()
    val e = intercept[IllegalStateException] {
      VersionedDir.publish(spark, root, writeV(99))
    }
    assert(e.getMessage.contains("concurrent publish refused"), e.getMessage)
    // the loser touched nothing: v1 is still CURRENT and complete
    assert(VersionedDir.current(spark, root).contains(1L))
    assert(spark.read.parquet(VersionedDir.currentPath(spark, root).get)
      .count() == 3L)
    // holder finishes (its own publish path releases the lease); here A
    // "completes" by dropping the lease, and the next publisher proceeds
    fs.delete(new Path(root, "_LEASE"), false)
    assert(VersionedDir.publish(spark, root, writeV(5)) == 2L)
    assert(spark.read.parquet(VersionedDir.currentPath(spark, root).get)
      .count() == 5L)
  }

  test("a stale lease from a crashed publisher is broken, not a deadlock") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(2)) == 1L)
    // crashed publisher: lease left behind, no process holds it
    val lease = new Path(root, "_LEASE")
    fs.create(lease, false).close()
    fs.setTimes(lease, System.currentTimeMillis() - 60L * 60 * 1000, -1)
    // over the ttl -> broken and the publish proceeds
    assert(VersionedDir.publish(spark, root, writeV(4)) == 2L)
    assert(spark.read.parquet(VersionedDir.currentPath(spark, root).get)
      .count() == 4L)
    // the winner released its own lease on the way out
    assert(!fs.exists(lease))
  }

  test("a failed write releases the lease so a retry can proceed") {
    val root = newRoot()
    val fs = fsOf(root)
    intercept[RuntimeException] {
      VersionedDir.publish(spark, root,
        _ => throw new RuntimeException("writer died"))
    }
    assert(!fs.exists(new Path(root, "_LEASE")),
      "a failed publish must not wedge the root")
    assert(VersionedDir.publish(spark, root, writeV(1)) == 1L)
  }

  test("a broken slow holder cannot remove the breaker's lease (token)") {
    val root = newRoot()
    val fs = fsOf(root)
    val lease = new Path(root, "_LEASE")
    VersionedDir.withLease(spark, root) {
      // mid-run, a breaker decided we were stale and replaced our
      // lease with its own token — our release must NOT delete it
      fs.delete(lease, false)
      fs.create(lease, false).close()
    }
    assert(fs.exists(lease),
      "the breaker's lease must survive the displaced holder's release")
    fs.delete(lease, false)
    // normal case: a holder's own lease is released on the way out
    VersionedDir.withLease(spark, root)(())
    assert(!fs.exists(lease))
  }

  test("tryWithLease skips on contention only, never on real failures") {
    val root = newRoot()
    val fs = fsOf(root)
    fs.mkdirs(new Path(root))
    fs.create(new Path(root, "_LEASE"), false).close() // live holder
    assert(VersionedDir.tryWithLease(spark, root)(_ => 42).isEmpty,
      "a held lease must skip the work")
    fs.delete(new Path(root, "_LEASE"), false)
    assert(VersionedDir.tryWithLease(spark, root)(_ => 42).contains(42))
    // an IllegalStateException raised by the WORK is not contention
    intercept[IllegalStateException] {
      VersionedDir.tryWithLease(spark, root) { _ =>
        throw new IllegalStateException("real failure inside")
      }
    }
    assert(!fs.exists(new Path(root, "_LEASE")),
      "the lease releases even when the work fails")
  }

  test("a displaced holder's heartbeat never rewrites the breaker's lease") {
    val root = newRoot()
    val fs = fsOf(root)
    val lease = new Path(root, "_LEASE")
    VersionedDir.withLease(spark, root, leaseTtlMs = 3000L) {
      // a breaker replaced our lease; our heartbeat (1 s period at
      // this ttl) must see the foreign token and stop, not clobber it
      fs.delete(lease, false)
      val out = fs.create(lease, false)
      out.write("breaker".getBytes("UTF-8")); out.close()
      Thread.sleep(2500L)
      val in = fs.open(lease)
      val content =
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(content == "breaker",
        "heartbeat must stop once the lease carries another token")
    }
    assert(fs.exists(lease), "the breaker's lease survives our release")
    fs.delete(lease, false)
  }

  test("a displaced holder aborts before the pointer swing") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(1)) == 1L)
    val lease = new Path(root, "_LEASE")
    val e = intercept[IllegalStateException] {
      VersionedDir.publish(spark, root, { dir =>
        writeV(5)(dir)
        // a breaker decided we were stale and replaced our lease
        // while the freeze was running
        fs.delete(lease, false)
        val out = fs.create(lease, false)
        out.write("breaker".getBytes("UTF-8")); out.close()
      })
    }
    assert(e.getMessage.contains("before the pointer swing"), e.getMessage)
    // nothing became visible: the pointer still resolves v1, and the
    // breaker's lease survives our abort
    assert(VersionedDir.currentPath(spark, root).get.endsWith("/v1"))
    assert(fs.exists(lease))
    fs.delete(lease, false)
  }

  test("andThen runs inside the publish lease") {
    val root = newRoot()
    val fs = fsOf(root)
    var heldDuringAndThen = false
    VersionedDir.publish(spark, root, writeV(2),
      andThen = _ => heldDuringAndThen = fs.exists(new Path(root, "_LEASE")))
    assert(heldDuringAndThen,
      "post-publish maintenance must run under the lease")
    assert(!fs.exists(new Path(root, "_LEASE")))
  }
}
