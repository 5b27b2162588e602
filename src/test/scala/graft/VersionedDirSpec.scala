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

  private def counter(name: String): Double =
    VersionedDir.metricsSnapshot().getOrElse(s"graft_publish_${name}_total", 0.0)

  test("a concurrent publisher fails cleanly; the holder's publish is intact") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(3)) == 1L)
    // simulate publisher A mid-publish: its lease is on disk
    fs.create(new Path(root, "_LEASE"), false).close()
    val contendedBefore = counter("lease_contended")
    val e = intercept[IllegalStateException] {
      VersionedDir.publish(spark, root, writeV(99))
    }
    assert(e.getMessage.contains("concurrent publish refused"), e.getMessage)
    assert(counter("lease_contended") == contendedBefore + 1,
      "contention must surface as a metric, not only an exception")
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
    val brokenBefore = counter("lease_broken")
    assert(VersionedDir.publish(spark, root, writeV(4)) == 2L)
    assert(counter("lease_broken") == brokenBefore + 1,
      "a stale-lease break must increment the broken counter")
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
    val displacedBefore = counter("heartbeat_displaced")
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
    assert(counter("heartbeat_displaced") >= displacedBefore + 1,
      "a displaced heartbeat must increment its counter")
    fs.delete(lease, false)
  }

  test("a displaced holder aborts before the pointer swing") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(1)) == 1L)
    val lease = new Path(root, "_LEASE")
    val abortsBefore = counter("fence_abort")
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
    assert(counter("fence_abort") == abortsBefore + 1,
      "a fence abort must increment its counter")
    // nothing became visible: the pointer still resolves v1, and the
    // breaker's lease survives our abort
    assert(VersionedDir.currentPath(spark, root).get.endsWith("/v1"))
    assert(fs.exists(lease))
    fs.delete(lease, false)
  }

  test("a displaced holder's late writes never touch the breaker's " +
      "committed version (attempt-unique staging)") {
    val root = newRoot()
    val fs = fsOf(root)
    assert(VersionedDir.publish(spark, root, writeV(1)) == 1L)
    val lease = new Path(root, "_LEASE")
    var zombieStage: String = null
    intercept[IllegalStateException] {
      VersionedDir.publish(spark, root, { dir =>
        zombieStage = dir
        writeV(5)(dir)
        // the breaker judged us stale mid-freeze and ran a COMPLETE
        // publish of the same slot (v2): its own staging dir, rename,
        // pointer swing, its own lease
        fs.delete(lease, false)
        val out = fs.create(lease, false)
        out.write("breaker".getBytes("UTF-8")); out.close()
        writeV(7)(s"$root/_v2-breaker1")
        assert(fs.rename(new Path(s"$root/_v2-breaker1"),
          new Path(s"$root/v2")))
        val cur = fs.create(new Path(root, "CURRENT"), true)
        cur.write("2".getBytes("UTF-8")); cur.close()
        // the zombie resumes and keeps WRITING after the breaker has
        // committed — every byte must land in its own staging dir, at
        // a path the breaker never computes
        writeV(9)(dir)
      })
    }
    // the breaker's v2 is untouched by the zombie's late writes...
    assert(spark.read.parquet(s"$root/v2").count() == 7L,
      "the committed version must survive a zombie's late writes")
    // ...which are stranded in the zombie's own attempt-unique staging
    assert(zombieStage != null && new Path(zombieStage).getName
      .startsWith("_v2-"), zombieStage)
    assert(spark.read.parquet(zombieStage).count() == 9L)
    assert(VersionedDir.current(spark, root).contains(2L))
    fs.delete(lease, false)
    // the orphan staging dir is swept (age-gated) by a later publish
    fs.setTimes(new Path(zombieStage), 1000L, -1)
    assert(VersionedDir.publish(spark, root, writeV(3)) == 3L)
    assert(!fs.exists(new Path(zombieStage)),
      "an aged orphan staging dir must be swept by the next publish")
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
