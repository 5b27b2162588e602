package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned publish protocol for frozen artifacts: each publish writes
  * a COMPLETE `root/v<N>` dir, then atomically swings `root/CURRENT` to
  * N. Readers resolve the pointer once and read only complete versions,
  * so a crash mid-publish can never destroy (or even hide) the
  * previously-published artifact — the property the release verb's
  * frozen corpus needs (a destructive in-place `overwrite` of the live
  * dir deletes first and writes after; a crash in between loses the
  * ONLY copy). Same pointer discipline as [[Dedup.writeBloom]]'s
  * versioned Bloom artifact, extracted with two hardenings:
  *
  *  1. **Pointer read heals the delete→rename window.** The swing is
  *     tmp-write → delete(CURRENT) → rename(tmp, CURRENT); a crash
  *     between the delete and the rename leaves no pointer file. A
  *     reader that finds no CURRENT falls back to the max v-dir that
  *     carries Spark's `_SUCCESS` commit marker — which in that window
  *     is exactly the fully-written version the crashed publisher was
  *     about to announce. A version that crashed mid-WRITE has no
  *     `_SUCCESS` and is never resolved; the next publish reclaims its
  *     name with `mode(overwrite)` (next = current + 1 — the same slot).
  *  2. **Bounded retention keeps the previous version servable.**
  *     `retain` complete versions survive each publish (default 2:
  *     current + previous), so in-flight readers of v<N-1> finish
  *     against a complete dir and a rolled-back consumer (e.g. a shard
  *     manifest still referencing the prior release) stays servable.
  *
  * Crash matrix: during the staged write → CURRENT untouched, the
  * attempt-unique `_v<N>-<nonce>` staging dir has no committed rename,
  * swept (age-gated) by the next publish. After the staging rename,
  * before swing → CURRENT still names v<N-1> (complete). During swing →
  * fallback resolves v<N> (complete). After swing → done; at worst an
  * orphan `_CURRENT.<N>` tmp remains, swept by the next publish.
  *
  * **Filesystem requirements.** Mutual exclusion and the commit rename
  * assume atomic `create(…, overwrite=false)` and atomic `rename` —
  * true on HDFS, local filesystems, and ABFS. On a raw object store
  * without those primitives (e.g. S3A, where create-exclusive is
  * HEAD+PUT and rename is copy+delete) the lease is only ADVISORY: two
  * acquirers can both "win". Run the root on a strongly-consistent
  * filesystem, or front the store with a layer providing conditional
  * writes (S3 If-None-Match / a commit service) before relying on the
  * single-publisher guarantee there.
  */
private[graft] object VersionedDir {

  /** Publish-protocol observability: how often leases were taken,
    * contended, broken as stale, how often a displaced holder's
    * heartbeat stood down, and how often the commit-point fence
    * aborted a publish — the counters a nightly-release operator
    * watches to notice contention (exposed via the /metrics server
    * next to the curate funnel counters). */
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def bump(name: String): Unit =
    counters.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
  def metricsSnapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) =>
      s"graft_publish_${k}_total" -> v.get.toDouble }.toMap
  }

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  def versionPath(root: String, v: Long): String = s"$root/v$v"

  private def committedVersions(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.stripPrefix("v").toLong)
      .filter(v => fs.exists(new Path(root, s"v$v/_SUCCESS")))
      .sorted

  /** The current published version: the CURRENT pointer, or (pointer
    * lost to a crashed swing) the max complete version. */
  def current(spark: SparkSession, root: String): Option[Long] = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val cur = new Path(rootPath, "CURRENT")
    if (fs.exists(cur)) {
      val in = fs.open(cur)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toLong)
      finally in.close()
    } else committedVersions(fs, rootPath).lastOption
  }

  /** Resolved path of the current version (None before first publish). */
  def currentPath(spark: SparkSession, root: String): Option[String] =
    current(spark, root).map(v => versionPath(root, v))

  /** Publish the next version: `write(dir)` must leave a
    * Spark-committed dir (with `_SUCCESS`) at `dir`. `dir` is an
    * ATTEMPT-UNIQUE staging path (`_v<N>-<nonce>`, see
    * [[stagedVersion]]/[[stagedNonce]]): only after the write commits
    * AND the commit-point fence confirms the lease is still held does
    * the staging dir atomically rename to `v<N>` and the pointer
    * swing — so a displaced-but-alive holder's writes can never
    * overwrite a committed version's files (they land in its own
    * orphan staging dir, swept age-gated by the next publish).
    * Returns the published version id.
    *
    * Single-publisher guard: a create-exclusive `_LEASE` file is taken
    * before any slot is claimed, so two publishers racing on the same
    * root cannot both compute `next = current + 1` and clobber each
    * other's version dir — the loser fails cleanly with the winner's
    * version and retention intact. The lease is released in a finally
    * (a FAILED write never wedges the root); a publisher that crashes
    * hard leaves a stale lease that the next publish breaks once it is
    * older than `leaseTtlMs` (a crashed holder cannot still be
    * writing after that long; its partial v-dir has no `_SUCCESS` and
    * is reclaimed as before). */
  val DefaultLeaseTtlMs: Long = 15L * 60 * 1000

  /** Take the root's `_LEASE` (create-exclusive, a random holder token
    * inside). None when a LIVE holder exists; a stale lease (older
    * than ttl — its holder crashed, or lost the heartbeat that keeps a
    * live holder's lease fresh) is broken and re-acquired. */
  private def acquire(fs: FileSystem, lease: Path,
                      leaseTtlMs: Long): Option[String] = {
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lease, false)
        try out.write(token.getBytes(UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) { bump("lease_acquired"); Some(token) }
    else {
      val age = try System.currentTimeMillis() -
        fs.getFileStatus(lease).getModificationTime
      catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry
      if (age < leaseTtlMs) None
      else {
        // stale lease from a crashed publisher: break it by ATOMIC
        // RENAME to a tombstone — of two racing breakers exactly one
        // rename succeeds, so the loser can never delete the winner's
        // freshly created lease (the delete-then-create TOCTOU)
        def readAt(p: Path): Option[String] =
          try {
            val in = fs.open(p)
            try Some(new String(in.readAllBytes(), UTF_8)) finally in.close()
          } catch { case _: java.io.IOException => None }
        val staleTok = readAt(lease) // the token we judged stale
        val tomb = new Path(lease.getParent, s"_LEASE.broken.$token")
        val broke = try fs.rename(lease, tomb)
        catch { case _: java.io.IOException => false }
        if (!broke) {
          // rename failed: either another breaker won, or the holder
          // RELEASED between our create attempt and now — a free path
          // must not read as contention
          val vanished = try !fs.exists(lease)
          catch { case _: java.io.IOException => false }
          if (vanished && tryCreate()) { bump("lease_acquired"); Some(token) }
          else None
        } else {
          // our staleness judgment itself races: revalidate by
          // CONTENT (rename-invariant — object-store renames are
          // copy+delete and reset mtime, so an mtime check would make
          // a stale lease unbreakable there). If what we renamed no
          // longer carries the token we judged stale, a new holder
          // raced in: hand its lease back and stand down; if the
          // hand-back loses a further race (a third acquirer took the
          // path), drop the tomb — that holder will fence-abort.
          val fresh = staleTok.isEmpty || !readAt(tomb).exists(_ == staleTok.get)
          if (fresh) {
            val handedBack = try fs.rename(tomb, lease)
            catch { case _: java.io.IOException => false }
            if (!handedBack) fs.delete(tomb, false)
            None
          } else {
            fs.delete(tomb, false)
            bump("lease_broken")
            if (tryCreate()) { bump("lease_acquired"); Some(token) }
            else None // a third arrived first
          }
        }
      }
    }
  }

  /** Delete the lease ONLY if it still carries our token: a slow
    * holder whose lease was broken must not remove the breaker's. */
  private def releaseLease(fs: FileSystem, lease: Path,
                           token: String): Unit = {
    val mine =
      try {
        val in = fs.open(lease)
        try new String(in.readAllBytes(), UTF_8) == token finally in.close()
      } catch { case _: java.io.IOException => false }
    if (mine) fs.delete(lease, false)
  }

  /** Keep a live holder's lease fresh every ttl/3 so only a CRASHED
    * holder ever goes stale — a slow publish (a huge distributed
    * freeze) holds the lease for as long as it runs. The refresh
    * REWRITES the lease file (same token) rather than `setTimes`:
    * object stores ship the base FileSystem's no-op setTimes, and a
    * silent no-op here would resurrect the exact concurrent-publish
    * corruption the heartbeat closes. */
  private def heartbeat(fs: FileSystem, lease: Path, token: String,
                        periodMs: Long): Thread = {
    val t = new Thread(() => {
      var live = true
      try while (live && !Thread.currentThread().isInterrupted) {
        Thread.sleep(periodMs)
        try {
          // refresh ONLY while the lease is still ours: a displaced
          // holder's heartbeat must never write its token back over
          // the breaker's lease (that would defeat the fence), and it
          // stops permanently once it sees another token. The
          // check-then-write NARROWS the overwrite window to one
          // read-to-write gap, it cannot close it (no CAS on a
          // filesystem); the commit-point fence is the backstop. A
          // MISSING lease is deliberately not re-created: it may mean
          // we were broken-and-swept, and the fence fails closed on a
          // persistently missing lease.
          val in = fs.open(lease)
          val mine = try new String(in.readAllBytes(), UTF_8) == token
            finally in.close()
          if (!mine) { bump("heartbeat_displaced"); live = false }
          else {
            val out = fs.create(lease, true)
            try out.write(token.getBytes(UTF_8)) finally out.close()
          }
        } catch { case _: java.io.IOException => () } // released under us
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$lease")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Thrown when the root's lease has a live holder — distinct from
    * any IllegalStateException the guarded work itself may raise, so
    * [[tryWithLease]] skips ONLY on contention. */
  final class LeaseHeldException(msg: String)
    extends IllegalStateException(msg)

  /** Acquire → heartbeat → run `f` (with a still-held fence callback)
    * → release. The fence re-reads the lease token with a short retry
    * (the heartbeat's rewrite is not atomic on every filesystem), so a
    * displaced-but-alive holder can notice it was broken BEFORE making
    * anything visible. */
  private def withLeaseImpl[T](spark: SparkSession, root: String,
                               leaseTtlMs: Long)
                              (f: (() => Boolean) => T): T = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    fs.mkdirs(rootPath)
    val lease = new Path(rootPath, "_LEASE")
    val token = acquire(fs, lease, leaseTtlMs).getOrElse {
      bump("lease_contended")
      throw new LeaseHeldException(
        s"another publisher holds $lease; concurrent publish refused")
    }
    val stillHeld = () => {
      // verdict rules, in order of evidence strength:
      //  - our own token on ANY read        -> held
      //  - a STABLE foreign token (the last retry still reads one,
      //    ruling out torn bytes from our own heartbeat's non-atomic
      //    rewrite)                          -> displaced
      //  - persistently MISSING (FNF x3)     -> displaced: the lease
      //    is definitively gone (broken and already swept), not
      //    throttled — fail closed
      //  - transient read ERRORS only        -> fail open to the
      //    lease's own guarantee; a throttling burst at the commit
      //    point must not discard a completed multi-hour freeze
      sealed trait R
      case object Mine extends R; case class Foreign(t: String) extends R
      case object Missing extends R; case object Err extends R
      def readTok(): R =
        try {
          val in = fs.open(lease)
          val t = try new String(in.readAllBytes(), UTF_8) finally in.close()
          if (t == token) Mine
          else if (t.isEmpty) Err // mid-rewrite truncation: in flux
          else Foreign(t)
        } catch {
          case _: java.io.FileNotFoundException => Missing
          case _: java.io.IOException => Err
        }
      var i = 0
      var out: Option[Boolean] = None
      var last: R = Err
      while (i < 3 && out.isEmpty) {
        last = readTok()
        last match {
          case Mine => out = Some(true)
          case _ if i < 2 => Thread.sleep(50L << i)
          case _ => ()
        }
        i += 1
      }
      out.getOrElse(last match {
        case Foreign(_) | Missing => false
        case _ => true
      })
    }
    val hb = heartbeat(fs, lease, token, math.max(1000L, leaseTtlMs / 3))
    try f(stillHeld)
    finally {
      // join BEFORE releasing: an in-flight heartbeat rewrite after
      // the delete would resurrect an orphan lease and wedge the root
      // for a full ttl
      hb.interrupt()
      try hb.join(10000L) catch { case _: InterruptedException => () }
      releaseLease(fs, lease, token)
    }
  }

  /** Run `f` while holding the root's publish lease — for maintenance
    * that must not overlap a publisher (e.g. pool GC, which would
    * reclaim a concurrent publisher's not-yet-manifested segment
    * writes as orphans). Throws [[LeaseHeldException]] if a live
    * holder exists. */
  def withLease[T](spark: SparkSession, root: String,
                   leaseTtlMs: Long = DefaultLeaseTtlMs)(f: => T): T =
    withLeaseImpl(spark, root, leaseTtlMs)(_ => f)

  /** Best-effort [[withLease]]: None (skipped) when a live holder has
    * the lease, instead of throwing — for optional maintenance that
    * the next run will redo anyway. `f` receives the still-held fence
    * so destructive work can re-check ownership right before acting. */
  def tryWithLease[T](spark: SparkSession, root: String,
                      leaseTtlMs: Long = DefaultLeaseTtlMs)
                     (f: (() => Boolean) => T): Option[T] =
    try Some(withLeaseImpl(spark, root, leaseTtlMs)(f))
    catch { case _: LeaseHeldException => None }

  /** [[withLease]] that ALSO hands `f` the still-held fence — for a
    * publisher that does long preparatory work (a chunked release
    * intake) under ONE lease spanning snapshot → intake → publish, so
    * no second publisher can interleave between its version snapshot
    * and its pointer swing. Pair with [[publishHeld]] for the publish
    * step; re-check the fence between long stages so a displaced
    * holder stops writing at the next stage boundary. */
  def withLeaseFenced[T](spark: SparkSession, root: String,
                         leaseTtlMs: Long = DefaultLeaseTtlMs)
                        (f: (() => Boolean) => T): T =
    withLeaseImpl(spark, root, leaseTtlMs)(f)

  /** [[publish]] for a caller ALREADY inside [[withLeaseFenced]] on the
    * same root (publish itself would re-acquire and self-conflict).
    * `stillHeld` must be the fence that [[withLeaseFenced]] provided. */
  def publishHeld(spark: SparkSession, root: String,
                  write: String => Unit, retain: Int,
                  stillHeld: () => Boolean,
                  leaseTtlMs: Long = DefaultLeaseTtlMs): Long = {
    require(retain >= 1, "retain must keep at least the current version")
    val rootPath = new Path(root)
    publishLocked(spark, fsOf(spark, rootPath), rootPath, root, write,
      retain, stillHeld, leaseTtlMs)
  }

  /** Version number of a staged publish dir (`_v<N>-<nonce>`), as
    * handed to the `write` callback. */
  def stagedVersion(stageDir: String): Long = {
    val n = new Path(stageDir).getName.stripPrefix("_v")
    n.substring(0, n.lastIndexOf('-')).toLong
  }

  /** Attempt nonce of a staged publish dir — embed it in every path
    * the write callback creates OUTSIDE the staging dir (shared pool
    * parents), so a displaced-but-alive holder's writes can never land
    * on a committed attempt's paths. */
  def stagedNonce(stageDir: String): String = {
    val n = new Path(stageDir).getName
    n.substring(n.lastIndexOf('-') + 1)
  }

  def publish(spark: SparkSession, root: String,
              write: String => Unit, retain: Int = 2,
              leaseTtlMs: Long = DefaultLeaseTtlMs,
              andThen: Long => Unit = _ => ()): Long = {
    require(retain >= 1, "retain must keep at least the current version")
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    withLeaseImpl(spark, root, leaseTtlMs) { stillHeld =>
      val v = publishLocked(spark, fs, rootPath, root, write, retain,
        stillHeld, leaseTtlMs)
      // still under the lease: post-publish maintenance that must not
      // overlap the NEXT publisher (pool GC after retention pruning).
      // Re-fenced: a holder displaced right after its swing must not
      // run destructive gc against the breaker's in-flight writes —
      // the skipped sweep is redone by the next publish
      if (stillHeld()) andThen(v)
      v
    }
  }

  private def publishLocked(spark: SparkSession, fs: FileSystem,
                            rootPath: Path, root: String,
                            write: String => Unit, retain: Int,
                            stillHeld: () => Boolean,
                            leaseTtlMs: Long): Long = {
    val prev = current(spark, root)
    val next = prev.getOrElse(0L) + 1L
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // sweep orphan pointer tmps from crashed swings before reusing
    // names, plus AGED staging dirs and lease tombstones: a fresh
    // tombstone may belong to a concurrent breaker mid-revalidation,
    // and a fresh staging dir to a just-displaced zombie mid-write —
    // age-gating keeps both sweeps off live actors' feet
    if (fs.exists(rootPath)) {
      val now = System.currentTimeMillis()
      fs.listStatus(rootPath).toSeq
        .filter { s =>
          val n = s.getPath.getName
          n.startsWith("_CURRENT.") ||
            ((n.startsWith("_LEASE.broken.") || n.startsWith("_v")) &&
              now - s.getModificationTime >= leaseTtlMs)
        }
        .foreach(s => fs.delete(s.getPath, true))
    }
    // ATTEMPT-UNIQUE staging: the write lands in _v<next>-<nonce>, a
    // path no other attempt (a zombie displaced mid-freeze, a breaker
    // re-running the same slot) ever computes — commit is one rename
    val stage = new Path(rootPath, s"_v$next-$nonce")
    write(stage.toString)
    require(fs.exists(new Path(stage, "_SUCCESS")),
      s"publish write for $stage did not commit (_SUCCESS missing)")
    // commit-point fence: a holder suspended past the ttl and broken
    // by another publisher must abort BEFORE making anything visible —
    // its staging dir stays an orphan and the breaker's publish stands
    if (!stillHeld()) {
      bump("fence_abort")
      throw new IllegalStateException(
        s"publish lease for $root was broken before the pointer swing; " +
          "aborting without publishing")
    }
    // the fence passed, so we own the slot: clear dead debris at the
    // final name (a pre-staging-era partial write), then commit
    fs.delete(new Path(rootPath, s"v$next"), true)
    require(fs.rename(stage, new Path(rootPath, s"v$next")),
      s"commit rename $stage -> $root/v$next failed")
    val tmp = new Path(rootPath, s"_CURRENT.$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes(UTF_8)) finally out.close()
    val cur = new Path(rootPath, "CURRENT")
    fs.delete(cur, false)
    fs.rename(tmp, cur)
    committedVersions(fs, rootPath).filter(_ <= next - retain)
      .foreach(v => fs.delete(new Path(rootPath, s"v$v"), true))
    bump("publish")
    next
  }

  /** All PUBLISHED versions still on disk, ascending — the retained
    * history a diagnostic (doc-fate's per-version membership) walks.
    * Capped at the current pointer: a version whose commit rename
    * landed but whose pointer swing crashed is complete on disk yet
    * was never announced — the next publish deletes and rewrites that
    * slot, so history must not report it. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new Path(root)
    val cur = current(spark, root).getOrElse(return Seq.empty)
    committedVersions(fsOf(spark, rootPath), rootPath).filter(_ <= cur)
  }
}
