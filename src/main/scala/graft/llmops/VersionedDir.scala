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
  * Crash matrix: during v<N> write → CURRENT untouched, partial dir has
  * no `_SUCCESS`, reclaimed next publish. After write, before swing →
  * CURRENT still names v<N-1> (complete). During swing → fallback
  * resolves v<N> (complete). After swing → done; at worst an orphan
  * `_CURRENT.<N>` tmp remains, swept by the next publish.
  */
private[graft] object VersionedDir {

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
    * Spark-committed dir (with `_SUCCESS`) at `dir`; the pointer swings
    * only after it returns. Returns the published version id.
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
  def publish(spark: SparkSession, root: String,
              write: String => Unit, retain: Int = 2,
              leaseTtlMs: Long = 15L * 60 * 1000): Long = {
    require(retain >= 1, "retain must keep at least the current version")
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    fs.mkdirs(rootPath)
    val lease = new Path(rootPath, "_LEASE")
    def tryAcquire(): Boolean =
      try { fs.create(lease, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val age = try System.currentTimeMillis() -
        fs.getFileStatus(lease).getModificationTime
      catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry
      if (age < leaseTtlMs)
        throw new IllegalStateException(
          s"another publisher holds $lease (age ${age}ms < ttl ${leaseTtlMs}ms); " +
            "concurrent publish refused")
      fs.delete(lease, false) // stale lease from a crashed publisher
      if (!tryAcquire())
        throw new IllegalStateException(
          s"lost the race re-acquiring $lease after breaking a stale lease")
    }
    try publishLocked(spark, fs, rootPath, root, write, retain)
    finally fs.delete(lease, false)
  }

  private def publishLocked(spark: SparkSession, fs: FileSystem,
                            rootPath: Path, root: String,
                            write: String => Unit, retain: Int): Long = {
    val prev = current(spark, root)
    val next = prev.getOrElse(0L) + 1L
    // sweep orphan pointer tmps from crashed swings before reusing
    // names, and clear a crashed partial v<next> wholesale — writers
    // that assemble the dir file-by-file (copies + multiple commits)
    // must start from an empty slot, not merge with dead leftovers
    if (fs.exists(rootPath)) {
      fs.listStatus(rootPath).toSeq
        .filter(_.getPath.getName.startsWith("_CURRENT."))
        .foreach(s => fs.delete(s.getPath, false))
      fs.delete(new Path(rootPath, s"v$next"), true)
    }
    write(versionPath(root, next))
    require(fs.exists(new Path(rootPath, s"v$next/_SUCCESS")),
      s"publish write for $root/v$next did not commit (_SUCCESS missing)")
    val tmp = new Path(rootPath, s"_CURRENT.$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes(UTF_8)) finally out.close()
    val cur = new Path(rootPath, "CURRENT")
    fs.delete(cur, false)
    fs.rename(tmp, cur)
    committedVersions(fs, rootPath).filter(_ <= next - retain)
      .foreach(v => fs.delete(new Path(rootPath, s"v$v"), true))
    next
  }
}
