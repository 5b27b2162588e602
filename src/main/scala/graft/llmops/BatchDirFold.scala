package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE committed-staging fold protocol for per-batch `b<id>` store
  * layouts (StreamingCurate stores, SketchStore) — extracted so the
  * crash-window rules live in a single place instead of drifting apart
  * per copy. Two rules both copies used to get wrong or risk getting
  * wrong:
  *
  *  1. **The newest b-dir NEVER folds.** A store's newest batch may
  *     belong to a checkpoint-uncommitted trigger: on resume the engine
  *     replays that epoch and the writer Overwrites its own `b<id>` dir
  *     (the store's replay-idempotence contract). If the fold had
  *     merged EVERYTHING into a dir of that name, the replay would
  *     replace the merged store with one batch's data — silent loss of
  *     every earlier batch. Folding `b0..b(n-1)` into `b(n-1)` is safe:
  *     a trigger for batch n only ever starts after batch n-1
  *     committed, so everything but the newest dir is durable.
  *  2. **Heal renames BEFORE clearing the `_target` marker.** The old
  *     order (delete marker, then rename) left a window where staging
  *     had `_SUCCESS` but no `_target`; the next heal would read that
  *     as a partial fold and delete the staging — which, after the
  *     originals were already dropped, was the ONLY copy. A leftover
  *     `_target` inside the live dir is harmless (underscore files are
  *     invisible to every reader) and is swept on the next pass.
  *
  * Normal-path order: write staged (+`_SUCCESS` from Spark, `_target`
  * written by us as the commit marker) → delete folded originals →
  * rename staged into place → sweep the marker. A crash anywhere
  * re-enters through [[heal]] and finishes (committed staging) or
  * discards (partial staging, originals intact).
  */
private[graft] object BatchDirFold {

  private def fsOf(spark: SparkSession, dir: Path) =
    dir.getFileSystem(spark.sessionState.newHadoopConf())

  private def bDirs(spark: SparkSession, dir: Path) = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
      .sortBy(_.getPath.getName.stripPrefix("b").toLong)
  }

  /** Finish or discard an interrupted fold; also sweeps a marker a
    * crash left inside the live dir after its rename. */
  def heal(spark: SparkSession, dir: Path): Unit = {
    val fs = fsOf(spark, dir)
    val staged = new Path(dir, "_fold")
    if (fs.exists(staged)) {
      val tgt = new Path(staged, "_target")
      if (fs.exists(new Path(staged, "_SUCCESS")) && fs.exists(tgt)) {
        val in = fs.open(tgt)
        val name = try new String(in.readAllBytes(), UTF_8).trim
          finally in.close()
        val maxId = name.stripPrefix("b").toLong
        bDirs(spark, dir)
          .filter(_.getPath.getName.stripPrefix("b").toLong <= maxId)
          .foreach(p => fs.delete(p.getPath, true))
        fs.rename(staged, new Path(dir, name))
        fs.delete(new Path(dir, s"$name/_target"), false)
      } else fs.delete(staged, true)
    }
    // marker left by a crash between rename and sweep: harmless to
    // readers, cleared here
    bDirs(spark, dir).foreach { b =>
      val m = new Path(b.getPath, "_target")
      if (fs.exists(m)) fs.delete(m, false)
    }
  }

  /** Fold every b-dir except the newest into one dir named after the
    * highest FOLDED id. `writeStaged(foldedDirs, stagedPath)` must
    * produce a Spark-committed dir (with `_SUCCESS`). Returns the
    * number of dirs folded (0 when there is nothing to fold — fewer
    * than two foldable dirs).
    *
    * `excludeFrom` widens rule 1 from "the newest dir" to "every dir
    * at or above this id": a `release`-verb store's batch ids live in
    * per-release ranges (`relBatch*65536 + chunk`) whose commit point
    * is the id ledger, written after publish — so every id at or above
    * `currentVersion*65536` is a REPLAYABLE (possibly crashed) attempt
    * that its owning release will Overwrite or reclaim. Folding such a
    * dir would carry uncommitted rows under a committed-looking name,
    * and the owner's range sweep would then delete committed history
    * along with the orphan. Callers without release semantics keep the
    * default (fold everything but the newest). */
  def fold(spark: SparkSession, dir: Path,
           writeStaged: (Seq[Path], String) => Unit,
           excludeFrom: Long = Long.MaxValue): Int = {
    val fs = fsOf(spark, dir)
    heal(spark, dir)
    val parts = bDirs(spark, dir)
      .filter(_.getPath.getName.stripPrefix("b").toLong < excludeFrom)
    val foldable = parts.dropRight(1) // newest may be replayed: never fold
    if (foldable.size <= 1) 0
    else {
      val name = foldable.last.getPath.getName
      val staged = new Path(dir, "_fold")
      writeStaged(foldable.map(_.getPath), staged.toString)
      val out = fs.create(new Path(staged, "_target"), true)
      try out.write(name.getBytes(UTF_8)) finally out.close()
      foldable.foreach(p => fs.delete(p.getPath, true))
      fs.rename(staged, new Path(dir, name))
      fs.delete(new Path(dir, s"$name/_target"), false)
      foldable.size
    }
  }
}
