package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-indirection layout for the release verb's frozen corpus —
  * the Delta/Iceberg snapshot idiom applied to [[VersionedDir]]'s
  * pointer discipline so a version REFERENCES its segments instead of
  * containing them:
  *
  * {{{
  *   docs/
  *     _segs/s<K>-v<N>/   segment K's parquet as (re)built by version N
  *     v<N>/MANIFEST      seg -> pool path lines; _SUCCESS after
  *     CURRENT            VersionedDir pointer
  * }}}
  *
  * A release writes ONLY the rebuilt/fresh segments' bytes into the
  * shared `_segs/` pool and a tiny MANIFEST naming every segment of the
  * version — unchanged segments are carried as manifest lines pointing
  * at the PREVIOUS version's pool dirs, so a +1% incremental release
  * moves O(changed segments) bytes instead of streaming the whole
  * corpus through the driver (the `FileUtil.copy`-per-segment freeze
  * this replaces was O(corpus) driver I/O per publish, on every
  * filesystem). Retention GC is refcount-by-manifest: after a publish
  * prunes old version dirs, [[gc]] deletes every pool dir referenced by
  * no surviving version's manifest. Crash windows inherit VersionedDir's
  * matrix — pool writes land before MANIFEST, MANIFEST before
  * `_SUCCESS`, and an uncommitted version neither resolves nor protects
  * its orphaned pool dirs from the next successful publish's GC.
  * Reference analog: pg2any's "trust tracked state, never re-read"
  * finalize (`storage/uncompressed.rs:70-84`) — the O(1) publish comes
  * from pointing at bytes already on disk, not from moving them.
  */
private[graft] object SegPool {

  val ManifestName = "MANIFEST"

  /** Pool path (relative to the docs root) for segment `seg` as
    * (re)built by version `v` — version-stamped so a rebuild never
    * overwrites a dir an older retained version still references, and
    * nonce-stamped per publish ATTEMPT ([[VersionedDir.stagedNonce]])
    * so a displaced-but-alive publisher's writes can never land on the
    * committed attempt's pool dirs (losers are unreferenced by any
    * manifest and reclaimed by [[gc]]). */
  def poolRel(seg: String, v: Long, nonce: String): String =
    s"_segs/s$seg-v$v-$nonce"

  /** Write a version's manifest: one `seg<TAB>relPath` line per
    * segment. A driver-side O(#segments) metadata write. */
  def writeManifest(fs: FileSystem, versionDir: String,
                    entries: Seq[(String, String)]): Unit = {
    val out = fs.create(new Path(versionDir, ManifestName), true)
    try out.write(entries.map { case (s, rel) => s"$s\t$rel" }
      .mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  /** (seg, relPath) entries of a version's manifest. STRICT: a line
    * without a tab fails loud — every reader of a manifest reads a
    * COMMITTED version (gc and the pointer heal are `_SUCCESS`-gated;
    * a crashed publisher's torn manifest lives in a dir no reader
    * resolves), so an unparseable line in a committed manifest is
    * corruption, and dropping it silently would let gc reclaim a LIVE
    * segment's pool dir. */
  def readManifest(fs: FileSystem, versionDir: String): Seq[(String, String)] = {
    val in = fs.open(new Path(versionDir, ManifestName))
    val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
    txt.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      line.split("\t", 2) match {
        case Array(seg, rel) => (seg, rel)
        case _ => throw new IllegalStateException(
          s"corrupt manifest line in $versionDir: '$line'")
      }
    }
  }

  val SourcesName = "SOURCES"

  /** Write a version's per-segment source counts: one
    * `seg<TAB>source<TAB>n` line per (segment, source) pair, next to
    * the MANIFEST. Written at freeze time from the segments being
    * written ANYWAY (rebuilt/fresh parents) plus the previous version's
    * carried-forward rows, so the per-release report never scans the
    * assembled corpus — the funnel's per-source counts become one
    * driver-side metadata read. Fields are URL-encoded so a source tag
    * containing a tab or newline cannot tear the format. */
  def writeSources(fs: FileSystem, versionDir: String,
                   rows: Seq[(String, String, Long)]): Unit = {
    def enc(s: String) = java.net.URLEncoder.encode(s, UTF_8)
    val out = fs.create(new Path(versionDir, SourcesName), true)
    try out.write(rows.map { case (seg, src, n) =>
      s"${enc(seg)}\t${enc(src)}\t$n" }.mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  /** (seg, source, n) rows of a version's SOURCES sidecar; None when
    * the version predates the sidecar (legacy — callers fall back to
    * one pruned column scan). Strict like [[readManifest]]: a torn
    * line in a committed sidecar is corruption, not noise. */
  def readSources(fs: FileSystem,
                  versionDir: String): Option[Seq[(String, String, Long)]] = {
    val p = new Path(versionDir, SourcesName)
    if (!fs.exists(p)) return None
    def dec(s: String) = java.net.URLDecoder.decode(s, UTF_8)
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
    Some(txt.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      line.split("\t", 3) match {
        case Array(seg, src, n) => (dec(seg), dec(src), n.toLong)
        case _ => throw new IllegalStateException(
          s"corrupt SOURCES line in $versionDir: '$line'")
      }
    })
  }

  /** Read a docs dir, resolving a MANIFEST if present (a SegPool
    * version dir) and falling back to a plain parquet read otherwise —
    * so every consumer (emit-shards, reports, specs) accepts both a
    * frozen release version and an ordinary parquet directory.
    * Manifest reads merge schemas across segments: a multimodal corpus
    * may widen its schema over releases. */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(p, ManifestName))) spark.read.parquet(dir)
    else {
      val root = p.getParent // docs root: versions sit directly under it
      val dirs = readManifest(fs, dir).map { case (_, rel) =>
        new Path(root, rel).toString }
      spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    }
  }

  /** Whether `dir` holds any parquet data file (recursive) — the guard
    * before reading a just-written dir that may be dataless (a rebuild
    * whose every row was retracted leaves only `_SUCCESS`). Shares the
    * recursive *.parquet walk convention with [[rowCount]]. */
  def hasParquet(fs: FileSystem, dir: String): Boolean = {
    val p = new Path(dir)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    var found = false
    while (!found && it.hasNext)
      found = it.next().getPath.getName.endsWith(".parquet")
    found
  }

  /** Total rows of a manifest version from parquet FOOTERS only —
    * O(#files) driver metadata reads, no Spark job, no column scan. */
  def rowCount(spark: SparkSession, versionDir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(versionDir)
    val fs = p.getFileSystem(conf)
    val root = p.getParent
    def footerSum(dir: Path, recursive: Boolean): Long = {
      val it = fs.listFiles(dir, recursive)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(f, conf))
          try total += rd.getRecordCount finally rd.close()
        }
      }
      total
    }
    if (!fs.exists(new Path(p, ManifestName)))
      footerSum(p, recursive = true) // legacy seg=K / plain parquet dir
    else readManifest(fs, versionDir)
      .map { case (_, rel) => footerSum(new Path(root, rel), false) }.sum
  }

  /** Refcount GC: delete every `_segs/` pool dir that no EXISTING
    * version dir's manifest references (run after a publish, whose
    * retention pruning is what drops references). Versions without a
    * manifest (a crashed partial write) protect nothing — their
    * orphaned pool dirs are exactly the garbage this reclaims.
    * Sub-segment aware: a partitioned fresh-batch parent
    * (`f<B>-v<N>/segp=P` entries) is kept while ANY child is
    * referenced, with unreferenced children deleted individually —
    * rebuild granularity equals reclaim granularity. Returns the
    * deleted pool paths (relative to `_segs/`). */
  def gc(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val segsDir = new Path(rootPath, "_segs")
    if (!fs.exists(segsDir)) return Nil
    // only COMMITTED versions (`_SUCCESS` present) protect pool dirs: a
    // crashed partial publish's manifest may be torn, its version dir
    // is reclaimed by the next publish, and its fresh pool dirs are
    // exactly the orphans this pass exists to collect
    val referenced = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .filter(s => fs.exists(new Path(s.getPath, ManifestName)) &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .flatMap(s => readManifest(fs, s.getPath.toString))
      .map { case (_, rel) => rel.stripPrefix("_segs/") }
      .toSet
    fs.listStatus(segsDir).toSeq.flatMap { top =>
      val name = top.getPath.getName
      if (referenced.contains(name)) Nil
      else if (referenced.exists(_.startsWith(name + "/"))) {
        // partially referenced parent: reclaim only dead children
        fs.listStatus(top.getPath).toSeq
          .filter(c => c.isDirectory &&
            !referenced.contains(s"$name/${c.getPath.getName}"))
          .map { c =>
            fs.delete(c.getPath, true); s"$name/${c.getPath.getName}" }
      } else {
        fs.delete(top.getPath, true); Seq(name)
      }
    }
  }
}
