package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained aggregate view (materialized rollup) of a
  * warehouse table — CDC-native incremental view maintenance: per
  * group, COUNT(*), SUM of declared numeric columns, and MIN/MAX of
  * declared columns, folded from each batch's before/after images as
  * SIGNED DELTAS:
  *
  *   insert: +after        update: −before, +after      delete: −before
  *
  * A group-value change inside an update needs no special case — its
  * two signed rows simply land in different groups. The view answers
  * "GROUP BY g" dashboards over a replicated table WITHOUT scanning the
  * replica: maintenance cost is O(batch), read cost is O(groups) (+
  * O(live distinct values) for MIN/MAX columns).
  *
  * Layout — the additive-delta pattern [[graft.llmops.SketchStore]]
  * uses for CMS cells:
  *
  *   root/e<epoch>/b<batchId>/part=P/      (groupCols…, cnt, sum_<c>…)
  *   root/e<epoch>/mm/b<batchId>/part=P/   (mcol, groupCols…, v, cnt)
  *
  * Per-batch dirs are ADDITIVE: the view's value per group is the sum
  * over the CURRENT epoch's delta dirs, so
  *  - a replayed batch Overwrites its own `b<id>` dir — no double
  *    counts (the store-wide replay-idempotence contract);
  *  - `part` = group-hash partitioning: a probed-group read prunes to
  *    its hash partitions via ordinary partition pruning;
  *  - TRUNCATE = epoch bump (a new empty `e` dir) — the view zeroes
  *    instantly without rewriting the accumulated deltas; compact
  *    physically drops dead epochs;
  *  - compact folds the current epoch's b-dirs (and mm/b-dirs)
  *    additively through the shared [[graft.llmops.BatchDirFold]]
  *    crash-safe protocol and purges groups/values netted to zero.
  *
  * MIN/MAX under deletes — the classic IVM limitation (retracting the
  * current extreme needs the runner-up) — is solved with a VALUE
  * MULTISET: the `mm` tree keeps, per (column, group, value), a signed
  * occurrence count; a read takes MIN/MAX over values whose net count
  * is positive, so deleting the maximum naturally surfaces the next
  * one. State is O(live distinct values per group) — bounded by the
  * group's row count, usually far smaller — and compact purges values
  * whose count netted out. NULLs never enter the multiset (SQL MIN/MAX
  * ignore them; an all-NULL group reads NULL). The same multiset also
  * yields EXACT per-group COUNT DISTINCT for free (`distinct_<c>` in
  * the read): the live value count, correct under deletes — the other
  * aggregate classic IVM can't retract.
  *
  * Correctness contract (spec-asserted): after ANY event sequence the
  * view equals `SELECT g…, count(*), sum(c)…, min(m)…, max(m)…,
  * count(DISTINCT m)… FROM replica GROUP BY g…` with cnt=0 groups
  * absent. Updates/deletes
  * REQUIRE the full before image (REPLICA IDENTITY FULL — fail fast
  * otherwise, the [[ProjectionSink]] discipline: a missing before image
  * would leave phantom counts behind).
  *
  * Batch contract (built by the warehouse apply): `op, lsn`, each
  * needed column `c` from the AFTER image under its own name and from
  * the BEFORE image as `__old_<c>`, plus `__has_before`. */
class AggViewSink(path: String, groupCols: Seq[String], sumCols: Seq[String],
                  numParts: Int = 64, minMaxCols: Seq[String] = Nil)
    extends Serializable {

  require(groupCols.nonEmpty, "aggregate view needs at least one group column")

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private def sumName(c: String) = s"sum_$c"

  private def groupKey: Column =
    concat_ws("\u0001", groupCols.map(c => coalesce(col(c), lit("\u0000"))): _*)

  private def partOf: Column =
    pmod(graft.expressions.GraftFunctions.md5_prefix60(groupKey),
      lit(numParts.toLong))

  // leaf-dir reads carry no part column (the dir IS the partition —
  // the SketchStore idiom, which also sidesteps multi-root partition
  // discovery)
  private def readSchema: StructType = StructType(
    groupCols.map(c => StructField(c, StringType)) ++
      (StructField("cnt", LongType) +:
        sumCols.map(c => StructField(sumName(c), DoubleType))))

  private def mmSchema: StructType = StructType(
    StructField("mcol", StringType) +:
      groupCols.map(c => StructField(c, StringType)) :+
      StructField("v", DoubleType) :+ StructField("cnt", LongType))

  /** Highest epoch dir (0 when none exist yet). */
  def currentEpoch(spark: SparkSession): Long = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("e"))
      .map(_.getPath.getName.stripPrefix("e").toLong)
      .sorted.lastOption.getOrElse(0L)
  }

  private def epochDir(e: Long) = new Path(root, s"e$e")
  private def mmDir(e: Long) = new Path(epochDir(e), "mm")

  /** Fold one batch of flattened events into signed-delta dirs. */
  def applyBatch(spark: SparkSession, flat: DataFrame, batchId: Long): Unit = {
    val bad = flat.filter(col("op").isin("u", "d") && !col("__has_before")).count()
    require(bad == 0,
      s"$bad update/delete events lack a before image — the aggregate " +
        "view needs REPLICA IDENTITY FULL to subtract the old values")
    val e = currentEpoch(spark)
    val plus = flat.filter(col("op").isin("c", "u"))
      .select(groupCols.map(col) ++
        (lit(1L).as("cnt") +:
          sumCols.map(c =>
            coalesce(col(c).cast("double"), lit(0.0)).as(sumName(c)))): _*)
    val minus = flat.filter(col("op").isin("u", "d"))
      .select(groupCols.map(c => col(s"__old_$c").as(c)) ++
        (lit(-1L).as("cnt") +:
          sumCols.map(c =>
            (-coalesce(col(s"__old_$c").cast("double"), lit(0.0)))
              .as(sumName(c)))): _*)
    applyDelta(spark, plus.unionByName(minus), batchId)
    if (minMaxCols.nonEmpty) {
      // value-multiset deltas: per (column, group, value), net +/- count
      val plusM = minMaxCols.map { c =>
        flat.filter(col("op").isin("c", "u"))
          .select(lit(c).as("mcol") +: groupCols.map(col) :+
            col(c).cast("double").as("v") :+ lit(1L).as("cnt"): _*)
      }
      val minusM = minMaxCols.map { c =>
        flat.filter(col("op").isin("u", "d"))
          .select(lit(c).as("mcol") +:
            groupCols.map(g => col(s"__old_$g").as(g)) :+
            col(s"__old_$c").cast("double").as("v") :+ lit(-1L).as("cnt"): _*)
      }
      (plusM ++ minusM).reduce(_ unionByName _)
        .filter(col("v").isNotNull) // SQL MIN/MAX ignore NULLs
        .groupBy(col("mcol") +: groupCols.map(col) :+ col("v"): _*)
        .agg(sum("cnt").as("cnt"))
        .withColumn("part", partOf.cast("int"))
        .write.mode(SaveMode.Overwrite).partitionBy("part")
        .parquet(new Path(mmDir(e), s"b$batchId").toString)
    }
  }

  /** Fold an already-SIGNED delta frame (groupCols…, cnt, sum_<c>…,
    * one row per contribution) into this batch's delta dir — the
    * lower-level entry [[JoinViewSink]] uses after resolving its group
    * columns through the dimension join. */
  def applyDelta(spark: SparkSession, signed: DataFrame, batchId: Long): Unit =
    signed
      .groupBy(groupCols.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        sumCols.map(c => sum(sumName(c)).as(sumName(c))): _*)
      .withColumn("part", partOf.cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(new Path(epochDir(currentEpoch(spark)), s"b$batchId").toString)

  /** Fold an already-SIGNED value-multiset delta frame (mcol,
    * groupCols…, v, cnt — one row per contribution, NULL values already
    * dropped) into this batch's mm delta dir — the MIN/MAX companion of
    * [[applyDelta]] for callers that resolve their group columns
    * elsewhere ([[JoinViewSink]]'s dimension join). */
  def applyMmDelta(spark: SparkSession, signedMm: DataFrame,
                   batchId: Long): Unit =
    signedMm
      .groupBy(col("mcol") +: groupCols.map(col) :+ col("v"): _*)
      .agg(sum("cnt").as("cnt"))
      .withColumn("part", partOf.cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(new Path(mmDir(currentEpoch(spark)), s"b$batchId").toString)

  /** Declare the view over an ALREADY-replicated table: compute the
    * initial aggregate state from a replica snapshot as the `b-1` delta
    * dir ("-1" can never collide with a streamed batch id, so the first
    * trigger's Overwrite-own-dir replay discipline is unaffected).
    * OFFLINE discipline, same as [[ProjectionSink.bootstrap]]: take the
    * snapshot with the streaming pipeline stopped — a snapshot racing
    * live applies would double-count the in-flight batch. */
  def bootstrap(spark: SparkSession, snapshot: DataFrame): Unit = {
    (groupCols ++ sumCols ++ minMaxCols).distinct.foreach(c =>
      require(snapshot.columns.contains(c), s"snapshot lacks view column $c"))
    val fs = fsOf(spark)
    if (fs.exists(root)) fs.delete(root, true)
    val snap = snapshot.select(
      (groupCols ++ sumCols ++ minMaxCols).distinct.map(c =>
        col(c).cast("string").as(c)): _*)
    snap.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(coalesce(col(c).cast("double"), lit(0.0)))
          .as(sumName(c))): _*)
      .withColumn("part", partOf.cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(new Path(epochDir(0), "b-1").toString)
    if (minMaxCols.nonEmpty) {
      minMaxCols.map { c =>
        snap.select(lit(c).as("mcol") +: groupCols.map(col) :+
          col(c).cast("double").as("v"): _*)
      }.reduce(_ unionByName _)
        .filter(col("v").isNotNull)
        .groupBy(col("mcol") +: groupCols.map(col) :+ col("v"): _*)
        .agg(count(lit(1)).as("cnt"))
        .withColumn("part", partOf.cast("int"))
        .write.mode(SaveMode.Overwrite).partitionBy("part")
        .parquet(new Path(mmDir(0), "b-1").toString)
    }
  }

  /** Leaf `part=P` dirs of the current epoch's delta dirs, optionally
    * pruned to probed parts. */
  private def leafDirs(spark: SparkSession, base: Path,
                       parts: Option[Seq[Int]]): Seq[String] = {
    val fs = fsOf(spark)
    val bs =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
        .map(_.getPath)
    bs.flatMap { b =>
      parts match {
        case None => fs.listStatus(b).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
          .map(_.getPath.toString)
        case Some(ps) => ps.sorted.map(pp => new Path(b, s"part=$pp"))
          .filter(fs.exists(_)).map(_.toString)
      }
    }
  }

  private def deltasOf(spark: SparkSession, dirs: Seq[String],
                       schema: StructType): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else spark.read.schema(schema).parquet(dirs: _*)

  /** cnt/sum fold + derived means over the given delta dirs. */
  private def foldBase(spark: SparkSession, dirs: Seq[String]): DataFrame =
    deltasOf(spark, dirs, readSchema)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        sumCols.map(c => sum(sumName(c)).as(sumName(c))): _*)
      .filter(col("cnt") =!= 0)
      .select(groupCols.map(col) ++ (col("cnt") +: sumCols.flatMap(c =>
        Seq(col(sumName(c)),
          (col(sumName(c)) / col("cnt")).as(s"avg_$c")))): _*)

  /** MIN/MAX over net-positive multiset values, one min_/max_ column
    * pair per declared column, keyed for the null-safe group join. */
  private def foldMinMax(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    val live = deltasOf(spark, dirs, mmSchema)
      .groupBy(col("mcol") +: groupCols.map(col) :+ col("v"): _*)
      .agg(sum("cnt").as("n"))
      .filter(col("n") > 0)
    live.groupBy(groupCols.map(col): _*)
      .pivot("mcol", minMaxCols)
      // the live (net-positive) value count IS the exact per-group
      // COUNT DISTINCT — maintained under deletes for free, since the
      // multiset already nets every value's +/- history
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("nd"))
      .withColumn("__gk", groupKey)
      .select(col("__gk") +: minMaxCols.flatMap(c =>
        Seq(col(s"${c}_mn").as(s"min_$c"), col(s"${c}_mx").as(s"max_$c"),
          coalesce(col(s"${c}_nd"), lit(0L)).as(s"distinct_$c"))): _*)
  }

  private def assemble(spark: SparkSession, baseDirs: Seq[String],
                       mmDirs: Seq[String]): DataFrame = {
    val base = foldBase(spark, baseDirs)
    if (minMaxCols.isEmpty) base
    else {
      // null-safe group equality via the hashed key string (group
      // columns may legitimately hold NULL; a plain equi-join would
      // drop those groups)
      val joined = base.withColumn("__gk", groupKey)
        .join(foldMinMax(spark, mmDirs), Seq("__gk"), "left")
        .drop("__gk")
      // a live group whose tracked values are all NULL never enters the
      // mm fold at all, so the left join leaves its distinct_<c> NULL —
      // but count(DISTINCT m) over an all-NULL group is 0, and the view
      // contract is equality with that replay
      minMaxCols.foldLeft(joined)((acc, c) =>
        acc.withColumn(s"distinct_$c",
          coalesce(col(s"distinct_$c"), lit(0L))))
    }
  }

  /** The materialized view: one row per live group, with the derived
    * per-group mean riding along (avg = sum/cnt — free from the
    * maintained aggregates) and min_/max_/distinct_ triples for each
    * declared MIN/MAX column (from the value multiset —
    * self-maintaining under deletes, distinct counts exact). */
  def read(spark: SparkSession): DataFrame = {
    val e = currentEpoch(spark)
    assemble(spark, leafDirs(spark, epochDir(e), None),
      leafDirs(spark, mmDir(e), None))
  }

  /** Probed-group read, single-column form: sugar over
    * [[readGroupTuples]] for the common one-group-column view. */
  def readGroups(spark: SparkSession, groups: Seq[String]): DataFrame = {
    require(groupCols.size == 1,
      s"view groups by ${groupCols.size} columns — probe with " +
        "readGroupTuples(values in groupCols order)")
    readGroupTuples(spark, groups.map(Seq(_)))
  }

  /** Probed-group read, compound-key form: each probe is the group
    * tuple's values in `groupCols` order. The probe tuples hash through
    * the SAME groupKey expression the writers used (evaluated by the
    * engine, so the hash can never drift from partOf), and partition
    * pruning cuts both the base and mm scans to the probed hash parts —
    * read cost is O(probed parts), never a view scan. */
  def readGroupTuples(spark: SparkSession, probes: Seq[Seq[String]]): DataFrame = {
    require(probes.nonEmpty, "empty probe set")
    require(probes.forall(_.size == groupCols.size),
      s"each probe needs ${groupCols.size} values (groupCols order)")
    import scala.jdk.CollectionConverters._
    val pdf = spark.createDataFrame(
      probes.map(p => org.apache.spark.sql.Row.fromSeq(p)).asJava,
      StructType(groupCols.map(c => StructField(c, StringType))))
      .select(partOf.cast("int").as("part"), groupKey.as("__gk"))
      .collect()
    val parts = pdf.map(_.getInt(0)).distinct.toSeq
    val keys = pdf.map(_.getString(1)).distinct.toSeq
    val e = currentEpoch(spark)
    assemble(spark, leafDirs(spark, epochDir(e), Some(parts)),
      leafDirs(spark, mmDir(e), Some(parts)))
      // fold first, then cut to the probed groups (null-safe via the
      // same hashed key string the mm join uses)
      .filter(groupKey.isin(keys: _*))
  }

  /** TRUNCATE: bump the epoch — the view is empty immediately; old
    * epochs are dropped physically at [[compact]]. */
  def truncate(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    fs.mkdirs(epochDir(currentEpoch(spark) + 1))
  }

  /** Fold the current epoch's delta dirs (all but the newest — it may
    * belong to an uncommitted trigger) into one, purging groups (and
    * multiset values) netted to zero, and drop dead epochs. Crash-safe
    * via the shared staged-swap protocol; the mm tree folds under its
    * own marker, so a crash between the two folds heals per-tree. */
  def compact(spark: SparkSession): Int = {
    val fs = fsOf(spark)
    val cur = currentEpoch(spark)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("e"))
      .filter(_.getPath.getName.stripPrefix("e").toLong < cur)
      .foreach(s => fs.delete(s.getPath, true))
    def leavesIn(dirs: Seq[Path]): Seq[String] =
      dirs.flatMap(b => fsOf(spark).listStatus(b).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
        .map(_.getPath.toString))
    val folded = graft.llmops.BatchDirFold.fold(spark, epochDir(cur),
      (dirs, staged) => {
        deltasOf(spark, leavesIn(dirs), readSchema)
          .groupBy(groupCols.map(col): _*)
          .agg(sum("cnt").as("cnt"),
            sumCols.map(c => sum(sumName(c)).as(sumName(c))): _*)
          .filter(col("cnt") =!= 0)
          .withColumn("part", partOf.cast("int"))
          .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(staged)
      })
    if (minMaxCols.nonEmpty)
      graft.llmops.BatchDirFold.fold(spark, mmDir(cur), (dirs, staged) => {
        deltasOf(spark, leavesIn(dirs), mmSchema)
          .groupBy(col("mcol") +: groupCols.map(col) :+ col("v"): _*)
          .agg(sum("cnt").as("cnt"))
          .filter(col("cnt") =!= 0)
          .withColumn("part", partOf.cast("int"))
          .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(staged)
      })
    folded
  }

  /** Heal an interrupted compact (call at startup). */
  def recover(spark: SparkSession): Unit = {
    graft.llmops.BatchDirFold.heal(spark, epochDir(currentEpoch(spark)))
    if (minMaxCols.nonEmpty)
      graft.llmops.BatchDirFold.heal(spark, mmDir(currentEpoch(spark)))
  }
}

/** Declared aggregate view, resolved against the warehouse root — the
  * [[ProjectionDef]] pattern: the warehouse chain maintains every
  * declared view from the same batch, and the truncate wave zeroes it
  * with its base table. */
final case class AggViewDef(table: String, groupCols: Seq[String],
                            sumCols: Seq[String], numParts: Int = 64,
                            minMaxCols: Seq[String] = Nil) {
  // group/sum/minmax sections separated so distinct definitions can
  // never share a delta directory (g|x_y vs g_x|y would collide under a
  // flat join, silently corrupting both views)
  def name: String = s"g_${groupCols.mkString("-")}__s_${sumCols.mkString("-")}" +
    (if (minMaxCols.isEmpty) "" else s"__m_${minMaxCols.mkString("-")}")
  def path(rootPath: String): String = s"$rootPath/_agg/$table/$name"
  def sink(rootPath: String): AggViewSink =
    new AggViewSink(path(rootPath), groupCols, sumCols, numParts, minMaxCols)
}
