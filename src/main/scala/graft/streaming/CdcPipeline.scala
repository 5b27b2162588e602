package graft.streaming

import graft.model.{CdcEvent, CdcSchema}
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E1/E2 analog: wire source → transform → exactly-once sink.
  *
  * The reference's producer/consumer pair with its filesystem queue
  * (D1-D9, ~2.3k LoC) collapses into Structured Streaming's checkpointed
  * micro-batches: source offsets + WAL live in `checkpointLocation`,
  * epoch replay after crash re-delivers the same batchId, and the sink's
  * batchId gate (JdbcApplier) makes the replay a no-op — the same
  * exactly-once contract as flush_lsn tracking (lsn_tracker.rs:201-460).
  */
object CdcPipeline {

  implicit val eventEnc: Encoder[CdcEvent] = Encoders.product[CdcEvent]

  /** envelope DataFrame → typed event stream (F1 filter applied; F4
    * origin filter when configured). `origin` is optional in the wire
    * envelope — absent means locally originated (null). */
  def toEvents(envelope: DataFrame,
               originFilter: OriginFilter = OriginFilter.Any): Dataset[CdcEvent] =
    toAllEvents(envelope, originFilter)
      .filter(col("op").isin("c", "u", "d", "t"))

  /** Like toEvents but KEEPS transaction-control events (begin/commit/
    * stream_*) — consumers that run the transaction assembler need the
    * framing. The origin filter applies to DML only: dropping a foreign
    * tx's data while keeping its (empty) framing preserves assembly. */
  def toAllEvents(envelope: DataFrame,
                  originFilter: OriginFilter = OriginFilter.Any): Dataset[CdcEvent] = {
    val withOrigin =
      if (envelope.columns.contains("origin")) envelope
      else envelope.withColumn("origin",
        org.apache.spark.sql.functions.lit(null).cast("string"))
    withOrigin
      .filter(!col("op").isin("c", "u", "d", "t") ||
        OriginFilter.predicate(originFilter))
      .as[CdcEvent]
  }

  /** Start the apply pipeline into a JDBC destination.
    *
    * Events are ASSEMBLED into transactions before apply (same contract
    * as the warehouse chain): raw DML of a protocol-v2 streamed
    * transaction may precede a later StreamAbort, and only the assembler
    * sees the abort and discards the buffer — applying raw DML would
    * materialize aborted changes. Envelope-marked streams (isFinalBatch
    * on each DML) seal per-event inside the assembler, so the plain
    * cdcwal envelope path is unchanged. Sealed transactions flatten back
    * to events; the DML filter preserves F1 for any stray non-DML op. */
  def startJdbc(
      envelope: DataFrame,
      ctx: RenderContext,
      url: String,
      checkpointDir: String,
      appId: String = "graft",
      trigger: Trigger = Trigger.AvailableNow(),
      originFilter: OriginFilter = OriginFilter.Any): StreamingQuery = {
    val applier = new JdbcApplier(url, ctx, appId)
    applier.init()
    startAssembled(envelope, originFilter, s"graft-cdc-$appId", checkpointDir,
      trigger) { (batch, batchId) => applier.applyBatch(batch, batchId) }
  }

  /** Shared assembled-apply scaffold: envelope → TxnAssembler → sealed
    * transactions flattened to DML events → `apply` per micro-batch.
    *
    * The event stream carries `observe("graft_cdc")` — max applied LSN,
    * newest commit timestamp, per-{event_type,table} counts — Spark's
    * CollectMetrics folds these into the batch's existing pass and
    * delivers them with the progress event, where [[CdcMetricsListener]]
    * turns them into the reference's lag/LSN/labeled metrics
    * (monitoring/metrics.rs:28-57). Zero extra jobs per trigger. */
  private[graft] def startAssembled(
      envelope: DataFrame, originFilter: OriginFilter, name: String,
      checkpointDir: String, trigger: Trigger)(
      apply: (Dataset[CdcEvent], Long) => Unit): StreamingQuery =
    TxnAssembler.assemble(observeCdcMetrics(toAllEvents(envelope, originFilter)))
      .writeStream
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (txs: Dataset[graft.model.CdcTransaction], batchId: Long) =>
        apply(txs.flatMap(_.events)(eventEnc)
          .filter(col("op").isin("c", "u", "d", "t")), batchId)
      }
      .start()

  /** Observed-metrics feed for [[CdcMetricsListener]]: reference label
    * semantics (metrics_abstraction.rs:186-209) — op mapped to the
    * event-type name, truncate events labeled with their joined table
    * list, everything else schema-qualified. */
  private def observeCdcMetrics(events: Dataset[CdcEvent]): Dataset[CdcEvent] = {
    import org.apache.spark.sql.functions._
    val eventType = when(col("op") === "c", "insert")
      .when(col("op") === "u", "update")
      .when(col("op") === "d", "delete")
      .when(col("op") === "t", "truncate")
    val tableName = when(col("op") === "t",
        array_join(col("truncateTables"), ","))
      .otherwise(concat_ws(".", col("schema"), col("table")))
    events.observe("graft_cdc",
      max(col("lsn")).as("max_lsn"),
      max(unix_micros(col("commitTs"))).as("max_commit_ts_micros"),
      graft.expressions.GraftFunctions.count_by_key(
        when(col("op").isin("c", "u", "d", "t"),
          concat_ws("\u0001", eventType, tableName))).as("events_by_type"))
  }

  /** Kafka-envelope pipeline: envelope → Debezium topic/key/value rows.
    * Attach .format("kafka") + bootstrap options to go to a real broker;
    * tests use the memory sink. */
  def debeziumRows(envelope: DataFrame, topicPrefix: String): DataFrame =
    graft.render.DebeziumEnvelope.project(envelope, topicPrefix)

  /** The 100 TB warehouse pipeline: envelope stream → one hash-bucketed
    * parquet replica PER TABLE under `rootPath/<schema>.<table>/`,
    * MERGE'd per micro-batch with bucket-partition pruning
    * (ParquetReplicaSink). Schema-fluid events flatten per table: one
    * column per observed column name, values from the after-image with
    * before-image fallback for delete keys. Replay-idempotent by
    * construction — re-applying a batch upserts identical winners and
    * re-deletes absent keys — so no batchId gate is needed.
    *
    * Tables apply sequentially within a batch (each apply is itself a
    * distributed job; WAL order across tables is preserved by LSN
    * squash within each key, and cross-table ordering has no observable
    * effect on per-table end state). */
  def startWarehouse(envelope: DataFrame, rootPath: String, checkpointDir: String,
                     numBuckets: Int = 64,
                     trigger: Trigger = Trigger.AvailableNow(),
                     originFilter: OriginFilter = OriginFilter.Any,
                     projections: Seq[graft.sinks.ProjectionDef] = Nil,
                     aggViews: Seq[graft.sinks.AggViewDef] = Nil,
                     joinViews: Seq[graft.sinks.JoinViewDef] = Nil,
                     historyTables: Seq[String] = Nil,
                     starViews: Seq[graft.sinks.StarViewDef] = Nil,
                     bloomCols: Map[String, Seq[String]] = Map.empty)
      : StreamingQuery =
    // Transactions are ASSEMBLED before apply: a raw-DML apply would
    // materialize events of a streamed (v2) transaction that later
    // ABORTS — its events precede a later commit boundary, but only the
    // assembler sees the StreamAbort and discards them (same contract as
    // the JDBC chain, which routes through the same scaffold).
    startAssembled(envelope, originFilter, "graft-warehouse", checkpointDir,
      trigger) { (batch, batchId) =>
      applyWarehouseBatch(batch, rootPath, numBuckets, batchId, projections,
        aggViews, joinViews, historyTables, starViews, bloomCols)
    }

  /** F2 gate for the warehouse root: refuses STALE batch replays (an old
    * batch re-applied after later deletes would resurrect rows). Written
    * AFTER the data, so a crash between data and gate replays the SAME
    * batch — which the MERGE apply handles idempotently. The
    * underscore-prefixed file is invisible to parquet discovery.
    *
    * Resolved through the Hadoop FileSystem of `root` (not java.nio), so
    * the gate travels with the data on hdfs:// and s3a:// roots, same as
    * the parquet it protects. */
  private def gatePath(root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_last_batch")

  private def lastWarehouseBatch(spark: SparkSession, root: String): Long = {
    val p = gatePath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  private def writeWarehouseBatch(spark: SparkSession, root: String,
                                  batchId: Long): Unit = {
    val dst = gatePath(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    val tmp = new org.apache.hadoop.fs.Path(root, "_graft_last_batch.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext rename-with-overwrite is atomic where the FS supports
    // it (HDFS, local); on object stores the window between delete and
    // re-create is covered by the apply's own idempotence.
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** One micro-batch of the warehouse apply (factored for batch tests).
    * `projections`: declared secondary layouts; a table's op="t"
    * truncates them WITH the base replica (a truncated table must not
    * keep serving dropped rows through a secondary path). */
  def applyWarehouseBatch(batch: Dataset[CdcEvent], rootPath: String,
                          numBuckets: Int, batchId: Long,
                          projections: Seq[graft.sinks.ProjectionDef] = Nil,
                          aggViews: Seq[graft.sinks.AggViewDef] = Nil,
                          joinViews: Seq[graft.sinks.JoinViewDef] = Nil,
                          historyTables: Seq[String] = Nil,
                          starViews: Seq[graft.sinks.StarViewDef] = Nil,
                          bloomCols: Map[String, Seq[String]] = Map.empty)
      : Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    if (batchId <= lastWarehouseBatch(spark, rootPath)) return // stale replay
    val df = batch.toDF()
      .withColumn("__after", map_from_arrays(col("after.name"), col("after.value")))
      .withColumn("__before", map_from_arrays(col("before.name"), col("before.value")))
    df.cache()
    try {
      // per-(schema, table): column set + key set observed in the batch
      // null-safe: WAL-sourced events carry NULL (not empty) images on
      // one side; concat(null, x) is null and would drop the table
      val emptyNames = array().cast("array<string>")
      val tables = df.filter(col("op").isin("c", "u", "d"))
        .select(col("schema"), col("table"),
          explode(concat(
            coalesce(col("after.name"), emptyNames),
            coalesce(col("before.name"), emptyNames))).as("colName"),
          col("keyColumns"))
        .groupBy("schema", "table")
        .agg(collect_set("colName").as("cols"),
          first("keyColumns").as("keys"))
        .collect()
      // P6 on the warehouse chain: op="t" truncates every listed table
      // (the reference truncates every destination, sql_renderer.rs:
      // 300-320). One row per truncated table — bounded driver collect.
      // LSN order matters WITHIN the batch: DML that follows the last
      // truncate must survive it, DML before it must not apply.
      val truncLsn: Map[String, Long] = df.filter(col("op") === "t")
        .select(explode(col("truncateTables")).as("tname"), col("lsn"))
        .groupBy("tname").agg(max("lsn").as("maxLsn"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // tables this batch touches (DML or truncate) — decides which
      // join views can apply incrementally vs must rebuild after
      val touched: Set[String] = tables.map(row =>
        Seq(Option(row.getString(0)), Some(row.getString(1)))
          .flatten.mkString(".")).toSet ++ truncLsn.keySet
      // a join view rebuilds when its dim changed (re-attributing fact
      // rows is out of incremental scope) or its fact truncated (the
      // epoch semantics live in the replica, not the view's fold)
      val rebuildViews = joinViews.filter(jv =>
        touched(jv.dimTable) || truncLsn.contains(jv.factTable))
      // a star view rebuilds when ANY of its dims changed (same
      // re-attribution argument, per spoke) or its fact truncated
      val rebuildStars = starViews.filter(sv =>
        sv.dims.exists(d => touched(d.dimTable)) ||
          truncLsn.contains(sv.factTable))
      // Per-table applies are independent (distinct paths, per-key LSN
      // squash inside each) — run them as CONCURRENT Spark jobs so many
      // small tables fill the cluster instead of serializing scheduler
      // round-trips. Each job is itself distributed; the pool only
      // overlaps job submission/IO, so a handful of threads suffices.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(math.max(tables.length, 1), 4))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val jobGroup = s"graft-warehouse-$batchId"
      try {
        val applies = tables.toSeq.map { row =>
          scala.concurrent.Future {
            // per-thread: tag this table's jobs so a sibling failure can
            // cancel them (interruptOnCancel stops running tasks too)
            spark.sparkContext.setJobGroup(jobGroup,
              s"warehouse apply batch=$batchId", interruptOnCancel = true)
            val (sch, tbl) = (row.getString(0), row.getString(1))
            val cols = row.getSeq[String](2).sorted
            val keys = row.getSeq[String](3)
            val name = Seq(Option(sch), Some(tbl)).flatten.mkString(".")
            val cut = truncLsn.get(name)
            val tableEventsAll = df
              .filter(col("schema") <=> lit(sch) && col("table") === tbl &&
                col("op").isin("c", "u", "d"))
            val tableEvents = tableEventsAll
              // pre-truncate DML is dead on arrival — the truncate
              // wipes it; only post-truncate changes apply
              .filter(cut.map(l => col("lsn") > l).getOrElse(lit(true)))
            val flatCols = cols.map(c =>
              coalesce(element_at(col("__after"), c),
                element_at(col("__before"), c)).as(c))
            val flat = tableEvents
              .select(col("op") +: col("lsn") +: flatCols: _*)
            val sink = new graft.sinks.ParquetReplicaSink(
              s"$rootPath/$name", keys, numBuckets,
              declaredBlooms = bloomCols.getOrElse(name, Nil))
            if (cut.isDefined) {
              sink.truncate(spark)
              // every declared secondary layout of the table goes with it
              projections.filter(_.table == name)
                .foreach(_.sink(rootPath).truncate(spark))
              aggViews.filter(_.table == name)
                .foreach(_.sink(rootPath).truncate(spark))
            }
            sink.applyBatch(spark, flat, batchId)
            // declared projections are maintained from the SAME batch:
            // the before image supplies the old index value (null on a
            // plain insert; the projection fails fast on a u/d missing
            // it — its REPLICA IDENTITY FULL contract)
            projections.filter(_.table == name).foreach { d =>
              val projFlat = tableEvents.select(
                col("op") +: col("lsn") +: (flatCols :+
                  element_at(col("__before"), d.indexKey).as("__old_idx")): _*)
              d.sink(rootPath).applyBatch(spark, projFlat, batchId)
            }
            // declared aggregate views fold the SAME batch as signed
            // deltas: after-image columns under their names, before-
            // image under __old_<c> (REPLICA IDENTITY FULL contract)
            aggViews.filter(_.table == name).foreach { v =>
              val needed = (v.groupCols ++ v.sumCols ++ v.minMaxCols).distinct
              // "has a before image" means EVERY column the view folds is
              // present in it — a key-only image (REPLICA IDENTITY
              // DEFAULT) passes a mere non-empty check and would subtract
              // from a phantom NULL group with 0 sums
              val avFlat = tableEvents.select(
                Seq(col("op"), col("lsn"),
                  needed.map(c => array_contains(col("before.name"), c))
                    .reduce(_ && _).as("__has_before")) ++
                  needed.map(c => element_at(col("__after"), c).as(c)) ++
                  needed.map(c =>
                    element_at(col("__before"), c).as(s"__old_$c")): _*)
              v.sink(rootPath).applyBatch(spark, avFlat, batchId)
            }
            // declared SCD2 histories version EVERY event of the batch —
            // including same-batch pre-truncate DML, which the replica
            // drops as dead-on-arrival but the audit trail must keep
            // (the truncate marker closes those intervals at its LSN)
            if (historyTables.contains(name)) {
              val hist = new graft.sinks.HistorySink(
                s"$rootPath/_history/$name", keys, numBuckets)
              hist.applyBatch(spark,
                tableEventsAll.select(col("op") +: col("lsn") +: flatCols: _*),
                batchId)
              cut.foreach(l => hist.truncate(spark, l, batchId))
            }
            // join views on an UNTOUCHED dim fold this fact batch
            // incrementally; dim-touched views rebuild after the barrier
            joinViews.filter(jv => jv.factTable == name &&
                !rebuildViews.contains(jv)).foreach { jv =>
              val needed = (jv.factKey +: (jv.sumCols ++ jv.minMaxCols)).distinct
              val jvFlat = tableEvents.select(
                Seq(col("op"), col("lsn"),
                  needed.map(c => array_contains(col("before.name"), c))
                    .reduce(_ && _).as("__has_before")) ++
                  needed.map(c => element_at(col("__after"), c).as(c)) ++
                  needed.map(c =>
                    element_at(col("__before"), c).as(s"__old_$c")): _*)
              // a dim that has never replicated = empty snapshot (the
              // inner join then contributes nothing, matching the replay
              // semantics) — snapshotting a missing path would throw and
              // crash-loop the micro-batch on every replay
              val dimPath = new org.apache.hadoop.fs.Path(
                s"$rootPath/${jv.dimTable}")
              val dimSnap =
                if (dimPath.getFileSystem(spark.sessionState.newHadoopConf())
                      .exists(dimPath))
                  new graft.sinks.ParquetReplicaSink(
                    dimPath.toString, Nil, numBuckets).snapshot(spark)
                else spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  org.apache.spark.sql.types.StructType(
                    (jv.dimKey +: jv.dimGroupCols).distinct.map(c =>
                      org.apache.spark.sql.types.StructField(c,
                        org.apache.spark.sql.types.StringType))))
              jv.sink(rootPath).applyBatch(spark, jvFlat, dimSnap, batchId)
            }
            // star views on UNTOUCHED dims fold this fact batch
            // incrementally, resolving through EVERY dim's snapshot;
            // any-dim-touched views rebuild after the barrier
            starViews.filter(sv => sv.factTable == name &&
                !rebuildStars.contains(sv)).foreach { sv =>
              val needed = (sv.dims.map(_.factKey) ++ sv.sumCols ++
                sv.minMaxCols).distinct
              val svFlat = tableEvents.select(
                Seq(col("op"), col("lsn"),
                  needed.map(c => array_contains(col("before.name"), c))
                    .reduce(_ && _).as("__has_before")) ++
                  needed.map(c => element_at(col("__after"), c).as(c)) ++
                  needed.map(c =>
                    element_at(col("__before"), c).as(s"__old_$c")): _*)
              val snaps = sv.dims.map { d =>
                val p = new org.apache.hadoop.fs.Path(
                  s"$rootPath/${d.dimTable}")
                d.dimTable -> (
                  if (p.getFileSystem(spark.sessionState.newHadoopConf())
                        .exists(p))
                    new graft.sinks.ParquetReplicaSink(
                      p.toString, Nil, numBuckets).snapshot(spark)
                  else spark.createDataFrame(
                    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                    org.apache.spark.sql.types.StructType(
                      (d.dimKey +: d.groupCols).distinct.map(c =>
                        org.apache.spark.sql.types.StructField(c,
                          org.apache.spark.sql.types.StringType)))))
              }.toMap
              sv.sink(rootPath).applyBatch(spark, svFlat, snaps, batchId)
            }
          }
        }
        // truncated tables with NO DML in the batch still truncate
        val dmlTables = tables.map(row => Seq(Option(row.getString(0)),
          Some(row.getString(1))).flatten.mkString(".")).toSet
        val truncOnly = truncLsn.keys.filterNot(dmlTables).toSeq.map { name =>
          scala.concurrent.Future {
            new graft.sinks.ParquetReplicaSink(s"$rootPath/$name", Nil, numBuckets)
              .truncate(spark)
            projections.filter(_.table == name)
              .foreach(_.sink(rootPath).truncate(spark))
            aggViews.filter(_.table == name)
              .foreach(_.sink(rootPath).truncate(spark))
            if (historyTables.contains(name))
              new graft.sinks.HistorySink(s"$rootPath/_history/$name", Nil,
                numBuckets).truncate(spark, truncLsn(name), batchId)
          }
        }
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(applies ++ truncOnly),
          scala.concurrent.duration.Duration.Inf)
        catch { case e: Throwable =>
          // One table failed: STOP the siblings before propagating.
          // The streaming retry replays this batch; an apply from the
          // failed attempt still rewriting buckets would race the
          // replay's reads of the same dirs.
          pool.shutdownNow()
          spark.sparkContext.cancelJobGroup(jobGroup)
          pool.awaitTermination(5, java.util.concurrent.TimeUnit.MINUTES)
          throw e
        }
      } finally pool.shutdown()
      // dim-touched (or fact-truncated) join views rebuild from the
      // POST-batch replicas — both sides have landed at this point
      rebuildViews.foreach { jv =>
        val hconf = spark.sessionState.newHadoopConf()
        def snapIfExists(table: String) = {
          val p = new org.apache.hadoop.fs.Path(s"$rootPath/$table")
          if (p.getFileSystem(hconf).exists(p))
            Some(new graft.sinks.ParquetReplicaSink(p.toString, Nil, numBuckets)
              .snapshot(spark))
          else None
        }
        (snapIfExists(jv.factTable), snapIfExists(jv.dimTable)) match {
          case (Some(fact), Some(dim)) =>
            jv.sink(rootPath).rebuild(spark, fact, dim)
          case _ => () // a side never replicated yet → the view stays empty
        }
      }
      // any-dim-touched (or fact-truncated) star views rebuild the same
      // way; a never-replicated dim joins as an empty snapshot (inner
      // join → empty view, matching the replay semantics)
      rebuildStars.foreach { sv =>
        val hconf = spark.sessionState.newHadoopConf()
        def snapIfExists(table: String) = {
          val p = new org.apache.hadoop.fs.Path(s"$rootPath/$table")
          if (p.getFileSystem(hconf).exists(p))
            Some(new graft.sinks.ParquetReplicaSink(p.toString, Nil, numBuckets)
              .snapshot(spark))
          else None
        }
        snapIfExists(sv.factTable).foreach { fact =>
          val snaps = sv.dims.map { d =>
            d.dimTable -> snapIfExists(d.dimTable).getOrElse(
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(
                  (d.dimKey +: d.groupCols).distinct.map(c =>
                    org.apache.spark.sql.types.StructField(c,
                      org.apache.spark.sql.types.StringType)))))
          }.toMap
          sv.sink(rootPath).rebuild(spark, fact, snaps)
        }
      }
      writeWarehouseBatch(spark, rootPath, batchId)
    } finally df.unpersist()
  }
}

/** F4: replication-origin filtering (config.rs:228-236). `NoOrigin`
  * keeps only locally-originated changes (the loop-prevention setting),
  * `Any` keeps everything, `Origin(name)` keeps one specific origin. */
sealed trait OriginFilter extends Serializable
object OriginFilter {
  case object NoOrigin extends OriginFilter
  case object Any extends OriginFilter
  final case class Origin(name: String) extends OriginFilter

  def predicate(f: OriginFilter): org.apache.spark.sql.Column = f match {
    case Any => org.apache.spark.sql.functions.lit(true)
    case NoOrigin => col("origin").isNull
    case Origin(n) => col("origin") === n
  }

  /** Env form: "none" / "any" / any other string = a specific origin. */
  def parse(s: String): OriginFilter = s.trim.toLowerCase match {
    case "none" => NoOrigin
    case "any" | "" => Any
    case _ => Origin(s.trim)
  }
}

/** E5: CDC_* environment parity (reference env.rs:58-173). Only the
  * engine-relevant knobs — queue/file-layout vars are obsolete here. */
final case class GraftConfig(
    batchSize: Int = 1000,
    bulkInsertThreshold: Int = 500,
    maxRowsPerInsert: Int = Int.MaxValue,
    segmentBytes: Long = 64L * 1024 * 1024,
    heartbeatSeconds: Int = 10,
    schemaMappings: Map[String, String] = Map.empty,
    slotName: String = "graft_slot",
    publication: String = "graft_pub",
    protocolVersion: Int = 1,
    streaming: Boolean = false,
    twoPhase: Boolean = false,
    originFilter: OriginFilter = OriginFilter.Any) {

  /** The reference's builder validation truth table (config.rs:617-663):
    * slot-name injection guard, protocol 1–4, streaming ⇒ v2+,
    * two-phase ⇒ v3+, positive sizes. Left = first violation. */
  def validate(): Either[String, GraftConfig] = {
    GraftConfig.validateSlotName(slotName) match {
      case Some(err) => return Left(err)
      case None => ()
    }
    if (publication.isEmpty) Left("Publication name is required")
    else if (protocolVersion < 1 || protocolVersion > 4)
      Left("Protocol version must be between 1 and 4")
    else if (streaming && protocolVersion < 2)
      Left("Streaming requires protocol version 2 or higher")
    else if (twoPhase && protocolVersion < 3)
      Left("Two-phase commit requires protocol version 3 or higher")
    else if (batchSize <= 0) Left("Batch size must be greater than 0")
    else if (segmentBytes <= 0) Left("Segment size must be greater than 0")
    else Right(this)
  }
}

object GraftConfig {
  /** Slot-name injection guard (slot.rs:99-115): PostgreSQL restricts
    * slot names to `[a-z0-9_]`; validating against that set — rather
    * than escaping — makes the name safe for SQL interpolation at every
    * boundary. None = valid. */
  def validateSlotName(slotName: String): Option[String] =
    if (slotName.isEmpty) Some("Replication slot name is required")
    else if (!slotName.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'))
      Some(s"Invalid replication slot name ${"\"" + slotName + "\""}: " +
        "only lower-case letters, digits, and underscores are allowed")
    else None

  /** Parse `public:cdc_db,sales:sales_db` (env.rs:180-208). */
  def parseSchemaMappings(s: String): Map[String, String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).flatMap { pair =>
      pair.split(":", 2) match {
        case Array(a, b) => Some(a.trim -> b.trim)
        case _ => None
      }
    }.toMap

  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = GraftConfig(
    batchSize = env.get("CDC_BATCH_SIZE").map(_.toInt).getOrElse(1000),
    bulkInsertThreshold =
      env.get("CDC_BULK_INSERT_THRESHOLD").map(_.toInt).getOrElse(500),
    maxRowsPerInsert =
      env.get("CDC_MAX_ROWS_PER_INSERT").map(_.toInt).getOrElse(Int.MaxValue),
    segmentBytes = env.get("CDC_TRANSACTION_SEGMENT_SIZE_MB")
      .map(_.toLong * 1024 * 1024).getOrElse(64L * 1024 * 1024),
    heartbeatSeconds =
      env.get("CDC_HEARTBEAT_INTERVAL").map(_.toInt).getOrElse(10),
    // the reference spells it CDC_SCHEMA_MAPPING (env.rs:180); the
    // plural form is kept for back-compat with earlier rounds
    schemaMappings = env.get("CDC_SCHEMA_MAPPING")
      .orElse(env.get("CDC_SCHEMA_MAPPINGS"))
      .map(parseSchemaMappings).getOrElse(Map.empty),
    slotName = env.getOrElse("CDC_REPLICATION_SLOT", "graft_slot"),
    publication = env.getOrElse("CDC_PUBLICATION", "graft_pub"),
    protocolVersion = env.get("CDC_PROTOCOL_VERSION").map(_.toInt).getOrElse(1),
    streaming = env.get("CDC_STREAMING").exists(_.toBoolean),
    twoPhase = env.get("CDC_TWO_PHASE").exists(_.toBoolean),
    originFilter = env.get("CDC_ORIGIN_FILTER")
      .map(OriginFilter.parse).getOrElse(OriginFilter.Any))
}
