package graft.streaming

import graft.dialect.Dialect
import graft.render.RenderContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E1/E2 app runner — the `run_cdc_app` analog (reference app.rs:51-234,
  * client.rs:54-160): env config → validation → cdcwal source → event
  * filter (F1/F4) → exactly-once JDBC apply, with the metrics scrape
  * server up and a JVM shutdown hook draining the in-flight epoch
  * (`query.stop()` ≙ the reference's SIGTERM → CancellationToken → drain
  * path, O4).
  *
  * All wiring lives in [[build]] so tests can drive the full composition
  * without a process; `main` adds only the process-lifecycle shell.
  *
  * Env surface (beyond GraftConfig's CDC_* set):
  *   GRAFT_WAL_DIR      — cdcwal segment directory (required)
  *   GRAFT_DEST_URL     — destination JDBC url (required unless
  *     GRAFT_WAREHOUSE_DIR selects the warehouse mode)
  *   GRAFT_WAREHOUSE_DIR — parquet-replica root: replicate into
  *     per-table hash-bucketed parquet (the 100 TB path) instead of a
  *     JDBC destination; GRAFT_WAREHOUSE_BUCKETS (default 64) sizes the
  *     layout, GRAFT_WAREHOUSE_SPILL=true routes through the disk-spill
  *     sealer for arbitrarily large streamed transactions
  *   GRAFT_CURATE_DIR   — training-data intake mode: stream document
  *     parquet (doc_id, source, text) from this directory through the
  *     curation pipeline (quality/language gates, exact + LSH near
  *     dedup) into GRAFT_CURATE_STORE (required with it); replaces the
  *     CDC chain, so GRAFT_WAL_DIR/GRAFT_DEST_URL are not required
  *   GRAFT_CHECKPOINT   — checkpoint location (required)
  *   GRAFT_DIALECT      — ansi|mysql|sqlserver|sqlite (default ansi)
  *   GRAFT_METRICS_PORT — scrape port (default 8080; -1 disables)
  *   CDC_MAX_EVENTS_PER_TRIGGER — admission cap (optional)
  *   GRAFT_PG_HOST/PORT/USER/PASSWORD/DATABASE — live capture upstream
  *     (optional; database defaults to "postgres", as libpq does)
  */
object GraftApp {

  final case class Wiring(query: StreamingQuery,
                          metrics: Option[MetricsServer],
                          listener: CdcMetricsListener,
                          capture: Option[graft.sources.pgwire.ReplicationClient] = None,
                          captureThread: Option[Thread] = None)

  /** Validate config, wire source→filter→sink, start metrics.
    *
    * When GRAFT_PG_HOST is set (or `captureTransport` is injected for
    * tests), a live-capture thread runs the replication client against
    * the upstream walsender, writing `.pgo` segments into GRAFT_WAL_DIR
    * while the Spark pipeline consumes them — the full socket→segment→
    * source→destination chain in one process. Without it, segments are
    * produced externally (the reference's own capture split). */
  def build(spark: SparkSession, cfg: GraftConfig, env: Map[String, String],
            trigger: Trigger = Trigger.ProcessingTime(0),
            captureTransport: Option[() => graft.sources.pgwire.PgWire.WireTransport] = None): Wiring = {
    cfg.validate() match {
      case Left(err) => throw new IllegalArgumentException(s"invalid config: $err")
      case Right(_) => ()
    }
    val ckpt = env.getOrElse("GRAFT_CHECKPOINT",
      throw new IllegalArgumentException("GRAFT_CHECKPOINT is required"))

    // curation-intake mode: a training-data pipeline instead of the CDC
    // chain — document parquet in, curated store out (StreamingCurate)
    env.get("GRAFT_CURATE_DIR") match {
      case Some(docsDir) =>
        val store = env.getOrElse("GRAFT_CURATE_STORE",
          throw new IllegalArgumentException(
            "GRAFT_CURATE_STORE is required with GRAFT_CURATE_DIR"))
        val listener = new CdcMetricsListener
        spark.streams.addListener(listener)
        val metricsPort =
          env.get("GRAFT_METRICS_PORT").map(_.toInt).getOrElse(8080)
        val metrics =
          if (metricsPort < 0) None
          else Some(new MetricsServer(listener, metricsPort).start())
        val docs = spark.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .parquet(docsDir)
        Wiring(
          graft.llmops.StreamingCurate.start(docs, store, ckpt, trigger),
          metrics, listener)
      case None => buildCdc(spark, cfg, env, trigger, captureTransport, ckpt)
    }
  }

  /** The CDC chains (JDBC / warehouse), factored from [[build]]. */
  private def buildCdc(spark: SparkSession, cfg: GraftConfig,
                       env: Map[String, String], trigger: Trigger,
                       captureTransport: Option[() => graft.sources.pgwire.PgWire.WireTransport],
                       ckpt: String): Wiring = {
    val walDir = env.getOrElse("GRAFT_WAL_DIR",
      throw new IllegalArgumentException("GRAFT_WAL_DIR is required"))
    val warehouseDir = env.get("GRAFT_WAREHOUSE_DIR")
    val destUrl = env.get("GRAFT_DEST_URL")
    if (warehouseDir.isEmpty && destUrl.isEmpty)
      throw new IllegalArgumentException(
        "GRAFT_DEST_URL is required (or GRAFT_WAREHOUSE_DIR for warehouse mode)")
    val dialect = Dialect.forName(env.getOrElse("GRAFT_DIALECT", "ansi"))

    // live capture (optional): replication client → .pgo segments.
    // Started BEFORE the query so the first trigger can already see WAL.
    val transportFactory: Option[() => graft.sources.pgwire.PgWire.WireTransport] =
      captureTransport.orElse(env.get("GRAFT_PG_HOST").map { host => () =>
        val t = graft.sources.pgwire.PgWire.socketTransport(
          host, env.get("GRAFT_PG_PORT").map(_.toInt).getOrElse(5432))
        connectTransport(t, env)
      })
    val capture = transportFactory.map { mk =>
      val startLsn = graft.model.Lsn(
        graft.sources.cdcwal.WalSegmentIO.readFeedback(walDir).getOrElse(0L))
      (new graft.sources.pgwire.ReplicationClient(mk(), cfg, walDir), startLsn)
    }
    val captureThread = capture.map { case (client, startLsn) =>
      val th = new Thread(() => client.run(startLsn), "graft-capture")
      th.setDaemon(true)
      th.start()
      th
    }

    val listener = new CdcMetricsListener
    spark.streams.addListener(listener)
    val metricsPort = env.get("GRAFT_METRICS_PORT").map(_.toInt).getOrElse(8080)
    val metrics =
      if (metricsPort < 0) None
      else Some(new MetricsServer(listener, metricsPort).start())

    val reader = spark.readStream
      .format("graft.sources.cdcwal.CdcWalSource")
      .option("path", walDir)
    env.get("CDC_MAX_EVENTS_PER_TRIGGER")
      .foreach(n => reader.option("maxEventsPerTrigger", n))
    val envelope = reader.load()

    val query = warehouseDir match {
      case Some(root) =>
        // warehouse mode: per-table hash-bucketed parquet replicas (the
        // 100 TB path); spill form bounds executor memory for huge txs
        val buckets = env.get("GRAFT_WAREHOUSE_BUCKETS").map(_.toInt).getOrElse(64)
        if (env.get("GRAFT_WAREHOUSE_SPILL").exists(_.toBoolean))
          TxnSpill.startWarehouseSpill(envelope, root, ckpt, buckets,
            trigger, cfg.originFilter)
        else CdcPipeline.startWarehouse(envelope, root, ckpt, buckets,
          trigger, cfg.originFilter)
      case None =>
        val ctx = RenderContext(dialect, cfg.schemaMappings)
        val applier = new graft.sinks.JdbcApplier(destUrl.get, ctx, cfg.slotName,
          graft.coalesce.CoalesceConfig(
            maxRowsPerInsert = cfg.maxRowsPerInsert,
            bulkInsertThreshold = cfg.bulkInsertThreshold),
          cfg.batchSize)
        applier.init()
        // Transaction assembly before apply (same scaffold as startJdbc /
        // startWarehouse): protocol-v2 streamed DML whose transaction later
        // StreamAborts must never reach the destination.
        CdcPipeline.startAssembled(envelope, cfg.originFilter,
          s"graft-app-${cfg.slotName}", ckpt, trigger) { (batch, batchId) =>
          applier.applyBatch(batch, batchId)
        }
    }
    Wiring(query, metrics, listener, capture.map(_._1), captureThread)
  }

  /** Open the wire session on a fresh transport: StartupMessage FIRST
    * (the server waits for it before saying anything — handshaking
    * without it deadlocks both sides), then the authentication
    * conversation. Factored so tests can drive the exact production
    * byte order through a scripted transport. */
  def connectTransport(t: graft.sources.pgwire.PgWire.WireTransport,
                       env: Map[String, String]): graft.sources.pgwire.PgWire.WireTransport = {
    val user = env.getOrElse("GRAFT_PG_USER", "postgres")
    t.send(graft.sources.pgwire.PgWire.startup(
      user, env.getOrElse("GRAFT_PG_DATABASE", "postgres")))
    graft.sources.pgwire.PgWire.handshake(t, user, env.get("GRAFT_PG_PASSWORD"))
    t
  }

  /** Drain and release everything (idempotent): capture first (final
    * standby status + CopyDone), then the query's in-flight epoch, then
    * the metrics server. */
  def shutdown(w: Wiring): Unit = {
    try {
      w.capture.foreach(_.stop())
      w.captureThread.foreach(_.join(30000))
    } finally {
      try w.query.stop() finally w.metrics.foreach(_.stop())
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    val w = build(spark, GraftConfig.fromEnv(sys.env), sys.env)
    // SIGTERM/SIGINT → drain in-flight epoch, final flush, clean exit
    Runtime.getRuntime.addShutdownHook(new Thread(() => shutdown(w)))
    w.query.awaitTermination()
  }
}
