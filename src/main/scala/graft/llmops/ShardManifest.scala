package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Release manifest for [[graft.streaming.GraftApp]]'s `emit-shards`
  * output — the dataset-versioning record a trainer needs to trust (and
  * incrementally refresh) a mounted shard tree. Mirrors the discipline
  * the reference applies to every durable artifact (checkpoint metadata
  * carries resume state, pg2any-lib/src/lsn_tracker.rs:72-124): each
  * emission writes a `release=N` manifest of
  *
  *   shard → (content_hash, n_docs, n_tokens, n_seqs, n_full),
  *
  * stamped with the tokenizer fingerprint, packing budget and shard
  * count that produced it. Two consumers:
  *
  *  - **Release diffing** ([[diff]]): which shards changed between two
  *    releases — the trainer re-downloads exactly those.
  *  - **Incremental emit**: the next emission compares the corpus's
  *    [[contentState]] against the latest manifest and re-tokenizes /
  *    re-packs ONLY the shards whose content hash moved. Deciding costs
  *    one hash scan of the docs (no tokenizer in the loop); at 100 TB
  *    a daily corpus delta touches a few shards, not the world. A
  *    changed tokenizer fingerprint, budget or shard count invalidates
  *    everything (shard membership / packing geometry moved) and forces
  *    the documented full re-emit.
  *
  * The content hash is a bit_xor fold of per-doc md5-prefix hashes:
  * order-independent (a shard's membership is a set) and replayable in
  * plain SQL — the `llm_shard_manifest` query oracle-checks the exact
  * construction against DuckDB. */
object ShardManifest {

  /** emit-shards' deterministic shard assignment, factored here so the
    * manifest and the emitter can never disagree on membership. */
  def shardOf(docId: Column, nShards: Int): Column =
    pmod(TextOps.tokenHash60(concat(lit("shard:"), docId.cast("string"))),
      lit(nShards.toLong))

  /** Pre-tokenization per-shard content state: (shard, n_docs,
    * content_hash) from ONE cheap scan — the "which shards changed"
    * decision never pays a re-tokenization. */
  def contentState(docs: DataFrame, nShards: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
        shardOf(col(idCol), nShards).as("shard"),
        graft.expressions.GraftFunctions.md5_prefix60(
          concat(col(idCol).cast("string"), lit(":"), col(textCol))).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("content_hash"))

  /** Driver-side fingerprint of a tokenizer artifact: streaming md5 over
    * a canonical rendering of its (bounded, driver-held) content, first
    * 60 bits as a long. Content-based, so byte-level parquet
    * nondeterminism across identical re-trains cannot fake a change. */
  def fpOf(parts: IterableOnce[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.iterator.foreach { p =>
      md.update(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update(0.toByte)
    }
    java.lang.Long.parseLong(
      md.digest().take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def manifestRoot(out: String) = new Path(out, "_manifest")

  private def fsOf(spark: SparkSession, out: String) =
    manifestRoot(out).getFileSystem(spark.sessionState.newHadoopConf())

  /** Latest (release, manifest) under `out`, None before the first
    * emission. The `_manifest` dir is underscore-hidden, so plain reads
    * of the shard tree never see it. */
  def latestRelease(spark: SparkSession, out: String): Option[(Int, DataFrame)] = {
    val root = manifestRoot(out)
    val fs = fsOf(spark, out)
    if (!fs.exists(root)) None
    else {
      val rels = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("release="))
        .map(_.getPath.getName.stripPrefix("release=").toInt)
      if (rels.isEmpty) None
      else Some(rels.max -> readRelease(spark, out, rels.max))
    }
  }

  def readRelease(spark: SparkSession, out: String, release: Int): DataFrame =
    spark.read.parquet(new Path(manifestRoot(out), s"release=$release").toString)

  /** One small file per release — manifests are O(nShards) rows. */
  def writeRelease(spark: SparkSession, out: String, release: Int,
                   manifest: DataFrame): Unit =
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(new Path(manifestRoot(out), s"release=$release").toString)

  /** Per-shard status between two releases — [[graft.queries.LlmQueries]]
    * `llm_dataset_diff`'s added/removed/changed/unchanged shape lifted
    * from docs to shards. */
  def diff(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("shard"), col("content_hash").as("h1"))
    val c = cur.select(col("shard"), col("content_hash").as("h2"))
    p.join(c, Seq("shard"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed"))
      .select("shard", "status")
  }
}
