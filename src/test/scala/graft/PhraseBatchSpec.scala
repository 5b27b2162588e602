package graft

import java.nio.file.Files
import graft.llmops.TextIndexStore
import org.apache.spark.sql.functions._

/** Batched phrase retrieval ([[TextIndexStore.phraseSearchBatch]]):
  * many phrases in ONE plan must return exactly the union of the
  * per-phrase [[TextIndexStore.phraseSearch]] results — same
  * candidates-carry-all-slots gate, same successor-position adjacency
  * count — with single-word phrases degrading to tf and tombstoned
  * docs excluded. */
class PhraseBatchSpec extends SparkSpecBase {

  test("batch ≡ per-phrase loop; single-word = tf; tombstones excluded") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200).cache()
    val dir = Files.createTempDirectory("phrase-batch")
      .toFile.getAbsolutePath + "/idx"
    val store = new TextIndexStore(dir, numParts = 16)
    store.addBatch(spark, docs, 0)
    // phrases = three probe docs' own token 2-4 trigrams (they at
    // least self-match), one two-word, plus a single-word probe
    val probeIds = Seq(2L, 11L, 30L)
    val phrases = docs.filter(col("doc_id").isin(probeIds: _*))
      .select(col("doc_id").as("qid"),
        posexplode(slice(split(col("text"), " "), 2, 3))
          .as(Seq("slot", "term")))
      .unionByName(docs.filter(col("doc_id") === 7L)
        .select(col("doc_id").as("qid"),
          posexplode(slice(split(col("text"), " "), 5, 2))
            .as(Seq("slot", "term"))))
      .unionByName(docs.filter(col("doc_id") === 9L)
        .select(col("doc_id").as("qid"),
          posexplode(slice(split(col("text"), " "), 3, 1))
            .as(Seq("slot", "term"))))
      .localCheckpoint(true)
    val batch = store.phraseSearchBatch(spark, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // the per-phrase loop (single-word qid 9 handled separately below)
    val loop = phrases.filter(col("qid") =!= 9L).collect()
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (qid, rows) =>
        val words = rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
        store.phraseSearch(spark, words).collect()
          .map(r => (qid, r.getLong(0), r.getLong(1)))
      }.sorted
    // single-word phrase: occurrence count = tf of that word per doc
    val w9 = phrases.filter(col("qid") === 9L).head().getString(2)
    val single = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n_occ",
        size(filter(col("t"), x => x === lit(w9))).cast("long"))
      .filter(col("n_occ") > 0)
      .select("doc_id", "n_occ")
      .collect().map(r => (9L, r.getLong(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty && batch == (loop ++ single).sorted,
      s"batch (${batch.size}) must equal loop+single (${loop.size}+${single.size})")
    // every probe self-matches
    probeIds.foreach(p => assert(batch.exists(r => r._1 == p && r._2 == p),
      s"probe $p must match itself"))
    // the corpus-sized form (no driver term list) returns the same rows
    val dist = store.phraseSearchDistributed(phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(dist == batch,
      "phraseSearchDistributed must match phraseSearchBatch exactly")
    // retraction: a tombstoned doc leaves every phrase's result
    val victim = batch.head._2
    store.delete(spark, Seq(victim))
    val after = store.phraseSearchBatch(spark, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(after == batch.filterNot(_._2 == victim),
      "tombstoned docs must drop from the batched results")
    assert(store.phraseSearchDistributed(phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      == after, "the distributed form honors tombstones too")
    docs.unpersist()
  }

  test("rarest-slot-first: a planted stopword slot never shuffles its " +
      "corpus-sized posting list") {
    import spark.implicits._
    // every doc carries the stopword "zz" SIX times (heavy pos arrays);
    // "rarewordq" lives in exactly two docs, once adjacent to zz
    val n = 4000
    val docs = (0L until n.toLong).map { i =>
      val rare = if (i == 7L) "rarewordq zz" else s"f${i}a f${i}b"
      (i, s"zz zz zz zz zz $rare")
    }.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("phrase-rarest")
      .toFile.getAbsolutePath + "/idx"
    val store = new TextIndexStore(dir, numParts = 8)
    store.addBatch(spark, docs, 0)
    val phrases = Seq((1L, 0, "rarewordq"), (1L, 1, "zz"))
      .toDF("qid", "slot", "term")
    // count the rows every shuffle in the serve actually moves — the
    // scale contract a correctness diff cannot see: the old plan
    // joined the stopword's FULL posting list (with pos arrays) into
    // the adjacency fold, shuffling >= n rows; rarest-first bounds the
    // shuffled volume by the rare slot's df plus survivor rows
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    val rows =
      try {
        val r = store.phraseSearchBatch(spark, phrases).collect()
        awaitQuiet(recs.get().toInt) // listener bus is async
        r
      } finally spark.sparkContext.removeSparkListener(l)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 7L, 1L)), "the planted adjacency must be found")
    assert(recs.get() < n / 4,
      s"phrase serve shuffled ${recs.get()} rows — the stopword slot's " +
        s"posting list (df=$n) must not ride a shuffle")
  }
}
