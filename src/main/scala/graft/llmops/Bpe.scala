package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train on a corpus, encode at scale.
  *
  * Scale factoring (the one every production BPE trainer uses):
  *  - corpus-scale work is ONE word-count aggregation shuffle; the
  *    merge loop never sees the corpus, only the word-frequency
  *    dictionary, which Zipf keeps orders of magnitude smaller and
  *    [[wordCounts]] caps explicitly (`vocabCap`, a distributed
  *    TakeOrdered — the dropped tail is the lowest-frequency words,
  *    which by construction can never win a merge vote anyway).
  *  - the greedy merge loop runs driver-side over the BOUNDED dict
  *    (O(nMerges · dictChars)); deterministic tie-break (count desc,
  *    pair asc) so any two runs — or engines — learn identical merges.
  *  - corpus encoding is vocabulary-sized, not corpus-sized: each
  *    DISTINCT word is encoded once (`mapPartitions` over the word
  *    dict with the broadcast merge table), then token occurrences
  *    join back on the word key — relational shuffles end to end; the
  *    per-word imperative loop never touches a corpus-sized row count.
  */
object Bpe {

  final case class Merge(a: String, b: String, rank: Int)

  /** The word stream every BPE surface here tokenizes from: whitespace
    * tokens, empties dropped, and tokens containing U+001F (the UNIT
    * SEPARATOR control char) dropped — that char is reserved as the
    * symbol-boundary marker in the engine-parity encoding of merge
    * state, and a control char inside a training token is corpus noise
    * anyway. One filter site so train, encode and vocab derivation can
    * never disagree on what a "word" is. */
  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("\u001f"))

  /** Word-frequency dictionary, capped to the `vocabCap` most frequent
    * words (count desc, word asc — a distributed TakeOrdered cut). */
  def wordCounts(docs: DataFrame, vocabCap: Int = 1 << 16,
                 textCol: String = "text"): DataFrame =
    words(docs, textCol)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(vocabCap)

  /** Classic greedy BPE training over a word-frequency dictionary:
    * start from single characters, repeatedly merge the most frequent
    * adjacent symbol pair (weighted by word frequency), `nMerges`
    * times or until no pair reaches `minPairCount`. Deterministic:
    * ties break on the lexicographically smallest (a, b). */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int,
            minPairCount: Long = 2L): Array[Merge] = {
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (w.split("").filter(_.nonEmpty), c) }.toArray
    val merges = Array.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, bestCnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (bestCnt < minPairCount) done = true
        else {
          merges += Merge(best._1, best._2, rank)
          val joined = best._1 + best._2
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 &&
                    syms(i + 1) == best._2) { out += joined; i += 2 }
                else { out += syms(i); i += 1 }
              }
              (out.result(), c)
            }
          }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Encode one word with a ranked merge table: repeatedly apply the
    * lowest-rank applicable merge — the exact inference rule paired
    * with [[train]]'s greedy construction. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.split("").filter(_.nonEmpty)
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j == bestIdx) { out += syms(j) + syms(j + 1); j += 2 }
          else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Corpus encode, vocabulary-factored: encode each DISTINCT word once
    * (the imperative loop runs over |vocab| rows, never the corpus),
    * then join subtoken counts back onto token occurrences. Returns one
    * row per doc: (doc_id, n_ws_tokens, n_bpe_tokens) — the token
    * accounting a training-data budget runs on. The word dict is tiny
    * after the distinct, so AQE broadcasts the join side. */
  def encodeCorpus(docs: DataFrame, merges: Array[Merge],
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.a, m.b) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val distinctWords = words(docs, textCol).distinct()
    val encoded = distinctWords.as[String].mapPartitions { it =>
      val r = bc.value
      it.map(w => (w, encodeWord(w, r).length.toLong))
    }.toDF("w", "n_sub")
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("\u001f"))
      .join(encoded, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ws_tokens"), sum("n_sub").as("n_bpe_tokens"))
  }

  /** One-call pipeline: cap the dict, train, encode — the shape a
    * tokenizer-budget job runs. */
  def trainAndEncode(spark: SparkSession, docs: DataFrame, nMerges: Int,
                     vocabCap: Int = 1 << 16): (Array[Merge], DataFrame) = {
    val dict = wordCounts(docs, vocabCap).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = train(dict, nMerges)
    (merges, encodeCorpus(docs, merges))
  }

  /** The subtoken VOCABULARY the encoder can emit for this corpus under
    * `merges`: every distinct subtoken of the encoded distinct-word
    * set, id'd 1..|V| in subtoken sort order — a pure function of
    * (corpus, merges), so any engine derives identical ids.
    * Output: (token, token_id).
    *
    * Scale note: the distinct-subtoken set is bounded by ~alphabet +
    * |merges| (every multi-char subtoken is a merge output), so — like
    * IVF centroids — the vocab is DRIVER METADATA: the distributed part
    * is the per-word encode + distinct, the bounded survivor set sorts
    * and ids on the driver (no global window/sort anywhere in the
    * plan; the returned table broadcasts into the encode join). */
  def vocabOf(docs: DataFrame, merges: Array[Merge],
              textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.a, m.b) -> m.rank).toMap)
    val toks = words(docs, textCol).distinct().as[String]
      .mapPartitions { it => val r = bc.value; it.flatMap(encodeWord(_, r)) }
      .distinct().collect().sorted
    toks.zipWithIndex.map { case (t, i) => (t, i + 1L) }.toSeq
      .toDF("token", "token_id")
  }

  /** Persist / load the id ↔ subtoken vocab table — the artifact a
    * training-data emitter ships WITH the token-id sequences (ids are
    * meaningless without it). One parquet dir; vocab tables are
    * metadata-sized. */
  def writeVocab(vocab: DataFrame, path: String): Unit =
    vocab.select("token_id", "token").coalesce(1)
      .write.mode("overwrite").parquet(path)

  def loadVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("token", "token_id")

  /** The COMPLETE persisted tokenizer: `path/merges` (the ranked merge
    * table — without it the vocab can't encode NEW text) + `path/vocab`
    * (id ↔ subtoken). Train once offline (the `bpe-train` maintenance
    * verb), then any job — this engine or another — loads it and
    * encodes byte-identically. Both tables are metadata-sized. */
  def writeTokenizer(spark: SparkSession, path: String,
                     merges: Array[Merge], vocab: DataFrame): Unit = {
    import spark.implicits._
    merges.toSeq.map(m => (m.a, m.b, m.rank)).toDF("a", "b", "rank")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    writeVocab(vocab, s"$path/vocab")
  }

  def loadTokenizer(spark: SparkSession, path: String): (Array[Merge], DataFrame) = {
    val merges = spark.read.parquet(s"$path/merges").collect()
      .map(r => Merge(r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(_.rank)
    (merges, loadVocab(spark, s"$path/vocab"))
  }

  /** Per-doc TOKEN-ID SEQUENCES — the form a training-data emitter
    * hands to the trainer: (doc_id, ids array<bigint>), ids resolved
    * against `vocab` (from [[vocabOf]] or [[loadVocab]]).
    *
    * Vocabulary-factored like [[encodeCorpus]]: each DISTINCT word is
    * encoded once and carries its id sub-sequence (the per-word loop
    * runs over |vocab| rows); documents reassemble by joining word
    * occurrences and flattening the sub-sequences in word order — the
    * wide work is two relational joins plus per-DOC array folds, never
    * a corpus-sized imperative pass. Words whose encoding is not FULLY
    * covered by `vocab` (frozen vocab, evolving corpus) are dropped
    * WHOLE from the sequence — the frozen-tokenizer contract; emitting
    * the covered fragment of a word would hand the trainer a silently
    * corrupted sub-word (asserted in the spec). Re-derive the vocab to
    * cover new words. */
  def encodeCorpusIds(docs: DataFrame, merges: Array[Merge], vocab: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.a, m.b) -> m.rank).toMap)
    val wordSubs = words(docs, textCol).distinct().as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.flatMap { w =>
          val subs = encodeWord(w, r)
          subs.iterator.zipWithIndex.map { case (t, i) =>
            (w, i, t, subs.length) }
        }
      }.toDF("w", "p", "token", "n_sub")
    val wordIds = wordSubs.join(vocab, "token")
      .groupBy("w")
      .agg(collect_list(struct(col("p"), col("token_id"))).as("ps"),
        count(lit(1)).as("n_res"), first("n_sub").as("n_sub"))
      // all-or-nothing per word: a partial vocab hit must not leak a
      // truncated id fragment into the sequence
      .filter(col("n_res") === col("n_sub"))
      .select(col("w"),
        transform(array_sort(col("ps")), s => s.getField("token_id")).as("wids"))
    docs.select(col(idCol), posexplode(TextOps.tokens(col(textCol))))
      .toDF(idCol, "wp", "w")
      .filter(length(col("w")) > 0 && !col("w").contains("\u001f"))
      .join(wordIds, "w")
      .groupBy(idCol)
      .agg(collect_list(struct(col("wp"), col("wids"))).as("ws"))
      .select(col(idCol),
        flatten(transform(array_sort(col("ws")), s => s.getField("wids"))).as("ids"))
  }

  /** Inverse of [[encodeCorpusIds]] for auditing emitted sequences:
    * resolve each id array back to its subtoken concatenation (word
    * boundaries are not recoverable — BPE encoding drops them — so the
    * output is the concatenated subtoken stream, which round-trips
    * `concat(words)` exactly). One explode + broadcast vocab join +
    * per-row ordered rebuild; O(total ids). Unknown ids fail loudly
    * (inner join drops them and the length check below catches it)
    * rather than silently skipping corrupt data. */
  def decode(seqs: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
             idsCol: String = "ids"): DataFrame = {
    val resolved = seqs.select(col(idCol), posexplode(col(idsCol)))
      .toDF(idCol, "p", "token_id")
      .join(broadcast(vocab), "token_id")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_resolved"),
        collect_list(struct(col("p"), col("token"))).as("ts"))
    // LEFT join from the sequence side: a row whose ids didn't all
    // resolve keeps its identity (n_resolved < n_ids) instead of
    // silently vanishing through an inner join
    seqs.select(col(idCol), size(col(idsCol)).cast("long").as("n_ids"))
      .join(resolved, Seq(idCol), "left")
      .select(col(idCol),
        when(coalesce(col("n_resolved"), lit(0L)) === col("n_ids"),
          concat_ws("", transform(array_sort(col("ts")),
            s => s.getField("token"))))
          .otherwise(raise_error(concat(lit("decode: unknown token ids in "),
            col(idCol).cast("string")))).as("text"))
  }

  /** PACKED training sequences from per-doc id arrays ([[encodeCorpusIds]]
    * output joined with a shard column): concatenate each shard's docs in
    * id order and cut every `budget` tokens — docs STRADDLE sequence
    * boundaries (standard trainer packing), so every sequence except a
    * shard's last is exactly full. Output: (srcCol, seq_id, ids, spans)
    * where `spans` is the ordered list of document extents inside the
    * sequence — `struct(doc_id, off, len)`, offsets 0-based, contiguous,
    * Σ len = |ids|. The spans column is what lets a trainer build the
    * block-diagonal attention mask (no cross-document attention) and
    * the loss mask at document boundaries without re-deriving packing;
    * it also addresses each packed slice back to its source document
    * for audit/decontamination after the fact.
    *
    * Scale factoring: packing is inherently sequential, so the scale
    * unit is the shard — one window partition per `srcCol` computes
    * each doc's running start offset; the doc→sequence attribution is a
    * per-doc explode over the ≤ ⌈len/budget⌉+1 sequences the doc
    * overlaps, with the overlapping id slice carried along; sequences
    * reassemble with a (shard, seq) groupBy + ordered array flatten.
    * The spans ride the SAME parts aggregate — no extra shuffle.
    * No corpus-sized imperative pass, no global order — the same
    * shard-window discipline as the `llm_pack` budget report. */
  def packSequences(docIds: DataFrame, budget: Int,
                    srcCol: String = "source", idCol: String = "doc_id",
                    idsCol: String = "ids"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(srcCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val B = lit(budget.toLong)
    docIds
      .select(col(srcCol), col(idCol), col(idsCol).as("ids"),
        size(col(idsCol)).cast("long").as("len"))
      .filter(col("len") > 0)
      .withColumn("start", sum("len").over(w) - col("len"))
      // every sequence this doc overlaps: floor(start/B)..floor((end-1)/B)
      .withColumn("seq_id",
        explode(sequence(expr(s"start div ${budget.toLong}"),
          expr(s"(start + len - 1) div ${budget.toLong}"))))
      // the doc's id slice that falls inside [seq·B, (seq+1)·B)
      .withColumn("frm", greatest(col("start"), col("seq_id") * B))
      .withColumn("to", least(col("start") + col("len"), (col("seq_id") + 1) * B))
      .withColumn("sl", slice(col("ids"),
        (col("frm") - col("start") + 1).cast("int"),
        (col("to") - col("frm")).cast("int")))
      .groupBy(srcCol, "seq_id")
      // `start` leads the struct so array_sort orders parts by corpus
      // position (unique within a sequence — comparison never falls
      // through to the later fields)
      .agg(collect_list(struct(col("start"), col("sl"),
        col(idCol).as("did"),
        (col("frm") - col("seq_id") * B).as("off"),
        (col("to") - col("frm")).as("slen"))).as("parts"))
      .select(col(srcCol), col("seq_id"),
        flatten(transform(array_sort(col("parts")), s => s.getField("sl")))
          .as("ids"),
        transform(array_sort(col("parts")), p =>
          struct(p.getField("did").as("doc_id"), p.getField("off").as("off"),
            p.getField("slen").as("len"))).as("spans"))
  }
}
