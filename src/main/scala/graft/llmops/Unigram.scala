package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword segmenter: the OTHER major
  * tokenizer family next to [[Bpe]]. Where BPE composes greedily from
  * merges, a unigram segmenter picks, per word, the GLOBALLY best
  * segmentation under per-piece log-probabilities — exact Viterbi
  * decoding over all substring splits. This implementation is the
  * frequency-seeded form (piece probability ∝ corpus substring
  * frequency over the selected vocab — hard-EM round zero, the seed
  * state every SentencePiece training run starts from).
  *
  * Scale factoring (identical discipline to [[Bpe]]):
  *  - corpus-scale work is ONE word-count shuffle ([[Bpe.wordCounts]]'
  *    shape); substring counting, vocab selection and per-word Viterbi
  *    all run over the BOUNDED word dict, never the corpus;
  *  - the vocab (top-V pieces + all single chars) is DRIVER METADATA
  *    like BPE merges / IVF centroids — ≤ vocabSize + alphabet rows —
  *    broadcast into the per-word decode;
  *  - corpus results join back on the word key (each DISTINCT word is
  *    decoded once; occurrences pay a hash join, not a DP).
  *
  * Engine-exact determinism (the oracle replays every step in SQL):
  *  - piece log-probs are micro-rounded lns of exact integer
  *    (freq, total) pairs: lnp = round(ln freq·1e6) − round(ln tot·1e6);
  *  - a path's score is a SUM of those integers, so the Viterbi argmax
  *    is order-independent; ties break (score desc, n_pieces asc,
  *    split-start asc) — fixed on both engines;
  *  - unknown single chars (possible when the dict cap drops a word's
  *    only occurrence of a char) decode with the defined UNK penalty
  *    lnp = −round(ln tot·1e6) (pseudo-frequency 1), so decoding is
  *    TOTAL: every word segments, nothing throws.
  */
object Unigram {

  val MaxPieceLen = 4
  val DefaultVocabSize = 512

  /** Position bound for the ORACLE's unrolled Viterbi DP (the Scala
    * decoder handles any length). Corpus words here are ≤ 8 chars; a
    * corpus with longer words needs the unroll widened in step — a
    * mismatch surfaces as a missing dp row → a hash mismatch, never a
    * silent wrong answer. */
  val OracleMaxWordLen = 12

  final case class Piece(piece: String, freq: Long)
  final case class Vocab(pieces: Array[Piece], total: Long) {
    lazy val lnTotMicro: Long = lnMicro(total)
    lazy val lnpMicro: Map[String, Long] =
      pieces.iterator.map(p => p.piece -> (lnMicro(p.freq) - lnTotMicro)).toMap
  }

  def lnMicro(x: Long): Long = Math.round(Math.log(x.toDouble) * 1e6)

  /** Code-point order — equals Spark's UTF8String / DuckDB's UTF-8
    * binary collation. JVM String order compares UTF-16 code units,
    * which ranks supplementary-plane pieces BELOW U+E000..U+FFFF ones
    * (surrogates sort low), so id assignment would silently diverge
    * between engine and oracle on such vocabularies. */
  val codePointOrder: Ordering[String] = (a: String, b: String) => {
    val n = math.min(a.length, b.length)
    var i = 0; var r = 0
    while (r == 0 && i < n) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(i)
      r = Integer.compare(ca, cb)
      if (r == 0) i += Character.charCount(ca)
    }
    if (r != 0) r else Integer.compare(a.length, b.length)
  }

  private val pieceOrder: Ordering[Piece] =
    Ordering.by[Piece, String](_.piece)(codePointOrder)

  /** All substrings of length 1..[[MaxPieceLen]] of the dict words,
    * weighted by word frequency — the seed-piece frequency table.
    * Bounded: |dict| · maxWordLen · MaxPieceLen rows pre-aggregation,
    * map-side combined down to the distinct-piece count. */
  def pieceCounts(wordFreq: DataFrame): DataFrame =
    wordFreq.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, least(length(w), $MaxPieceLen)),
           |  l -> transform(sequence(1, length(w) - l + 1),
           |    s -> substring(w, s, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("freq"))

  /** Select the vocab: top `vocabSize` pieces by (freq desc, piece asc)
    * — a distributed TakeOrdered cut — UNION all single-char pieces
    * (guaranteed coverage), then collect: the result is bounded driver
    * metadata. `total` is the vocab's frequency mass (the probability
    * denominator). */
  def trainVocab(docs: DataFrame, vocabSize: Int = DefaultVocabSize,
                 vocabCap: Int = 1 << 16, textCol: String = "text"): Vocab = {
    val pc = pieceCounts(Bpe.wordCounts(docs, vocabCap, textCol))
    val top = pc.orderBy(desc("freq"), col("piece")).limit(vocabSize)
    val chars = pc.filter(length(col("piece")) === 1)
    val rows = top.union(chars).distinct()
      .collect().map(r => Piece(r.getString(0), r.getLong(1)))
      .sorted(pieceOrder)
    Vocab(rows, rows.map(_.freq).sum)
  }

  /** Exact Viterbi decode of one word under the vocab: maximize the
    * summed piece log-prob over every segmentation into pieces of
    * length ≤ [[MaxPieceLen]] (single chars always available, unknown
    * ones at the UNK penalty). Ties: fewer pieces, then earliest
    * split start. Returns (pieces, scoreMicro). O(len · MaxPieceLen). */
  def segmentWord(word: String, vocab: Vocab): (Array[String], Long) = {
    val n = word.length
    if (n == 0) return (Array.empty, 0L)
    val lnp = vocab.lnpMicro
    val unk = -vocab.lnTotMicro
    // dp over end positions: score, piece count, backpointer
    val score = Array.fill(n + 1)(Long.MinValue)
    val np = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0L; np(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (score(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val p = lnp.get(piece) match {
            case Some(v) => Some(v)
            case None => if (i - j == 1) Some(unk) else None
          }
          p.foreach { v =>
            val s = score(j) + v
            val k = np(j) + 1
            // (score desc, np asc, j asc): strict improvement keeps the
            // smallest j among equals because j iterates ascending
            if (s > score(i) || (s == score(i) && k < np(i))) {
              score(i) = s; np(i) = k; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val pieces = Array.newBuilder[String]
    var at = n
    val stack = scala.collection.mutable.Stack.empty[String]
    while (at > 0) { val j = back(at); stack.push(word.substring(j, at)); at = j }
    while (stack.nonEmpty) pieces += stack.pop()
    (pieces.result(), score(n))
  }

  /** One hard-EM (Viterbi-EM) refinement: re-estimate piece
    * frequencies from the CURRENT vocab's own Viterbi segmentations of
    * the word dict (weighted by word frequency), keeping the piece SET
    * fixed. Pieces no segmentation uses keep pseudo-frequency 1, so
    * decoding stays total. This is the alternation SentencePiece runs
    * (E: best split under the params; M: counts from the splits), and
    * it carries hard-EM's guarantee — the joint likelihood of
    * (corpus, best paths) does not decrease across a full cycle
    * (spec-asserted within integer-rounding slack).
    *
    * Scale: the E-step is the same vocabulary-factored mapPartitions
    * as [[segmentCorpus]] — per-DISTINCT-word DP with the broadcast
    * vocab; the M-step is one bounded groupBy over emitted pieces
    * (≤ dict·maxLen rows). Iterate as many rounds as wanted; each is
    * one dict pass. */
  def emStep(docs: DataFrame, vocab: Vocab, vocabCap: Int = 1 << 16,
             textCol: String = "text"): Vocab = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    val obs = Bpe.wordCounts(docs, vocabCap, textCol)
      .as[(String, Long)].mapPartitions { it =>
        val v = bc.value
        it.flatMap { case (w, c) =>
          segmentWord(w, v)._1.iterator.map(p => (p, c)) }
      }.toDF("piece", "cnt")
      .groupBy("piece").agg(sum("cnt").as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pieces = vocab.pieces
      .map(p => Piece(p.piece, math.max(obs.getOrElse(p.piece, 0L), 1L)))
      .sorted(pieceOrder)
    Vocab(pieces, pieces.map(_.freq).sum)
  }

  /** Persist the segmenter artifact: the bounded (piece, freq) table
    * (total re-derives on load as Σ freq — no separate meta to drift).
    * The frozen-tokenizer artifact a serving/emit job mounts, the
    * unigram sibling of [[Bpe.writeTokenizer]]. */
  def writeVocab(spark: org.apache.spark.sql.SparkSession, path: String,
                 vocab: Vocab): Unit = {
    import spark.implicits._
    vocab.pieces.toSeq.map(p => (p.piece, p.freq)).toDF("piece", "freq")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Vocab = {
    val rows = spark.read.parquet(path).collect()
      .map(r => Piece(r.getString(0), r.getLong(1)))
      .sorted(pieceOrder)
    Vocab(rows, rows.map(_.freq).sum)
  }

  /** Dense piece-id table: piece → id, ids 1..|V| in piece sort order
    * (pieces are unique, so the order is total); id 0 is RESERVED for
    * the UNK single-char fallback. Driver metadata like the vocab
    * itself — any engine derives identical ids. */
  def pieceIds(vocab: Vocab): Map[String, Long] =
    vocab.pieces.map(_.piece).sorted(codePointOrder).zipWithIndex
      .map { case (p, i) => p -> (i + 1L) }.toMap

  /** Per-doc piece-ID SEQUENCES — the unigram counterpart of
    * [[Bpe.encodeCorpusIds]], feeding the same
    * [[Bpe.packSequences]]/emit-shards path. Unknown single-char
    * pieces emit the reserved UNK id 0 (the decoder's totality rule
    * carried into the id space — unlike BPE's all-or-nothing word
    * drop, a unigram segmentation always exists, so no token is ever
    * silently lost). Vocabulary-factored: DP + id lookup run once per
    * DISTINCT word against the broadcast vocab; docs reassemble by
    * word-position sort (the Bpe reassembly idiom). */
  def encodeCorpusIds(docs: DataFrame, vocab: Vocab, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((vocab, pieceIds(vocab)))
    val wordIds = docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String]
      .mapPartitions { it =>
        val (v, m) = bc.value
        it.map(w => (w, segmentWord(w, v)._1.map(p => m.getOrElse(p, 0L)).toSeq))
      }.toDF("w", "wids")
    docs.select(col(idCol), posexplode(TextOps.tokens(col(textCol))))
      .toDF(idCol, "wp", "w")
      .filter(length(col("w")) > 0)
      .join(wordIds, "w")
      .groupBy(idCol)
      .agg(collect_list(struct(col("wp"), col("wids"))).as("ws"))
      .select(col(idCol),
        flatten(transform(array_sort(col("ws")), s => s.getField("wids"))).as("ids"))
  }

  /** Corpus segmentation, vocabulary-factored: decode each DISTINCT
    * word once (mapPartitions over the word dict with the broadcast
    * vocab — the imperative DP never sees a corpus-sized row count),
    * then join per-word (n_pieces, score) back onto token occurrences.
    * Output per doc: (doc_id, n_ws_tokens, n_pieces, nll_milli) where
    * nll_milli is the mean negative log-likelihood per piece in
    * milli-nats — the unigram-LM fit signal a tokenizer-budget job
    * reads next to BPE fertility. */
  def segmentCorpus(docs: DataFrame, vocab: Vocab,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    val distinctWords = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val decoded = distinctWords.as[String].mapPartitions { it =>
      val v = bc.value
      it.map { w =>
        val (pieces, s) = segmentWord(w, v)
        (w, pieces.length.toLong, s)
      }
    }.toDF("w", "n_pieces_w", "score_micro_w")
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(decoded, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum("n_pieces_w").as("n_pieces"),
        sum("score_micro_w").as("s_micro"))
      .select(col(idCol), col("n_ws_tokens"), col("n_pieces"),
        round(-col("s_micro") * lit(1.0) / (lit(1000.0) * col("n_pieces")))
          .cast("bigint").as("nll_milli"))
  }
}
