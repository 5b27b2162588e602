package graft

import graft.llmops.Unigram
import graft.llmops.Unigram.{Piece, Vocab}
import org.apache.spark.sql.functions._

/** Unigram (SentencePiece-style) segmenter: hand-computed decodes,
  * decoder invariants over a real corpus slice, UNK totality, and
  * corpus-roll-up parity with the per-word decoder. */
class UnigramSpec extends SparkSpecBase {

  private def vocab(ps: (String, Long)*): Vocab = {
    val arr = ps.map { case (p, f) => Piece(p, f) }.toArray
    Vocab(arr, arr.map(_.freq).sum)
  }

  test("Viterbi picks the globally best split, not the greedy one") {
    // greedy longest-match from the left would take "ab" then "cd";
    // make the middle piece "bc" so expensive singles surround it when
    // chosen — global DP must still prefer ab|cd over a|bc|d
    val v = vocab("ab" -> 100L, "cd" -> 100L, "bc" -> 100L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    val (pieces, score) = Unigram.segmentWord("abcd", v)
    assert(pieces.toSeq == Seq("ab", "cd"))
    val lnp = v.lnpMicro
    assert(score == lnp("ab") + lnp("cd"))
  }

  test("fewer pieces win a score tie; totality via the UNK penalty") {
    // "aa" vs "a","a": freq chosen so ln(aa)=2·ln(a)−ln(tot) exactly
    // cannot be forced with integers, so instead assert the defined
    // preference directly on an exact tie: identical freq for "aa" and
    // the two-"a" path can't tie in general — use the np tie-break on
    // a constructed equal-score pair instead: "ab" (freq f) vs "a","b"
    // where ln(f)−lnT == (ln(f)−lnT)·2 only when ln(f)=lnT ⇒ f=tot —
    // a single-piece vocab: every path score is then k·0 = 0 and the
    // decoder must pick the FEWEST pieces.
    val v1 = vocab("aa" -> 1L)
    // only "a" is len-1 and unknown → UNK; "aa" known with lnp = 0
    val (p1, s1) = Unigram.segmentWord("aaaa", v1)
    assert(p1.toSeq == Seq("aa", "aa"))
    assert(s1 == 0L)
    // unknown single char decodes at −ln(total), never throws
    val v2 = vocab("ab" -> 7L)
    val (p2, s2) = Unigram.segmentWord("zq", v2)
    assert(p2.toSeq == Seq("z", "q"))
    assert(s2 == -2L * v2.lnTotMicro)
  }

  test("decoder invariants on the sf0.001 corpus vocab") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v = Unigram.trainVocab(docs)
    assert(v.pieces.nonEmpty && v.total > 0)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    val lnp = v.lnpMicro
    words.foreach { w =>
      val (pieces, score) = Unigram.segmentWord(w, v)
      assert(pieces.mkString("") == w, s"round-trip failed for $w")
      assert(pieces.forall(p => p.length >= 1 && p.length <= Unigram.MaxPieceLen))
      val recomputed = pieces.map(p =>
        lnp.getOrElse(p, { assert(p.length == 1); -v.lnTotMicro })).sum
      assert(score == recomputed, s"score mismatch for $w")
      // no split can beat the DP (spot-check the all-singles path)
      val singles = w.split("").filter(_.nonEmpty).map(c =>
        lnp.getOrElse(c, -v.lnTotMicro)).sum
      assert(score >= singles, s"DP beaten by singles for $w")
    }
    // determinism: an independent training run yields the same vocab
    val v2 = Unigram.trainVocab(docs)
    assert(v.pieces.toSeq == v2.pieces.toSeq && v.total == v2.total)
  }

  test("hard-EM round does not decrease the joint likelihood") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dict = graft.llmops.Bpe.wordCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(dict.nonEmpty)
    // joint NLL of (dict, best paths) in micro-nats under a vocab
    def nll(v: Vocab): Long =
      dict.map { case (w, c) => -c * Unigram.segmentWord(w, v)._2 }.sum
    val v0 = Unigram.trainVocab(docs)
    val v1 = Unigram.emStep(docs, v0)
    val v2 = Unigram.emStep(docs, v1)
    // piece SET is fixed; only frequencies move
    assert(v1.pieces.map(_.piece).toSeq == v0.pieces.map(_.piece).toSeq)
    val (n0, n1, n2) = (nll(v0), nll(v1), nll(v2))
    // hard-EM monotonicity, with slack for integer micro-rounding and
    // the unused-piece frequency floor (both ≪ 0.1%)
    assert(n1 <= n0 + n0 / 1000, s"EM round 1 increased NLL: $n0 -> $n1")
    assert(n2 <= n1 + n1 / 1000, s"EM round 2 increased NLL: $n1 -> $n2")
    // decoding stays total and deterministic under the refined model
    dict.foreach { case (w, _) =>
      val (p, _) = Unigram.segmentWord(w, v2)
      assert(p.mkString("") == w)
    }
  }

  test("id emission agrees with the segmenter and feeds packSequences") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100).cache()
    val v = Unigram.trainVocab(docs)
    val ids = Unigram.encodeCorpusIds(docs, v).cache()
    // token accounting: id-array lengths == the segmenter's piece counts
    val idTok = ids.agg(sum(size(col("ids")))).first().getLong(0)
    val segTok = Unigram.segmentCorpus(docs, v)
      .agg(sum("n_pieces")).first().getLong(0)
    assert(idTok == segTok, s"id emission $idTok vs segmenter $segTok")
    // the ids DF plugs straight into the BPE packing path, lossless
    val packed = graft.llmops.Bpe.packSequences(
      ids.withColumn("source", lit("s")), budget = 128)
    val packTok = packed.agg(sum(size(col("ids")))).first().getLong(0)
    assert(packTok == idTok, s"packing lost tokens: $packTok vs $idTok")
    // an unknown char decodes to the reserved UNK id 0
    import spark.implicits._
    val weird = Seq((0L, "ÿq ÿq ÿq")).toDF("doc_id", "text")
    val wids = Unigram.encodeCorpusIds(weird, v)
      .select("ids").first().getSeq[Long](0)
    assert(wids.nonEmpty && wids.contains(0L), s"no UNK id in $wids")
  }

  test("corpus roll-up equals the per-word decode, fold by occurrence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).cache()
    val v = Unigram.trainVocab(docs)
    val got = Unigram.segmentCorpus(docs, v)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      val segs = ws.map(w => Unigram.segmentWord(w, v))
      val nP = segs.map(_._1.length.toLong).sum
      val s = segs.map(_._2).sum
      r.getLong(0) -> ((ws.length.toLong, nP,
        Math.round(-s * 1.0 / (1000.0 * nP))))
    }.toMap
    assert(got == expected)
  }
}
