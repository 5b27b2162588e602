package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming stateful near-dedup: flag each arriving document that is
  * near-identical to any PREVIOUSLY seen document, incrementally.
  *
  * The batch path (`Dedup.minhashCandidates` → verify) recomputes the
  * whole candidate set per run; a training-data ingest pipeline instead
  * wants "is this new doc a dup of anything already ingested?" at
  * arrival time. Shape:
  *
  *  1. per-doc minhash signature (k hashes) — stateless projection
  *  2. explode to LSH band buckets (same banding as the batch path)
  *  3. `flatMapGroupsWithState` keyed by bucket: state = the signatures
  *     previously seen in this bucket (capped); each arrival is compared
  *     against them by minhash match fraction (the unbiased Jaccard
  *     estimator) and emitted as a `DupHit` when ≥ the threshold
  *
  * Scale: state is per-bucket and bounded by `maxPerBucket`; bucket
  * cardinality grows with corpus size so state per key stays small.
  * A doc sharing several buckets with the same prior doc emits the
  * same hit from each — `.dropDuplicates("doc_id","dup_of")` downstream
  * if exact-once pairs matter. Comparisons are signature-only (k longs),
  * never full text; exact verification can join the emitted pairs back
  * to the corpus, exactly like the batch `ngramJaccard(candidates=...)`.
  */
object StreamingDedup {

  final case class SigDoc(id: Long, sig: Seq[Long])
  final case class BucketArrival(bucket: String, docId: Long, sig: Seq[Long])
  final case class BucketState(docs: List[SigDoc])
  final case class DupHit(doc_id: Long, dup_of: Long, est_jaccard: Double)

  implicit val arrivalEnc: Encoder[BucketArrival] = Encoders.product[BucketArrival]
  implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
  implicit val hitEnc: Encoder[DupHit] = Encoders.product[DupHit]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  /** Per-row minhash signature (array of k). The bulk path computes
    * signatures via explode + native MinHashAgg (scan-throughput
    * optimal); this per-row form exists for the streaming operator,
    * where per-arrival cost dominates and a row must stay a row (no
    * pre-shuffle aggregation before stateful processing). */
  def signature(text: Column, k: Int = 8, shingleN: Int = 3): Column = {
    require(k <= Dedup.MinhashCoeffs.size)
    val hs = transform(TextOps.shingles(text, shingleN),
      s => TextOps.tokenHash60(s) % Dedup.MinhashP)
    array(Dedup.MinhashCoeffs.take(k).map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % Dedup.MinhashP))
    }: _*)
  }

  /** Docs → (bucket, docId, sig) arrivals, one row per LSH band.
    * Docs below `shingleN` tokens have no shingles → no signature →
    * dropped (they cannot near-dup by this metric). */
  def bucketArrivals(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                     shingleN: Int = 3, idCol: String = "doc_id",
                     textCol: String = "text"): Dataset[BucketArrival] = {
    val bands = k / rowsPerBand
    val bucketCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      concat_ws("-", lit(b) +: parts: _*)
    }
    docs
      .select(col(idCol).cast("long").as("docId"),
        signature(col(textCol), k, shingleN).as("sig"))
      .filter(element_at(col("sig"), 1).isNotNull)
      .select(explode(array(bucketCols: _*)).as("bucket"), col("docId"), col("sig"))
      .as[BucketArrival]
  }

  /** Minhash match fraction — E[frac] = Jaccard(a, b). */
  def matchFraction(a: Seq[Long], b: Seq[Long]): Double = {
    var same = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Pure per-bucket transition: compare each new arrival (docId order,
    * deterministic) against the bucket's seen signatures, emit hits,
    * append to state with the oldest entries evicted past `cap`.
    * Re-delivered docIds are no-ops (epoch replay safety). */
  def step(existing: List[SigDoc], batch: Seq[BucketArrival],
           simThreshold: Double, cap: Int): (List[SigDoc], Seq[DupHit]) = {
    var docs = existing
    val out = Seq.newBuilder[DupHit]
    batch.sortBy(_.docId).foreach { a =>
      if (!docs.exists(_.id == a.docId)) {
        docs.foreach { prior =>
          val f = matchFraction(prior.sig, a.sig)
          if (f >= simThreshold) out += DupHit(a.docId, prior.id, f)
        }
        docs = (SigDoc(a.docId, a.sig) :: docs).take(cap)
      }
    }
    (docs, out.result())
  }

  /** The streaming operator: arrivals → dup hits (Append mode). */
  def detect(arrivals: Dataset[BucketArrival], simThreshold: Double = 0.5,
             maxPerBucket: Int = 1000): Dataset[DupHit] =
    arrivals
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[BucketArrival], state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.docs).getOrElse(Nil)
          val (kept, hits) = step(prior, it.toSeq, simThreshold, maxPerBucket)
          state.update(BucketState(kept))
          hits.iterator
      }

  /** Convenience: docs stream in, dup hits stream out. */
  def dupStream(docs: DataFrame, simThreshold: Double = 0.5,
                k: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3,
                maxPerBucket: Int = 1000, idCol: String = "doc_id",
                textCol: String = "text"): Dataset[DupHit] =
    detect(bucketArrivals(docs, k, rowsPerBand, shingleN, idCol, textCol),
      simThreshold, maxPerBucket)
}
