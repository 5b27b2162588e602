package graft.llmops

import graft.expressions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Numeric contract: vectors are quantized to BIGINT milli-units before
  * any aggregation, so dot products are exact integers (order-independent,
  * reproducible across engines) and only the final cosine division is
  * floating point. 64-dim ±~5σ floats quantized at 1e3 stay far below
  * 2^53, so the integer math never loses a bit. Dot products run through
  * the native codegen'd `dot_q` expression (graft.expressions.DotQ), not
  * interpreted higher-order functions.
  *
  * Scale paths:
  *  - bruteForceTopK: one broadcast of the probe + full scan; exact.
  *    Right answer for "top-k of one query against the corpus".
  *  - banded hyperplane LSH (`bandBuckets`): `bands` independent bucket
  *    tables of `bitsPerBand` random-hyperplane sign bits each. A pair at
  *    angle θ shares a given band with probability (1-θ/π)^bits; the
  *    union over bands recovers the recall a single bucket table loses at
  *    hyperplane boundaries, while more bits per band keep buckets small
  *    (work per bucket is quadratic in bucket size). At 100 TB the
  *    bucket table is written out once partitioned by (band, bucket);
  *    `signLshTopK` probes it with a literal (band, bucket-IN-list)
  *    predicate — partition pruning, not a scan-and-filter.
  */
object Similarity {

  /** Fixed hyperplane-family seed; baked into oracle SQL as literals. */
  val DefaultSeed: Long = 1069L
  val DefaultBands: Int = 10
  val DefaultBitsPerBand: Int = 10

  /** array<float> → array<bigint> milli-quantized. Native codegen'd
    * expression (graft.expressions.QuantizeMilli) — the previous
    * `transform(v, x => round(x * scale).cast("bigint"))` HOF is
    * CodegenFallback, interpreted per element per row with a BigDecimal
    * allocation inside Round; it sat under every ANN query and both
    * embedding stores. Bit parity (float multiply, HALF_UP on the
    * float→double chain, saturating cast) is pinned by
    * QuantizeMilliParitySpec on the .5 boundaries. */
  def quantize(v: Column, scale: Int = 1000): Column =
    GraftFunctions.quantize_milli(v, scale)

  /** Exact integer dot product of two quantized vectors (codegen'd). */
  def dotQ(a: Column, b: Column): Column = GraftFunctions.dot_q(a, b)

  def normQ(a: Column): Column = dotQ(a, a)

  /** (id, qe, nq): the reusable quantized form of the corpus. */
  def quantized(embeddings: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol), quantize(col(vecCol)).as("qe"))
      .withColumn("nq", normQ(col("qe")))

  /** Johnson–Lindenstrauss Rademacher projection: reduce a quantized
    * dim-64 embedding to `outDim` integer components, qr_j = <qe, s_j>
    * with s_j the same deterministic ±1 family the sign-LSH planes use
    * ([[graft.expressions.Hyperplanes]], distinct seed) — so the exact
    * projection replays as SQL literals for the oracle. JL: pairwise
    * dot products are preserved within ~1/sqrt(outDim) relative error,
    * which turns a 64-dim scan into a 16-dim one — the 4× cheaper
    * FIRST-PASS scoring space of a rerank pipeline (score everything
    * reduced, rerank the shortlist full-width). Integer end to end:
    * |qr_j| ≤ dim·|qe|_max keeps every product inside BIGINT with the
    * norms multiplied as doubles. */
  val RpSeed: Long = 7331L
  val RpDim: Int = 16

  def rpProject(qe: Column, seed: Long = RpSeed, outDim: Int = RpDim,
                inDim: Int = 64): Column =
    array((0 until outDim).map { j =>
      dotQ(qe, typedlit(graft.expressions.Hyperplanes
        .planeCoeffs(seed, j, inDim).map(_.toLong).toSeq))
    }: _*)

  /** (id, qr, nr): the reduced-space corpus — [[quantized]]'s shape one
    * projection down. */
  def rpReduced(embeddings: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding", seed: Long = RpSeed,
                outDim: Int = RpDim): DataFrame =
    quantized(embeddings, idCol, vecCol)
      .select(col(idCol), rpProject(col("qe"), seed, outDim).as("qr"))
      .withColumn("nr", normQ(col("qr")))

  /** Two-stage reduced-then-rerank ANN — the production shape the JL
    * projection exists for: score EVERY vector in the 16-dim reduced
    * space (4× less arithmetic + memory traffic per candidate), cut a
    * `shortlist` with a distributed TakeOrdered, then rerank only the
    * shortlist at full width. Exactness degrades gracefully: with
    * `shortlist` ≥ corpus the result IS brute force (spec-asserted);
    * at 100 TB the reduced pass is the scan and the rerank touches
    * O(shortlist) rows. */
  def rpRerankTopK(embeddings: DataFrame, probeId: Long, k: Int,
                   shortlist: Int = 50, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val red = rpReduced(embeddings, idCol, vecCol)
    val probeR = red.filter(col(idCol) === probeId)
      .select(col("qr").as("pr"), col("nr").as("np"))
    val short = red.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probeR))
      .withColumn("cr", dotQ(col("qr"), col("pr")) * lit(1.0) /
        sqrt(col("nr").cast("double") * col("np").cast("double")))
      .orderBy(desc("cr"), col(idCol)).limit(shortlist)
      .select(idCol)
    val q = quantized(embeddings, idCol, vecCol)
    val probeF = q.filter(col(idCol) === probeId)
      .select(col("qe").as("pe"), col("nq").as("npf"))
    q.join(short, idCol).crossJoin(broadcast(probeF))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine", col("dp") * lit(1.0) /
        sqrt((col("nq") * col("npf")).cast("double")))
      .orderBy(desc("cosine"), col(idCol)).limit(k)
      .select(col(idCol), col("dp"), col("cosine"))
  }

  /** Per-vector symmetric int8 quantization: scale = 127 / max|x|, the
    * serving-path compression (4 bytes/dim → 1) every large ANN index
    * uses. Cosine is scale-invariant, so the per-vector scale cancels in
    * the quantized cosine up to rounding — int8 keeps rank fidelity while
    * the index shrinks 4×. Values live in [-127, 127]; a 64-dim int8
    * norm is ≤ 64·127² ≈ 2^20, so norm products stay far under 2^53 and
    * the integer dot products are exact and order-independent.
    * Native codegen'd expression (graft.expressions.Quantize8) — one
    * pass per row; a higher-order-function formulation re-evaluates the
    * interpreted max-abs lambda per element. */
  def quantize8(v: Column): Column = GraftFunctions.quantize8(v)

  /** (id, q8, n8): the int8-quantized corpus form. */
  def quantized8(embeddings: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol), quantize8(col(vecCol)).as("q8"))
      .withColumn("n8", dotQ(col("q8"), col("q8")))

  /** Exact top-k over the int8-quantized index — the compressed serving
    * path (same shape as [[bruteForceTopK]]: broadcast probe, codegen'd
    * integer dot products, TakeOrdered). */
  def bruteForceTopK8(embeddings: DataFrame, probeId: Long, k: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = quantized8(embeddings, idCol, vecCol)
    val probe = q.filter(col(idCol) === probeId)
      .select(col("q8").as("p8"), col("n8").as("np8"))
    q.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .withColumn("dp8", dotQ(col("q8"), col("p8")))
      .withColumn("cosine8",
        col("dp8") * lit(1.0) / sqrt((col("n8") * col("np8")).cast("double")))
      .select(col(idCol), col("dp8"), col("cosine8"))
      .orderBy(desc("cosine8"), col(idCol))
      .limit(k)
  }

  /** Exact cosine top-k of `probeId` against all other vectors. */
  def bruteForceTopK(embeddings: DataFrame, probeId: Long, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
    val probe = q.filter(col(idCol) === probeId)
      .select(col("qe").as("pe"), col("nq").as("np"))
    q.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col(idCol), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Metadata-filtered exact top-k: only vectors satisfying `predicate`
    * are scored. The filter applies BEFORE quantization, so at scale it
    * pushes into the parquet scan (with a metadata-partitioned or
    * z-ordered layout the pruning is physical) — a filtered vector
    * search must shrink the candidate set first, never post-filter a
    * full-corpus top-k, or the k survivors of the filter may not be the
    * filtered top-k at all. */
  def filteredTopK(embeddings: DataFrame, probeId: Long, k: Int,
                   predicate: Column, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val probe = quantized(embeddings.filter(col(idCol) === probeId), idCol, vecCol)
      .select(col("qe").as("pe"), col("nq").as("np"))
    quantized(embeddings.filter(predicate && col(idCol) =!= probeId), idCol, vecCol)
      .crossJoin(broadcast(probe))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col(idCol), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Hard-negative mining for contrastive training: for each anchor in
    * a bounded anchor batch, the k highest-cosine vectors carrying a
    * DIFFERENT label — the "looks similar, isn't the same thing"
    * examples a contrastive trainer pairs with its positives (the
    * negatives that actually move the loss; random negatives are
    * mostly trivial). One corpus scan against the broadcast anchor
    * batch: |anchors|·N scored rows, per-anchor top-k via a rank
    * window over the anchor partitioning (WindowGroupLimit keeps a
    * k-row heap per task) — never corpus × corpus. The label
    * inequality filters BEFORE scoring, same discipline as
    * [[filteredTopK]]. At serving scale the identical shape runs
    * against the persisted ANN layouts with a label `where=`
    * ([[AnnIndexStore]]); this is the exact-mining pass over a
    * training minibatch of anchors. */
  def hardNegatives(embeddings: DataFrame, anchorPred: Column, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = embeddings
      .select(col(idCol), col(labelCol), quantize(col(vecCol)).as("qe"))
      .withColumn("nq", normQ(col("qe")))
    val anchors = q.filter(anchorPred).select(
      col(idCol).as("anchor_id"), col(labelCol).as("anchor_label"),
      col("qe").as("ae"), col("nq").as("na"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(desc("cosine"), col(idCol))
    q.crossJoin(broadcast(anchors))
      .filter(col(labelCol) =!= col("anchor_label"))
      .withColumn("dp", dotQ(col("qe"), col("ae")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("na")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col(idCol).as("neg_id"),
        col(labelCol).as("neg_label"), col("dp"), col("cosine"), col("rank"))
      .orderBy("anchor_id", "rank")
  }

  /** Exploded banded bucket table (id, band, bucket). This is the LSH
    * index: at scale, persist it partitioned by (band, bucket) and
    * reuse it for every probe / near-dup pass. */
  def bandBuckets(q: DataFrame, bands: Int = DefaultBands,
                  bitsPerBand: Int = DefaultBitsPerBand,
                  seed: Long = DefaultSeed, idCol: String = "vec_id"): DataFrame =
    q.select(col(idCol),
        posexplode(GraftFunctions.hyperplane_buckets(col("qe"), seed, bands, bitsPerBand)))
      .toDF(idCol, "band", "bucket")

  /** All bucket ids within Hamming distance `radius` of `b` (multi-probe
    * enumeration: C(bits,0)+..+C(bits,radius) values — literal IN-list). */
  def hammingBall(b: Long, bits: Int, radius: Int): Seq[Long] =
    (0 to radius).flatMap(r =>
      (0 until bits).combinations(r).map(
        _.foldLeft(b)((acc, i) => acc ^ (1L << i)))).distinct

  /** Approximate cosine top-k via the banded LSH index: the probe's
    * `bands` buckets (each expanded to its Hamming-`radius` ball) are
    * pushed down as literal (band, bucket-IN-list) predicates — with a
    * (band, bucket)-partitioned index layout this prunes to
    * bands·C(bits,≤radius) buckets instead of scanning the corpus. */
  def signLshTopK(embeddings: DataFrame, probeId: Long, k: Int, radius: Int = 1,
                  bands: Int = DefaultBands, bitsPerBand: Int = DefaultBitsPerBand,
                  seed: Long = DefaultSeed, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
    signLshTopKIndexed(q, bandBuckets(q, bands, bitsPerBand, seed, idCol),
      probeId, k, radius, bitsPerBand, idCol)
  }

  /** The serving-path form: `q` and `buckets` are the persisted index.
    * One driver-side fetch of the probe row is the ANN-serving pattern
    * (the probe is a single query vector, not a distributed dataset). */
  def signLshTopKIndexed(q: DataFrame, buckets: DataFrame, probeId: Long,
                         k: Int, radius: Int, bitsPerBand: Int = DefaultBitsPerBand,
                         idCol: String = "vec_id"): DataFrame = {
    val pBuckets = buckets.filter(col(idCol) === probeId)
      .select("band", "bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    require(pBuckets.nonEmpty, s"probe $probeId not found in bucket index")
    val probePred = pBuckets.map { case (band, b) =>
      col("band") === band &&
        col("bucket").isin(hammingBall(b, bitsPerBand, radius): _*)
    }.reduce(_ || _)
    val candIds = buckets.filter(probePred)
      .filter(col(idCol) =!= probeId)
      .select(idCol).distinct()
    val probe = q.filter(col(idCol) === probeId)
      .select(col("qe").as("pe"), col("nq").as("np"))
    candIds.join(q, idCol)
      .crossJoin(broadcast(probe))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col(idCol), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  // ===========================================================================
  // Product quantization (PQ): the 16–64× serving-tier compression. A
  // dim-64 quantized vector splits into `mSub` subvectors; per subspace a
  // small codebook is trained and each vector stores only its per-subspace
  // CODE — mSub small ints instead of dim floats. ADC (asymmetric distance
  // computation) scores a candidate by summing the probe's precomputed
  // per-codeword partials over the candidate's codes, so the first-pass
  // scan reads codes only; an exact full-width rerank of the shortlist
  // restores true cosines (the rpRerankTopK idiom — approximation only
  // chooses WHO gets reranked, never the reported scores).
  //
  // Determinism contract (the oracle replays training + serving in SQL):
  //  - codebooks train exactly like the IVF centroids (ivfIndex): seeds =
  //    the ksub lowest-id vectors' subvectors, one Lloyd round with
  //    SUM-centroids — valid because assignment is by COSINE, which is
  //    scale-invariant, so sum ≡ mean with zero fractional drift;
  //  - every dot product is an exact integer (< 2^53, so even a double
  //    accumulator is exact and order-independent); the per-subspace ADC
  //    partial is one IEEE division dot/sqrt(nc); the ADC total adds the
  //    mSub partials in FIXED ascending-m order on both engines (never a
  //    row-order-dependent SUM aggregate).
  // ===========================================================================

  /** One PQ codeword: subspace `m`, code id `cl` (a seed vec_id), the
    * sum-subvector and its squared norm. */
  final case class PqCodeword(m: Int, cl: Long, ce: Seq[Long], nc: Long)

  val DefaultPqSub: Int = 8     // subspaces over dim 64 → 8-dim subvectors
  val DefaultPqK: Int = 16      // codewords per subspace (256 at prod scale)

  private def subCol(m: Int, dsub: Int): Column =
    slice(col("qe"), m * dsub + 1, dsub)

  /** Per-subspace code assignment as a PURE PROJECTION over the literal
    * codebooks (the assignByCentroids idiom, once per subspace): output
    * (vec_id, codes) with `codes[m+1]` = the argmax-cosine codeword id of
    * subspace m, ties to the lowest id. */
  def pqCodes(q: DataFrame, books: Seq[PqCodeword],
              mSub: Int = DefaultPqSub, dim: Int = 64): DataFrame = {
    val dsub = dim / mSub
    val codeCols = (0 until mSub).map { m =>
      val sv = subCol(m, dsub)
      val nsv = sqrt(dotQ(sv, sv).cast("double"))
      val scored = books.filter(_.m == m).map { b =>
        struct(
          (dotQ(sv, typedLit(b.ce)) / (nsv * lit(math.sqrt(b.nc.toDouble))))
            .as("c"),
          lit(-b.cl).as("negCl"))
      }
      (-array_max(array(scored: _*)).getField("negCl")).as(s"c$m")
    }
    q.select(col("vec_id") +: codeCols: _*)
      .select(col("vec_id"),
        array((0 until mSub).map(m => col(s"c$m")): _*).as("codes"))
  }

  /** Train the PQ codebooks: per subspace, seeds = the `ksub` lowest-id
    * vectors' subvectors, one integer-exact Lloyd round (sum-centroids,
    * cosine assignment). Codebooks are driver metadata — mSub·ksub·dsub
    * longs — exactly like the IVF centroid table. */
  def pqCodebooks(q: DataFrame, mSub: Int = DefaultPqSub,
                  ksub: Int = DefaultPqK, dim: Int = 64): Seq[PqCodeword] = {
    val dsub = dim / mSub
    val seedRows = q.orderBy(col("vec_id")).limit(ksub)
      .select(col("vec_id"), col("qe")).collect()
    require(seedRows.nonEmpty, "pqCodebooks: corpus is empty")
    val seeds = seedRows.toSeq.flatMap { r =>
      val id = r.getLong(0); val qe = r.getSeq[Long](1)
      (0 until mSub).map { m =>
        val sv = qe.slice(m * dsub, (m + 1) * dsub)
        PqCodeword(m, id, sv, sv.map(x => x * x).sum)
      }
    }
    // one refinement: assigned subvectors re-sum per (m, code) — a
    // bounded groupBy (≤ mSub·ksub rows), map-side combined
    val assigned = pqCodes(q, seeds, mSub, dim)
      .join(q.select("vec_id", "qe"), "vec_id")
      .select(col("qe"), posexplode(col("codes")))
      .toDF("qe", "m", "cl")
    val sums = (1 to dsub).map(i =>
      sum(element_at(col("qe"), col("m") * dsub + i)).as(s"s$i"))
    assigned.groupBy("m", "cl").agg(sums.head, sums.tail: _*)
      .collect().toSeq.map { r =>
        val ce = (1 to dsub).map(i => r.getLong(1 + i))
        PqCodeword(r.getInt(0), r.getLong(1), ce, ce.map(x => x * x).sum)
      }.sortBy(b => (b.m, b.cl))
  }

  /** The probe's ADC lookup tables: per subspace, codeword id → the
    * partial score dot(probe_m, ce)/sqrt(nc) — mSub·ksub doubles of
    * driver metadata, each an exact integer dot followed by one IEEE
    * division (bit-equal to the SQL replay). */
  def pqLut(pe: Seq[Long], books: Seq[PqCodeword],
            mSub: Int = DefaultPqSub, dim: Int = 64): IndexedSeq[Map[Long, Double]] = {
    val dsub = dim / mSub
    (0 until mSub).map { m =>
      val pm = pe.slice(m * dsub, (m + 1) * dsub)
      books.filter(_.m == m).map { b =>
        var dp = 0L; var i = 0
        while (i < dsub) { dp += pm(i) * b.ce(i); i += 1 }
        b.cl -> dp / math.sqrt(b.nc.toDouble)
      }.toMap
    }
  }

  /** ADC score column over a `codes` frame: the probe's LUT rides as
    * map literals; the total adds subspace partials in fixed ascending-m
    * order (deterministic IEEE sum, mirrored by the oracle). */
  def pqAdcScore(lut: IndexedSeq[Map[Long, Double]]): Column =
    lut.zipWithIndex.map { case (t, m) =>
      element_at(typedlit(t), element_at(col("codes"), m + 1))
    }.reduceLeft(_ + _)

  /** Two-stage PQ-then-rerank ANN over an in-memory corpus: train the
    * codebooks, code every vector (mSub small ints each), ADC-score the
    * codes against the probe's LUT, cut a `shortlist` by the approximate
    * score (distributed TakeOrdered), and rerank only the shortlist at
    * full width — reported scores are TRUE cosines. The persisted
    * serving form is [[AnnIndexStore.writeIvfPq]]/[[AnnIndexStore.pqTopK]],
    * where the first pass reads ONLY the code column of the probed
    * posting lists. */
  def pqRerankTopK(embeddings: DataFrame, probeId: Long, k: Int,
                   shortlist: Int = 50, mSub: Int = DefaultPqSub,
                   ksub: Int = DefaultPqK, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
      .withColumnRenamed(idCol, "vec_id")
    val books = pqCodebooks(q, mSub, ksub)
    val pe = q.filter(col("vec_id") === probeId).select("qe")
      .head().getSeq[Long](0)
    val lut = pqLut(pe, books, mSub)
    val short = pqCodes(q, books, mSub)
      .filter(col("vec_id") =!= probeId)
      .withColumn("adc", pqAdcScore(lut))
      .orderBy(desc("adc"), col("vec_id")).limit(shortlist)
      .select("vec_id")
    val probeF = q.filter(col("vec_id") === probeId)
      .select(col("qe").as("pe"), col("nq").as("npf"))
    q.join(short, "vec_id").crossJoin(broadcast(probeF))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine", col("dp") * lit(1.0) /
        sqrt((col("nq") * col("npf")).cast("double")))
      .orderBy(desc("cosine"), col("vec_id")).limit(k)
      .select(col("vec_id"), col("dp"), col("cosine"))
  }

  /** One IVF centroid: (cluster id, sum-vector, its squared norm). */
  final case class IvfCentroid(cluster: Long, ce: Seq[Long], nc: Long)

  /** Public form of the literal-centroid assignment for index
    * maintenance (AnnIndexStore.append): new vectors join an EXISTING
    * centroid set without re-clustering. */
  def assignToCentroids(q: DataFrame, cents: Seq[IvfCentroid],
                        idCol: String = "vec_id"): DataFrame =
    assignByCentroids(q, cents, idCol)

  /** Assignment as a PURE PROJECTION: centroids are index metadata (K
    * rows), so they ride along as literals and the argmax-cosine runs
    * inside whole-stage codegen — zero shuffles, unlike the textbook
    * crossJoin + window-argmin which shuffles N·K rows. Ties break to
    * the lowest cluster id (struct max on (cos, -cluster)). The winning
    * cosine rides along as `cos` — assignment quality telemetry
    * (AnnIndexStore's centroid-drift report) for free. */
  private def assignByCentroids(q: DataFrame, cents: Seq[IvfCentroid],
                                idCol: String): DataFrame = {
    val scored = cents.map { c =>
      struct(
        (dotQ(col("qe"), typedLit(c.ce)) /
          (sqrt(col("nq").cast("double")) * lit(math.sqrt(c.nc.toDouble)))).as("c"),
        lit(-c.cluster).as("negCl"))
    }
    q.withColumn("__best", array_max(array(scored: _*)))
      .select(col(idCol), (-col("__best.negCl")).as("cluster"),
        col("__best.c").as("cos"))
  }

  /** Driver-side exact cosine between a centroid and a probe vector. */
  private[llmops] def centroidCos(ce: Seq[Long], nc: Long, pe: Seq[Long], np: Long): Double = {
    var dp = 0L; var i = 0
    while (i < ce.length) { dp += ce(i) * pe(i); i += 1 }
    dp / (math.sqrt(nc.toDouble) * math.sqrt(np.toDouble))
  }

  /** IVF index over the quantized corpus: (centroids, assignment).
    *
    * Deterministic and integer-exact so the DuckDB oracle reproduces it:
    * seeds are the `k` lowest-id vectors; one Lloyd refinement replaces
    * each seed with the element-wise SUM of its assigned vectors (cosine
    * is scale-invariant, so sum ≡ mean with no fractional drift); the
    * final assignment is against the refined centroids. Production would
    * iterate Lloyd to convergence on a sample — the index layout, probe
    * pruning, and scoring are identical. Centroid norms can exceed
    * sqrt-of-long-product range, so centroid cosines use
    * sqrt(nq)·sqrt(nc), never sqrt(nq·nc).
    *
    * Shape at 100 TB: centroids are K·dim longs of driver/broadcast
    * metadata (K ~ sqrt(N)); assignment is a projection (no shuffle);
    * the refinement is a K-row partial aggregation (dim sum columns,
    * map-side combined — not a dim-fold row explosion). Written out
    * partitioned by `cluster`, a probe reads nprobe/K of the corpus —
    * real partition pruning. */
  def ivfIndex(q: DataFrame, k: Int = DefaultIvfClusters, dim: Int = 64,
               idCol: String = "vec_id", rounds: Int = 1): (Seq[IvfCentroid], DataFrame) = {
    // seeds = the k lowest OBSERVED ids (not `id < k`: sparse or
    // non-zero-based id spaces would yield short or empty seed sets and
    // silently null clusters downstream)
    val seeds = q.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col("qe"), col("nq")).collect()
      .map(r => IvfCentroid(r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    require(seeds.nonEmpty, "ivfIndex: corpus is empty, nothing to seed from")
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("qe"), i + 1)).as(s"s$i"))
    // Lloyd, integer-exact per round; `rounds`=1 is the oracle-mirrored
    // default, higher values iterate to assignment stability (seed bias
    // washes out; each round is the same sum-centroid refinement, so
    // determinism is preserved at every round count). Each assignment is
    // a literal-centroid projection — K·dim longs of driver metadata per
    // round, never a shuffled cross join.
    var cents = seeds
    var assign = assignByCentroids(q, cents, idCol)
    var round = 0
    var stable = false
    while (round < rounds && !stable) {
      val refined = assign.join(q, idCol).groupBy("cluster")
        .agg(sumCols.head, sumCols.tail: _*)
        .collect()
        .map { r =>
          val ce = (0 until dim).map(i => r.getLong(i + 1))
          IvfCentroid(r.getLong(0), ce, ce.map(x => x * x).sum)
        }.toSeq.sortBy(_.cluster)
      val next = assignByCentroids(q, refined, idCol)
      if (round < rounds - 1) {
        // converged when no vector changes cluster (scan + join, no
        // driver materialization of the assignment)
        stable = assign.withColumnRenamed("cluster", "__c0")
          .join(next, idCol)
          .filter(col("__c0") =!= col("cluster"))
          .isEmpty
      }
      cents = refined
      assign = next
      round += 1
    }
    (cents, assign)
  }

  val DefaultIvfClusters: Int = 16
  val DefaultIvfProbes: Int = 4

  /** IVF ANN top-k: rank centroids by probe cosine (driver-side — the
    * centroid table IS index metadata), take the best `nprobe` clusters
    * as a literal IN-list (partition-prunable on a cluster-partitioned
    * assignment layout), score only their members exactly. Per-query
    * work = K centroid scores + ~N·nprobe/K exact scores instead of N. */
  def ivfTopK(embeddings: DataFrame, probeId: Long, k: Int,
              nClusters: Int = DefaultIvfClusters, nprobe: Int = DefaultIvfProbes,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
    val (cents, assign) = ivfIndex(q, nClusters, idCol = idCol)
    ivfTopKIndexed(q, cents, assign, probeId, k, nprobe, idCol)
  }

  /** The serving-path form: `q`/`cents`/`assign` are the persisted IVF
    * index (build once with [[ivfIndex]], write `assign` partitioned by
    * `cluster`; centroids are K rows of driver metadata). Per probe:
    * K driver-side centroid scores, then an exact scan restricted to
    * the `nprobe` best clusters via a literal IN-list — partition
    * pruning on the cluster layout, never a corpus scan. */
  def ivfTopKIndexed(q: DataFrame, cents: Seq[IvfCentroid], assign: DataFrame,
                     probeId: Long, k: Int, nprobe: Int = DefaultIvfProbes,
                     idCol: String = "vec_id"): DataFrame = {
    val probeRow = q.filter(col(idCol) === probeId).select("qe", "nq").head()
    val pe = probeRow.getSeq[Long](0)
    val np = probeRow.getLong(1)
    val probeClusters = cents
      .map(c => (centroidCos(c.ce, c.nc, pe, np), c.cluster))
      .sortBy { case (cos, cl) => (-cos, cl) }
      .take(nprobe).map(_._2)
    val probe = q.filter(col(idCol) === probeId)
      .select(col("qe").as("pe"), col("nq").as("np"))
    assign.filter(col("cluster").isin(probeClusters: _*))
      .filter(col(idCol) =!= probeId)
      .join(q, idCol)
      .crossJoin(broadcast(probe))
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col(idCol), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** All-pairs cosine ≥ threshold restricted to banded-LSH candidate
    * pairs (pairs sharing ≥1 band bucket), verified exactly.
    *
    * Scale shape: candidates come from bucket-local equality joins on
    * (band, bucket) — never an all-pairs comparison — and the pair list
    * is deduplicated *before* vectors are re-attached, so the wide `qe`
    * arrays cross the shuffle once per side, not once per band. Bucket
    * size stays ~N/2^bits per band regardless of corpus size skew in
    * any single axis direction (planes are random, not axis-aligned). */
  def cosineNearDup(embeddings: DataFrame, threshold: Double,
                    bands: Int = DefaultBands, bitsPerBand: Int = DefaultBitsPerBand,
                    seed: Long = DefaultSeed, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
    val bk = bandBuckets(q, bands, bitsPerBand, seed, idCol)
    val a = bk.as("a"); val b = bk.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("va"), col(s"b.$idCol").as("vb"))
      .distinct()
    val qa = q.select(col(idCol).as("va"), col("qe").as("qa"), col("nq").as("na"))
    val qb = q.select(col(idCol).as("vb"), col("qe").as("qb"), col("nq").as("nb"))
    cand.join(qa, "va").join(qb, "vb")
      .withColumn("dp", dotQ(col("qa"), col("qb")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("na") * col("nb")).cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col("va"), col("vb"), col("cosine"))
  }

  /** Batch retrieval: approximate top-k for EVERY probe in one plan —
    * the many-queries-at-once shape (RAG corpus scoring, eval-set
    * retrieval) where per-probe driver loops would serialize. Probe rows
    * (`probePred`) join the banded bucket index on (band, bucket) — ONE
    * shuffle keyed by bucket, never probe × corpus — candidates dedup
    * per (probe, cand), exact quantized cosine, per-probe window top-k.
    * With the (band, bucket)-partitioned persisted index this is the
    * bulk companion of [[signLshTopKIndexed]]'s single-probe pruning. */
  def signLshTopKBatch(embeddings: DataFrame, probePred: Column, k: Int,
                       bands: Int = DefaultBands, bitsPerBand: Int = DefaultBitsPerBand,
                       seed: Long = DefaultSeed, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val q = quantized(embeddings, idCol, vecCol)
    val bk = bandBuckets(q, bands, bitsPerBand, seed, idCol)
    val p = bk.filter(probePred).as("p")
    val c = bk.as("c")
    val cand = p.join(c,
        col("p.band") === col("c.band") && col("p.bucket") === col("c.bucket") &&
          col(s"p.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"p.$idCol").as("pid"), col(s"c.$idCol").as("cid"))
      .distinct()
    val qp = q.select(col(idCol).as("pid"), col("qe").as("pe"), col("nq").as("np"))
    val qc = q.select(col(idCol).as("cid"), col("qe").as("ce"), col("nq").as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("cid"))
    cand.join(qp, "pid").join(qc, "cid")
      .withColumn("dp", dotQ(col("pe"), col("ce")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("np") * col("nc")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "cid", "dp", "cosine", "rank")
  }
}
