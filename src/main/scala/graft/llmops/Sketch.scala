package graft.llmops

import graft.expressions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches over corpus attributes.
  *
  * KMV (k-minimum-values): keep the k smallest distinct uniform hashes
  * of a set; the kth one measures the set's density in hash space, so
  * distinct ≈ (k-1)·H / h_k with standard error ~1/sqrt(k-2). The
  * reference engine has no distinct-count surface; this belongs to the
  * training-data analytics family — vocabulary / shingle-space /
  * near-dup-space sizing at 100 TB, where an exact distinct is a full
  * shuffle of the key space and an HLL is not reproducible across
  * engines (implementation-defined registers). KMV over a shared md5
  * hash is BOTH sub-linear and deterministic: the DuckDB oracle computes
  * the identical estimate.
  *
  * Scale shape: [[graft.expressions.KmvAgg]] is a TypedImperativeAggregate
  * with O(k) partial state, so the sketch is map-side combined — each
  * scan partition ships ≤ k longs, never its hash set. Sketch union =
  * buffer merge, which also makes the state foldable for streaming or a
  * stored per-partition sketch index.
  */
object Sketch {

  /** Hash-space width: 48-bit hashes keep (k-1)·2^48 inside BIGINT on
    * both engines (60-bit would overflow the estimator's numerator). */
  val HashBits = 48
  val HashSpace: Long = 1L << HashBits

  /** 48-bit uniform hash: the top 12 hex chars of md5 — the 60-bit
    * native prefix shifted right 12, which equals DuckDB's
    * ('0x' || substr(md5(x),1,12))::BIGINT. */
  def hash48(v: Column): Column = shiftright(TextOps.tokenHash60(v), 12)

  /** KMV sketch column (ascending array of ≤ k smallest hashes). */
  def kmvSketch(value: Column, k: Int = 256): Column =
    GraftFunctions.kmv_agg(hash48(value), k)

  /** Distinct-count estimate from a sketch array: exact when the group
    * had fewer than k distinct values (the sketch IS the set), else
    * (k-1)·H div h_k — integer arithmetic end to end. */
  def kmvEstimate(sketch: Column, k: Int = 256): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      // integer `div`, not `/` (which widens to double and loses exact
      // low bits past 2^53 — the oracle divides exactly)
      .otherwise(call_function("div",
        lit((k - 1).toLong * HashSpace),
        greatest(element_at(sketch, k), lit(1L))))

  /** Per-group distinct-count estimate of `value`: one map-side-combined
    * aggregation, shuffle volume O(groups · k). */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
                  k: Int = 256): DataFrame =
    df.groupBy(groupCol)
      .agg(kmvSketch(value, k).as("sk"))
      .select(col(groupCol), kmvEstimate(col("sk"), k).as("n_est"))

  // ---------------------------------------------- kmv set algebra

  /** Pairwise set-overlap estimates BETWEEN sketches (the theta-sketch
    * idea on the KMV buffer): for groups a < b, combine their k-min
    * buffers into the union's k smallest hashes U; θ = max(U) estimates
    * |A∪B| exactly as [[kmvEstimate]]; and because every h ∈ U below
    * each buffer's max is in that set's buffer iff it is in the set,
    * |U ∩ ska ∩ skb| / |U| estimates the Jaccard. All integer over the
    * shared md5 hashes — the estimates (not just the machinery) are
    * oracle-exact. Cost: groups² pairs of k-long arrays — group count
    * is small by construction (sources, shards, snapshots), the CORPUS
    * is only read once to build the sketches.
    *
    * Input: (groupCol, sk array<bigint>) as built by [[kmvSketch]].
    * Output: (ga, gb, n_union_est, jacc_est_milli) for ga < gb. */
  def kmvPairOverlap(sketches: DataFrame, groupCol: String,
                     k: Int = 256): DataFrame = {
    val a = sketches.select(col(groupCol).as("ga"), col("sk").as("ska"))
    val b = sketches.select(col(groupCol).as("gb"), col("sk").as("skb"))
    // group-sized right side: broadcast the non-equi pair join so it
    // plans as a BNLJ, never a shuffled cartesian
    a.join(broadcast(b), col("ga") < col("gb"))
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("theta", element_at(col("u"), size(col("u"))))
      .withColumn("n_union_est",
        when(size(col("u")) < k, size(col("u")).cast("long"))
          .otherwise(call_function("div",
            lit((k - 1).toLong * HashSpace), greatest(col("theta"), lit(1L)))))
      .withColumn("ni",
        size(array_intersect(col("u"),
          array_intersect(col("ska"), col("skb")))).cast("long"))
      .withColumn("jacc_est_milli",
        call_function("div", col("ni") * 1000L, size(col("u")).cast("long")))
      .select(col("ga"), col("gb"), col("n_union_est"), col("jacc_est_milli"))
  }

  // ---------------------------------------------------- hyperloglog
  //
  // HLL complements KMV on the other axis of the state/accuracy
  // trade: KMV state is k longs PER GROUP and exact below k distinct;
  // HLL state is m 6-bit registers per group REGARDLESS of distinct
  // count, merges by per-register max (order-independent), and unions
  // across stores/streams for free. Library HLLs (approx_count_distinct)
  // are implementation-defined and can't be oracle-checked; this one
  // fixes the hash (md5), the register layout (top 8 bits of the
  // 48-bit hash) and the estimator's integer arithmetic, so the DuckDB
  // oracle reproduces the estimate bit-for-bit. Raw-regime estimator
  // only (no linear-counting small-range patch, which needs float ln):
  // sized at m=256 the raw regime starts at ~2.5·m = 640 distinct —
  // below that the estimate reads high and err_permille says so.

  /** Register count m = 2^HllP. */
  val HllP = 8
  val HllM = 1 << HllP
  /** alpha_256 = 0.7213/(1 + 1.079/256), fixed at micro precision so
    * both engines multiply by the same integer. */
  val HllAlphaMicro = 718273L
  /** Fixed-point scale for sum(2^-M_j): one term is 2^(41-M_j), M_j in
    * [0, 41] (40 hash bits below the register index + the all-zeros
    * case). Max sum = m·2^41 = 2^49 — inside BIGINT. */
  val HllRhoMax = 41

  /** Register index (top HllP bits of the 48-bit hash) and rank
    * rho = leading-zeros-in-40-bits + 1 for one value. */
  def hllBucket(h: Column): Column = shiftright(h, 48 - HllP)
  def hllRho(h: Column): Column = {
    val rem = h.bitwiseAND(lit((1L << (48 - HllP)) - 1))
    when(rem === 0L, lit(HllRhoMax))
      .otherwise(lit(HllRhoMax) - length(bin(rem)))
      .cast("long")
  }

  /** The sketch as a (group, bucket, r) register table — ≤ m rows per
    * group however large the group; one partial-agg shuffle. Registers
    * merge by MAX, so cell tables from different stores/batches union
    * exactly (same contract the durable store leans on). */
  def hllCells(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val h = hash48(value)
    df.select(col(groupCol), hllBucket(h).as("bucket"), hllRho(h).as("r"))
      .groupBy(groupCol, "bucket").agg(max("r").as("r"))
  }

  /** Distinct estimate from a register table: E = alpha·m²/sum(2^-M_j),
    * fixed-point at 2^41 with absent registers contributing 2^41 each.
    * The numerator alpha_micro·m²·2^41 ≈ 1.0e23 rides DECIMAL(38,0)
    * (HUGEINT in the oracle); the div chain order is part of the
    * contract. */
  def hllEstimates(cells: DataFrame, groupCol: String): DataFrame =
    cells.groupBy(groupCol)
      .agg(sum(expr(s"shiftleft(1L, $HllRhoMax - r)")).as("s_present"),
        count(lit(1)).as("v"))
      .withColumn("s",
        col("s_present") + (lit(HllM.toLong) - col("v")) * lit(1L << HllRhoMax))
      .withColumn("n_est", expr(
        s"CAST(CAST($HllAlphaMicro AS DECIMAL(38,0)) * ${HllM.toLong * HllM} " +
          s"* ${1L << HllRhoMax} div s div 1000000 AS BIGINT)"))
      .select(col(groupCol), col("n_est"))

  /** Per-group HLL distinct estimate: fixed m-register state per group,
    * the constant-size alternative to KMV's k-longs when group counts
    * explode. */
  def hllDistinct(df: DataFrame, groupCol: String, value: Column): DataFrame =
    hllEstimates(hllCells(df, groupCol, value), groupCol)

  // ------------------------------------------------- count-min sketch

  /** Count-min sketch: d salted hash rows × w buckets of plain counters.
    * Unlike heap-based heavy-hitter summaries (Misra-Gries/SpaceSaving),
    * whose merge is order-dependent, CMS cells merge by ADDITION — the
    * sketch is order-independent, exactly reproducible, and therefore
    * both oracle-checkable (llm_cms_counts) and streaming-foldable with
    * exact batch parity. Point estimates (min over the d rows) are ≥ the
    * true count, within n/w with probability 1−(1/2)^d. */
  def cmsBucket(value: Column, r: Int, w: Int): Column =
    pmod(TextOps.tokenHash60(concat(lit(s"cms$r"), value)), lit(w.toLong))

  /** The sketch as a (r, bucket, c) table — ≤ d·w rows regardless of
    * input size; one partial-agg shuffle bounded at d·w groups. */
  def cmsTable(df: DataFrame, value: Column, d: Int = 4,
               w: Int = 1024): DataFrame =
    df.select(posexplode(array((0 until d).map(r => cmsBucket(value, r, w)): _*)))
      .toDF("r", "bucket")
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))

  /** Point estimates for a probe set: min over the d rows. Probes
    * broadcast (a probe vocabulary is driver-small by definition). */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, probeCol: String,
                  d: Int = 4, w: Int = 1024): DataFrame =
    broadcast(probes
        .select(col(probeCol), posexplode(array((0 until d).map(r =>
          cmsBucket(col(probeCol), r, w)): _*)))
        .toDF(probeCol, "r", "bucket"))
      .join(cms, Seq("r", "bucket"))
      .groupBy(probeCol).agg(min("c").as("n_est"))

  // ------------------------------------- log-linear histogram (quantiles)

  /** Log-linear (HdrHistogram-style) value histogram: 16 sub-buckets
    * per power-of-two octave, so bucket width ≤ 1/16 of the value
    * (≤ 6.25% relative error) and a full 2^63 range is ~950 buckets.
    * The mergeable percentile sketch: per (group, idx) counts ADD, so
    * the histogram is order-independent, streaming-foldable and
    * store-unionable exactly like CMS — percentiles at 100 TB without
    * a global sort. All bucket math is integer bit ops reproducible in
    * the oracle engine (llm_hist_quantile). */
  def histBucket(v: Column): Column = {
    val vv = v.cast("bigint")
    val bl = length(bin(vv)).cast("bigint") // bit length of v
    when(vv < 32, vv).otherwise(
      (bl - 6) * 16 +
        call_function("shiftright", vv, (bl - 5).cast("int"))
          .bitwiseAND(lit(15L)) + 32)
  }

  /** Lower edge of bucket `idx` — the quantile read-out value. */
  def histBucketLo(idx: Column): Column =
    when(idx < 32, idx).otherwise(
      call_function("shiftleft", lit(16L) + (idx - 32) % 16,
        (call_function("div", idx - 32, lit(16L)) + 1).cast("int")))

  /** The histogram as a (group, idx, c) table — one map-side-combined
    * shuffle bounded at groups·buckets. */
  def histTable(df: DataFrame, groupCol: String, value: Column): DataFrame =
    df.select(col(groupCol), histBucket(value).as("idx"))
      .groupBy(groupCol, "idx").agg(count(lit(1)).as("c"))

  /** The ONE crossing-bucket selection both quantile read-outs share:
    * for every (group, q) the bucket where the cumulative count crosses
    * target = ceil(q·n/1000), plus how deep in that bucket the answer
    * sits. A window over the tiny bucket table — factored so the
    * approximate and exact read-outs can never disagree on the rank
    * convention. */
  private def crossingBuckets(hist: DataFrame, groupCol: String,
                              qPermille: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    hist
      .withColumn("cum",
        sum("c").over(Window.partitionBy(groupCol).orderBy("idx")))
      .withColumn("n", sum("c").over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("idx"), col("c"), col("cum"), col("n"),
        explode(typedlit(qPermille)).as("q_permille"))
      .withColumn("target", expr("(q_permille * n + 999) div 1000"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("c") < col("target"))
      .select(col(groupCol), col("idx"), col("q_permille"),
        (col("target") - (col("cum") - col("c"))).as("k_in_bucket"))
  }

  /** Per-group quantile read-out from a histogram table: for each
    * q (permille) the lower edge of the crossing bucket. */
  def histQuantiles(hist: DataFrame, groupCol: String,
                    qPermille: Seq[Long]): DataFrame =
    crossingBuckets(hist, groupCol, qPermille)
      .select(col(groupCol), col("q_permille"),
        histBucketLo(col("idx")).as("approx_lo"))

  /** EXACT per-group quantiles without a per-group sort: two passes.
    * Pass 1 = the log-linear histogram finds, for every (group, q),
    * the bucket where the cumulative count crosses the target rank and
    * how deep in that bucket the answer sits. Pass 2 re-scans with the
    * crossing buckets broadcast, so ONLY values inside a crossing
    * bucket survive to the rank window — with 16 sub-buckets per
    * octave that is ~1/16 of a group per read-out on smooth data
    * (degenerate all-equal groups collapse to one bucket, where any
    * method pays the same). The exact answer of a global sort at the
    * cost of one bounded aggregation + one pruned window. */
  def exactQuantiles(df: DataFrame, groupCol: String, value: Column,
                     qPermille: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sel = crossingBuckets(histTable(df, groupCol, value),
      groupCol, qPermille)
    // ties on equal v may rank in any order — the SELECTED value (the
    // k-th order statistic) is identical regardless, so the read-out
    // is deterministic without a tie-break column
    val w = Window.partitionBy(groupCol, "q_permille").orderBy("v")
    df.select(col(groupCol), value.as("v"),
        histBucket(value).as("idx"))
      .join(broadcast(sel), Seq(groupCol, "idx"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") === col("k_in_bucket"))
      .select(col(groupCol), col("q_permille"), col("v").as("exact"))
  }

  // ------------------------------------------------------------ streaming

  final case class HashArrival(group: String, h: Long)
  final case class KmvState(mins: Seq[Long])
  final case class KmvRunning(group: String, n_est: Long)

  /** Scala-side estimator — the same integer arithmetic as
    * [[kmvEstimate]] (exact below k, (k-1)·H div h_k at k). */
  private def estimate(size: Int, kth: Long, k: Int): Long =
    if (size < k) size.toLong
    else (k - 1).toLong * HashSpace / math.max(kth, 1L)

  /** Streaming running distinct-count per group: `mapGroupsWithState`
    * whose state IS the KMV buffer — ≤ k longs per group however large
    * the stream grows (sketches are the bounded-state alternative to
    * exact streaming distinct, whose state is the key set). Each trigger
    * merges the group's new hashes (union + re-take-k, the batch
    * aggregate's merge) and emits the refreshed estimate, so after any
    * prefix of the stream the estimate equals the batch sketch over the
    * same rows (tested). Use OutputMode.Update. */
  def kmvStream(rows: DataFrame, groupCol: String, value: Column,
                k: Int = 256): org.apache.spark.sql.Dataset[KmvRunning] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val arrEnc: Encoder[HashArrival] = Encoders.product[HashArrival]
    implicit val stEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[KmvRunning] = Encoders.product[KmvRunning]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    rows
      .select(col(groupCol).cast("string").as("group"), hash48(value).as("h"))
      .as[HashArrival]
      .groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[HashArrival], st: GroupState[KmvState]) =>
          val buf = new java.util.TreeSet[java.lang.Long]()
          st.getOption.foreach(_.mins.foreach(m => buf.add(m)))
          it.foreach { a =>
            if (buf.size() < k) buf.add(a.h)
            else if (a.h < buf.last()) {
              if (buf.add(a.h)) buf.remove(buf.last())
            }
          }
          val mins = {
            val out = new Array[Long](buf.size())
            val bi = buf.iterator(); var i = 0
            while (bi.hasNext) { out(i) = bi.next().longValue(); i += 1 }
            out.toSeq
          }
          st.update(KmvState(mins))
          KmvRunning(g, estimate(mins.size, if (mins.nonEmpty) mins.last else 1L, k))
      }
  }

  final case class HllArrival(group: String, bucket: Int, r: Int)
  final case class HllState(regs: Seq[Int])
  final case class HllRunning(group: String, n_est: Long)

  /** The estimator over raw registers (absent/zero = 0), exactly the
    * integer chain of [[hllEstimates]] via BigInt. */
  private[llmops] def hllEstimate(regs: Array[Int]): Long = {
    var s = BigInt(0)
    var j = 0
    while (j < HllM) { s += BigInt(1) << (HllRhoMax - regs(j)); j += 1 }
    (BigInt(HllAlphaMicro) * (HllM.toLong * HllM) * (BigInt(1) << HllRhoMax)
      / s / 1000000).toLong
  }

  /** Streaming running HLL estimate per group: state IS the m-register
    * array — fixed size per group forever. Register merge is max, so
    * after any stream prefix the estimate equals [[hllDistinct]] over
    * the same rows (tested). Use OutputMode.Update. */
  def hllStream(rows: DataFrame, groupCol: String, value: Column)
      : org.apache.spark.sql.Dataset[HllRunning] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val arrEnc: Encoder[HllArrival] = Encoders.product[HllArrival]
    implicit val stEnc: Encoder[HllState] = Encoders.product[HllState]
    implicit val outEnc: Encoder[HllRunning] = Encoders.product[HllRunning]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val h = hash48(value)
    rows
      .select(col(groupCol).cast("string").as("group"),
        hllBucket(h).cast("int").as("bucket"), hllRho(h).cast("int").as("r"))
      .as[HllArrival]
      .groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[HllArrival], st: GroupState[HllState]) =>
          val regs = st.getOption.map(_.regs.toArray)
            .getOrElse(new Array[Int](HllM))
          it.foreach { a =>
            if (a.r > regs(a.bucket)) regs(a.bucket) = a.r
          }
          st.update(HllState(regs.toSeq))
          HllRunning(g, hllEstimate(regs))
      }
  }

  final case class HistCell(group: String, idx: Long, c: Long)

  /** Streaming histogram fold: state per touched (group, idx) cell is
    * ONE long, bounded at groups·buckets; cells ADD, so after any
    * stream prefix every cell equals [[histTable]] over the same rows
    * exactly (tested) and [[histQuantiles]] reads percentiles off the
    * stream's running state. Use OutputMode.Update. */
  def histStream(rows: DataFrame, groupCol: String, value: Column)
      : org.apache.spark.sql.Dataset[HistCell] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val keyEnc: Encoder[(String, Long)] = Encoders.product[(String, Long)]
    implicit val outEnc: Encoder[HistCell] = Encoders.product[HistCell]
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    rows
      .select(col(groupCol).cast("string").as("group"),
        histBucket(value).as("idx"))
      .as[(String, Long)]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: (String, Long), it: Iterator[(String, Long)], st: GroupState[Long]) =>
          var n = st.getOption.getOrElse(0L)
          it.foreach(_ => n += 1L)
          st.update(n)
          HistCell(k._1, k._2, n)
      }
  }

  final case class CmsArrival(key: String)
  final case class CmsCell(r: Int, bucket: Long, c: Long)

  /** Streaming CMS fold: state per touched (r, bucket) cell is ONE long,
    * bounded at d·w cells total however large the stream grows; each
    * trigger adds the cell's new arrivals and emits the refreshed count.
    * Because the merge is addition, after any stream prefix every cell
    * equals [[cmsTable]] over the same rows EXACTLY (tested) — the
    * sketch can fold live and be compared/unioned with batch sketches.
    * Use OutputMode.Update. */
  def cmsStream(rows: DataFrame, value: Column, d: Int = 4,
                w: Int = 1024): org.apache.spark.sql.Dataset[CmsCell] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val arrEnc: Encoder[CmsArrival] = Encoders.product[CmsArrival]
    implicit val outEnc: Encoder[CmsCell] = Encoders.product[CmsCell]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    rows
      .select(posexplode(array((0 until d).map(r => cmsBucket(value, r, w)): _*)))
      .toDF("r", "bucket")
      .select(concat_ws(":", col("r"), col("bucket")).as("key"))
      .as[CmsArrival]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CmsArrival], st: GroupState[Long]) =>
          var n = st.getOption.getOrElse(0L)
          it.foreach(_ => n += 1L)
          st.update(n)
          val Array(r, b) = key.split(":")
          CmsCell(r.toInt, b.toLong, n)
      }
  }
}
