package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Numeric contract: vectors are quantized to BIGINT milli-units before
  * any aggregation, so dot products are exact integers (order-independent,
  * reproducible across engines) and only the final cosine division is
  * floating point. 64-dim ±~5σ floats quantized at 1e3 stay far below
  * 2^53, so the integer math never loses a bit.
  *
  * Scale paths:
  *  - bruteForceTopK: one broadcast of the probe + full scan; exact.
  *    Right answer for "top-k of one query against the corpus".
  *  - signLshTopK: sign-bit bucketing (random-hyperplane LSH with
  *    axis-aligned planes). The corpus is bucketed once (reusable,
  *    write it out partitioned by bucket at 100 TB); each query probes
  *    its own bucket plus `probes-1` nearest buckets by Hamming
  *    distance — bounded work per query instead of a full scan.
  */
object Similarity {

  /** array<float> → array<bigint> milli-quantized. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x * scale).cast("bigint"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  def normQ(a: Column): Column = dotQ(a, a)

  /** Exact cosine top-k of `probeId` against all other vectors. */
  def bruteForceTopK(embeddings: DataFrame, probeId: Long, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.select(col(idCol), quantize(col(vecCol)).as("qe"))
      .withColumn("nq", normQ(col("qe")))
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

  /** Sign-bit bucket id over the first `bits` dimensions. */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Bucket the corpus once; reusable across queries. Bucket signs come
    * from the quantized vector so bucketing and scoring share one
    * representation. */
  def bucketize(embeddings: DataFrame, bits: Int = 8,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol), quantize(col(vecCol)).as("qe"))
      .withColumn("nq", normQ(col("qe")))
      .withColumn("bucket", signBucket(col("qe"), bits))

  /** Approximate cosine top-k: scan only buckets within Hamming
    * distance `radius` of the probe's bucket. */
  def signLshTopK(bucketed: DataFrame, probeId: Long, k: Int, radius: Int = 1,
                  idCol: String = "vec_id"): DataFrame = {
    val probe = bucketed.filter(col(idCol) === probeId)
      .select(col("qe").as("pe"), col("nq").as("np"), col("bucket").as("pbucket"))
    bucketed.filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .filter(bit_count(col("bucket").bitwiseXOR(col("pbucket"))) <= radius)
      .withColumn("dp", dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col(idCol), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Exact all-pairs cosine above a threshold (embedding near-dup).
    * Bucketed self-join: only pairs sharing a sign bucket are compared —
    * the embedding-space analog of minhash banding. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double, bits: Int = 8,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = bucketize(embeddings, bits, idCol, vecCol)
    val a = b.as("a"); val c = b.as("b")
    a.join(c, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("dp", dotQ(col("a.qe"), col("b.qe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("a.nq") * col("b.nq")).cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col(s"a.$idCol").as("va"), col(s"b.$idCol").as("vb"), col("cosine"))
  }
}
