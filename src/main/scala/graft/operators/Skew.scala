package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most cases at runtime
  * (spark.sql.adaptive.skewJoin); explicit salting remains the tool when
  * one build-side key is pathologically hot (the Zipf tail of user_id /
  * orderkey at 100 TB): the probe side gets a random-but-deterministic
  * salt in [0, factor), the build side is replicated across all salts,
  * turning one hot partition into `factor` even ones.
  */
object Skew {

  /** Inner equi-join with the right side replicated `factor` ways.
    * Deterministic salting (hash of the whole left row's key + a stable
    * discriminator column) keeps reruns identical. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int, discriminator: String): DataFrame = {
    require(factor > 1, "salt factor must exceed 1")
    val l = left.withColumn("__salt",
      pmod(hash(col(key), col(discriminator)), lit(factor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
