package graft.tools
import graft.llmops.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
      }
    }
    time("shingle explode only") {
      docs.select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s")).count()
    }
    time("tokens explode only") {
      docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t")).count()
    }
    time("shingles via lead-window") {
      val t = docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      t.withColumn("n1", lead("col",1).over(w)).withColumn("n2", lead("col",2).over(w))
        .filter(col("n2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("col"), col("n1"), col("n2")).as("s"))
        .distinct().count()
    }
    time("shingles via self-join on pos") {
      val t = docs.select(col("doc_id"), posexplode(split(col("text"), " "))).cache()
      t.count()
      val a = t.as("a"); val b = t.as("b"); val c = t.as("c")
      val r = a.join(b, col("a.doc_id")===col("b.doc_id") && col("b.pos")===col("a.pos")+1)
        .join(c, col("a.doc_id")===col("c.doc_id") && col("c.pos")===col("a.pos")+2)
        .select(col("a.doc_id"), concat_ws(" ", col("a.col"), col("b.col"), col("c.col")).as("s"))
        .distinct().count()
      t.unpersist(); r
    }
    time("shingles via posexplode+element_at") {
      docs.select(col("doc_id"), col("text"))
        .withColumn("t", split(col("text"), " "))
        .select(col("doc_id"), col("t"), posexplode(col("t")))
        .filter(col("pos") <= size(col("t")) - 3)
        .select(col("doc_id"), concat_ws(" ", col("col"),
          element_at(col("t"), col("pos") + 2),
          element_at(col("t"), col("pos") + 3)).as("s"))
        .distinct().count()
    }
    time("minhash full (affine)") {
      Dedup.minhashSignatures(docs).count()
    }
    time("exact dedup contentHash") {
      docs.select(TextOps.contentHash(col("text")).as("h")).groupBy("h").count().count()
    }
    time("md5 only") {
      docs.select(md5(col("text")).as("h")).groupBy("h").count().count()
    }
    time("regexp_replace only") {
      docs.select(regexp_replace(lower(col("text")), "\\s+", " ").as("h")).groupBy("h").count().count()
    }
    spark.stop()
  }
}
