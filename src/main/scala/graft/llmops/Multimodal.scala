package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata.
  *
  * The decode/feature-extract step is a clearly-marked STUB (no image/
  * audio libraries in this environment); the Spark-side contract — the
  * schema, the per-partition batch shape, the partitioning — is real and
  * tested. Swapping `decodeStub` for a JNI/ONNX decoder changes nothing
  * upstream or downstream.
  *
  * Batch shape: `mapPartitions` pulls `batchSize` items at a time
  * (mirroring Arrow-batch UDF execution) so a real decoder can amortize
  * model/codec initialization per batch, not per row.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType),
      StructField("n_bytes", IntegerType))), nullable = true)))

  final case class MediaItem(media_id: Long, kind: String, bytes: Array[Byte],
                             source: String, mime: String)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: String, width: Int, height: Int,
                                 feature: Array[Float])

  implicit val itemEnc: Encoder[MediaItem] = Encoders.product[MediaItem]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Wrap any table with a binary payload column into the media shape. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String, kind: String,
              sourceCol: String, mime: String): Dataset[MediaItem] = {
    val ss = df.sparkSession
    import ss.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        col(bytesCol).cast("binary").as("bytes"),
        col(sourceCol).as("source"), lit(mime).as("mime"))
      .as[MediaItem]
  }

  /** STUB decoder: deterministic pseudo-features from the payload hash.
    * A real implementation decodes pixels/samples here — per batch, so
    * codec setup amortizes. Everything around it is production-shaped. */
  def decodeStub(items: Dataset[MediaItem], batchSize: Int = 64,
                 featureDim: Int = 8): Dataset[MediaFeatures] = {
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> real codec/model init would happen once per batch here <<<
        batch.iterator.map { m =>
          val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
          val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          def u16(i: Int): Int =
            ((digest(i) & 0xff) << 8) | (digest(i + 1) & 0xff)
          val feature = Array.tabulate(featureDim)(i =>
            (u16(i * 2 % 14) / 65535.0f) * 2f - 1f)
          MediaFeatures(
            m.media_id, m.kind, bytes.length,
            digest.take(4).map(b => f"${b & 0xff}%02x").mkString,
            width = u16(0) % 1024, height = u16(2) % 1024, feature = feature)
        }
      }
    }
  }

  /** Frame-sample stub for video-kind items: deterministic frame index
    * selection (every `stride`-th of `nFrames`), payload untouched. */
  def sampleFrames(items: Dataset[MediaItem], nFrames: Int, stride: Int)
      : DataFrame = {
    val ss = items.sparkSession
    import ss.implicits._
    items.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1), lit(stride))))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        md5(concat(col("media_id"), lit(":"), col("frame_idx"))).as("frame_key"))
  }
}
