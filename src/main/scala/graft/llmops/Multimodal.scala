package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata.
  *
  * IMAGE decode and resize are REAL — `javax.imageio` ships in the JDK
  * (PNG/JPEG/GIF/BMP), so [[decodeImage]] reads actual pixel dimensions
  * and extracts a luminance-grid feature, and [[resizeImage]] rescales
  * and re-encodes. AUDIO decode is REAL too — `javax.sound.sampled`
  * ships in the JDK (WAV/AIFF/AU containers, PCM 8/16-bit), so
  * [[decodeAudio]] reads actual sample rate / channel / frame counts
  * and extracts an RMS-energy strip feature. Only VIDEO (and exotic
  * codecs) keep the clearly-marked deterministic stubs
  * ([[decodeStub]], [[sampleFrames]])
  * — no video codec exists in this environment; the Spark-side
  * contract — schema, per-partition batch shape, partitioning — is
  * identical on both paths, so swapping the stub for a JNI/ONNX decoder
  * changes nothing upstream or downstream.
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

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/
    * BMP): actual pixel dimensions plus a `featureDim`-strip mean-
    * luminance feature in [-1, 1] — deterministic, pixel-derived, and
    * cheap (pixels are sampled on a ≤256-point grid per axis, so a
    * 4k image costs the same as a thumbnail). Undecodable payloads
    * fail loudly with the media id (route bad rows upstream; silent
    * nulls would poison downstream similarity). Runs per batch inside
    * `mapPartitions` like every decoder here. */
  def decodeImage(items: Dataset[MediaItem], batchSize: Int = 64,
                  featureDim: Int = 8): Dataset[MediaFeatures] = {
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ImageIO readers are looked up per call; batch grouping kept so
        // heavier codecs can init once per batch
        batch.iterator.map { m =>
          require(m.kind == "image",
            s"decodeImage on kind=${m.kind} (media ${m.media_id})")
          val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null,
            s"media ${m.media_id}: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val stepX = math.max(1, w / 256)
          val stepY = math.max(1, h / 256)
          val feature = Array.tabulate(featureDim) { i =>
            // strip i covers x ∈ [i·w/dim, (i+1)·w/dim)
            val x0 = i * w / featureDim
            val x1 = math.max(x0 + 1, (i + 1) * w / featureDim)
            var sum = 0.0; var n = 0
            var y = 0
            while (y < h) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                n += 1; x += stepX
              }
              y += stepY
            }
            if (n == 0) 0f else ((sum / n) / 127.5 - 1.0).toFloat
          }
          val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          MediaFeatures(m.media_id, m.kind, bytes.length,
            digest.take(4).map(b => f"${b & 0xff}%02x").mkString,
            width = w, height = h, feature = feature)
        }
      }
    }
  }

  /** REAL image resize via `java.awt` + `javax.imageio`: decode, scale
    * to `targetW`×`targetH` (area-ish smooth scaling), re-encode PNG.
    * Deterministic (PNG encoding carries no timestamps), so re-runs and
    * replays produce byte-identical thumbnails. */
  def resizeImage(items: Dataset[MediaItem], targetW: Int, targetH: Int,
                  batchSize: Int = 64): Dataset[ResizedMedia] = {
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val src = Option(m.bytes).getOrElse(Array.emptyByteArray)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(src))
          require(img != null,
            s"media ${m.media_id}: payload is not a decodable image")
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          ResizedMedia(m.media_id, m.kind, buf.toByteArray,
            targetW, targetH, src.length)
        }
      }
    }
  }

  final case class AudioFeatures(media_id: Long, n_bytes: Int, checksum: String,
                                 sample_rate: Int, channels: Int, n_frames: Long,
                                 duration_ms: Long, feature: Array[Float])
  implicit val audioEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM 8/16-bit signed or unsigned, either endianness):
    * actual sample rate, channel count, frame count and duration, plus
    * a `featureDim`-strip RMS-energy feature in [-1, 1] — the audio
    * analog of [[decodeImage]]'s luminance strips. Per-strip work is
    * strided to ≤8192 frames, so an hour-long file costs the same as a
    * clip. Undecodable or non-PCM payloads fail loudly with the media
    * id (silent nulls would poison downstream similarity). */
  def decodeAudio(items: Dataset[MediaItem], batchSize: Int = 64,
                  featureDim: Int = 8): Dataset[AudioFeatures] = {
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          require(m.kind == "audio",
            s"decodeAudio on kind=${m.kind} (media ${m.media_id})")
          val bytes = Option(m.bytes).getOrElse(Array.emptyByteArray)
          val ain =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"media ${m.media_id}: payload is not decodable audio", e)
            }
          val fmt = ain.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          require(signed ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            s"media ${m.media_id}: unsupported audio encoding $enc (PCM only)")
          val bits = fmt.getSampleSizeInBits
          require(bits == 8 || bits == 16,
            s"media ${m.media_id}: $bits-bit PCM unsupported (8/16 only)")
          val data = ain.readAllBytes()
          val frameSize = fmt.getFrameSize
          val channels = fmt.getChannels
          val nFrames = data.length / frameSize
          def sample(frame: Int, ch: Int): Double = {
            val off = frame * frameSize + ch * (bits / 8)
            if (bits == 8) {
              if (signed) data(off) / 128.0
              else ((data(off) & 0xff) - 128) / 128.0
            } else {
              val (lo, hi) =
                if (fmt.isBigEndian) (data(off + 1), data(off))
                else (data(off), data(off + 1))
              if (signed) ((hi << 8) | (lo & 0xff)) / 32768.0
              else ((((hi & 0xff) << 8) | (lo & 0xff)) - 32768) / 32768.0
            }
          }
          val feature = Array.tabulate(featureDim) { i =>
            if (nFrames == 0) -1f
            else {
              // strip i covers frames [i·n/dim, (i+1)·n/dim)
              val f0 = (i.toLong * nFrames / featureDim).toInt
              val f1 = math.max(f0 + 1,
                ((i + 1).toLong * nFrames / featureDim).toInt)
              val stride = math.max(1, (f1 - f0) / 8192)
              var sumSq = 0.0; var n = 0; var f = f0
              while (f < f1) {
                var c = 0
                while (c < channels) {
                  val s = sample(f, c); sumSq += s * s; n += 1; c += 1
                }
                f += stride
              }
              val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
              (rms * 2 - 1).toFloat
            }
          }
          val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          val sr = fmt.getSampleRate.toInt
          AudioFeatures(m.media_id, bytes.length,
            digest.take(4).map(b => f"${b & 0xff}%02x").mkString,
            sample_rate = sr, channels = channels, n_frames = nFrames.toLong,
            duration_ms = if (sr <= 0) 0L else nFrames.toLong * 1000 / sr,
            feature = feature)
        }
      }
    }
  }

  /** Audio features → the similarity stack, mirroring
    * [[featureEmbeddings]]: RMS-strip vectors ARE an embedding column,
    * so near-dup detection over audio reuses every ANN operator. */
  def audioEmbeddings(features: Dataset[AudioFeatures]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"),
      col("feature").as("embedding"))

  /** STUB decoder for kinds the JDK cannot decode (VIDEO — no codec in
    * this environment): deterministic pseudo-features from the payload
    * hash. A real implementation decodes frames here — per batch, so
    * codec setup amortizes. Everything around it is production-shaped;
    * images use the real [[decodeImage]]. */
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

  final case class ResizedMedia(media_id: Long, kind: String, bytes: Array[Byte],
                                width: Int, height: Int, orig_bytes: Int)
  implicit val resizedEnc: Encoder[ResizedMedia] = Encoders.product[ResizedMedia]

  /** STUB resize for non-image kinds (video thumbnailing needs a codec
    * this environment lacks; images use the real [[resizeImage]]). The
    * stub emits a deterministic payload derived from the input
    * (md5-keyed, length `targetW·targetH/64` as a stand-in for a
    * re-encoded thumbnail), so downstream size accounting and
    * repartitioning are exercised with realistic byte volumes. */
  def resizeStub(items: Dataset[MediaItem], targetW: Int, targetH: Int,
                 batchSize: Int = 64): Dataset[ResizedMedia] = {
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // >>> real codec init once per batch here <<<
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.iterator.map { m =>
          val src = Option(m.bytes).getOrElse(Array.emptyByteArray)
          val seed = md.digest(src ++ s":${targetW}x$targetH".getBytes)
          val outLen = math.max(16, targetW * targetH / 64)
          val out = Array.tabulate(outLen)(i => seed(i % seed.length))
          ResizedMedia(m.media_id, m.kind, out, targetW, targetH, src.length)
        }
      }
    }
  }

  /** Audio-chunking stub: fixed-size windows over the byte stream with
    * overlap — pure arithmetic on lengths (no decode), so the chunk
    * table (the unit of downstream ASR/embedding work) is real. One row
    * per chunk: (media_id, chunk_idx, offset, length). */
  def chunkAudio(items: Dataset[MediaItem], chunkBytes: Int,
                 overlapBytes: Int = 0): DataFrame = {
    require(overlapBytes < chunkBytes, "overlap must be smaller than the chunk")
    val step = chunkBytes - overlapBytes
    items.toDF()
      .withColumn("n_bytes", octet_length(col("bytes")))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        greatest(ceil((col("n_bytes") - lit(overlapBytes)) / lit(step)) - 1, lit(0))
          .cast("int"))))
      .select(col("media_id"), col("chunk_idx"),
        (col("chunk_idx") * step).as("offset"),
        least(lit(chunkBytes), col("n_bytes") - col("chunk_idx") * step)
          .as("length"))
      .filter(col("length") > 0)
  }

  /** Features → the similarity stack: the extracted feature vectors ARE
    * an embedding column, so every ANN/near-dup operator applies
    * unchanged. This is the composition a multimodal dedup pipeline
    * runs (decode → embed → cosine near-dup). */
  def featureEmbeddings(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"),
      col("feature").as("embedding"))
}
