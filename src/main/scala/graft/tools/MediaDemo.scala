package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llmops.{Multimodal, Similarity}

/** Runtime drive for the multimodal family: generates REAL media
  * payloads (PNG via `javax.imageio`, WAV via `javax.sound.sampled`),
  * pushes them through decode → feature → resize → chunk → ANN, and
  * `require`s the decoded facts (pixel dims, sample rates, RMS levels)
  * match what was synthesized. One command, self-checking:
  *
  *   sbt -batch "runMain graft.tools.MediaDemo"
  */
object MediaDemo {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def wav(sr: Int, seconds: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val n = (sr * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / sr) * amp * 32767).toInt
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-media-demo").master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._

      // ---- images: decode reads back the synthesized dimensions ----
      val images = Seq(
        Multimodal.MediaItem(1L, "image", png(64, 48), "demo", "image/png"),
        Multimodal.MediaItem(2L, "image", png(32, 32), "demo", "image/png"),
        Multimodal.MediaItem(3L, "image", png(128, 16), "demo", "image/png"))
        .toDS()
      val imgFeats = Multimodal.decodeImage(images, featureDim = 8)
        .collect().sortBy(_.media_id)
      require(imgFeats.map(f => (f.width, f.height)).toSeq ==
        Seq((64, 48), (32, 32), (128, 16)),
        s"decoded dims: ${imgFeats.map(f => (f.width, f.height)).toSeq}")
      require(imgFeats.forall(f =>
        f.feature.toSeq == f.feature.sorted.toSeq),
        "gradient strips must brighten left->right")
      println(s"images: dims=${imgFeats.map(f => s"${f.width}x${f.height}").mkString(",")} " +
        s"gradient-monotone=true")

      val thumbs = Multimodal.resizeImage(images, 16, 16).collect()
      require(thumbs.forall { t =>
        val round = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(t.bytes))
        round != null && round.getWidth == 16 && round.getHeight == 16
      }, "thumbnails must round-trip at target dims")
      println(s"resize: ${thumbs.length} PNG thumbnails round-trip at 16x16")

      // ---- audio: decode reads back rate/frames and the RMS level ----
      val audio = Seq(
        Multimodal.MediaItem(10L, "audio", wav(8000, 1.0, 0.5), "demo", "audio/wav"),
        Multimodal.MediaItem(11L, "audio", wav(16000, 0.5, 0.25), "demo", "audio/wav"),
        Multimodal.MediaItem(12L, "audio", wav(8000, 0.2, 0.0), "demo", "audio/wav"))
        .toDS()
      val audFeats = Multimodal.decodeAudio(audio, featureDim = 4)
        .collect().sortBy(_.media_id)
      require(audFeats.map(f => (f.sample_rate, f.n_frames, f.duration_ms)).toSeq ==
        Seq((8000, 8000L, 1000L), (16000, 8000L, 500L), (8000, 1600L, 200L)),
        s"decoded audio meta: ${audFeats.map(f => (f.sample_rate, f.n_frames)).toSeq}")
      def lvl(a: Double) = (2 * a / math.sqrt(2) - 1).toFloat
      require(audFeats(0).feature.forall(v => math.abs(v - lvl(0.5)) < 0.02) &&
        audFeats(1).feature.forall(v => math.abs(v - lvl(0.25)) < 0.02) &&
        audFeats(2).feature.forall(v => math.abs(v + 1f) < 0.02),
        s"RMS strips: ${audFeats.map(_.feature.toSeq).toSeq}")
      println(s"audio: rates=${audFeats.map(_.sample_rate).mkString(",")} " +
        s"rms-strips match synthesized amplitudes")

      val chunks = Multimodal.chunkAudio(audio, chunkBytes = 4000,
        overlapBytes = 500).collect()
      require(chunks.nonEmpty, "chunking must tile the streams")
      println(s"chunks: ${chunks.length} windows over 3 streams")

      // ---- features ARE embeddings: ANN over decoded audio ----
      val emb = Multimodal.audioEmbeddings(
        Multimodal.decodeAudio(audio, featureDim = 8))
      val top = Similarity.bruteForceTopK(emb, probeId = 10L, k = 2)
        .collect()
      require(top.length == 2, s"ANN over audio features: ${top.length} rows")
      println(s"ann: top-2 for probe 10 = " +
        top.map(r => s"${r.getLong(0)}@${"%.3f".format(r.getDouble(2))}").mkString(", "))

      println("MediaDemo OK")
    } finally spark.stop()
  }
}
