package graft

import graft.llmops.Classifier
import graft.llmops.Classifier.Weights
import org.apache.spark.sql.functions._

/** Logistic-regression quality classifier: the training loop LEARNS on
  * separable data, moves weights in the signal's direction, and is
  * deterministic — plus the integer-exactness contract of the
  * gradient aggregate. */
class ClassifierSpec extends SparkSpecBase {

  /** Separable synthetic corpus: positive docs are stopword-rich
    * English-labeled, negatives stopword-free — the stopword-rate
    * feature alone separates them. */
  private def corpus() = {
    import spark.implicits._
    val pos = (0 until 120).map(i =>
      (i.toLong, "the cat and the dog of the house in a tree is here", "en"))
    val neg = (0 until 120).map(i =>
      (1000L + i, "vec tensor shard merge bucket probe queue stack heap", "xx"))
    (pos ++ neg).toDF("doc_id", "text", "lang")
  }

  test("gradient descent separates a separable corpus within 3 steps") {
    val report = Classifier.trainReport(corpus(), steps = 3).first()
    val (tp, fp, tn, fn) = (report.getLong(5), report.getLong(6),
      report.getLong(7), report.getLong(8))
    assert(tp + fn == 120 && fp + tn == 120)
    // zero-weight start predicts everything positive (z = 0 ≥ 0);
    // trained model must beat that trivially-half accuracy cleanly
    val acc = (tp + tn).toDouble / 240.0
    assert(acc >= 0.95, s"trained accuracy $acc (tp=$tp fp=$fp tn=$tn fn=$fn)")
    // stopword rate is THE separating signal here: its weight must
    // move positive, and the bias must not dominate it
    val wStop = report.getLong(2)
    assert(wStop > 0, s"stopword weight did not move positive: $wStop")
  }

  test("training is deterministic and steps are exact-integer folds") {
    val feats = Classifier.features(corpus()).localCheckpoint(true)
    val w1 = Classifier.step(feats, Weights(0, 0, 0, 0))
    val w1b = Classifier.step(feats, Weights(0, 0, 0, 0))
    assert(w1 == w1b)
    // partition count cannot change the gradient (order-independent
    // integer sums): repartitioned input yields identical weights
    val w1c = Classifier.step(feats.repartition(7), Weights(0, 0, 0, 0))
    assert(w1 == w1c)
    // a second step from the first step's weights changes them (the
    // loop is actually iterating, not fixed-pointed at zero)
    val w2 = Classifier.step(feats, w1)
    assert(w2 != w1)
  }

  test("weight artifact round-trips; gateDocs is the z>=0 predict") {
    val docs = corpus()
    val w = Classifier.trainWeights(docs, steps = 3)
    val dir = java.nio.file.Files.createTempDirectory("clf-w")
      .toFile.getAbsolutePath + "/weights"
    Classifier.writeWeights(spark, dir, w)
    assert(Classifier.loadWeights(spark, dir) == w)
    // the gate keeps exactly the docs the confusion matrix calls
    // positive predictions
    val kept = Classifier.gateDocs(docs, w).count()
    val rep = Classifier.trainReport(docs, steps = 3).first()
    assert(kept == rep.getLong(5) + rep.getLong(6), // tp + fp
      s"gate kept $kept, confusion says ${rep.getLong(5) + rep.getLong(6)}")
  }

  test("curate intake model stage: below-margin docs never enter, counter publishes") {
    import graft.llmops.StreamingCurate
    import spark.implicits._
    // BOTH classes pass the base quality/language gate (≥20 tokens,
    // stopword-bearing, predicted en); they differ on the model's
    // signals — positives diverse, negatives massively repetitive —
    // so only the TRAINED gate separates them
    val pos = (0 until 80).map { i =>
      (i.toLong, "s", "the a and of to in is " +
        (0 until 15).map(j => s"u${i}x$j").mkString(" "), "en")
    }
    val neg = (0 until 80).map { i =>
      (1000L + i, "s",
        ("the " * 12).trim + " " + (s"z$i " * 9).trim, "xx")
    }
    val docs = (pos ++ neg).toDF("doc_id", "source", "text", "lang")
    val w = Classifier.trainWeights(docs, steps = 3)
    // sanity: the base gate alone admits both classes; the model
    // separates them
    val baseGate = StreamingCurate.gate(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(baseGate.exists(_ < 1000) && baseGate.exists(_ >= 1000),
      s"base gate must pass both classes: $baseGate")
    val modelKept = Classifier.gateDocs(StreamingCurate.gate(docs), w)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(modelKept.nonEmpty && modelKept.forall(_ < 1000),
      s"model must keep only positives: $modelKept")

    val mdir = java.nio.file.Files.createTempDirectory("clf-m")
      .toFile.getAbsolutePath + "/weights"
    Classifier.writeWeights(spark, mdir, w)
    val store = java.nio.file.Files.createTempDirectory("clf-store")
      .toFile.getAbsolutePath
    StreamingCurate.applyBatch(docs.select("doc_id", "source", "text"),
      store, 0L, modelDir = Some(mdir))
    val admitted = StreamingCurate.curated(spark, store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty && admitted.subsetOf(modelKept),
      s"model stage leaked: ${admitted -- modelKept}")
    val snap = StreamingCurate.metricsSnapshot()
    assert(snap.keys.exists(_.contains("1a_model")),
      s"model stage counter missing: ${snap.keys}")
  }

  test("features are integer-milli and bounded") {
    val rows = Classifier.features(corpus()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, x1, x2, x3) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(y == 0L || y == 1L)
      assert(x1 >= 0 && x1 <= 1000)
      assert(x2 >= 1 && x2 <= 1000)
      assert(x3 >= 0 && x3 <= 1000)
    }
  }
}
