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
