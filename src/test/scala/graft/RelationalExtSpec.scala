package graft

import graft.operators.RelationalExt

/** As-of and banded range joins on hand-computable fixtures. */
class RelationalExtSpec extends SparkSpecBase {

  test("asOfJoin: most recent right row at-or-before, nulls when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100), (1L, 20L, 200), (1L, 30L, 300), (2L, 7L, 900))
      .toDF("k", "t", "v")
    val out = RelationalExt.asOfJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("name", "asof_v").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out("e1") == 100) // equal timestamp matches (inclusive)
    assert(out("e2") == 200) // 20 <= 25 < 30
    assert(out("e3") == -1)  // right row at t=7 is AFTER left t=5 → no match
  }

  test("asOfJoin: ties at one timestamp resolved by tiebreak, deterministic") {
    import spark.implicits._
    val left = Seq((1L, 50L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 40L, 1L, 10), (1L, 40L, 2L, 20)).toDF("k", "t", "id", "v")
    val out = RelationalExt.asOfJoin(left, right, Seq("k"), "t", "t",
      Seq("id", "v"), rightTiebreak = Some("id"))
    assert(out.select("asof_id").first().getLong(0) == 2L) // largest id wins
  }

  test("rangeJoin: inclusive bounds, bucket edges, key isolation") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, 90L, "r1"),   // within [a-20, a]
      (1L, 100L, "r2"),  // exactly at a (inclusive)
      (1L, 79L, "r3"),   // just outside a's window
      (1L, 195L, "r4"),  // within b's window
      (2L, 99L, "r5"))   // other key, within c's window
      .toDF("k", "t", "rn")
    val out = RelationalExt.rangeJoin(left, right, Seq("k"), "t", "t",
      before = 20L, after = 0L, rightPayload = Seq("rn"))
      .select("name", "r_rn").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "r1"), ("a", "r2"), ("b", "r4"), ("c", "r5")))
  }

  test("rangeJoin: symmetric window (before and after)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a")).toDF("k", "t", "name")
    val right = Seq((1L, 80L, "x"), (1L, 120L, "y"), (1L, 121L, "z"))
      .toDF("k", "t", "rn")
    val out = RelationalExt.rangeJoin(left, right, Seq("k"), "t", "t",
      before = 20L, after = 20L, rightPayload = Seq("rn"))
      .select("r_rn").collect().map(_.getString(0)).toSet
    assert(out == Set("x", "y"))
  }
}
