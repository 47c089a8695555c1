package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("asof picks latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "e1"), ("u1", 20L, "e2"), ("u1", 5L, "e0"),
      ("u2", 15L, "e3")).toDF("k", "t", "ev")
    val right = Seq(
      ("u1", 8L, "r8"), ("u1", 10L, "r10"), ("u1", 25L, "r25"),
      ("u2", 99L, "r99")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asof(left, right, "t", "rt", Seq("k"), Seq("rv"))
      .select("ev", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e0") == null) // t=5: no right ≤ 5
    assert(out("e1") == "r10") // inclusive: rt=10 matches t=10
    assert(out("e2") == "r10") // r25 is later than 20
    assert(out("e3") == null) // u2's only order is at 99
  }

  test("forward direction picks earliest right at or after left time") {
    import spark.implicits._
    val left = Seq(("u1", 10L, "e1"), ("u1", 26L, "e2")).toDF("k", "t", "ev")
    val right = Seq(("u1", 10L, "r10"), ("u1", 25L, "r25")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asof(left, right, "t", "rt", Seq("k"), Seq("rv"), "forward")
      .select("ev", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e1") == "r10") // inclusive at equal time
    assert(out("e2") == null) // nothing at/after 26
  }

  test("nearest direction picks the closer side, ties backward") {
    import spark.implicits._
    val left = Seq(("u1", 12L, "near10"), ("u1", 24L, "near25"), ("u1", 18L, "tie"))
      .toDF("k", "t", "ev")
    val right = Seq(("u1", 10L, "r10"), ("u1", 26L, "r26")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asof(left, right, "t", "rt", Seq("k"), Seq("rv"), "nearest")
      .select("ev", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("near10") == "r10") // |12-10| < |26-12|
    assert(out("near25") == "r26") // |26-24| < |24-10|
    assert(out("tie") == "r10") // |18-10| == |26-18| → backward
  }

  test("asof keeps all left rows and left columns") {
    import spark.implicits._
    val left = Seq(("a", 1L, 7.5)).toDF("k", "t", "x")
    val right = Seq(("a", 1L, "hit")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asof(left, right, "t", "rt", Seq("k"), Seq("rv"))
    assert(out.columns.toSeq == Seq("k", "t", "x", "rv"))
    val r = out.collect().head
    assert(r.getDouble(2) == 7.5 && r.getString(3) == "hit")
  }
}
