package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SnapshotSpec extends AnyFunSuite with SparkSpec {

  test("compact keeps the greatest version per key and counts versions") {
    import spark.implicits._
    val df = Seq(
      ("k1", 1L, "v1"), ("k1", 3L, "v3"), ("k1", 2L, "v2"),
      ("k2", 7L, "w7")).toDF("key", "ver", "payload")
    val got = Snapshot.compact(df, Seq("key"), Seq("ver"))
      .select($"key", $"n_versions", $"latest.ver", $"latest.payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(("k1", 3L, 3L, "v3"), ("k2", 1L, 7L, "w7")))
  }

  test("version tie broken by the second version column (lexicographic struct order)") {
    import spark.implicits._
    val df = Seq(("k", 1L, 10L, "low"), ("k", 1L, 20L, "high"))
      .toDF("key", "ver", "seq", "payload")
    val got = Snapshot.compact(df, Seq("key"), Seq("ver", "seq"))
      .select($"latest.payload").collect().map(_.getString(0))
    assert(got.toSeq == Seq("high"))
  }

  test("merge: increment overrides older snapshot versions, new keys appear") {
    import spark.implicits._
    val snap = Seq(("a", 1L, "a1"), ("b", 5L, "b5")).toDF("key", "ver", "payload")
    val inc = Seq(("a", 2L, "a2"), ("c", 1L, "c1")).toDF("key", "ver", "payload")
    val got = Snapshot.merge(snap, inc, Seq("key"), Seq("ver"))
      .select($"key", $"n_versions", $"latest.payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("a", 2L, "a2"), ("b", 1L, "b5"), ("c", 1L, "c1")))
  }

  test("applyChanges: update, delete, insert, last-change-wins, resurrect") {
    import spark.implicits._
    val target = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L))
      .toDF("key", "v")
    val changes = Seq(
      ("a", 1L, "U", 11L),              // plain update
      ("b", 1L, "D", 0L),               // delete
      ("c", 1L, "U", 31L), ("c", 2L, "D", 0L), // update then delete → gone
      ("d", 1L, "D", 0L), ("d", 2L, "U", 42L), // delete then update → resurrect
      ("e", 1L, "U", 50L),              // insert (key absent from target)
      ("z", 1L, "D", 0L))               // delete of absent key → no row
      .toDF("key", "seq", "op", "v")
    val got = Snapshot.applyChanges(target, changes, Seq("key"), "seq", "op")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 11L, "d" -> 42L, "e" -> 50L))
  }
}
