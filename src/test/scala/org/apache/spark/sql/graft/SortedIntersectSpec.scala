package org.apache.spark.sql.graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SortedIntersectSpec extends AnyFunSuite with SparkSpec {

  test("sortedIntersectSize == size(array_intersect) on sorted-distinct random arrays") {
    import spark.implicits._
    // seeded random word arrays (duplicates injected BEFORE the
    // distinct+sort prep, as real text has) across sizes 0..60,
    // including disjoint, identical, and subset shapes
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 500).map { i =>
      val na = rnd.nextInt(60)
      val nb = rnd.nextInt(60)
      val a = Seq.fill(na)(s"w${rnd.nextInt(80)}")
      val b = Seq.fill(nb)(s"w${rnd.nextInt(80)}")
      (i.toLong, a.mkString(" "), b.mkString(" "))
    } ++ Seq(
      (1000L, "", ""),                       // empty both
      (1001L, "x y z", ""),                  // empty right
      (1002L, "x y z", "x y z"),             // identical
      (1003L, "a b c d", "b d"),             // subset
      (1004L, "a b", "c d"))                 // disjoint
    val df = rows.toDF("id", "ta", "tb")
      .withColumn("ja", expr("array_sort(array_distinct(split(ta, ' ')))"))
      .withColumn("jb", expr("array_sort(array_distinct(split(tb, ' ')))"))
    val got = df.select(col("id"),
        ArrayFunctions.sortedIntersectSize(col("ja"), col("jb")).as("fast"),
        expr("CAST(size(array_intersect(ja, jb)) AS BIGINT)").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: fast=${r.getLong(1)} ref=${r.getLong(2)}")
    }
    // and the expression actually codegens (no interpreted fallback):
    // the projection must sit inside a WholeStageCodegen span
    // repartition first (over a LocalTableScan Catalyst evaluates the
    // projection at plan time), and execute so AQE finalizes the plan
    // — only then do the WholeStageCodegen spans appear in the tree
    val q = df.repartition(2)
      .select(ArrayFunctions.sortedIntersectSize(col("ja"), col("jb")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the compact tree renders WholeStageCodegen stages as a "*(n) "
    // prefix — the projection computing the expression must carry it
    assert(plan.contains("*(1) Project [graft_sorted_inter"), plan)
  }

  test("null array inputs propagate; null elements (sorted last) terminate the merge exactly") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"), null: Seq[String]))
      .toDF("id", "ja", "jb")
    assert(df.select(ArrayFunctions.sortedIntersectSize(col("ja"), col("jb")))
      .head.isNullAt(0))
    // null elements: array_sort puts them LAST and the merge stops
    // there — nulls never match (documented divergence from
    // array_intersect, which treats null = null as a member; token
    // arrays from split() never contain nulls, so the verify paths
    // never see the difference)
    val withNulls = Seq((1L, Seq("a", "b", null), Seq("b", null)))
      .toDF("id", "xa", "xb")
      .select(col("id"), expr("array_sort(xa)").as("ja"), expr("array_sort(xb)").as("jb"))
    val r = withNulls.select(
      ArrayFunctions.sortedIntersectSize(col("ja"), col("jb")).as("fast")).head
    assert(r.getLong(0) == 1L) // only "b"; the null pair does not count
  }
}
