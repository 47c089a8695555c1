package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableDiffSpec extends AnyFunSuite with SparkSpec {

  private val rowSql = "concat(cast(id AS string), ':', v)"

  test("identical tables -> empty diff, regardless of partitioning/order") {
    import spark.implicits._
    val a = (0 until 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val b = a.orderBy(col("id").desc).repartition(7)
    assert(TableDiff.diff(a, b, rowSql, 32).count() == 0)
  }

  test("modification, deletion, insertion each surface their bucket") {
    import spark.implicits._
    val a = (0 until 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val b = (0 until 300).filter(_ != 50)            // delete id 50
      .map(i => (i.toLong, if (i == 7) "CHANGED" else s"v$i")) // modify id 7
      .:+((999L, "new"))                              // insert id 999
      .toDF("id", "v")
    val out = TableDiff.diff(a, b, rowSql, 32).collect()
    assert(out.nonEmpty && out.length <= 5) // <= buckets touched by 4 row hashes
    // every differing bucket reports a real digest or count mismatch
    out.foreach { r =>
      assert(r.getLong(1) != r.getLong(2) || r.getLong(3) != r.getLong(4))
    }
    // total row-count delta across buckets = -1 + 1 = 0 is possible;
    // here delete+insert land in different buckets unless hashes
    // collide, so the bucket count mismatch must appear somewhere
    assert(out.exists(r => r.getLong(1) != r.getLong(2)))
  }

  test("checksum is a pure reduction: O(buckets) rows out") {
    import spark.implicits._
    val a = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val cs = TableDiff.checksum(a, rowSql, 16)
    assert(cs.count() <= 16)
    assert(cs.agg(sum("n_rows")).head.getLong(0) == 1000L)
  }
}
