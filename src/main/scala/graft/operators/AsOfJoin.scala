package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest
  * right row with `rightTime <= leftTime` within the same key group.
  *
  * Implementation is the union-sort technique, not a range join: tag
  * both sides, union, and take `last(right, ignoreNulls)` over a window
  * ordered by (time, side) per key. Cost is ONE shuffle of L+R rows on
  * the key — at 100 TB this beats any O(L×R-per-key) range-condition
  * join and never materializes candidate pairs. Right rows sort before
  * left rows at equal timestamps, so the match is inclusive
  * (`rightTime <= leftTime`), matching DuckDB/pandas `ASOF JOIN`
  * semantics.
  *
  * Right side must be unique per (keys, rightTime); pre-aggregate it
  * otherwise (ambiguous matches have no deterministic answer).
  *
  * Left rows with no match keep null right values (left-join
  * semantics); filter them out for DuckDB-style inner `ASOF JOIN`.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame,
           leftTime: String, rightTime: String,
           keys: Seq[String],
           rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        right.select(rightValueCols.map(col): _*).schema
          .foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f))))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) ++
        Seq(lit(0).as("__side"), struct(rightValueCols.map(col): _*).as("__r")): _*)
    // align schemas: right side gets nulls for left-only columns
    val rAligned = leftCols.filterNot(keys.contains)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
