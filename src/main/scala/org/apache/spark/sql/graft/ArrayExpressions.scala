package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native sorted-merge intersection size for the exact-Jaccard verify
  * hot path (PPJoin q181, sorted-neighborhood q169).
  *
  * `size(array_intersect(ja, jb))` builds a hash set PLUS an output
  * array per PAIR — on a verify stage running tens of millions of
  * candidate pairs that allocation dominates GC (round-11 bench
  * metrics: q181 spent 9.5 s of task GC at sf0.1, the suite's
  * worst). With both token arrays sorted once per DOC (array_sort in
  * the checkpointed doc prep), the per-pair intersection SIZE is a
  * two-pointer merge: O(n+m) byte-wise UTF8String comparisons, zero
  * per-pair allocation, fully inside WholeStageCodegen.
  *
  * CONTRACT: both inputs must be SORTED ascending (Spark's binary
  * UTF8String order — exactly what `array_sort` produces) and
  * DISTINCT (what `array_distinct` produces); the count is undefined
  * otherwise. Null ELEMENTS sort last under array_sort, and the merge
  * stops at the first null on either side — so nulls NEVER match
  * (documented divergence from `array_intersect`, which counts a
  * null = null pair; `split()` token arrays contain no nulls, so the
  * verify paths never observe it). Null ARRAY inputs propagate. Under
  * that contract, on null-free inputs the result equals
  * `size(array_intersect(ja, jb))` (spec-pinned on random inputs).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_inter"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m && !x.isNullAt(i) && !y.isNullAt(j)) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1L; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectSize]] over BIGINT arrays — for token/shingle sets
  * already hashed to 60-bit longs (the [[Md5Expressions]] discipline):
  * the merge compares primitive longs, and the arrays themselves ship
  * through the candidate join at 8 bytes per token instead of a
  * variable-width UTF8String + offset. Same sorted-distinct contract;
  * same null rules.
  */
case class SortedIntersectSizeLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_inter_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m && !x.isNullAt(i) && !y.isNullAt(j)) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectSizeLong =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** Column API for [[SortedIntersectSize]]. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[SortedIntersectSizeLong]]. */
  def sortedIntersectSizeLong(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSizeLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
