package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for graft's vector-similarity hot path.
  *
  * Lives under `org.apache.spark.sql` because the extension surface it
  * needs (`AbstractDataType` in `ExpectsInputTypes`, the
  * Column↔Expression bridge) is `private[sql]` — the standard pattern
  * for Spark-native extension libraries.
  *
  * Spark's higher-order `aggregate`/`zip_with` lambdas are interpreted
  * per element — on an O(n²) near-dup pair join that dominates the
  * whole query. [[DotProduct]] is the same strictly-sequential
  * left-to-right summation (bit-identical to the
  * `aggregate(zip_with(...))` fold and to DuckDB's list_dot_product)
  * compiled into a tight primitive loop via `doGenCode`, living fully
  * inside WholeStageCodegen.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on length mismatch / null element (zip_with pads the shorter
  // array with null and null propagates through * and +), so the
  // optimizer rewrite from the higher-order form is value-preserving
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** `graft_maxsim_long(qv, dv)` — late-interaction (ColBERT-style)
  * MaxSim over integer subvector grids:
  * `Σ_{qs ∈ qv} max_{ds ∈ dv} dot(qs, ds)` on array<array<bigint>>.
  *
  * Replaces the triply-nested higher-order chain
  * `aggregate(transform(qv, qs -> array_max(transform(dv, ds ->
  * aggregate(zip_with(qs, ds, x*y), 0L, a+x)))), 0L, a+x)`, whose
  * interpreted lambdas allocate a boxed array per (qs, ds) pair per
  * row (round 14, q235). Null semantics are replicated exactly:
  * a null qs or an all-null/empty inner max poisons the outer sum
  * (null propagates through +); a length-mismatched or null-element
  * dot is null and is SKIPPED by array_max when other dots exist;
  * long arithmetic wraps like the non-ANSI fold. Spec-pinned in
  * Round14Spec against the verbatim higher-order form.
  */
case class MaxSimLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(LongType)), ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_maxsim_long"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    MaxSimKernel.maxSimLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r =
         |  org.apache.spark.sql.graft.MaxSimKernel.maxSimLong($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MaxSimLong =
    copy(left = newLeft, right = newRight)
}

object MaxSimKernel {
  /** See [[MaxSimLong]]. Returns null exactly where the higher-order
    * chain yields NULL.
    */
  def maxSimLong(qv: ArrayData, dv: ArrayData): java.lang.Long = {
    val nq = qv.numElements()
    val nd = dv.numElements()
    var acc = 0L
    var g = 0
    while (g < nq) {
      // null qs: zip_with(null, ds) → null dot for every ds →
      // array_max all-null → null → the outer sum is null
      if (qv.isNullAt(g)) return null
      val qs = qv.getArray(g)
      val n = qs.numElements()
      var best = 0L
      var has = false
      var j = 0
      while (j < nd) {
        if (!dv.isNullAt(j)) {
          val ds = dv.getArray(j)
          if (ds.numElements() == n) {
            var s = 0L
            var ok = true
            var i = 0
            while (ok && i < n) {
              if (qs.isNullAt(i) || ds.isNullAt(i)) ok = false
              else { s += qs.getLong(i) * ds.getLong(i); i += 1 }
            }
            if (ok && (!has || s > best)) { best = s; has = true }
          }
        }
        j += 1
      }
      if (!has) return null // array_max of empty / all-null dots
      acc += best
      g += 1
    }
    acc
  }
}
