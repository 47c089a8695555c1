package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the
  * canonicalization step every web corpus needs before hashing or
  * dedup (the same text arrives precomposed from one crawler and
  * decomposed from another; their md5s differ unless normalized).
  *
  * No Spark built-in exposes `java.text.Normalizer`, and a Scala UDF
  * would break whole-stage codegen on the hottest column in the
  * pipeline — hence an `Expression` (preference order (b) of the
  * design brief). `form` is NFC/NFD/NFKC/NFKD; NFC for canonical
  * equality, NFKC additionally folds compatibility variants
  * (full-width forms, ligatures) — the aggressive choice for dedup
  * keys.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""org.apache.spark.sql.graft.NormalizeKernel.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object NormalizeKernel {
  /** `isNormalized` is a cheap scan that is true for pure-ASCII (the
    * overwhelmingly common case) — the fast path returns the input
    * UTF8String untouched, so normalization costs ~zero allocation on
    * already-clean corpora.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
