package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Top-60-bits of one half of md5(input), as a BIGINT — the portable
  * shingle/split hash every dedup operator keys on.
  *
  * The SQL formulation `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS
  * BIGINT)` materializes a 32-char hex string, slices it, parses it to
  * a decimal string, and parses THAT to a long — four string passes
  * per row on the hottest column in the corpus pipeline. This
  * expression computes the identical value (hex chars [1,15] = big-
  * endian bytes 0..7 >>> 4; chars [17,31] = bytes 8..15 >>> 4)
  * straight from the digest bytes, codegen'd.
  */
case class Md5Top60(child: Expression, hi: Boolean)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = if (hi) "graft_md5hi60" else "graft_md5lo60"

  override protected def nullSafeEval(input: Any): Any =
    Md5HashKernel.top60(input.asInstanceOf[Array[Byte]], hi)

  // the kernel lives in its own object (not the companion): Expression
  // already defines instance `eval`, which suppresses the static
  // forwarder a companion method of the same name would get, and
  // Janino resolves only true statics
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Md5HashKernel.top60($c, $hi)")

  override protected def withNewChildInternal(newChild: Expression): Md5Top60 =
    copy(child = newChild)
}

object Md5HashKernel {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Value of 15 hex chars of the md5: nibbles 0..14 (hi) or 16..30
    * (lo) — always in [0, 2⁶⁰), so the BIGINT is non-negative like the
    * `conv` parse it replaces.
    */
  def top60(bytes: Array[Byte], hi: Boolean): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(bytes)
    val off = if (hi) 0 else 8
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (h(off + i) & 0xffL)
      i += 1
    }
    v >>> 4
  }
}
