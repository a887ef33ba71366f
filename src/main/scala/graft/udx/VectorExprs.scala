package graft.udx

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernels callable from whole-stage-generated Java. Both fold
  * LEFT-TO-RIGHT in double precision — the exact IEEE operation sequence
  * of the `aggregate(zip_with(...))` higher-order-function formulation
  * they replace (float→double widening is exact), so swapping one for
  * the other can never change a result, only remove the interpreted
  * per-element lambda dispatch HOFs pay (they are CodegenFallback). */
object VectorKernels {
  /** Dot product of two float vectors, accumulated in double. */
  def fdot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Positions where two long arrays agree (signature match count). */
  def lmatch(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** L2 norm of a float vector, accumulated in double. */
  def fnorm(v: ArrayData): Double = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }
}

/** Static bridges returning Catalyst ArrayData, callable from generated
  * Java (UnsafeArrayData.fromPrimitiveArray is a zero-copy-ish pack). */
object TextKernels {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
  import org.apache.spark.unsafe.types.UTF8String
  def shingles64(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(graft.llm.MinHash.shingleHashes(s.toString))
  def minhash64(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(graft.llm.MinHash.signature(s.toString))
}

/** `graft_shingles64(text)` → array<bigint>: distinct hashed word-3-
  * shingles in one codegen'd pass (see MinHash.shingleHashes). */
case class ShingleHashesExpression(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.udx.TextKernels.shingles64($c)")
  override def prettyName: String = "graft_shingles64"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpression =
    copy(child = newChild)
}

/** `graft_minhash(text)` → array<bigint>: 64-permutation MinHash
  * signature as a native expression — replaces the Scala UDF and its
  * per-row Seq conversion/serialization boundary. */
case class MinHashExpression(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhash64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.udx.TextKernels.minhash64($c)")
  override def prettyName: String = "graft_minhash"
  override protected def withNewChildInternal(newChild: Expression): MinHashExpression =
    copy(child = newChild)
}

/** `graft_lmatch(array<bigint>, array<bigint>)` → int: number of
  * positions where the two arrays agree (MinHash signature agreement
  * count) — one codegen'd loop instead of zip_with+aggregate lambdas. */
case class LongMatchCountExpression(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.IntegerType
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.lmatch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.udx.VectorKernels.lmatch($a, $b)")
  override def prettyName: String = "graft_lmatch"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongMatchCountExpression =
    copy(left = newLeft, right = newRight)
}

/** `graft_fdot(array<float>, array<float>)` → double: codegen'd fused
  * dot product. The HOF route (`aggregate(zip_with(a, b, *), 0.0, +)`)
  * materializes a zipped intermediate array and interprets two lambdas
  * per element; this is one tight loop over the two unsafe arrays. */
case class FloatDotExpression(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.fdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.udx.VectorKernels.fdot($a, $b)")
  override def prettyName: String = "graft_fdot"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDotExpression =
    copy(left = newLeft, right = newRight)
}

/** `graft_fnorm(array<float>)` → double: codegen'd L2 norm. */
case class FloatNormExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    VectorKernels.fnorm(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.udx.VectorKernels.fnorm($v)")
  override def prettyName: String = "graft_fnorm"
  override protected def withNewChildInternal(newChild: Expression): FloatNormExpression =
    copy(child = newChild)
}
