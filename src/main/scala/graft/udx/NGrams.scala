package graft.udx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram generator as a native Catalyst `Generator`
  * (SURVEY §2.B udtf_ngrams): one input row fans out to length−n+1 rows
  * inside the Generate operator — no intermediate array materialization,
  * unlike the UDF-returns-array + explode formulation.
  */
case class NGramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Iterator.empty
      else (0 to s.length - n).iterator
        .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsGenerator =
    copy(child = newChild)
}

object NGrams {
  /** Registers `graft_ngrams(str, n)` for SQL use; the analyzer plans a
    * Generate node when it appears in a select list. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => NGramsGenerator(exprs.head, exprs(1).eval(null).asInstanceOf[Int]),
      "scala_udf")

  /** Registers every graft_* function on an already-built session —
    * per-session equivalent of installing `GraftExtensions` via
    * `spark.sql.extensions` at session build time. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fdot",
      exprs => FloatDotExpression(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnorm",
      exprs => FloatNormExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles64",
      exprs => ShingleHashesExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashExpression(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lmatch",
      exprs => LongMatchCountExpression(exprs.head, exprs(1)),
      "scala_udf")
  }
}
