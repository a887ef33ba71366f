package graft.udx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import graft.llm.SimHash

/** Native scalar expression: `graft_simhash(text)` → 64-bit SimHash
  * signature. Unary, null-safe, deterministic, with real `doGenCode`:
  * the generated stage calls the static hash directly on the unsafe
  * string — no interpreted-eval detour, no value boxing, no InternalRow
  * materialization per row (the costs CodegenFallback would add inside
  * the whole-stage pipeline). */
case class SimHashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHash.simhash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // SimHash is a top-level Scala object → static forwarder callable
    // from generated Java
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHash.simhash64($c.toString())")
  override def prettyName: String = "graft_simhash"
  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

/** Session extension point (`spark.sql.extensions=graft.udx.GraftExtensions`):
  * registers the engine's custom SQL functions at session build time so
  * any SQL client on the cluster sees them — the production equivalent
  * of the per-session `NGrams.register` used in tests. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "graft_ngrams"),
      (exprs: Seq[Expression]) =>
        NGramsGenerator(exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpression].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHashExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fdot"),
      new ExpressionInfo(classOf[FloatDotExpression].getName, "graft_fdot"),
      (exprs: Seq[Expression]) => FloatDotExpression(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fnorm"),
      new ExpressionInfo(classOf[FloatNormExpression].getName, "graft_fnorm"),
      (exprs: Seq[Expression]) => FloatNormExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles64"),
      new ExpressionInfo(classOf[ShingleHashesExpression].getName, "graft_shingles64"),
      (exprs: Seq[Expression]) => ShingleHashesExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashExpression].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashExpression(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_lmatch"),
      new ExpressionInfo(classOf[LongMatchCountExpression].getName, "graft_lmatch"),
      (exprs: Seq[Expression]) => LongMatchCountExpression(exprs.head, exprs(1))))
    // rewrite the declarative HOF dot-product idiom to the codegen'd
    // kernel — users write catalog functions, the engine substitutes the
    // fused loop (bit-identical fold; see VectorKernelRewrite)
    ext.injectOptimizerRule(_ => VectorKernelRewrite)
    // whole-operator extension: the as-of join planner strategy
    // (graft.plans.AsOfJoin → AsOfJoinExec); AsOf.join also installs it
    // per-session for callers without the extensions conf
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
