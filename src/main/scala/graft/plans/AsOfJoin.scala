package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the full custom-Catalyst path
  * (SURVEY §4.3 option c): a LogicalPlan node, a planner Strategy, and a
  * physical SparkPlan, registered per-session (`AsOf.join`) or globally
  * (`GraftExtensions.injectPlannerStrategy`).
  *
  * Semantics (backward as-of, DuckDB `ASOF LEFT JOIN`): for every left
  * row, attach the right row with the same key and the GREATEST right
  * time ≤ the left row's time; null-extend when none exists.
  *
  * Physical shape: the exec node declares
  * `requiredChildDistribution = ClusteredDistribution(key)` and
  * `requiredChildOrdering = (key, time)` on both sides, so Catalyst
  * plans exactly one hash exchange + sort per side (reusing existing
  * partitioning/ordering when an upstream stage already provides it —
  * e.g. bucketed tables join with NO exchange). The merge itself is a
  * single forward pass over each partition holding ONE buffered right
  * row and ONE candidate match — O(1) state, no per-key
  * materialization, no time-range fan-out. That is the property the
  * window-composed formulation (`Relational.joinAsof`) shares and a
  * range self-join lacks; the custom operator additionally avoids the
  * union + filter + running-`last` machinery (one pass, no null
  * carry-forward column), and is the extension point for semantics
  * windows can't express (tolerance bounds, forward/nearest direction).
  *
  * Constraints (checked by the helper): one equi-key per side, non-null
  * times; rows with null keys or times never match (left ones still
  * emit, null-extended).
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long] = None,
    forward: Boolean = false,
    nearest: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd, near) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, fwd, near, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge state machine for [[AsOfJoinExec]] — the single
  * source of truth for as-of semantics, shared verbatim by the
  * interpreted `doExecute` path and the whole-stage-codegen path (the
  * generated loop just calls `advance()` and reads `curLeft`/`curRight`,
  * so fusing into codegen can never change a result).
  *
  * O(1) state: the next unconsumed right row (with its key), and the
  * best match so far for the current left key. Every left row produces
  * exactly one output; `curRight` is an all-null row when unmatched
  * (left-outer null-extension). */
final class AsOfScanner(
    lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
    lkB: Expression, ltB: Expression, rkB: Expression, rtB: Expression,
    keyOrd: Ordering[Any], timeOrd: Ordering[Any],
    tol: Long, forward: Boolean, nearest: Boolean, nRightFields: Int) {

  private val nullRight = new GenericInternalRow(nRightFields)
  private val needTime = tol >= 0 || nearest
  private var rHead: InternalRow = null
  private var rHeadKey: Any = null
  private var best: InternalRow = null
  private var bestKey: Any = null
  private var bestTime: Long = 0L

  var curLeft: InternalRow = null
  var curRight: InternalRow = null

  def advance(): Boolean = {
    if (!lIter.hasNext) return false
    val l = lIter.next()
    curLeft = l
    val k = lkB.eval(l)
    val t = ltB.eval(l)
    if (k == null || t == null) { curRight = nullRight; return true }
    if (bestKey != null && keyOrd.compare(bestKey, k) != 0) { best = null; bestKey = null }
    var continue = true
    while (continue) {
      if (rHead == null) {
        if (rIter.hasNext) {
          rHead = rIter.next()
          rHeadKey = rkB.eval(rHead)
          if (rHeadKey == null || rtB.eval(rHead) == null) rHead = null // unmatched by definition
        } else continue = false
      }
      if (rHead != null) {
        val c = keyOrd.compare(rHeadKey, k)
        if (c < 0) rHead = null // key fully passed; its matches were consumed by earlier left rows
        else if (!forward && c == 0 && timeOrd.compare(rtB.eval(rHead), t) <= 0) {
          // BACKWARD (and NEAREST's predecessor half): consume —
          // a later-t left row wants a later right
          best = rHead.copy() // row buffers are reused — retain a copy
          bestKey = rHeadKey
          if (needTime) bestTime = rtB.eval(best).asInstanceOf[Long]
          rHead = null
        } else if (forward && c == 0 && timeOrd.compare(rtB.eval(rHead), t) < 0) {
          // FORWARD: rights strictly before t can never match this
          // or any later left row — discard
          rHead = null
        } else continue = false // backward: right ahead; forward: rHead IS the match candidate
      }
    }
    curRight =
      if (forward) {
        // PEEK, don't consume: the same right row may be the "next
        // at-or-after" for several left rows of this key
        val m = rHead != null && keyOrd.compare(rHeadKey, k) == 0 && {
          val rt = rtB.eval(rHead)
          timeOrd.compare(rt, t) >= 0 &&
            (tol < 0 || rt.asInstanceOf[Long] - t.asInstanceOf[Long] <= tol)
        }
        if (m) rHead else nullRight
      } else if (nearest) {
        // NEAREST: predecessor sits in `best`, successor is the
        // un-consumed rHead — pick the closer, ties to the earlier
        val tl = t.asInstanceOf[Long]
        val backOk = best != null && keyOrd.compare(bestKey, k) == 0
        val backDist = if (backOk) tl - bestTime else Long.MaxValue
        val fwdOk = rHead != null && keyOrd.compare(rHeadKey, k) == 0
        val fwdDist = if (fwdOk) rtB.eval(rHead).asInstanceOf[Long] - tl else Long.MaxValue
        val useBack = backOk && backDist <= fwdDist
        val dist = math.min(backDist, fwdDist)
        if (dist != Long.MaxValue && (tol < 0 || dist <= tol)) {
          if (useBack) best else rHead
        } else nullRight
      } else {
        // the greatest right time ≤ t is the only candidate: if IT
        // violates the tolerance, every earlier one does too → null
        val withinTol = tol < 0 || (best != null &&
          t.asInstanceOf[Long] - bestTime <= tol)
        if (best != null && withinTol && keyOrd.compare(bestKey, k) == 0) best
        else nullRight
      }
    true
  }
}

final case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long], forward: Boolean, nearest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Shared by both execution paths (and called from generated Java). */
  def createScanner(lIter: Iterator[InternalRow], rIter: Iterator[InternalRow]): AsOfScanner =
    new AsOfScanner(
      lIter, rIter,
      BindReferences.bindReference(leftKey, left.output),
      BindReferences.bindReference(leftTime, left.output),
      BindReferences.bindReference(rightKey, right.output),
      BindReferences.bindReference(rightTime, right.output),
      TypeUtils.getInterpretedOrdering(leftKey.dataType),
      TypeUtils.getInterpretedOrdering(leftTime.dataType),
      toleranceUs.getOrElse(-1L), forward, nearest, right.output.length)

  protected override def doExecute(): RDD[InternalRow] = {
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val scanner = createScanner(lIter, rIter)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      new Iterator[InternalRow] {
        override def hasNext: Boolean = scanner.advance()
        override def next(): InternalRow =
          resultProj(joined(scanner.curLeft, scanner.curRight))
      }
    }
  }

  // ---- whole-stage codegen: the merge stays in AsOfScanner (compiled
  // once, identical to the interpreted path); the generated code fuses
  // the CONSUMPTION side — downstream project/filter/aggregate read the
  // scanner's rows directly, no per-row UnsafeRow materialization or
  // iterator hop at the operator boundary (SortMergeJoin's pattern).

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // scanner rows are reused buffers (curLeft aliases the child iterator's
  // row; curRight may alias rHead) — downstream buffering operators must
  // copy, exactly like SortMergeJoin
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val thisPlan = ctx.addReferenceObj("plan", this)
    val scanner = ctx.addMutableState("graft.plans.AsOfScanner", "asofScanner",
      v => s"$v = ((graft.plans.AsOfJoinExec) $thisPlan).createScanner(inputs[0], inputs[1]);",
      forceInline = true)
    val leftRow = ctx.addMutableState("InternalRow", "asofLeftRow", forceInline = true)
    val rightRow = ctx.addMutableState("InternalRow", "asofRightRow", forceInline = true)
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      // null-extended on miss → always nullable on the output side
      BoundReference(i, a.dataType, nullable = true).genCode(ctx)
    }
    val leftVarsCode = evaluateVariables(leftVars)
    val rightVarsCode = evaluateVariables(rightVars)
    s"""
       |while ($scanner.advance()) {
       |  $leftRow = $scanner.curLeft();
       |  $rightRow = $scanner.curRight();
       |  $leftVarsCode
       |  $rightVarsCode
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: `AsOf.join(purchases, clicks, "user_id", "ts", "click_ts")`.
  * Column names resolve against each side (alias the right side's columns
  * to fresh names first — that also guarantees distinct expression ids
  * on a self-join). Idempotently installs the planner strategy on the
  * session. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      key: String, leftTimeCol: String, rightKey: String, rightTimeCol: String,
      toleranceUs: Option[Long] = None, forward: Boolean = false,
      nearest: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    require(attr(lPlan, leftTimeCol).dataType == attr(rPlan, rightTimeCol).dataType,
      "as-of join: time columns must share a type")
    // mismatched key types (e.g. INT vs BIGINT) hash-partition differently per
    // side and the interpreted key ordering would CCE at runtime — fail at
    // analysis time instead
    require(attr(lPlan, key).dataType == attr(rPlan, rightKey).dataType,
      "as-of join: key columns must share a type")
    require(!(forward && nearest), "nearest implies both directions; do not combine with forward")
    require((toleranceUs.isEmpty && !nearest) ||
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.TimestampType,
        org.apache.spark.sql.types.LongType).contains(attr(lPlan, leftTimeCol).dataType),
      "as-of tolerance requires timestamp or long time columns")
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, rightKey),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), toleranceUs, forward, nearest)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
