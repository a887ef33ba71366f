package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

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

final case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long], forward: Boolean, nearest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkB = BindReferences.bindReference(leftKey, lOut)
      val ltB = BindReferences.bindReference(leftTime, lOut)
      val rkB = BindReferences.bindReference(rightKey, rOut)
      val rtB = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      // O(1) merge state: the next unconsumed right row (with its key),
      // and the best match so far for the current left key
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var best: InternalRow = null
      var bestKey: Any = null
      var bestTime: Long = 0L
      // tolerance/nearest need numeric time arithmetic; timestamps are
      // Long micros internally, so -1 (disabled) vs a bound in µs
      val tol: Long = toleranceUs.getOrElse(-1L)
      val needTime = tol >= 0 || nearest
      lIter.map { l =>
        val k = lkB.eval(l)
        val t = ltB.eval(l)
        if (k == null || t == null) resultProj(joined(l, nullRight))
        else {
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
          if (forward) {
            // PEEK, don't consume: the same right row may be the "next
            // at-or-after" for several left rows of this key
            val m = rHead != null && keyOrd.compare(rHeadKey, k) == 0 && {
              val rt = rtB.eval(rHead)
              timeOrd.compare(rt, t) >= 0 &&
                (tol < 0 || rt.asInstanceOf[Long] - t.asInstanceOf[Long] <= tol)
            }
            if (m) resultProj(joined(l, rHead)) else resultProj(joined(l, nullRight))
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
              if (useBack) resultProj(joined(l, best))
              else resultProj(joined(l, rHead))
            } else resultProj(joined(l, nullRight))
          } else {
            // the greatest right time ≤ t is the only candidate: if IT
            // violates the tolerance, every earlier one does too → null
            val withinTol = tol < 0 || (best != null &&
              t.asInstanceOf[Long] - bestTime <= tol)
            if (best != null && withinTol && keyOrd.compare(bestKey, k) == 0)
              resultProj(joined(l, best))
            else resultProj(joined(l, nullRight))
          }
        }
      }
    }
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
