package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Banded INTERVAL JOIN as a whole operator (the second custom-Catalyst
  * operator next to [[AsOfJoin]]): emit every (left, right) pair with the
  * same key and right_time ∈ [left_time, left_time + windowUs].
  *
  * Why it exists: Spark plans a time-band predicate either as a range
  * self-join (BroadcastNestedLoopJoin — quadratic) or via the bucketed
  * explode trick (`join_range_bucket` — fan-out = band width in buckets).
  * This exec shuffles each side ONCE on the key, sorts by (key, time),
  * and merges with a sliding buffer holding only the right rows inside
  * the CURRENT band — memory bounded by band occupancy, exactly the
  * state bound the streaming interval join gets from its watermark, now
  * available to batch. */
final case class IntervalJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    windowUs: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, rt, w) =>
      IntervalJoinExec(lk, rk, lt, rt, w, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class IntervalJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    windowUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val w = windowUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkB = BindReferences.bindReference(leftKey, lOut)
      val ltB = BindReferences.bindReference(leftTime, lOut)
      val rkB = BindReferences.bindReference(rightKey, rOut)
      val rtB = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // sliding band state: COPIED right rows of the current key whose
        // time has not yet fallen behind the current left row
        private val buf = new java.util.ArrayDeque[(Long, InternalRow)]()
        private var bufKey: Any = null
        private var rHead: InternalRow = null
        private var rHeadKey: Any = null
        // pending emissions for the current left row
        private var pending: java.util.Iterator[(Long, InternalRow)] = null
        private var curLeft: InternalRow = null

        private def advanceLeft(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            curLeft = lIter.next()
            val k = lkB.eval(curLeft)
            val tAny = ltB.eval(curLeft)
            if (k != null && tAny != null) {
              val t = tAny.asInstanceOf[Long]
              // new key → band state resets
              if (bufKey == null || keyOrd.compare(bufKey, k) != 0) { buf.clear(); bufKey = k }
              // pull rights into the band up to t + w
              var continue = true
              while (continue) {
                if (rHead == null) {
                  if (rIter.hasNext) {
                    rHead = rIter.next()
                    rHeadKey = rkB.eval(rHead)
                    if (rHeadKey == null || rtB.eval(rHead) == null) rHead = null
                  } else continue = false
                }
                if (rHead != null) {
                  val c = keyOrd.compare(rHeadKey, k)
                  if (c < 0) rHead = null // earlier key: dead, lefts are past it
                  else if (c == 0 && rtB.eval(rHead).asInstanceOf[Long] <= t + w) {
                    buf.addLast((rtB.eval(rHead).asInstanceOf[Long], rHead.copy()))
                    rHead = null
                  } else continue = false // beyond band or later key
                }
              }
              // evict rights that fell behind the band start
              while (!buf.isEmpty && buf.peekFirst()._1 < t) buf.removeFirst()
              if (!buf.isEmpty) pending = buf.iterator()
            }
            // null key/time or empty band: inner join → left row drops
          }
          if (pending == null) curLeft = null // exhausted
        }

        override def hasNext: Boolean = {
          while ((pending == null || !pending.hasNext) && lIter.hasNext) advanceLeft()
          pending != null && pending.hasNext
        }

        override def next(): InternalRow =
          resultProj(joined(curLeft, pending.next()._2))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry, same conventions as [[AsOf.join]]. */
object IntervalJoinApi {
  def join(left: DataFrame, right: DataFrame,
      key: String, leftTimeCol: String, rightKey: String, rightTimeCol: String,
      windowUs: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        IntervalJoinStrategy +: spark.experimental.extraStrategies
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"interval join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    require(attr(lPlan, leftTimeCol).dataType == attr(rPlan, rightTimeCol).dataType,
      "interval join: time columns must share a type")
    // same rationale as AsOf.join: catch INT-vs-BIGINT key mismatches before
    // they corrupt co-partitioning / throw CCE in the interpreted ordering
    require(attr(lPlan, key).dataType == attr(rPlan, rightKey).dataType,
      "interval join: key columns must share a type")
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.TimestampType,
        org.apache.spark.sql.types.LongType).contains(attr(lPlan, leftTimeCol).dataType),
      "interval join requires timestamp or long time columns")
    val node = IntervalJoin(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, rightKey),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), windowUs)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
