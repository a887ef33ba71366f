package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

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

object IntervalJoinExec {
  /** Max band rows held on-heap per partition before the buffer spills a
    * segment to local disk. Bounds executor memory at (cap × row size)
    * per task regardless of band occupancy — the one-hot-key hazard at
    * 100 TB (every right row of one key landing inside one window). */
  val BandBufferRowsKey = "spark.graft.interval.bandBufferRows"
  val BandBufferRowsDefault = 1 << 20

  /** Process-wide spill telemetry (test- and debug-visible; local mode
    * shares the JVM so a plain adder is observable from the driver). */
  val spilledSegments = new java.util.concurrent.atomic.LongAdder
}

/** Disk-backed sliding band: an on-heap deque of the newest rows plus a
  * chain of immutable spilled segments (oldest first). Rights arrive in
  * time order, so every segment covers a contiguous time range; a
  * segment is reclaimed wholesale once its max time falls behind the
  * band start, and emission filters `time >= t` per segment read.
  * Disk traffic is proportional to emitted output (every surviving
  * spilled row is about to be joined with the current left), so the
  * spill path changes the memory bound, not the asymptotic cost. */
private final class BandBuffer(numFields: Int, limit: Int) {
  private val mem = new java.util.ArrayDeque[(Long, UnsafeRow)]()
  private var segments: List[BandSegment] = Nil // oldest first
  private val writeBuffer = new Array[Byte](4096)

  def add(time: Long, row: UnsafeRow): Unit = {
    if (mem.size >= limit) spill()
    mem.addLast((time, row))
  }

  private def spill(): Unit = {
    val f = java.io.File.createTempFile("graft-interval-band", ".bin")
    f.deleteOnExit()
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
    var maxT = Long.MinValue
    var n = 0
    val it = mem.iterator()
    while (it.hasNext) {
      val (t, r) = it.next()
      out.writeLong(t)
      out.writeInt(r.getSizeInBytes)
      r.writeToStream(out, writeBuffer)
      if (t > maxT) maxT = t
      n += 1
    }
    out.close()
    segments = segments :+ new BandSegment(f, maxT, n)
    mem.clear()
    IntervalJoinExec.spilledSegments.increment()
  }

  /** Drop rows/segments whose time fell behind the band start `t`. */
  def evictBelow(t: Long): Unit = {
    while (!mem.isEmpty && mem.peekFirst()._1 < t) mem.removeFirst()
    val (dead, live) = segments.partition(_.maxTime < t)
    dead.foreach(_.file.delete())
    segments = live
  }

  def nonEmpty: Boolean = !mem.isEmpty || segments.nonEmpty

  /** All band rows with time ≥ t, oldest first. Buffered rows never
    * exceed t + w (times are pulled in nondecreasing left order), so
    * only the lower bound needs filtering. */
  def iterator(t: Long): Iterator[InternalRow] = {
    val memIt = { // mem is already evicted below t
      val it = mem.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = it.next()._2
      }
    }
    if (segments.isEmpty) memIt // fast path: no spill, zero overhead
    else segments.iterator.flatMap(_.read(numFields, t)) ++ memIt
  }

  def clear(): Unit = {
    mem.clear()
    segments.foreach(_.file.delete())
    segments = Nil
  }
}

private final class BandSegment(val file: java.io.File, val maxTime: Long, val count: Int) {
  /** Stream the segment's rows with time ≥ t (arrival = time order). */
  def read(numFields: Int, t: Long): Iterator[InternalRow] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(file), 1 << 16))
    var remaining = count
    new Iterator[InternalRow] {
      private var nextRow: InternalRow = null
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && remaining > 0) {
          val time = in.readLong()
          val size = in.readInt()
          val bytes = new Array[Byte](size)
          in.readFully(bytes)
          remaining -= 1
          if (time >= t) {
            val row = new UnsafeRow(numFields)
            row.pointTo(bytes, size)
            nextRow = row
          }
        }
        if (nextRow == null) in.close()
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = { val r = nextRow; advance(); r }
    }
  }
}

/** Per-partition sliding-band state machine for [[IntervalJoinExec]] —
  * single source of truth for interval semantics, shared by the
  * interpreted `doExecute` and the whole-stage-codegen path (same
  * contract as [[AsOfScanner]]: the generated loop calls `advance()`
  * and reads `curLeft`/`curRight`). */
final class IntervalScanner(
    lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
    lkB: Expression, ltB: Expression, rkB: Expression, rtB: Expression,
    keyOrd: Ordering[Any], w: Long, rOut: Seq[Attribute], bandLimit: Int) {

  // sliding band: COPIED right rows of the current key whose time has
  // not yet fallen behind the current left row; spills to local-disk
  // segments past `bandLimit` rows (one-hot-key guard)
  private val buf = new BandBuffer(rOut.length, bandLimit)
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit](_ => buf.clear()))
  // sorted-shuffle output rows are UnsafeRows already; this projection
  // only fires if a future child breaks that, keeping the spill codec
  // (UnsafeRow.writeToStream) universally applicable
  private val rToUnsafe = UnsafeProjection.create(rOut, rOut)

  private var bufKey: Any = null
  private var rHead: InternalRow = null
  private var rHeadKey: Any = null
  private var pending: Iterator[InternalRow] = null

  var curLeft: InternalRow = null
  var curRight: InternalRow = null

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
              val u = rHead match {
                case ur: UnsafeRow => ur.copy()
                case other => rToUnsafe(other).copy()
              }
              buf.add(rtB.eval(rHead).asInstanceOf[Long], u)
              rHead = null
            } else continue = false // beyond band or later key
          }
        }
        // evict rights that fell behind the band start
        buf.evictBelow(t)
        if (buf.nonEmpty) pending = buf.iterator(t)
      }
      // null key/time or empty band: inner join → left row drops
    }
    if (pending == null) curLeft = null // exhausted
  }

  def advance(): Boolean = {
    while ((pending == null || !pending.hasNext) && lIter.hasNext) advanceLeft()
    if (pending != null && pending.hasNext) { curRight = pending.next(); true }
    else false
  }
}

final case class IntervalJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    windowUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Shared by both execution paths (and called from generated Java). */
  def createScanner(lIter: Iterator[InternalRow], rIter: Iterator[InternalRow]): IntervalScanner = {
    val bandLimit = conf.getConfString(
      IntervalJoinExec.BandBufferRowsKey,
      IntervalJoinExec.BandBufferRowsDefault.toString).toInt
    new IntervalScanner(
      lIter, rIter,
      BindReferences.bindReference(leftKey, left.output),
      BindReferences.bindReference(leftTime, left.output),
      BindReferences.bindReference(rightKey, right.output),
      BindReferences.bindReference(rightTime, right.output),
      TypeUtils.getInterpretedOrdering(leftKey.dataType),
      windowUs, right.output, bandLimit)
  }

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

  // ---- whole-stage codegen (see AsOfJoinExec: scanner stays compiled,
  // consumption side fuses into the downstream generated stage)

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val thisPlan = ctx.addReferenceObj("plan", this)
    val scanner = ctx.addMutableState("graft.plans.IntervalScanner", "intervalScanner",
      v => s"$v = ((graft.plans.IntervalJoinExec) $thisPlan).createScanner(inputs[0], inputs[1]);",
      forceInline = true)
    val leftRow = ctx.addMutableState("InternalRow", "intervalLeftRow", forceInline = true)
    val rightRow = ctx.addMutableState("InternalRow", "intervalRightRow", forceInline = true)
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
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
