package graft.udx

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer/output carrier: candidate keys with their residual counts. */
final case class MGBuf(keys: Map[Long, Long])

/** Mergeable Misra–Gries heavy-hitters summary (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — public algorithm).
  *
  * Guarantee: after summarizing n rows with k counters, every key whose
  * true frequency exceeds n/(k+1) is present in the buffer (its residual
  * count underestimates by at most n/(k+1)). The summary is fully
  * mergeable — merge = pointwise sum, then subtract the (k+1)-th largest
  * count from all and drop non-positives — so Spark's partial/final
  * aggregation gives the identical candidate set at ANY partitioning.
  *
  * Why this matters at 100 TB: an exact `groupBy(key).count` over a
  * high-cardinality key shuffles one row per DISTINCT key; the MG pass
  * reduces each input partition to ≤ k counters before the exchange, so
  * finding the heavy candidates costs a k-row shuffle no matter how many
  * distinct keys exist. Callers then confirm candidates EXACTLY with one
  * broadcast semi-join pass — the sketch can only widen the candidate
  * set, never lose a true heavy hitter, so the two-pass result is exact.
  */
object MisraGries {

  final class MG(k: Int) extends Aggregator[Long, MGBuf, MGBuf] {

    // strip to the k largest residuals, subtracting the (k+1)-th largest
    // so the MG error bound (and hence mergeability) is preserved
    private def shrink(m: Map[Long, Long]): Map[Long, Long] =
      if (m.size <= k) m
      else {
        val cut = m.values.toSeq.sortBy(-_)(Ordering.Long).apply(k)
        m.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(b: MGBuf, key: Long): MGBuf = {
      val m = b.keys
      if (m.contains(key)) MGBuf(m.updated(key, m(key) + 1L))
      else if (m.size < k) MGBuf(m.updated(key, 1L))
      else MGBuf(m.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None })
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val sum = b.keys.foldLeft(a.keys) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      MGBuf(shrink(sum))
    }

    override def finish(b: MGBuf): MGBuf = b
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** mg(k)(key): struct<keys: map<long,long>> — candidate heavy keys
    * with residual (under-counted) frequencies. */
  def mg(k: Int)(key: Column): Column = udaf(new MG(k)).apply(key)
}
