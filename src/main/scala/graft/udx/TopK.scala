package graft.udx

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer/output carrier: the k best (score, id) pairs, best-first. */
final case class TopKBuf(items: Seq[(Double, Long)])

/** Bounded top-k aggregate (SURVEY §4.3 P2): keeps the k best
  * (score, id) pairs per group in a fixed-size buffer with map-side
  * partial aggregation.
  *
  * Why this beats `row_number().over(Window.partitionBy(g))` at scale:
  * the window form shuffles EVERY candidate row to its group's partition
  * and sorts the whole group (skew disaster when one probe has 10^9
  * candidates); this aggregate reduces each input partition to ≤ k rows
  * per group before the shuffle, so the exchange carries k·groups rows
  * total and no sort exceeds k elements.
  *
  * Ordering: score descending, id ascending tiebreak — callers pass
  * pre-rounded scores so the order is engine-independent.
  */
object TopKAggregator {

  type Pair = (Double, Long)

  final class TopK(k: Int) extends Aggregator[Pair, TopKBuf, TopKBuf] {
    private def better(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    // buffer kept sorted best-first, length ≤ k; inserting into a ≤ k-
    // element vector is O(k) — k is small by construction.
    private def insert(b: Seq[Pair], in: Pair): Seq[Pair] =
      if (b.length >= k && better(b.last, in)) b
      else {
        val i = b.indexWhere(x => better(in, x)) match { case -1 => b.length; case x => x }
        (b.take(i) :+ in) ++ b.drop(i).take(k - i - 1)
      }

    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, in: Pair): TopKBuf = TopKBuf(insert(b.items, in))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = TopKBuf(b.items.foldLeft(a.items)(insert))
    override def finish(b: TopKBuf): TopKBuf = b
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** topk(k)(score, id): struct<items: array<struct<score,id>>> of the
    * k best pairs, best-first. */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopK(k)).apply(score, id)
}
