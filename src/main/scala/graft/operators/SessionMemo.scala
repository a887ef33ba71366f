package graft.operators

import org.apache.spark.sql.SparkSession

/** Generic (session, key)-scoped memo of family-shared derivations —
  * the `GraphQueries.memoized` convention extracted so the LLM/ANN
  * families can share derived tables the same way the graph family
  * shares its adjacency (round-15 optimization: the HNSW navigable
  * graph, the brute-force truth top-10 and the MinHash signature table
  * were each rebuilt by every consumer query — 2–5 rebuilds per bench
  * pass of byte-identical intermediates).
  *
  * Semantics (identical to the graph-family memo):
  *   - keyed on the LIVE session reference + caller key: entries for
  *     stopped sessions are evicted on every lookup, so dead frames are
  *     never served;
  *   - entries never survive the session — nothing crosses a
  *     bench/verify invocation boundary, every invocation computes from
  *     the parquet inputs;
  *   - cached frames inside entries are registered with [[GraftCaches]]
  *     by their builders, so `SparkEntry.releaseCaches()` (which also
  *     calls [[clear]]) both unpersists the blocks and drops the memo;
  *   - the IMMUTABLE-DIR assumption of `tables.Tables.t` applies: a
  *     host that rewrites inputs in place calls releaseCaches() first.
  *
  * Per-kind build seconds are recorded (the round-15 bench-attribution
  * convention) so artifacts can report where shared-derivation time
  * went instead of aliasing it to whichever query ran first.
  */
object SessionMemo {
  private val memo =
    scala.collection.mutable.HashMap.empty[String, (SparkSession, AnyRef)]
  private val buildSecs = scala.collection.mutable.HashMap.empty[String, Double]

  def buildSeconds: Map[String, Double] = memo.synchronized(buildSecs.toMap)

  def memoized[T <: AnyRef](s: SparkSession, key: String)(build: => T): T =
    memo.synchronized {
      memo.filterInPlace { case (_, (sess, _)) => !sess.sparkContext.isStopped }
      memo.get(key) match {
        case Some((sess, v)) if sess eq s => v.asInstanceOf[T]
        case _ =>
          val t0 = System.nanoTime()
          val v = build
          buildSecs(key) = buildSecs.getOrElse(key, 0.0) + (System.nanoTime() - t0) / 1e9
          memo.put(key, (s, v))
          v
      }
    }

  /** Drop every entry (frames themselves are unpersisted by
    * GraftCaches.releaseAll, which SparkEntry.releaseCaches runs in the
    * same call). */
  def clear(): Unit = memo.synchronized(memo.clear())
}
