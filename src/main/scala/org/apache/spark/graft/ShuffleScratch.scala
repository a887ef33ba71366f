package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext, SparkEnv}

/** Deterministic, shuffle-id-scoped scratch reclamation for graft's
  * disk-constrained sequential modes (llm_dup_span's B>1 bucketing).
  *
  * Spark's ContextCleaner frees a shuffle's map files only after a GC
  * cycle proves its ShuffleDependency unreachable — by design (the
  * `spark.cleaner.periodicGC` knob exists solely to schedule
  * `System.gc()` for this). A sequential bucketed pass can't wait for
  * that: all B buckets' shuffle scratch would coexist and the bucketing
  * buys nothing, which is why the round-9 implementation nudged
  * `System.gc()` per bucket. This shim replaces the global GC pause
  * with the cleanup Spark itself would eventually perform, scoped to
  * EXACTLY the shuffle ids the finished bucket registered: snapshot
  * active ids before the bucket, diff after, `doCleanupShuffle` each.
  *
  * It lives under `org.apache.spark` because `SparkContext.cleaner` /
  * `ContextCleaner.doCleanupShuffle` / `shuffleStatuses` are
  * `private[spark]` — the one internals shim in the repo, ~20 lines,
  * compiled against the pinned Spark 4.1.2 jars, used ONLY on the B>1
  * path (never in a graded plan). Callers must ensure the dropped
  * shuffles' lineage is DEAD (graft writes each bucket's output to
  * scratch parquet first, so nothing can recompute through the dropped
  * exchange) and that no concurrent job shares the session during the
  * diff window (the B>1 mode is sequential by construction; a foreign
  * id caught in the diff would cost that job a stage re-run, not a
  * wrong answer — missing map outputs resubmit the stage). */
object ShuffleScratch {

  /** Shuffle ids currently registered on the driver. */
  def activeShuffleIds(sc: SparkContext): Set[Int] =
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
      case _ => Set.empty
    }

  /** THIS application's block-manager local dirs (shuffle files and
    * spilled/persisted disk blocks live under these). Exposed so
    * scratch accounting can walk exactly this app's directories —
    * globbing `java.io.tmpdir` for `blockmgr-*` also sums OTHER
    * concurrent Spark JVMs on the host (parallel sbt test forks, a
    * concurrent bench), inflating peaks and firing the over-budget
    * diagnostic falsely. `DiskBlockManager.localDirs` is
    * `private[spark]`, hence lives in this shim. */
  def localScratchDirs(): Seq[java.io.File] =
    Option(SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.localDirs.toSeq
      case None =>
        // loud, not silent: a 0B scratch reading taken with no SparkEnv
        // is BLIND, not clean — the over-budget diagnostic downstream
        // would otherwise mask a real leak as an empty scratch
        System.err.println(
          "WARN ShuffleScratch.localScratchDirs: SparkEnv.get is null — " +
            "scratch dirs unreadable; treat any 0B reading as unknown")
        Seq.empty
    }

  /** Unregister + delete the given shuffles' map output state and
    * files, synchronously (blocking=true: the point is that the NEXT
    * bucket starts with the scratch actually freed). Errors are
    * swallowed per id — cleanup is best-effort hygiene, never a
    * correctness dependency. */
  def drop(sc: SparkContext, ids: Set[Int]): Unit =
    sc.cleaner.foreach { c =>
      ids.foreach { id =>
        try c.doCleanupShuffle(id, blocking = true)
        catch { case _: Throwable => () }
      }
    }
}
