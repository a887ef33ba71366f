package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Input-size introspection for scale-adaptive plans (dup_span's
  * scratch-budgeted bucketing, sink_sorted_runs' run sizing derive
  * their constants from input bytes, not fixed counts — a fixed count
  * is a scale bug).
  *
  * Each file's FileSystem is resolved FROM ITS OWN PATH — a single
  * `FileSystem.get(conf)` (the default FS) throws "Wrong FS" the moment
  * inputs live on a non-default scheme (s3a:// inputs under an
  * hdfs-default cluster, or local test files under an s3a default),
  * which is exactly the 100 TB deployment this sizing exists for.
  */
object Inputs {

  /** Total on-disk bytes of `df`'s input files (0 for non-file plans). */
  def bytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }
}
