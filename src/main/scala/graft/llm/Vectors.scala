package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`transform`/`zip_with`/`aggregate`)
  * — no UDFs, so the arithmetic is identical, sequential, double-precision
  * on every engine (which is what makes the DuckDB oracle hash-match).
  */
object Vectors {

  /** Elementwise cast to double (float32 bits are preserved exactly). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm, same fold order as `dot`. */
  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two pre-cast double vectors given their
    * precomputed norms (precompute per row before any join — at scale
    * this is O(N·d) once instead of O(pairs·d) repeated). */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
