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

  /** Native codegen'd dot product over raw `array<float>` columns
    * (graft.udx.FloatDotExpression): the identical left-fold double
    * arithmetic as `dot(toDouble(a), toDouble(b))` — float→double
    * widening is exact — minus the interpreted per-element lambda
    * dispatch (HOFs are CodegenFallback) and the cast pass, and the
    * float arrays are half the bytes of double arrays through every
    * broadcast/shuffle. Requires `graft.udx.NGrams.registerAll` (or the
    * GraftExtensions session extension). */
  def fdot(a: Column, b: Column): Column = call_function("graft_fdot", a, b)

  /** Native codegen'd L2 norm over a raw `array<float>` column — same
    * fold order as `norm(toDouble(v))`. */
  def fnorm(v: Column): Column = call_function("graft_fnorm", v)
}
