package graft.llm

/** IVF (inverted-file) coarse quantization for ANN — the second scale
  * path next to LSH (`graft.llm.Lsh`).
  *
  * Vectors are assigned to their nearest coarse centroid ("cell"); a
  * probe only scores vectors in its `NProbe` nearest cells, turning the
  * cross join into a cell-key equi-join. Centroids here are a
  * deterministic sample of the corpus (the first `NCells` vector ids) —
  * the zero-iteration stand-in for k-means training, which at 100 TB
  * would run once offline and broadcast its centroid table exactly like
  * this one; the query-side plan is identical either way.
  */
object Ivf {
  val NCells = 16
  val NProbe = 2

  /** Nearest-centroid cell ids for a vector, best-first, by dot-product
    * similarity with deterministic index tiebreak. */
  def nearestCells(v: Array[Double], centroids: Array[Array[Double]], n: Int): Array[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length && j < v.length) { d += c(j) * v(j); j += 1 }
      (d, i)
    }.sortBy { case (d, i) => (-d, i) }.take(n).map(_._2)
}
