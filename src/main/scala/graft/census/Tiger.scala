package graft.census

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed TIGER/Line-style shapefile scan: the Spark counterpart
  * of `upstream:censuspgsql/tiger2pgsql.py`'s `shp2pgsql | psql`
  * pipeline. TIGER ships one .shp/.dbf pair per county — thousands of
  * pairs per vintage — so the natural parallel unit is the PAIR: one
  * task decodes one pair, and a 1000-executor cluster decodes 1000
  * counties at once. No single file is ever split (shapefile records
  * are variable-length and back-to-back; the format has no sync
  * markers), which is also why the driver never touches file contents
  * here — tasks read bytes from the shared filesystem themselves. */
object Tiger {

  /** Scans every .shp (+ sibling .dbf) under `dir` into a DataFrame of
    * decoded shape records: geometry as coordinate arrays + part
    * offsets, attributes as a map. Wrap-up projections (WKT, bbox,
    * centroid) stay in Spark SQL on top of this. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".shp")).map(_.getPath).sorted.toSeq
    spark.sparkContext
      .parallelize(pairs, math.max(pairs.size, 1))
      .flatMap { shpPath =>
        val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(shpPath))
        val dbfPath = shpPath.stripSuffix(".shp") + ".dbf"
        val dbf =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(dbfPath)))
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dbfPath))
          else Array.empty[Byte]
        val file = shpPath.substring(shpPath.lastIndexOf('/') + 1)
        Shapefile.readPair(shp, dbf).map { r =>
          (file, r.recNo, r.shapeType, r.parts, r.xs, r.ys, r.attrs)
        }
      }
      .toDF("file", "rec_no", "shape_type", "parts", "xs", "ys", "attrs")
  }
}
