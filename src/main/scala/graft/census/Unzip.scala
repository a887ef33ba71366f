package graft.census

import java.io.File

/** A2 — archive extraction (upstream acs2pgsql.py::extract_acs_data,
  * reconstructed: the reference unzips each downloaded per-state ACS
  * summary-file archive into its working directory before loading).
  *
  * This is deliberately DRIVER-side, like the reference's
  * `zipfile.ZipFile(...).extractall`: the archive inventory is tiny
  * (one zip per state × span — dozens, not millions), each expands to
  * the g/e/m text files the DISTRIBUTED ingest then scans, and a local
  * filesystem stage is exactly where a non-splittable container format
  * belongs. At cluster scale the same call runs on an edge node (or
  * the zips land pre-extracted in object storage); the Spark-side scan
  * is unchanged either way. Zero egress in this sandbox means archives
  * arrive out-of-band; `IngestCli --zip-dir` stages them through here.
  */
object Unzip {

  /** Extract every entry of `zip` under `dest`; returns the extracted
    * file names. Guards against zip-slip (an entry path that escapes
    * `dest` — archives are UNTRUSTED inputs). */
  def extractAll(zip: File, dest: File): Seq[String] = {
    dest.mkdirs()
    val zf = new java.util.zip.ZipFile(zip)
    try {
      val out = scala.collection.mutable.Buffer.empty[String]
      val es = zf.entries()
      while (es.hasMoreElements) {
        val e = es.nextElement()
        val target = new File(dest, e.getName)
        require(
          target.getCanonicalPath.startsWith(dest.getCanonicalPath + File.separator),
          s"zip entry escapes extraction dir: ${e.getName}")
        if (e.isDirectory) target.mkdirs()
        else {
          Option(target.getParentFile).foreach(_.mkdirs())
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          out += e.getName
        }
      }
      out.toSeq
    } finally zf.close()
  }

  /** Stage every `*.zip` in `zipDir` into a fresh temp data dir and
    * return its path — the A2 step of the CLI pipeline. */
  def stageZipDir(zipDir: String): String = {
    val zips = Option(new File(zipDir).listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.toLowerCase.endsWith(".zip")).sortBy(_.getName)
    require(zips.nonEmpty, s"--zip-dir $zipDir holds no .zip archives")
    val tmp = java.nio.file.Files.createTempDirectory("acs_unzip").toFile
    zips.foreach(z => extractAll(z, tmp))
    tmp.getAbsolutePath
  }
}
