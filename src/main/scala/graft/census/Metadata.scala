package graft.census

import org.apache.spark.sql.types._

/** ACS Summary File metadata: parse the Census lookup file and derive
  * table schemas from it (SURVEY §2.A A3/A4; the reference builds its
  * whole Postgres schema this way —
  * upstream:censuspgsql/acs2pgsql.py, metadata section).
  *
  * Lookup file layout (published ACS spec,
  * `ACS_{span}yr_Seq_Table_Number_Lookup.txt`): CSV with header
  * `File ID, Table ID, Sequence Number, Line Number, Start Position,
  * Total Cells in Table, Total Cells in Sequence, Table Title, Subject Area`.
  * Row kinds:
  *  - blank line number + non-blank "Total Cells in Table" → table
  *    header (start position, cell count like "2 CELLS.", title);
  *  - fractional line number (0.5) → universe metadata, not a cell;
  *  - integer line number → one cell, title = cell label.
  */
final case class CellMeta(line: Int, title: String)

final case class TableMeta(
    tableId: String,
    sequence: Int,
    startPos: Int,
    cells: Int,
    title: String,
    universe: String,
    subject: String,
    cellTitles: Seq[CellMeta]) {

  /** Column name for cell `line`, reference-style: b01001 line 1 →
    * `b01001001`. */
  def cellName(line: Int): String = f"${tableId.toLowerCase}$line%03d"

  /** Engine schema: (stusab, logrecno, one double per cell). */
  def schema: StructType = StructType(
    StructField("stusab", StringType, nullable = false) ::
      StructField("logrecno", IntegerType, nullable = false) ::
      (1 to cells).map(i => StructField(cellName(i), DoubleType, nullable = true)).toList)
}

object Metadata {

  /** Minimal CSV field splitter handling quoted fields with commas —
    * lookup titles contain commas ("POPULATION, TOTAL"). */
  private[census] def splitCsv(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == ',' && !inQ) { out += sb.toString; sb.clear() }
      else sb += c
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** Parse lookup-file content → table metas keyed by table id, in file
    * order. Pure function of the text: no I/O, no Spark. */
  def parseLookup(lines: Iterator[String]): Seq[TableMeta] = {
    val rows = lines.drop(1).map(splitCsv).filter(_.length >= 8).toSeq
    val out = scala.collection.mutable.LinkedHashMap.empty[String, TableMeta]
    rows.foreach { f =>
      val tableId = f(1).trim
      val seq = f(2).trim.toInt
      val lineNo = f(3).trim
      val startPos = f(4).trim
      val cellsInTable = f(5).trim
      val title = f(7).trim
      if (lineNo.isEmpty && cellsInTable.nonEmpty) {
        val nCells = cellsInTable.takeWhile(_.isDigit).toInt
        out(tableId) = TableMeta(tableId, seq, startPos.toInt, nCells, title,
          universe = "", subject = if (f.length > 8) f(8).trim else "", cellTitles = Nil)
      } else if (lineNo.nonEmpty && lineNo.contains(".")) {
        // fractional line (0.5): universe string, not a cell
        out.get(tableId).foreach(t => out(tableId) = t.copy(universe = title))
      } else if (lineNo.nonEmpty) {
        out.get(tableId).foreach(t =>
          out(tableId) = t.copy(cellTitles = t.cellTitles :+ CellMeta(lineNo.toInt, title)))
      }
    }
    out.values.toSeq
  }

  /** Geoheader schema (declared subset of the ~50-column ACS layout —
    * the reference declares the full layout the same way, never
    * inferring; upstream:censuspgsql/acs2pgsql.py::create_geoheader). */
  val geoheaderSchema: StructType = StructType(Seq(
    StructField("fileid", StringType),
    StructField("stusab", StringType),
    StructField("sumlevel", StringType),
    StructField("component", StringType),
    StructField("logrecno", IntegerType),
    StructField("geoid", StringType),
    StructField("name", StringType)))

  /** Sequence-file schema for a given sequence: the 6 fixed header
    * fields then every cell of every table in the sequence, in
    * (startPos) order — cells are read as STRINGS because the Census
    * files use both '' and '.' for NULL (coerced later, A8). */
  def sequenceSchema(metas: Seq[TableMeta]): StructType = {
    val header = Seq(
      StructField("fileid", StringType),
      StructField("filetype", StringType),
      StructField("stusab", StringType),
      StructField("chariter", StringType),
      StructField("sequence", IntegerType),
      StructField("logrecno", IntegerType))
    val cells = metas.sortBy(_.startPos)
      .flatMap(m => (1 to m.cells).map(i => StructField(m.cellName(i), StringType)))
    StructType(header ++ cells)
  }
}
