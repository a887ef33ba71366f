package graft.census

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Dependency-free ESRI shapefile codec (the TIGER/Line container:
  * `upstream:censuspgsql/tiger2pgsql.py` pipes these through
  * `shp2pgsql`; here the decode is native JVM so a Spark job can scan
  * county files directly — no child processes, no PostGIS).
  *
  * Format per the ESRI Shapefile Technical Description (public spec):
  * `.shp` = 100-byte header (big-endian file code 9994 + little-endian
  * shape type + bbox) then records of [BE record#, BE content words,
  * LE shape body]; `.dbf` = dBase III fixed-width attribute table.
  * Shape types supported: 1 (Point), 3 (PolyLine), 5 (Polygon) — the
  * three TIGER ships (points, edges, faces). The writer exists for
  * fixtures and round-trip grading; real TIGER inputs arrive as files.
  */
object Shapefile {

  /** dBase III field descriptor. `ftype`: 'C' text, 'N' numeric. */
  final case class Field(name: String, ftype: Char, length: Int, decimals: Int = 0)

  /** One decoded shape record: ring/part start offsets into the
    * coordinate arrays, plus the record's .dbf attribute row. */
  final case class ShpRecord(
      recNo: Int, shapeType: Int, parts: Array[Int],
      xs: Array[Double], ys: Array[Double], attrs: Map[String, String])

  // ------------------------------------------------------------- writer

  /** Writes a .shp/.dbf pair. `rows` = (shapeType, partOffsets, xs, ys,
    * attrValues aligned with `fields`). Fixture-scale scaffolding: runs
    * on the driver, one pair per call — parallelism at read time comes
    * from MANY pairs (TIGER's per-county layout), not from one file. */
  def write(pathNoExt: String, fields: Seq[Field],
            rows: Seq[(Int, Array[Int], Array[Double], Array[Double], Seq[String])]): Unit = {
    require(fields.forall(f => f.name.length <= 10), "dBase field names cap at 10 chars")
    // ---- .shp
    val bodies = rows.zipWithIndex.map { case ((st, parts, xs, ys, _), i) =>
      val content = st match {
        case 1 =>
          val b = alloc(4 + 16)
          b.putInt(1).putDouble(xs(0)).putDouble(ys(0)); b.array()
        case 3 | 5 =>
          val b = alloc(4 + 32 + 8 + 4 * parts.length + 16 * xs.length)
          b.putInt(st)
          b.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
          b.putInt(parts.length).putInt(xs.length)
          parts.foreach(b.putInt)
          (0 until xs.length).foreach(j => b.putDouble(xs(j)).putDouble(ys(j)))
          b.array()
        case other => throw new IllegalArgumentException(s"unsupported shape type $other")
      }
      val rec = ByteBuffer.allocate(8 + content.length).order(ByteOrder.BIG_ENDIAN)
      rec.putInt(i + 1).putInt(content.length / 2).put(content)
      rec.array()
    }
    val fileBytes = 100 + bodies.map(_.length).sum
    val hdr = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
    hdr.putInt(9994); (0 until 5).foreach(_ => hdr.putInt(0))
    hdr.putInt(fileBytes / 2)
    hdr.order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(1000).putInt(rows.headOption.map(_._1).getOrElse(0))
    val (axs, ays) = (rows.flatMap(_._3), rows.flatMap(_._4))
    hdr.putDouble(if (axs.isEmpty) 0 else axs.min).putDouble(if (ays.isEmpty) 0 else ays.min)
    hdr.putDouble(if (axs.isEmpty) 0 else axs.max).putDouble(if (ays.isEmpty) 0 else ays.max)
    hdr.putDouble(0).putDouble(0).putDouble(0).putDouble(0)
    Files.write(Paths.get(pathNoExt + ".shp"),
      hdr.array() ++ bodies.flatten.toArray)
    // ---- .dbf (version 0x03; fixed date so bytes are deterministic)
    val recSize = 1 + fields.map(_.length).sum
    val hdrSize = 32 + 32 * fields.length + 1
    val d = ByteBuffer.allocate(hdrSize + recSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    d.put(0x03.toByte).put(26.toByte).put(1.toByte).put(1.toByte)
    d.putInt(rows.length).putShort(hdrSize.toShort).putShort(recSize.toShort)
    d.position(d.position() + 20)
    fields.foreach { f =>
      val name = f.name.getBytes("US-ASCII").padTo(11, 0.toByte)
      d.put(name).put(f.ftype.toByte)
      d.position(d.position() + 4)
      d.put(f.length.toByte).put(f.decimals.toByte)
      d.position(d.position() + 14)
    }
    d.put(0x0D.toByte)
    rows.foreach { case (_, _, _, _, vals) =>
      d.put(0x20.toByte) // not-deleted flag
      fields.zip(vals).foreach { case (f, v) =>
        require(v.length <= f.length, s"value '$v' overflows ${f.name}(${f.length})")
        val bytes = f.ftype match {
          case 'N' => (" " * (f.length - v.length) + v).getBytes("US-ASCII")
          case _   => (v + " " * (f.length - v.length)).getBytes("US-ASCII")
        }
        d.put(bytes)
      }
    }
    d.put(0x1A.toByte)
    Files.write(Paths.get(pathNoExt + ".dbf"), d.array())
  }

  private def alloc(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  // ------------------------------------------------------------- reader

  /** Decodes one .shp/.dbf pair already read into memory (the task-side
    * entry point: executors read the byte arrays, never the driver). */
  def readPair(shp: Array[Byte], dbf: Array[Byte]): Seq[ShpRecord] = {
    val attrs = readDbf(dbf)
    val b = ByteBuffer.wrap(shp).order(ByteOrder.BIG_ENDIAN)
    require(b.getInt(0) == 9994, s"not a shapefile: code ${b.getInt(0)}")
    val fileBytes = b.getInt(24) * 2
    var off = 100
    val out = Seq.newBuilder[ShpRecord]
    var i = 0
    while (off + 8 <= math.min(fileBytes, shp.length)) {
      b.order(ByteOrder.BIG_ENDIAN)
      val recNo = b.getInt(off)
      val contentBytes = b.getInt(off + 4) * 2
      b.order(ByteOrder.LITTLE_ENDIAN)
      val st = b.getInt(off + 8)
      val rec = st match {
        case 0 => // null shape
          ShpRecord(recNo, 0, Array.empty, Array.empty, Array.empty, attr(attrs, i))
        case 1 =>
          ShpRecord(recNo, 1, Array(0),
            Array(b.getDouble(off + 12)), Array(b.getDouble(off + 20)), attr(attrs, i))
        case 3 | 5 =>
          val nParts = b.getInt(off + 44)
          val nPoints = b.getInt(off + 48)
          val parts = Array.tabulate(nParts)(p => b.getInt(off + 52 + 4 * p))
          val pts = off + 52 + 4 * nParts
          val xs = Array.tabulate(nPoints)(p => b.getDouble(pts + 16 * p))
          val ys = Array.tabulate(nPoints)(p => b.getDouble(pts + 16 * p + 8))
          ShpRecord(recNo, st, parts, xs, ys, attr(attrs, i))
        case other => throw new IllegalArgumentException(s"unsupported shape type $other")
      }
      out += rec
      off += 8 + contentBytes
      i += 1
    }
    out.result()
  }

  private def attr(rows: IndexedSeq[Map[String, String]], i: Int): Map[String, String] =
    if (i < rows.length) rows(i) else Map.empty

  /** dBase III decode: header → field descriptors → fixed-width rows.
    * 'C' values right-trimmed, 'N' values fully trimmed; deleted rows
    * (flag 0x2A) are skipped, matching shp2pgsql. */
  def readDbf(dbf: Array[Byte]): IndexedSeq[Map[String, String]] = {
    if (dbf.length < 33) return Vector.empty // no header → attribute-less scan
    val b = ByteBuffer.wrap(dbf).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = b.getInt(4)
    val hdrSize = b.getShort(8) & 0xFFFF
    val recSize = b.getShort(10) & 0xFFFF
    val fields = Iterator.from(0).map(32 + _ * 32)
      .takeWhile(p => p < hdrSize - 1 && dbf(p) != 0x0D)
      .map { p =>
        val raw = new String(dbf, p, 11, "US-ASCII")
        val name = raw.takeWhile(c => c != 0.toChar && c != ' ').trim
        Field(name, dbf(p + 11).toChar, dbf(p + 16) & 0xFF, dbf(p + 17) & 0xFF)
      }.toVector
    (0 until nRec).flatMap { r =>
      val base = hdrSize + r * recSize
      if (dbf(base) != 0x20) None // deleted
      else {
        var off = base + 1
        Some(fields.map { f =>
          val v = new String(dbf, off, f.length, "US-ASCII")
          off += f.length
          f.name -> (if (f.ftype == 'N') v.trim else v.replaceAll("\\s+$", ""))
        }.toMap)
      }
    }
  }
}
