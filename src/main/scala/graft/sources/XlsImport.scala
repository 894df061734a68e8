package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Legacy binary spreadsheet source (SURVEY.md §2.1 S4, last gap): .xls =
 * a BIFF8 record stream inside an OLE2/CFB compound document. The
 * reference accepts XLS/XLSX/ODS alike through roo and converts to CSV
 * first (lib/cartodb-importer/importer.rb:124-140); reproduced here with
 * the same "every cell is a string, then the type lattice runs" contract
 * as XlsxImport — parseXls yields rows of strings, read() re-enters the
 * shared inference tail.
 *
 * Both container layouts are public file-format structure (MS-CFB and
 * MS-XLS specifications): sector FAT chains + directory for the
 * container (including the mini-stream path small files use), and the
 * BOF/SST/LABELSST/LABEL/NUMBER/RK/MULRK/BLANK/MULBLANK/BOOLERR/FORMULA
 * record family for cells, with SST CONTINUE-record splitting (between
 * and mid-string, with the compression flag restated per fragment).
 */
object XlsImport {

  // ------------------------------------------------------------- CFB layer

  private final val FreeSect = 0xFFFFFFFF
  private final val EndOfChain = 0xFFFFFFFE

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Extract the Workbook stream bytes from a CFB compound document. */
  def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 512 &&
      i32(bytes, 0) == 0xE011CFD0 && i32(bytes, 4) == 0xE11AB1A1,
      "not an OLE2 compound document (bad signature)")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val numFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)
    def sectorOff(s: Int): Int = (s + 1) * sectorSize

    // FAT sector list: 109 header DIFAT entries, then chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.length < numFat) {
      val e = i32(bytes, 76 + 4 * i)
      if (e != FreeSect && e != EndOfChain) fatSectors += e
      i += 1
    }
    var difat = firstDifat
    while (difat != EndOfChain && difat != FreeSect && fatSectors.length < numFat) {
      val base = sectorOff(difat)
      val perSector = sectorSize / 4 - 1
      var j = 0
      while (j < perSector && fatSectors.length < numFat) {
        val e = i32(bytes, base + 4 * j)
        if (e != FreeSect && e != EndOfChain) fatSectors += e
        j += 1
      }
      difat = i32(bytes, base + 4 * perSector)
    }
    val entriesPerFat = sectorSize / 4
    def fat(sector: Int): Int = {
      val fs = fatSectors(sector / entriesPerFat)
      i32(bytes, sectorOff(fs) + 4 * (sector % entriesPerFat))
    }
    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < (1 << 20)) {
        val off = sectorOff(s)
        out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        s = fat(s); guard += 1
      }
      val a = out.toByteArray
      if (size >= 0 && size < a.length) java.util.Arrays.copyOf(a, size.toInt) else a
    }

    // directory entries (128 bytes each) from the directory chain
    val dir = readChain(firstDir, -1L)
    case class Entry(name: String, objType: Int, startSector: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val off = k * 128
      val nameLen = u16(dir, off + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, dir(off + 66) & 0xFF, i32(dir, off + 116),
        i32(dir, off + 120).toLong & 0xFFFFFFFFL)
    }
    val wb = entries.find(e => e.objType == 2 &&
        (e.name.equalsIgnoreCase("Workbook") || e.name.equalsIgnoreCase("Book")))
      .getOrElse(throw new IllegalArgumentException(
        "no Workbook stream in compound document"))
    if (wb.size >= miniCutoff) readChain(wb.startSector, wb.size)
    else {
      // mini-stream path: the root entry's regular chain holds the mini
      // stream; the miniFAT (its own regular chain) links 64-byte sectors
      val root = entries.find(_.objType == 5).getOrElse(
        throw new IllegalArgumentException("compound document has no root entry"))
      val miniStream = readChain(root.startSector, root.size)
      val miniFat = readChain(firstMiniFat, -1L)
      val out = new java.io.ByteArrayOutputStream()
      var s = wb.startSector
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < (1 << 20)) {
        val off = s * miniSize
        out.write(miniStream, off, math.min(miniSize, miniStream.length - off))
        s = i32(miniFat, 4 * s); guard += 1
      }
      val a = out.toByteArray
      if (wb.size < a.length) java.util.Arrays.copyOf(a, wb.size.toInt) else a
    }
  }

  // ------------------------------------------------------------ BIFF layer

  // record ids (MS-XLS)
  private final val RecBof = 0x0809
  private final val RecEof = 0x000A
  private final val RecSst = 0x00FC
  private final val RecContinue = 0x003C
  private final val RecBoundsheet = 0x0085
  private final val RecLabelSst = 0x00FD
  private final val RecLabel = 0x0204
  private final val RecNumber = 0x0203
  private final val RecRk = 0x027E
  private final val RecMulRk = 0x00BD
  private final val RecBlank = 0x0201
  private final val RecMulBlank = 0x00BE
  private final val RecBoolErr = 0x0205
  private final val RecFormula = 0x0006
  private final val RecString = 0x0207

  /** Decode an RK-encoded number (2 flag bits + 30-bit int or high 30
    * bits of an IEEE double). */
  def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble(((rk & 0xFFFFFFFC).toLong & 0xFFFFFFFFL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Render a cell double the way the CSV path would have received it:
    * whole values print as integers (no trailing .0), so the type
    * lattice sees the same strings a CSV export of the sheet contains. */
  def renderNumber(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** SST with CONTINUE handling: fragments may split between strings or
    * mid-string; a mid-string continuation fragment restates the
    * compression flag, and characters never straddle a fragment (a wide
    * char needs 2 bytes in the SAME fragment — a short remainder is dead
    * padding and skipped). */
  private final class SstCursor(wb: Array[Byte], segs: IndexedSeq[(Int, Int)]) {
    private var seg = 0
    private var off = 0
    private def fragRemaining: Int = segs(seg)._2 - off
    private def hasMoreFrags: Boolean = seg < segs.length - 1
    private def advanceFrag(): Unit = { seg += 1; off = 0 }
    def nextU8(): Int = {
      while (fragRemaining < 1 && hasMoreFrags) advanceFrag()
      val v = wb(segs(seg)._1 + off) & 0xFF; off += 1; v
    }
    def nextU16(): Int = nextU8() | (nextU8() << 8)
    def nextI32(): Int = nextU16() | (nextU16() << 16)
    def skip(n: Int): Unit = { var k = n; while (k > 0) { nextU8(); k -= 1 } }
    /** Read one XLUnicodeRichExtendedString. */
    def nextString(): String = {
      val cch = nextU16()
      val grbit = nextU8()
      val rich = (grbit & 0x08) != 0
      val ext = (grbit & 0x04) != 0
      val cRun = if (rich) nextU16() else 0
      val cbExt = if (ext) nextI32() else 0
      var compressed = (grbit & 0x01) == 0
      val sb = new java.lang.StringBuilder(cch)
      var remaining = cch
      while (remaining > 0) {
        val need = if (compressed) 1 else 2
        if (fragRemaining < need && hasMoreFrags) {
          advanceFrag()
          compressed = (nextU8() & 0x01) == 0 // restated flag byte
        }
        if (compressed) sb.append((nextU8()).toChar)
        else sb.append((nextU8() | (nextU8() << 8)).toChar)
        remaining -= 1
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
  }

  private def parseSst(wb: Array[Byte], recOff: Int): IndexedSeq[String] = {
    val segs = mutable.ArrayBuffer.empty[(Int, Int)]
    var p = recOff
    var first = true
    while (p + 4 <= wb.length &&
        (if (first) u16(wb, p) == RecSst else u16(wb, p) == RecContinue)) {
      val len = u16(wb, p + 2)
      segs += ((p + 4, len))
      p += 4 + len
      first = false
    }
    val cur = new SstCursor(wb, segs.toIndexedSeq)
    cur.nextI32() // total ref count (with repeats)
    val unique = cur.nextI32()
    (0 until unique).map(_ => cur.nextString())
  }

  /** A short inline string (LABEL / STRING records): cch16, flags, chars
    * — single-record, no rich/ext extras read beyond the flag. */
  private def inlineString(wb: Array[Byte], off: Int): String = {
    val cch = u16(wb, off)
    val grbit = wb(off + 2) & 0xFF
    val sb = new java.lang.StringBuilder(cch)
    var p = off + 3
    if ((grbit & 0x08) != 0) p += 2 // rich run count
    if ((grbit & 0x04) != 0) p += 4 // ext size
    var k = 0
    if ((grbit & 0x01) == 0) { // compressed 8-bit
      while (k < cch) { sb.append(((wb(p + k)) & 0xFF).toChar); k += 1 }
    } else {
      while (k < cch) { sb.append(u16(wb, p + 2 * k).toChar); k += 1 }
    }
    sb.toString
  }

  /** Parse the first worksheet of a BIFF8 workbook stream into rows of
    * strings (cells at their column positions, "" for gaps). */
  def parseBiff(wb: Array[Byte]): Seq[IndexedSeq[String]] = {
    // pass 1 (workbook globals): SST + first BOUNDSHEET's BOF offset
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var sheetOff = -1
    var pos = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val t = u16(wb, pos); val len = u16(wb, pos + 2)
      t match {
        case RecSst => sst = parseSst(wb, pos)
        case RecBoundsheet => if (sheetOff < 0) sheetOff = i32(wb, pos + 4)
        case RecEof => done = true
        case _ =>
      }
      pos += 4 + len
    }
    require(sheetOff >= 0 && sheetOff + 4 <= wb.length,
      "BIFF workbook has no worksheet substream")

    // pass 2 (worksheet substream): cell records → (row, col) → value
    val cells = mutable.SortedMap.empty[Int, mutable.SortedMap[Int, String]]
    def put(row: Int, col: Int, v: String): Unit =
      cells.getOrElseUpdate(row, mutable.SortedMap.empty[Int, String])(col) = v
    pos = sheetOff
    done = false
    var pendingStringCell: Option[(Int, Int)] = None // FORMULA with string result
    while (!done && pos + 4 <= wb.length) {
      val t = u16(wb, pos); val len = u16(wb, pos + 2)
      val d = pos + 4
      t match {
        case RecEof => done = true
        case RecLabelSst =>
          val idx = i32(wb, d + 6)
          put(u16(wb, d), u16(wb, d + 2), sst.lift(idx).getOrElse(""))
        case RecLabel =>
          put(u16(wb, d), u16(wb, d + 2), inlineString(wb, d + 6))
        case RecNumber =>
          val bits = (i32(wb, d + 6).toLong & 0xFFFFFFFFL) |
            (i32(wb, d + 10).toLong << 32)
          put(u16(wb, d), u16(wb, d + 2),
            renderNumber(java.lang.Double.longBitsToDouble(bits)))
        case RecRk =>
          put(u16(wb, d), u16(wb, d + 2), renderNumber(decodeRk(i32(wb, d + 6))))
        case RecMulRk =>
          val row = u16(wb, d); val colFirst = u16(wb, d + 2)
          val n = (len - 6) / 6
          var k = 0
          while (k < n) {
            put(row, colFirst + k, renderNumber(decodeRk(i32(wb, d + 4 + 6 * k + 2))))
            k += 1
          }
        case RecBlank =>
          put(u16(wb, d), u16(wb, d + 2), "")
        case RecMulBlank =>
          val row = u16(wb, d); val colFirst = u16(wb, d + 2)
          val n = (len - 6) / 2
          (0 until n).foreach(k => put(row, colFirst + k, ""))
        case RecBoolErr =>
          val row = u16(wb, d); val col = u16(wb, d + 2)
          if ((wb(d + 7) & 0xFF) == 0) // boolean, not error
            put(row, col, if ((wb(d + 6) & 0xFF) != 0) "true" else "false")
          else put(row, col, "")
        case RecFormula =>
          val row = u16(wb, d); val col = u16(wb, d + 2)
          if (u16(wb, d + 12) == 0xFFFF) {
            (wb(d + 6) & 0xFF) match {
              case 0 => pendingStringCell = Some((row, col)) // STRING follows
              case 1 => put(row, col, if ((wb(d + 8) & 0xFF) != 0) "true" else "false")
              case 3 => put(row, col, "")
              case _ => put(row, col, "") // error value
            }
          } else {
            val bits = (i32(wb, d + 6).toLong & 0xFFFFFFFFL) |
              (i32(wb, d + 10).toLong << 32)
            put(row, col, renderNumber(java.lang.Double.longBitsToDouble(bits)))
          }
        case RecString =>
          pendingStringCell.foreach { case (r, c) => put(r, c, inlineString(wb, d)) }
          pendingStringCell = None
        case _ =>
      }
      pos += 4 + len
    }
    cells.values.map { byCol =>
      val width = byCol.lastKey + 1
      (0 until width).map(c => byCol.getOrElse(c, "")): IndexedSeq[String]
    }.toSeq
  }

  /** Parse the first sheet of an .xls into rows of strings. */
  def parseXls(path: String): Seq[IndexedSeq[String]] =
    parseBiff(workbookStream(Files.readAllBytes(Paths.get(path))))

  /** XLS → typed DataFrame via the CSV-path semantics (same tail as
    * XlsxImport: sanitize header, all-strings rows, type lattice). */
  def read(spark: SparkSession, path: String, inferTypes: Boolean = true): DataFrame =
    SpreadsheetRows.toDataFrame(spark, parseXls(path), path, inferTypes)
}
