package graft.sources

import scala.collection.mutable.ArrayBuffer

/**
 * Test-only BIFF8/.xls writer: emits a CFB compound document (regular-FAT
 * or mini-stream layout, chosen by the 4096-byte cutoff exactly like real
 * writers) containing a single-sheet BIFF8 workbook. Cell encodings cover
 * the reader's record family: LABELSST (with SST CONTINUE fragmentation,
 * optionally splitting MID-string with the restated flag byte), LABEL,
 * NUMBER, RK, MULRK, BLANK, MULBLANK, BOOLERR, FORMULA(+STRING).
 */
object XlsFixture {

  /** Marker wrappers for specific cell encodings. */
  case class Inline(s: String)          // LABEL record (inline string)
  case class MulRk(vs: Seq[Int])        // one MULRK across consecutive cols
  case class MulBlank(n: Int)           // MULBLANK run
  case class FormulaNum(v: Double)      // FORMULA with cached numeric
  case class FormulaStr(s: String)      // FORMULA + STRING result

  private final class Buf {
    val out = new ArrayBuffer[Byte]()
    def u8(v: Int): this.type = { out += v.toByte; this }
    def u16(v: Int): this.type = { u8(v & 0xFF); u8((v >> 8) & 0xFF); this }
    def i32(v: Int): this.type = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF); this }
    def i64(v: Long): this.type = { i32((v & 0xFFFFFFFFL).toInt); i32((v >>> 32).toInt); this }
    def bytes(b: Array[Byte]): this.type = { out ++= b; this }
    def padTo(n: Int, fill: Byte = 0): this.type = { while (out.length < n) out += fill; this }
    def result: Array[Byte] = out.toArray
  }

  private def record(t: Int, body: Array[Byte]): Array[Byte] =
    new Buf().u16(t).u16(body.length).bytes(body).result

  private def bof(substreamType: Int): Array[Byte] =
    record(0x0809, new Buf().u16(0x0600).u16(substreamType)
      .u16(0x0DBB).u16(0x07CC).i32(0).i32(0).result)

  /** SST + CONTINUE records. Strings are packed into fragments of at most
    * `fragLimit` data bytes; a string whose chars don't fit is split
    * mid-string iff `midSplit` (continuation fragment restates the flag
    * byte), else the fragment is cut before the string. */
  private def sstRecords(strings: Seq[String], fragLimit: Int,
      midSplit: Boolean): Array[Byte] = {
    val frags = ArrayBuffer(new Buf)
    frags.head.i32(strings.length).i32(strings.length)
    def room = fragLimit - frags.last.out.length
    strings.foreach { s =>
      val wide = s.exists(_ > 0xFF)
      val header = new Buf().u16(s.length).u8(if (wide) 1 else 0).result
      val bytesPerChar = if (wide) 2 else 1
      // header never splits; without midSplit the WHOLE string must fit,
      // so fragment cuts only ever fall between strings
      val needUpFront =
        header.length + (if (midSplit) bytesPerChar else bytesPerChar * s.length)
      if (room < needUpFront) frags += new Buf
      frags.last.bytes(header)
      var i = 0
      while (i < s.length) {
        if (room < bytesPerChar) {
          frags += new Buf
          frags.last.u8(if (wide) 1 else 0) // mid-string: flag byte restated
        }
        if (wide) frags.last.u16(s.charAt(i).toInt) else frags.last.u8(s.charAt(i).toInt)
        i += 1
      }
    }
    val out = new Buf
    frags.zipWithIndex.foreach { case (f, k) =>
      out.bytes(record(if (k == 0) 0x00FC else 0x003C, f.result))
    }
    out.result
  }

  private def cellHeader(row: Int, col: Int): Buf =
    new Buf().u16(row).u16(col).u16(0) // ixfe 0

  private def rkOfInt(v: Int): Int = (v << 2) | 2

  /** Build the BIFF8 workbook stream for one sheet of cell values. */
  def workbook(rows: Seq[Seq[Any]], sstFragLimit: Int = 8202,
      midSplit: Boolean = false): Array[Byte] = {
    val strings = rows.flatten.collect { case s: String => s }.distinct
    val sstIdx = strings.zipWithIndex.toMap

    val sheet = new Buf
    sheet.bytes(bof(0x0010))
    rows.zipWithIndex.foreach { case (cells, r) =>
      var c = 0
      cells.foreach { v =>
        v match {
          case null => sheet.bytes(record(0x0201, cellHeader(r, c).result))
          case s: String =>
            sheet.bytes(record(0x00FD, cellHeader(r, c).i32(sstIdx(s)).result))
          case Inline(s) =>
            sheet.bytes(record(0x0204, cellHeader(r, c).u16(s.length).u8(0)
              .bytes(s.getBytes("ISO-8859-1")).result))
          case i: Int =>
            sheet.bytes(record(0x027E, cellHeader(r, c).i32(rkOfInt(i)).result))
          case d: Double =>
            sheet.bytes(record(0x0203, cellHeader(r, c)
              .i64(java.lang.Double.doubleToLongBits(d)).result))
          case b: Boolean =>
            sheet.bytes(record(0x0205, cellHeader(r, c).u8(if (b) 1 else 0).u8(0).result))
          case MulRk(vs) =>
            val b = new Buf().u16(r).u16(c)
            vs.foreach(x => b.u16(0).i32(rkOfInt(x)))
            b.u16(c + vs.length - 1)
            sheet.bytes(record(0x00BD, b.result))
          case MulBlank(n) =>
            val b = new Buf().u16(r).u16(c)
            (0 until n).foreach(_ => b.u16(0))
            b.u16(c + n - 1)
            sheet.bytes(record(0x00BE, b.result))
          case FormulaNum(d) =>
            sheet.bytes(record(0x0006, cellHeader(r, c)
              .i64(java.lang.Double.doubleToLongBits(d)).u16(0).i32(0).i32(0).u16(0).result))
          case FormulaStr(s) =>
            // cached string: byte0=0, bytes6-7=0xFFFF, then STRING record
            sheet.bytes(record(0x0006, cellHeader(r, c)
              .u8(0).u8(0).u16(0).u16(0).u16(0xFFFF).u16(0).i32(0).i32(0).u16(0).result))
            sheet.bytes(record(0x0207, new Buf().u16(s.length).u8(0)
              .bytes(s.getBytes("ISO-8859-1")).result))
          case other => throw new IllegalArgumentException(s"cell $other")
        }
        v match {
          case MulRk(vs) => c += vs.length
          case MulBlank(n) => c += n
          case _ => c += 1
        }
      }
    }
    sheet.bytes(record(0x000A, Array.empty))

    // globals: BOF, SST(+CONTINUE), BOUNDSHEET (needs the sheet offset =
    // globals length, known once the boundsheet's own size is fixed), EOF
    val sstBytes = sstRecords(strings, sstFragLimit, midSplit)
    val sheetName = "Sheet1"
    val bsLen = 4 + 4 + 2 + 1 + 1 + sheetName.length
    val globalsLen = bof(5).length + sstBytes.length + bsLen + 4
    val globals = new Buf
    globals.bytes(bof(0x0005))
    globals.bytes(sstBytes)
    globals.bytes(record(0x0085, new Buf().i32(globalsLen).u16(0)
      .u8(sheetName.length).u8(0).bytes(sheetName.getBytes("ISO-8859-1")).result))
    globals.bytes(record(0x000A, Array.empty))
    assert(globals.out.length == globalsLen, s"${globals.out.length} != $globalsLen")
    globals.bytes(sheet.result).result
  }

  private final val FreeSect = 0xFFFFFFFF
  private final val EndOfChain = 0xFFFFFFFE
  private final val FatSect = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, child: Int,
      startSector: Int, size: Long): Array[Byte] = {
    val b = new Buf
    val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    b.bytes(utf16).padTo(64)
    b.u16(utf16.length + 2) // name length incl. terminator
    b.u8(objType).u8(1)     // black
    b.i32(-1).i32(-1).i32(child)
    b.padTo(100)            // clsid + state flags zero
    b.i64(0L).i64(0L)       // times
    b.i32(startSector).i32(size.toInt).i32(0)
    assert(b.out.length == 128)
    b.result
  }

  /** Wrap a stream in a CFB container (mini layout under 4096 bytes). */
  def cfb(data: Array[Byte]): Array[Byte] = {
    val mini = data.length < 4096
    val b = new Buf
    // ---- header
    b.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    b.padTo(24)             // clsid
    b.u16(0x003E).u16(3).u16(0xFFFE).u16(9).u16(6)
    b.padTo(44)             // reserved + num dir sectors
    b.i32(1)                // one FAT sector
    b.i32(1)                // directory at sector 1
    b.i32(0)                // transaction
    b.i32(4096)             // mini cutoff
    if (mini) b.i32(2).i32(1) else b.i32(EndOfChain).i32(0) // miniFAT start/count
    b.i32(EndOfChain).i32(0) // DIFAT chain
    b.i32(0)                // DIFAT[0] = FAT at sector 0
    (1 until 109).foreach(_ => b.i32(FreeSect))
    assert(b.out.length == 512)

    if (!mini) {
      val nData = (data.length + 511) / 512
      // FAT sector: 0=FATSECT, 1=dir EOC, 2..: data chain
      val fat = new Buf().i32(FatSect).i32(EndOfChain)
      (0 until nData).foreach(k => fat.i32(if (k == nData - 1) EndOfChain else 3 + k))
      fat.padTo(512, 0xFF.toByte)
      b.bytes(fat.result)
      // directory sector
      val dir = new Buf
      dir.bytes(dirEntry("Root Entry", 5, 1, EndOfChain, 0L))
      dir.bytes(dirEntry("Workbook", 2, -1, 2, data.length.toLong))
      dir.padTo(512) // one directory sector: 2 live + 2 free entries
      b.bytes(dir.result)
      b.bytes(data).padTo(512 + 512 + 512 + nData * 512)
    } else {
      val nMini = (data.length + 63) / 64
      val miniStreamBytes = nMini * 64
      val nMiniStreamSectors = (miniStreamBytes + 511) / 512
      // FAT: 0=FATSECT, 1=dir, 2=miniFAT, 3..: mini-stream chain
      val fat = new Buf().i32(FatSect).i32(EndOfChain).i32(EndOfChain)
      (0 until nMiniStreamSectors).foreach(k =>
        fat.i32(if (k == nMiniStreamSectors - 1) EndOfChain else 4 + k))
      fat.padTo(512, 0xFF.toByte)
      b.bytes(fat.result)
      val dir = new Buf
      dir.bytes(dirEntry("Root Entry", 5, 1, 3, miniStreamBytes.toLong))
      dir.bytes(dirEntry("Workbook", 2, -1, 0, data.length.toLong))
      dir.padTo(512) // one directory sector: 2 live + 2 free entries
      b.bytes(dir.result)
      // miniFAT sector: chain over 64-byte mini sectors
      val mfat = new Buf
      (0 until nMini).foreach(k => mfat.i32(if (k == nMini - 1) EndOfChain else k + 1))
      mfat.padTo(512, 0xFF.toByte)
      b.bytes(mfat.result)
      b.bytes(data).padTo(512 * (4 + nMiniStreamSectors))
    }
    b.result
  }

  /** Write a complete .xls file; returns its path. */
  def write(rows: Seq[Seq[Any]], sstFragLimit: Int = 8202,
      midSplit: Boolean = false): String = {
    val f = java.nio.file.Files.createTempFile("graft_test_", ".xls")
    java.nio.file.Files.write(f, cfb(workbook(rows, sstFragLimit, midSplit)))
    f.toString
  }
}
