package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * DBF (Xbase) writer — the writer half of SURVEY.md §2.1 S9, layout per
 * the public Xbase spec the reference's misc/dbfUtils.py:59-113 encodes:
 * version 0x03 header, 32-byte field descriptors, fixed-width ASCII
 * records, 0x1A terminator.
 */
object DbfWriter {

  final case class FieldSpec(name: String, ftype: Char, length: Int, decimals: Int)

  /** Header + field descriptors + 0x0D terminator for `recordCount`
    * records — split out so a distributed writer can emit the header on
    * the driver while executors produce the record bytes. */
  def headerBytes(fields: Seq[FieldSpec], recordCount: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val recordLen = 1 + fields.map(_.length).sum
    val headerLen = 32 + fields.length * 32 + 1
    val hdr = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(0x03.toByte)
    val now = java.time.LocalDate.of(2000, 1, 1) // deterministic stamp
    hdr.put((now.getYear - 1900).toByte).put(now.getMonthValue.toByte).put(now.getDayOfMonth.toByte)
    hdr.putInt(recordCount)
    hdr.putShort(headerLen.toShort)
    hdr.putShort(recordLen.toShort)
    hdr.put(new Array[Byte](20))
    out.write(hdr.array())
    fields.foreach { f =>
      val fd = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      val nameBytes = f.name.take(10).getBytes(StandardCharsets.US_ASCII)
      fd.put(nameBytes).put(new Array[Byte](11 - nameBytes.length))
      fd.put(f.ftype.toByte)
      fd.putInt(0)
      fd.put(f.length.toByte).put(f.decimals.toByte)
      fd.put(new Array[Byte](14))
      out.write(fd.array())
    }
    out.write(0x0D)
    out.toByteArray
  }

  /** One fixed-width record incl. the not-deleted flag byte. */
  def recordBytes(fields: Seq[FieldSpec], rec: Seq[Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(' '.toInt) // not deleted
    fields.zip(rec).foreach { case (f, v) => out.write(encode(f, v)) }
    out.toByteArray
  }

  def write(fields: Seq[FieldSpec], records: Seq[Seq[Any]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(headerBytes(fields, records.length))
    records.foreach(rec => out.write(recordBytes(fields, rec)))
    out.write(0x1A)
    out.toByteArray
  }

  private def encode(f: FieldSpec, v: Any): Array[Byte] = {
    val s = f.ftype match {
      case 'N' | 'F' =>
        val text = v match {
          case null => ""
          case d: java.math.BigDecimal =>
            d.setScale(f.decimals, java.math.RoundingMode.HALF_UP).toPlainString
          case d: Double => BigDecimal(d)
            .setScale(f.decimals, BigDecimal.RoundingMode.HALF_UP).toString
          case other => other.toString
        }
        text.reverse.padTo(f.length, ' ').reverse.mkString // right-justify
      case 'D' => v match {
        case null => " " * 8
        case d: java.sql.Date => d.toLocalDate.format(
          java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
        case other => other.toString.replace("-", "").take(8)
      }
      case 'L' => v match {
        case null => "?"
        case b: java.lang.Boolean => if (b) "T" else "F"
        case other => other.toString.take(1)
      }
      case _ => Option(v).map(_.toString).getOrElse("")
    }
    val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
    if (bytes.length >= f.length) bytes.take(f.length)
    else bytes ++ Array.fill(f.length - bytes.length)(' '.toByte)
  }
}
