package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

/**
 * Test-only minimal PostgreSQL v3 wire-protocol client (simple-query
 * flow, trust auth, TEXT results). The sandbox ships postgres binaries
 * but no JDBC driver jar, so the live-sink integration test speaks the
 * (public, documented) frontend/backend protocol directly.
 */
final class PgWire(host: String, port: Int, user: String, db: String)
    extends AutoCloseable {

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)

  locally {
    val params = (Seq("user", user, "database", db).mkString("\u0000") + "\u0000\u0000").getBytes("UTF-8")
    out.writeInt(8 + params.length)
    out.writeInt(196608) // protocol 3.0
    out.write(params)
    out.flush()
    drainUntilReady() // auth (trust → R/0), params, backend key, Z
  }

  private def readMsg(): (Char, Array[Byte]) = {
    val t = in.readByte().toChar
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (t, body)
  }

  private def drainUntilReady(): Unit = {
    var t = ' '
    while (t != 'Z') {
      val (tt, body) = readMsg()
      if (tt == 'E')
        throw new RuntimeException("pg startup error: " + new String(body, "UTF-8"))
      t = tt
    }
  }

  /** Run one SQL statement; returns rows as TEXT values (null for NULL). */
  def query(sql: String): Seq[Seq[String]] = {
    val b = sql.getBytes("UTF-8")
    out.writeByte('Q')
    out.writeInt(4 + b.length + 1)
    out.write(b)
    out.writeByte(0)
    out.flush()
    val rows = Seq.newBuilder[Seq[String]]
    var err: String = null
    var t = ' '
    while (t != 'Z') {
      val (tt, body) = readMsg()
      tt match {
        case 'D' =>
          val n = ((body(0) & 0xFF) << 8) | (body(1) & 0xFF)
          var off = 2
          rows += (0 until n).map { _ =>
            val len = ((body(off) & 0xFF) << 24) | ((body(off + 1) & 0xFF) << 16) |
              ((body(off + 2) & 0xFF) << 8) | (body(off + 3) & 0xFF)
            off += 4
            if (len < 0) null
            else { val s = new String(body, off, len, "UTF-8"); off += len; s }
          }
        case 'E' => err = new String(body, "UTF-8").replace('\u0000', ' ')
        case _ =>
      }
      t = tt
    }
    if (err != null) throw new RuntimeException(s"pg error: $err")
    rows.result()
  }

  def execute(sql: String): Unit = { query(sql); () }

  override def close(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() }
    catch { case _: Throwable => () }
    sock.close()
  }
}
