package graft

import graft.sources.pgwire.PgWire
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.LinkedBlockingQueue

/** Shared test fixtures: pgoutput frame builders and a scripted
  * walsender transport (CopyBothResponse + blocking frame queue). */
object WalsenderFixtures {

  def msg(build: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(512); build(b)
    val a = new Array[Byte](b.position()); b.rewind(); b.get(a); a
  }
  def cstr(b: ByteBuffer, v: String): Unit = {
    b.put(v.getBytes(UTF_8)); b.put(0.toByte)
  }
  def text(b: ByteBuffer, v: String): Unit = {
    b.put('t'.toByte); b.putInt(v.length); b.put(v.getBytes(UTF_8))
  }
  def relation(relId: Int, table: String, namespace: String = "public"): Array[Byte] =
    msg { b =>
      b.put('R'.toByte); b.putInt(relId); cstr(b, namespace); cstr(b, table)
      b.put('d'.toByte); b.putShort(2.toShort)
      b.put(1.toByte); cstr(b, "id"); b.putInt(25); b.putInt(-1)
      b.put(0.toByte); cstr(b, "v"); b.putInt(25); b.putInt(-1)
    }
  def begin(xid: Int): Array[Byte] = msg { b =>
    b.put('B'.toByte); b.putLong(9L); b.putLong(0L); b.putInt(xid)
  }
  def insert(relId: Int, id: String, v: String): Array[Byte] = msg { b =>
    b.put('I'.toByte); b.putInt(relId); b.put('N'.toByte)
    b.putShort(2.toShort); text(b, id); text(b, v)
  }
  def commit(lsn: Long): Array[Byte] = msg { b =>
    b.put('C'.toByte); b.put(0.toByte); b.putLong(lsn); b.putLong(lsn + 1); b.putLong(0L)
  }

  def xlog(walStart: Long, payload: Array[Byte]): PgWire.Backend = {
    val b = ByteBuffer.allocate(payload.length + 25)
    b.put('w'.toByte); b.putLong(walStart); b.putLong(walStart); b.putLong(0L)
    b.put(payload)
    val body = new Array[Byte](b.position()); b.rewind(); b.get(body)
    PgWire.Backend('d', body)
  }
  def keepalive(walEnd: Long, reply: Boolean): PgWire.Backend = {
    val b = ByteBuffer.allocate(18)
    b.put('k'.toByte); b.putLong(walEnd); b.putLong(0L)
    b.put(if (reply) 1.toByte else 0.toByte)
    PgWire.Backend('d', b.array())
  }

  /** Scripted walsender: answers START_REPLICATION with CopyBoth, then
    * serves queued frames; blocks (like a real socket) when idle. */
  final class FakeWalsender extends PgWire.WireTransport {
    val frames = new LinkedBlockingQueue[PgWire.Backend]()
    val sent = new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]()
    @volatile private var copyBothSent = false
    override def read(): PgWire.Backend =
      if (!copyBothSent) { copyBothSent = true; PgWire.Backend('W', Array(0.toByte, 0, 0)) }
      else frames.take()
    override def send(bytes: Array[Byte]): Unit = sent.add(bytes)
    override def close(): Unit = ()
  }
}
