package graft

import graft.sources.pgoutput.{PgOutputAssembler, PgOutputDecoder}
import graft.sources.pgoutput.PgOutputDecoder._
import graft.streaming.TxnAssembler
import graft.streaming.TxnAssembler.Ctl
import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** pgoutput binary-format decoding + event assembly, against frames
  * built by a test-side encoder of the public wire layout (PostgreSQL
  * "Logical Replication Message Formats", protocol v1/v2). */
class PgOutputSpec extends AnyFunSuite {

  // --- tiny encoder for the documented wire format ---
  private def buf(n: Int = 512) = ByteBuffer.allocate(n)
  private def out(b: ByteBuffer): Array[Byte] = {
    val a = new Array[Byte](b.position()); b.rewind(); b.get(a); a
  }
  private def cstr(b: ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(UTF_8)); b.put(0.toByte)
  }
  private def text(b: ByteBuffer, v: String): Unit = {
    b.put('t'.toByte); val x = v.getBytes(UTF_8); b.putInt(x.length); b.put(x)
  }

  private def relationMsg(relId: Int, ns: String, name: String, ident: Char,
                          cols: Seq[(String, Boolean)]): Array[Byte] = {
    val b = buf()
    b.put('R'.toByte); b.putInt(relId); cstr(b, ns); cstr(b, name)
    b.put(ident.toByte); b.putShort(cols.size.toShort)
    cols.foreach { case (n, key) =>
      b.put((if (key) 1 else 0).toByte); cstr(b, n); b.putInt(25); b.putInt(-1)
    }
    out(b)
  }

  private def beginMsg(xid: Long, tsMicros: Long): Array[Byte] = {
    val b = buf(); b.put('B'.toByte); b.putLong(999L); b.putLong(tsMicros)
    b.putInt(xid.toInt); out(b)
  }

  private def commitMsg(commitLsn: Long, tsMicros: Long): Array[Byte] = {
    val b = buf(); b.put('C'.toByte); b.put(0.toByte); b.putLong(commitLsn)
    b.putLong(commitLsn + 1); b.putLong(tsMicros); out(b)
  }

  private def insertMsg(relId: Int, values: Seq[Option[String]],
                        xid: Option[Long] = None): Array[Byte] = {
    val b = buf()
    b.put('I'.toByte); xid.foreach(x => b.putInt(x.toInt)); b.putInt(relId)
    b.put('N'.toByte); b.putShort(values.size.toShort)
    values.foreach {
      case Some(v) => text(b, v)
      case None => b.put('n'.toByte)
    }
    out(b)
  }

  test("relation + begin/insert/commit decode into the Ctl event vocabulary") {
    val tsMicros = 757382400000000L // 2024-01-01T00:00:00Z in PG epoch micros
    val frames = Seq(
      1L -> relationMsg(16385, "public", "t1", 'd',
        Seq("id" -> true, "val" -> false)),
      2L -> beginMsg(700, tsMicros),
      3L -> insertMsg(16385, Seq(Some("1"), Some("ten"))),
      4L -> insertMsg(16385, Seq(Some("2"), None)),
      5L -> commitMsg(5L, tsMicros))
    val (st, evs) = PgOutputAssembler.assembleAll(frames)
    assert(evs.map(_.op) == Seq(Ctl.Begin, "c", "c", Ctl.Commit))
    val ins = evs(1)
    assert(ins.schema == "public" && ins.table == "t1" && ins.txid == 700L)
    assert(ins.keyColumns == Seq("id"))
    assert(ins.after.map(c => c.name -> c.value) ==
      Seq("id" -> "1", "val" -> "ten"))
    assert(evs(2).after.find(_.name == "val").get.value == null)
    assert(evs(3).commitTs.toInstant.toString == "2024-01-01T00:00:00Z")
    assert(st.relations.contains(16385))
    // feeds TxnAssembler unchanged: one sealed tx of 2 events
    val (_, sealed_) = TxnAssembler.step(700L, evs, None)
    assert(sealed_.size == 1 && sealed_.head.events.size == 2)
    assert(sealed_.head.commitLsn == 5L)
  }

  test("update with key old-image, delete, binary and unchanged-toast values") {
    val relF = relationMsg(99, "public", "t2", 'f', Seq("k" -> true, "b" -> false))
    val upd = {
      val b = buf()
      b.put('U'.toByte); b.putInt(99)
      b.put('K'.toByte); b.putShort(1.toShort); text(b, "5")
      b.put('N'.toByte); b.putShort(2.toShort); text(b, "5")
      b.put('u'.toByte) // unchanged TOAST: column omitted from the image
      out(b)
    }
    val del = {
      val b = buf()
      b.put('D'.toByte); b.putInt(99)
      b.put('O'.toByte); b.putShort(2.toShort); text(b, "5")
      b.put('b'.toByte); b.putInt(2); b.put(0xde.toByte); b.put(0xad.toByte)
      out(b)
    }
    val (_, evs) = PgOutputAssembler.assembleAll(
      Seq(1L -> relF, 2L -> upd, 3L -> del))
    val u = evs(0); val d = evs(1)
    assert(u.op == "u" && u.replicaIdentity == "FULL")
    assert(u.before.map(_.name) == Seq("k"))
    assert(u.after.map(_.name) == Seq("k"), "unchanged TOAST column omitted")
    assert(d.op == "d")
    val bin = d.before.find(_.name == "b").get
    assert(bin.isBinary && bin.value == "\\xdead")
  }

  test("truncate resolves relids through the relation cache") {
    val frames = Seq(
      1L -> relationMsg(11, "public", "a", 'd', Seq("id" -> true)),
      2L -> relationMsg(12, "sales", "b", 'd', Seq("id" -> true)),
      3L -> { val b = buf(); b.put('T'.toByte); b.putInt(2); b.put(0.toByte)
        b.putInt(11); b.putInt(12); out(b) })
    val (_, evs) = PgOutputAssembler.assembleAll(frames)
    assert(evs.head.op == "t")
    assert(evs.head.truncateTables == Seq("public.a", "sales.b"))
  }

  test("protocol v2 streamed transaction: xid prefixes between start/stop") {
    val frames = Seq(
      1L -> relationMsg(7, "public", "s", 'd', Seq("id" -> true)),
      2L -> { val b = buf(); b.put('S'.toByte); b.putInt(900); b.put(1.toByte); out(b) },
      3L -> insertMsg(7, Seq(Some("1")), xid = Some(900L)), // xid-prefixed
      4L -> { val b = buf(); b.put('E'.toByte); out(b) },
      5L -> { val b = buf(); b.put('c'.toByte); b.putInt(900); b.put(0.toByte)
        b.putLong(5L); b.putLong(6L); b.putLong(0L); out(b) })
    val (st, evs) = PgOutputAssembler.assembleAll(frames)
    assert(evs.map(_.op) ==
      Seq(Ctl.StreamStart, "c", Ctl.StreamStop, Ctl.StreamCommit))
    assert(evs(1).txid == 900L)
    assert(!st.inStream)
    // abort discards in TxnAssembler
    val abortFrames = Seq(
      6L -> { val b = buf(); b.put('S'.toByte); b.putInt(901); b.put(1.toByte); out(b) },
      7L -> insertMsg(7, Seq(Some("2")), xid = Some(901L)),
      8L -> { val b = buf(); b.put('E'.toByte); out(b) },
      9L -> { val b = buf(); b.put('A'.toByte); b.putInt(901); b.putInt(901); out(b) })
    val (_, evs2) = PgOutputAssembler.assembleAll(abortFrames, st)
    val (kept, sealed_) = TxnAssembler.step(901L,
      evs2.filter(e => e.txid == 901L), None)
    assert(sealed_.isEmpty && kept.isEmpty, "aborted stream leaves nothing")
  }

  test("origin message stamps subsequent events and clears at commit (F4)") {
    val frames = Seq(
      1L -> relationMsg(5, "public", "o", 'd', Seq("id" -> true)),
      2L -> { val b = buf(); b.put('O'.toByte); b.putLong(0L); cstr(b, "up_a"); out(b) },
      3L -> beginMsg(800, 0L),
      4L -> insertMsg(5, Seq(Some("1"))),
      5L -> commitMsg(5L, 0L),
      6L -> beginMsg(801, 0L),
      7L -> insertMsg(5, Seq(Some("2"))),
      8L -> commitMsg(8L, 0L))
    val (_, evs) = PgOutputAssembler.assembleAll(frames)
    val byLsn = evs.map(e => e.lsn -> e.origin).toMap
    assert(byLsn(4L) == "up_a")
    assert(byLsn(7L) == null, "origin resets at commit")
  }

  test("decode failures are loud: unknown relation, unknown message type") {
    intercept[DecodeException] {
      PgOutputAssembler.assembleAll(Seq(1L -> insertMsg(12345, Seq(Some("x")))))
    }
    intercept[DecodeException] {
      PgOutputDecoder.parse(Array('Z'.toByte, 0, 0))
    }
  }

  test("two-phase family decodes and assembles: prepare parks, commit-prepared seals") {
    val ts = 757382400000000L
    def beginPrepare(xid: Long, gid: String): Array[Byte] = {
      val b = buf(); b.put('b'.toByte); b.putLong(100L); b.putLong(101L)
      b.putLong(ts); b.putInt(xid.toInt); cstr(b, gid); out(b)
    }
    def prepare(xid: Long, gid: String): Array[Byte] = {
      val b = buf(); b.put('P'.toByte); b.put(0.toByte); b.putLong(100L)
      b.putLong(101L); b.putLong(ts); b.putInt(xid.toInt); cstr(b, gid); out(b)
    }
    def commitPrepared(xid: Long, gid: String, lsn: Long): Array[Byte] = {
      val b = buf(); b.put('K'.toByte); b.put(0.toByte); b.putLong(lsn)
      b.putLong(lsn + 1); b.putLong(ts); b.putInt(xid.toInt); cstr(b, gid); out(b)
    }
    def rollbackPrepared(xid: Long, gid: String): Array[Byte] = {
      val b = buf(); b.put('r'.toByte); b.put(0.toByte); b.putLong(100L)
      b.putLong(102L); b.putLong(ts); b.putLong(ts + 5); b.putInt(xid.toInt)
      cstr(b, gid); out(b)
    }

    // raw decode sanity
    PgOutputDecoder.parse(prepare(801, "gid-a")) match {
      case PrepareMsg(0, 100L, 101L, `ts`, 801L, "gid-a") => ()
      case other => fail(s"$other")
    }
    PgOutputDecoder.parse(rollbackPrepared(802, "gid-b")) match {
      case RollbackPreparedMsg(0, 100L, 102L, _, _, 802L, "gid-b") => ()
      case other => fail(s"$other")
    }

    // prepared tx 801 commits LATER, with tx 900 fully running in
    // between; prepared tx 802 rolls back — its insert must vanish
    val frames = Seq(
      1L -> relationMsg(42, "public", "t1", 'd', Seq("id" -> true)),
      2L -> beginPrepare(801, "gid-a"),
      3L -> insertMsg(42, Seq(Some("1"))),
      4L -> prepare(801, "gid-a"),
      5L -> beginPrepare(802, "gid-b"),
      6L -> insertMsg(42, Seq(Some("666"))),
      7L -> prepare(802, "gid-b"),
      8L -> beginMsg(900, ts),
      9L -> insertMsg(42, Seq(Some("2"))),
      10L -> commitMsg(10L, ts),
      11L -> rollbackPrepared(802, "gid-b"),
      12L -> commitPrepared(801, "gid-a", 12L))
    val (_, evs) = PgOutputAssembler.assembleAll(frames)
    // fold through the transaction assembler per txid (batch form)
    val byTx = evs.groupBy(_.txid).map { case (txid, es) =>
      txid -> TxnAssembler.step(txid, es, None)._2
    }
    assert(byTx(801L).size == 1)
    assert(byTx(801L).head.events.map(e => e.get(e.after, "id").get.value) == Seq("1"))
    assert(byTx(801L).head.commitLsn == 12L)
    assert(byTx(802L).isEmpty, "rolled-back prepared tx must not seal")
    assert(byTx(900L).size == 1)
    // an un-resolved prepared tx keeps state (parked, not dropped)
    val (keep, emitted) = TxnAssembler.step(803L, Seq(
      evs.find(_.txid == 801L).get.copy(txid = 803L)), None)
    assert(emitted.isEmpty && keep.isDefined)
  }

  test("randomized round-trip: encode → decode → assemble preserves every image") {
    val rnd = new scala.util.Random(4242)
    def randStr(): String = {
      val pool = "abcXYZ019 'quo\\te\u00e9\u65e5"
      (0 until 1 + rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    var lsn = 0L
    def nextLsn(): Long = { lsn += 1; lsn }
    val relId = 500
    val nCols = 2 + rnd.nextInt(4)
    val colNames = (0 until nCols).map(i => s"c$i")
    val relFrame = nextLsn() -> relationMsg(relId, "public", "rt", 'd',
      colNames.map(n => n -> (n == "c0")))
    // 40 transactions of random inserts with text/null values
    case class Truth(txid: Long, rows: Seq[Seq[Option[String]]])
    val truths = (1 to 40).map { t =>
      Truth(1000L + t, (0 until 1 + rnd.nextInt(5)).map(_ =>
        colNames.map(_ => if (rnd.nextInt(5) == 0) None else Some(randStr()))))
    }
    val frames = relFrame +: truths.flatMap { tr =>
      (nextLsn() -> beginMsg(tr.txid, 0L)) +:
        tr.rows.map(vals => nextLsn() -> insertMsg(relId, vals)) :+
        (nextLsn() -> commitMsg(lsn + 1, 0L))
    }
    val (_, evs) = PgOutputAssembler.assembleAll(frames)
    // every sealed transaction carries exactly the generated images
    truths.foreach { tr =>
      val (kept, sealed_) = TxnAssembler.step(tr.txid,
        evs.filter(_.txid == tr.txid), None)
      assert(kept.isEmpty && sealed_.size == 1, s"tx ${tr.txid} not sealed")
      val got = sealed_.head.events.map(_.after.map(c => Option(c.value)))
      assert(got == tr.rows.map(_.toSeq),
        s"tx ${tr.txid}: images diverged after round-trip")
    }
  }
}
