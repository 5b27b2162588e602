package graft

import graft.model.Lsn
import graft.sources.cdcwal.WalSegmentIO
import graft.sources.pgwire.{PgWire, ReplicationClient}
import graft.streaming.GraftConfig
import org.apache.spark.sql.streaming.Trigger
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

/** The live-capture loop against a scripted walsender: CopyBoth framing,
  * segment rotation with relation re-emission (self-containment),
  * flush-LSN feedback, graceful drain — then the captured segments
  * stream through CdcWalSource end-to-end. */
class ReplicationClientSpec extends SparkSpecBase {

  import WalsenderFixtures._

  private def newCfg(segBytes: Long) = GraftConfig(
    slotName = "test_slot", publication = "pub", protocolVersion = 2,
    segmentBytes = segBytes)

  test("capture session: rotation, self-contained segments, feedback, drain") {
    val dir = Files.createTempDirectory("replcli").toFile.getAbsolutePath
    // the sink has ACKed through LSN 3 before the session starts
    WalSegmentIO.writeFeedback(dir, 3L)

    val t = new FakeWalsender
    // tiny segment budget so the 2nd transaction rotates
    val client = new ReplicationClient(t, newCfg(segBytes = 120), dir)
    val runner = new Thread(() => client.run(Lsn(0L)))
    runner.start()

    // tx 1: relation + one insert
    t.frames.put(xlog(1, relation(42, "t1")))
    t.frames.put(xlog(2, begin(500)))
    t.frames.put(xlog(3, insert(42, "1", "one")))
    t.frames.put(xlog(4, commit(4)))
    // tx 2 (will land in a rotated segment — relation must re-emit)
    t.frames.put(xlog(5, begin(501)))
    t.frames.put(xlog(6, insert(42, "2", "two")))
    t.frames.put(xlog(7, commit(7)))
    // keepalive demanding a status update
    t.frames.put(keepalive(8, reply = true))

    // wait for the status update (proves all prior frames processed);
    // sent(0) is the START_REPLICATION Query itself
    def sentTags = (0 until t.sent.size).map(i => t.sent.get(i)(0).toChar)
    val deadline = System.currentTimeMillis() + 20000
    while (!sentTags.contains('d') && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(sentTags.head == 'Q',
      "first client message must be START_REPLICATION")
    val status = t.sent.get(sentTags.indexOf('d'))
    assert(status(0) == 'd'.toByte)
    val sb = ByteBuffer.wrap(status, 5, status.length - 5)
    assert(sb.get() == 'r'.toByte)
    assert(sb.getLong() == 8L)  // written: all WAL received
    assert(sb.getLong() == 3L)  // flushed: the sink's ACK, not what we buffered
    assert(client.statusUpdatesSent.get(0) == 3L)

    // graceful drain: stop, nudge the blocked read with a keepalive
    client.stop()
    t.frames.put(keepalive(9, reply = false))
    runner.join(20000)
    assert(!runner.isAlive, "client did not drain")
    // drain sent a final status, CopyDone, Terminate
    val tags = sentTags
    assert(tags.count(_ == 'd') >= 2) // ≥2 CopyData ('r' updates)
    assert(tags.contains('c') && tags.contains('X'))

    // rotation happened and EVERY segment decodes stand-alone (the
    // relation cache re-emitted at each segment head)
    val segs = WalSegmentIO.segmentFiles(dir)
    assert(segs.size >= 2, s"expected rotation, got ${segs.map(_.getName)}")
    segs.foreach { f =>
      val solo = Files.createTempDirectory("solo").toFile.getAbsolutePath
      Files.copy(f.toPath, Paths.get(solo, f.getName))
      // forces a full decode; DML before its Relation would throw
      val recs = WalSegmentIO.readLines(solo).toVector
      assert(recs.nonEmpty)
    }

    // both inserts survive, exactly once, across the rotated segments
    val all = WalSegmentIO.readLines(dir).toVector
    assert(all.count(_.commit) == 2)

    // the captured WAL streams through the source end-to-end
    val ckpt = Files.createTempDirectory("replcli-ckpt").toFile.getAbsolutePath
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = spark.readStream
      .format("graft.sources.cdcwal.CdcWalSource")
      .option("path", dir).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.selectExpr("op", "coalesce(after[0].value, '')").collect()
          .foreach(r => seen.add((r.getString(0), r.getString(1))))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val inserts = seen.toArray(Array.empty[(String, String)])
      .filter(_._1 == "c").map(_._2).sorted.toSeq
    assert(inserts == Seq("1", "2"))
  }

  test("rotation waits for a transaction boundary — a segment never splits a tx") {
    val dir = Files.createTempDirectory("replcli3").toFile.getAbsolutePath
    val t = new FakeWalsender
    // segBytes=1: EVERY frame is over budget, so rotation is requested
    // constantly — it may only actually happen at tx-idle points
    val client = new ReplicationClient(t, newCfg(segBytes = 1), dir)
    val runner = new Thread(() => client.run(Lsn(0L)))
    runner.start()
    t.frames.put(xlog(1, relation(42, "t1")))
    t.frames.put(xlog(2, begin(500)))
    (3 to 12).foreach(i => t.frames.put(xlog(i, insert(42, i.toString, "x"))))
    t.frames.put(xlog(13, commit(13)))
    t.frames.put(xlog(14, begin(501)))
    t.frames.put(xlog(15, insert(42, "15", "y")))
    t.frames.put(xlog(16, commit(16)))
    t.frames.put(keepalive(17, reply = true))
    val deadline = System.currentTimeMillis() + 20000
    while (client.statusUpdatesSent.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    client.stop()
    t.frames.put(keepalive(18, reply = false))
    runner.join(20000)
    assert(!runner.isAlive)

    val segs = WalSegmentIO.segmentFiles(dir)
    assert(segs.size >= 2, s"expected rotation, got ${segs.map(_.getName)}")
    // EVERY segment decodes stand-alone, and no DML row ever falls out
    // of its transaction framing (txid=0 would mean a mid-tx split)
    var dmlSeen = 0
    segs.foreach { f =>
      val solo = Files.createTempDirectory("solo3").toFile.getAbsolutePath
      Files.copy(f.toPath, Paths.get(solo, f.getName))
      WalSegmentIO.readLines(solo).foreach { r =>
        val row = r.make()
        val op = row.getUTF8String(0).toString
        if (op == "c" || op == "u" || op == "d") {
          dmlSeen += 1
          assert(row.getLong(2) != 0L,
            s"DML with txid=0 in ${f.getName}: segment split mid-transaction")
        }
      }
    }
    assert(dmlSeen == 11)
  }

  test("resumed session continues segment numbering (no overwrite)") {
    val dir = Files.createTempDirectory("replcli2").toFile.getAbsolutePath

    def runSession(frames: Seq[PgWire.Backend]): Unit = {
      val t = new FakeWalsender
      val client = new ReplicationClient(t, newCfg(segBytes = 1 << 20), dir)
      val runner = new Thread(() => client.run(Lsn(0L)))
      runner.start()
      frames.foreach(t.frames.put)
      // settle, then drain
      Thread.sleep(200)
      client.stop()
      t.frames.put(keepalive(99, reply = false))
      runner.join(20000)
      assert(!runner.isAlive)
    }

    runSession(Seq(xlog(1, relation(42, "t1")), xlog(2, begin(1)),
      xlog(3, insert(42, "1", "a")), xlog(4, commit(4))))
    val firstSegs = WalSegmentIO.segmentFiles(dir).map(_.getName)
    runSession(Seq(xlog(11, relation(42, "t1")), xlog(12, begin(2)),
      xlog(13, insert(42, "2", "b")), xlog(14, commit(14))))
    val allSegs = WalSegmentIO.segmentFiles(dir).map(_.getName)
    assert(allSegs.size > firstSegs.size, "second session must add a new segment")
    assert(allSegs.distinct.size == allSegs.size)
    // nothing lost: both transactions present
    assert(WalSegmentIO.readLines(dir).count(_.commit) == 2)
  }
}
