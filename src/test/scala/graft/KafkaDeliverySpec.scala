package graft

import graft.sinks.KafkaDelivery
import graft.sinks.KafkaDelivery._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Scripted-fake tests for the Kafka delivery state machines: retry
  * classification + backoff schedule, the delivery barrier, hook
  * ordering, and flush-on-close (kafka.rs:346-416,700-750 contracts). */
class KafkaDeliverySpec extends AnyFunSuite {

  /** A future that acks instantly. */
  private def ok: DeliveryFuture = _ => Some(Right(()))

  /** Producer whose trySend outcomes follow a script, then succeed. */
  private class ScriptedProducer(script: EnqueueError*) extends ProducerLike {
    val calls = mutable.ArrayBuffer.empty[String]
    var flushed = false
    var flushCallCount = 0
    private var i = 0
    override def trySend(topic: String, key: Option[String],
                         value: Array[Byte]): Either[EnqueueError, DeliveryFuture] = {
      calls += s"send:$topic"
      if (i < script.size) { i += 1; Left(script(i - 1)) } else Right(ok)
    }
    override def flush(timeoutMs: Long): Boolean = {
      calls += "flush"; flushCallCount += 1; flushed = true; true
    }
  }

  private def collectSleeps(buf: mutable.ArrayBuffer[Long]): Long => Unit = buf += _

  test("retryable errors retry with the exact exponential backoff schedule") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val p = new ScriptedProducer(QueueFull, UnknownTopic, QueueFull)
    val r = enqueueWithRetry(p, "t", None, Array(1), collectSleeps(sleeps))
    assert(r.isRight)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L))
    assert(p.calls.size == 4)
  }

  test("retryable error on every attempt exhausts retries and returns the error") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val p = new ScriptedProducer(
      QueueFull, QueueFull, QueueFull, QueueFull, QueueFull, QueueFull)
    val r = enqueueWithRetry(p, "t", None, Array(1), collectSleeps(sleeps))
    assert(r == Left("Kafka enqueue failed: QueueFull"))
    // 5 attempts, sleeps only between them (4)
    assert(p.calls.size == 5)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L, 800L))
  }

  test("fatal errors never retry") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val p = new ScriptedProducer(FatalError("broker gone"))
    val r = enqueueWithRetry(p, "t", None, Array(1), collectSleeps(sleeps))
    assert(r == Left("broker gone"))
    assert(p.calls.size == 1 && sleeps.isEmpty)
  }

  test("backoff delay saturates at the 3s cap and never overflows") {
    assert(backoffDelayMs(0) == 100L)
    assert(backoffDelayMs(3) == 800L)
    assert(backoffDelayMs(5) == 3000L) // 3200 capped
    assert(backoffDelayMs(62) == 3000L)
    assert(backoffDelayMs(200) == 3000L)
  }

  test("delivery barrier passes when all futures ack") {
    assert(awaitDeliveries(Seq(ok, ok, ok), 10) == Right(()))
  }

  test("delivery barrier surfaces the first broker error") {
    val bad: DeliveryFuture = _ => Some(Left("NotLeaderForPartition"))
    assert(awaitDeliveries(Seq(ok, bad, ok), 10) == Left("NotLeaderForPartition"))
  }

  test("delivery barrier times out on a future that never acks") {
    val never: DeliveryFuture = _ => None
    assert(awaitDeliveries(Seq(ok, never), 10) ==
      Left("Kafka delivery future timed out waiting for broker acknowledgement"))
  }

  test("sendBatch runs the hook only after every ack, in order") {
    val events = mutable.ArrayBuffer.empty[String]
    val p = new ScriptedProducer() {
      override def trySend(topic: String, key: Option[String],
                           value: Array[Byte]): Either[EnqueueError, DeliveryFuture] = {
        events += s"send:$topic"
        Right { timeoutMs => { events += s"ack:$topic"; Some(Right(())) } }
      }
    }
    val r = sendBatch(p, Seq(("a", None, Array(1)), ("b", Some("k"), Array(2))),
      preCommitHook = () => events += "hook")
    assert(r == Right(2))
    // all sends precede the barrier; the hook is strictly last
    assert(events.toSeq == Seq("send:a", "send:b", "ack:a", "ack:b", "hook"))
  }

  test("sendBatch on delivery failure never runs the hook") {
    var hookRan = false
    val p = new ScriptedProducer() {
      override def trySend(topic: String, key: Option[String],
                           value: Array[Byte]): Either[EnqueueError, DeliveryFuture] =
        Right(_ => Some(Left("delivery failed")))
    }
    assert(sendBatch(p, Seq(("a", None, Array(1))),
      preCommitHook = () => hookRan = true) == Left("delivery failed"))
    assert(!hookRan)
  }

  test("flush-on-close: close flushes once, after all sends") {
    val p = new ScriptedProducer()
    assert(sendBatch(p, Seq(("a", None, Array(1)), ("a", None, Array(2)))).isRight)
    assert(KafkaDelivery.closeProducer(p))
    assert(p.flushCallCount == 1)
    assert(p.calls.toSeq == Seq("send:a", "send:a", "flush"))
  }

  test("flush timeout on close is survivable (false, not an exception)") {
    val p = new ScriptedProducer() {
      override def flush(timeoutMs: Long): Boolean = false
    }
    assert(!KafkaDelivery.closeProducer(p))
  }
}
