package graft.sinks

/** Kafka delivery semantics as pure, producer-agnostic logic.
  *
  * Behavioral contract from the reference's Kafka destination:
  *  - enqueue retry (kafka.rs:346-389): UnknownTopic/UnknownTopicOrPartition/
  *    QueueFull are retryable with exponential backoff 100ms·2^n capped at
  *    3s, at most 5 attempts; a retryable failure on the final attempt and
  *    any other error return the error itself.
  *  - delivery barrier (kafka.rs:391-416): every enqueued record's delivery
  *    future must acknowledge within 30s before the batch counts as applied
  *    (and before the pre-commit hook runs, kafka.rs:723-731) — this is the
  *    at-least-once boundary Spark's epoch commit maps onto.
  *  - flush-on-close (kafka.rs:734-750): close flushes the producer with a
  *    timeout; a flush failure is a warning, not an error (messages
  *    re-deliver on restart — same warning the reference logs).
  *
  * In production the 5-line `writeStream.format("kafka")` composition
  * (DebeziumEnvelope + built-in sink) supplies the transport; this module
  * exists so the retry/barrier/flush state machines are testable against a
  * scripted fake without a broker.
  */
object KafkaDelivery {

  sealed trait EnqueueError
  case object UnknownTopic extends EnqueueError
  case object QueueFull extends EnqueueError
  final case class FatalError(message: String) extends EnqueueError

  /** A pending broker acknowledgement.
    * await: None = no ack within timeout; Some(Left) = broker error;
    * Some(Right) = delivered. */
  trait DeliveryFuture {
    def await(timeoutMs: Long): Option[Either[String, Unit]]
  }

  /** The minimal producer surface the semantics need (the rdkafka
    * send_result/flush analog). */
  trait ProducerLike {
    def trySend(topic: String, key: Option[String],
                value: Array[Byte]): Either[EnqueueError, DeliveryFuture]
    /** Block until all queued messages are delivered or timeout; true =
      * fully flushed. */
    def flush(timeoutMs: Long): Boolean
  }

  val MaxRetries = 5
  val BaseDelayMs = 100L
  val MaxDelayMs = 3000L
  val DeliveryTimeoutMs = 30000L
  val FlushTimeoutMs = 30000L

  /** 100ms·2^attempt, saturating, capped at 3s (kafka.rs:376-379). */
  def backoffDelayMs(attempt: Int): Long =
    if (attempt >= 35) MaxDelayMs
    else math.min(BaseDelayMs * (1L << attempt), MaxDelayMs)

  private def isRetryable(e: EnqueueError): Boolean =
    e == UnknownTopic || e == QueueFull

  /** Enqueue with retry; `sleep` is injectable so tests assert the exact
    * backoff schedule without waiting. */
  def enqueueWithRetry(p: ProducerLike, topic: String, key: Option[String],
                       value: Array[Byte],
                       sleep: Long => Unit = Thread.sleep): Either[String, DeliveryFuture] = {
    var attempt = 0
    while (attempt < MaxRetries) {
      p.trySend(topic, key, value) match {
        case Right(f) => return Right(f)
        case Left(e) if isRetryable(e) && attempt < MaxRetries - 1 =>
          sleep(backoffDelayMs(attempt))
        case Left(FatalError(m)) => return Left(m)
        // retryable error on the final attempt returns the error itself
        case Left(e) => return Left(s"Kafka enqueue failed: $e")
      }
      attempt += 1
    }
    Left("Kafka enqueue failed after max retries")
  }

  /** The delivery barrier: all futures must ack within the timeout; the
    * first timeout/error aborts (kafka.rs:391-416). */
  def awaitDeliveries(futures: Seq[DeliveryFuture],
                      timeoutMs: Long = DeliveryTimeoutMs): Either[String, Unit] = {
    futures.foreach { f =>
      f.await(timeoutMs) match {
        case None =>
          return Left("Kafka delivery future timed out waiting for broker acknowledgement")
        case Some(Left(err)) => return Left(err)
        case Some(Right(_)) => ()
      }
    }
    Right(())
  }

  /** One events batch: enqueue everything (with retry), then the barrier,
    * then — only after every ack — the pre-commit hook (kafka.rs:700-731).
    * Returns the delivered record count. */
  def sendBatch(p: ProducerLike,
                records: Seq[(String, Option[String], Array[Byte])],
                preCommitHook: () => Unit = () => (),
                sleep: Long => Unit = Thread.sleep,
                deliveryTimeoutMs: Long = DeliveryTimeoutMs): Either[String, Int] = {
    val futures = Seq.newBuilder[DeliveryFuture]
    records.foreach { case (topic, key, value) =>
      enqueueWithRetry(p, topic, key, value, sleep) match {
        case Left(err) => return Left(err)
        case Right(f) => futures += f
      }
    }
    val fs = futures.result()
    awaitDeliveries(fs, deliveryTimeoutMs) match {
      case Left(err) => Left(err)
      case Right(_) => preCommitHook(); Right(fs.size)
    }
  }

  /** Flush-on-close: true = clean flush; false = timed out/failed, which
    * is survivable (re-delivery on restart) and reported as a warning by
    * callers, never an error (kafka.rs:734-750). */
  def closeProducer(p: ProducerLike, flushTimeoutMs: Long = FlushTimeoutMs): Boolean =
    p.flush(flushTimeoutMs)
}
