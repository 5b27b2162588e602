package graft.operators

/** O3 + E6: retry with exponential backoff, driven by an error taxonomy.
  *
  * The reference classifies CdcError into transient / permanent /
  * cancelled (error.rs:4-201, classifiers 175-200) and retries transient
  * consumer failures with 2^n-second backoff capped at 30 s, resetting
  * the counter once the queue drains (consumer.rs:203-278). Same policy
  * here, for sink-side work inside foreachBatch (Spark task retries cover
  * the read path).
  */
object Retry {

  sealed trait ErrorClass
  case object Transient extends ErrorClass
  case object Permanent extends ErrorClass
  case object Cancelled extends ErrorClass

  /** E6 classification: connection/timeout-ish → transient; interrupts →
    * cancelled; SQL semantics (constraint, syntax) → permanent. */
  def classify(t: Throwable): ErrorClass = t match {
    case _: InterruptedException => Cancelled
    case e: java.sql.SQLTransientException => Transient
    case e: java.sql.SQLNonTransientException => Permanent
    case e: java.sql.SQLException =>
      // recoverable classes by SQLSTATE: 08xxx connection, 40xxx rollback
      val state = Option(e.getSQLState).getOrElse("")
      if (state.startsWith("08") || state.startsWith("40")) Transient else Permanent
    case _: java.net.SocketException => Transient
    case _: java.net.SocketTimeoutException => Transient
    case _: java.io.IOException => Transient
    case _ => Permanent
  }

  /** Backoff schedule: 2^attempt seconds capped at 30 (consumer.rs:260-269). */
  def backoffSeconds(attempt: Int): Int = math.min(1L << math.min(attempt, 5), 30L).toInt

  /** Run `f`, retrying transient failures up to `maxAttempts`.
    * `sleep` injectable for tests. */
  def withRetry[A](maxAttempts: Int = 5,
                   sleep: Int => Unit = s => Thread.sleep(s * 1000L))(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case t: Throwable =>
          classify(t) match {
            case Transient if attempt < maxAttempts - 1 =>
              sleep(backoffSeconds(attempt))
              attempt += 1
            case _ => throw t
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
