package graft.llmops

/** Serving-index observability gauges, exposed through the /metrics
  * server next to the publish-lease counters ([[VersionedDir]]) and the
  * curate funnel ([[StreamingCurate]]). The load-bearing gauge is
  * `graft_index_tombstones_{text,ann}`: pending (uncompacted)
  * retractions widen the BM25 df-cap's slack (stored df − |dead| is the
  * live-df lower bound), and past a point NO term prices over the cap —
  * every stopword's corpus-sized posting read is silently re-admitted
  * until a compact runs. The release verb auto-compacts on buildup
  * (GRAFT_INDEX_AUTOCOMPACT_*), and this gauge is how an operator sees
  * the pressure between releases.
  *
  * Gauges come in two forms: [[set]] records a point-in-time value;
  * [[gauge]] registers a CALLBACK evaluated at every scrape, so the
  * exported value tracks the store's CURRENT state (a delete landing
  * between releases moves the scraped number immediately) instead of
  * freezing at the last maintenance verb's reading. A callback wins
  * over a static value of the same name; a callback that throws is
  * skipped for that scrape (the store may be mid-maintenance). */
object IndexMetrics {
  private val gauges =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
  private val callbacks =
    new java.util.concurrent.ConcurrentHashMap[String, () => Double]()

  def set(name: String, v: Double): Unit = gauges.put(name, v)

  /** Register a live gauge: `f` runs at every [[metricsSnapshot]]. Keep
    * it metadata-sized (e.g. a store's memoized `tombstoneCount`) — it
    * executes on the scrape path. Re-registering a name replaces the
    * previous callback (each release verb re-points it at the current
    * index paths). */
  def gauge(name: String)(f: => Double): Unit =
    callbacks.put(name, () => f)

  def metricsSnapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val live = callbacks.asScala.flatMap { case (k, f) =>
      scala.util.Try(f()).toOption.map(k -> _)
    }
    gauges.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap ++ live
  }
}
