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
  * the pressure between releases. */
object IndexMetrics {
  private val gauges =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def set(name: String, v: Double): Unit = gauges.put(name, v)

  def metricsSnapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    gauges.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap
  }
}
