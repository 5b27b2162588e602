package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** E4: the Prometheus scrape surface over [[CdcMetricsListener]]
  * (reference monitoring/metrics_server.rs — HTTP :8080, text format).
  *
  * JDK-built-in HTTP server, zero dependencies, one daemon thread —
  * metrics serving must never compete with executor threads. `port = 0`
  * binds an ephemeral port (tests); the reference's default is 8080.
  * Endpoints: `/metrics` (Prometheus text exposition v0.0.4) and
  * `/health` (200 "ok"), matching the reference server's surface.
  */
class MetricsServer(listener: CdcMetricsListener, port: Int = 8080,
                    extra: () => Map[String, Double] = () => Map.empty) {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, MetricsServer.render(listener.snapshot() ++ extra()),
        "text/plain; version=0.0.4; charset=utf-8")
  })
  server.createContext("/health", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, "ok", "text/plain; charset=utf-8")
  })

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  def start(): MetricsServer = {
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-metrics-server"); t.setDaemon(true); t
    })
    server.start()
    this
  }

  /** The actually-bound port (differs from the requested one when 0). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object MetricsServer {
  /** Prometheus text exposition: `# TYPE` line + sample per metric.
    * Counters end in `_total`; everything else is a gauge. Names may
    * carry `{label="..."}` suffixes — the TYPE line uses the base name
    * and is emitted once per metric family, samples keep their labels. */
  def render(snapshot: Map[String, Double]): String = {
    val sb = new StringBuilder
    var lastBase = ""
    // sort by (base, name), not bare name: '{' sorts after letters, so
    // a name sorting between a family's bare and labeled samples would
    // otherwise split the family and emit a duplicate TYPE line (which
    // Prometheus parsers reject)
    snapshot.toSeq.sortBy { case (n, _) => (n.takeWhile(_ != '{'), n) }
      .foreach { case (name, value) =>
      val base = name.takeWhile(_ != '{')
      if (base != lastBase) {
        val kind = if (base.endsWith("_total")) "counter" else "gauge"
        sb.append(s"# TYPE $base $kind\n")
        lastBase = base
      }
      val v = if (value == value.floor && !value.isInfinite) value.toLong.toString
              else value.toString
      sb.append(s"$name $v\n")
    }
    sb.toString
  }
}
