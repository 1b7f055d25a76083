package graft.sql

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Socket-level serving shim over [[Serving]]'s endpoint map — the analog of
  * the reference's Flask apps (app.py:40–413 JSON dashboard routes;
  * app_interactive.py:38–89 SSE change-feed loop). JDK-only
  * (`com.sun.net.httpserver`), no new dependencies.
  *
  * Model: one shared SparkSession; each request runs its endpoint's catalog
  * query and serializes the post-LIMIT result (Serving.toJson — the one
  * documented collect edge). The SSE route replays the reference's tail loop:
  * poll events with `event_id > last-seen` in id order (Ingest.changeFeed —
  * min/max-pruned scan + TakeOrderedAndProject), emit one `data:` frame per
  * event, advance the cursor, sleep, repeat.
  */
object HttpServing {

  final case class Handle(server: HttpServer, port: Int) extends AutoCloseable {
    override def close(): Unit = server.stop(0)
  }

  /** Start on 127.0.0.1:`port` (0 = ephemeral); returns the bound handle. */
  def start(spark: SparkSession, dir: String, port: Int = 0): Handle = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-http"); t.setDaemon(true); t
    }))
    Serving.endpoints.keys.foreach { route =>
      server.createContext(route, jsonHandler(route, spark, dir))
    }
    server.createContext("/api/stream", sseHandler(spark, dir))
    server.createContext("/health",
      (ex: HttpExchange) => respond(ex, 200, """{"status":"ok"}""", "application/json"))
    server.start()
    Handle(server, server.getAddress.getPort)
  }

  private def respond(ex: HttpExchange, code: Int, body: String, contentType: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jsonHandler(route: String, spark: SparkSession, dir: String): HttpHandler =
    (ex: HttpExchange) =>
      try respond(ex, 200, Serving.toJson(Serving.run(route, spark, dir)), "application/json")
      catch { case e: Throwable =>
        respond(ex, 500, s"""{"error": "${e.getClass.getSimpleName}"}""", "application/json")
      }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap

  /** SSE change feed: `/api/stream?last_id=-1&rounds=3&interval_ms=200`.
    * Bounded rounds (the reference loops forever; a bound keeps the handler
    * testable and the executor pool drainable) — a dashboard client simply
    * reconnects with its last seen id, which is also the reference's
    * reconnect semantics.
    */
  private def sseHandler(spark: SparkSession, dir: String): HttpHandler =
    (ex: HttpExchange) =>
      try {
        val p = queryParams(ex)
        var last = p.getOrElse("last_id", "-1").toLong
        val rounds = math.min(p.getOrElse("rounds", "3").toInt, 100)
        val intervalMs = math.min(p.getOrElse("interval_ms", "200").toLong, 10000L)
        ex.getResponseHeaders.add("Content-Type", "text/event-stream")
        ex.getResponseHeaders.add("Cache-Control", "no-cache")
        ex.sendResponseHeaders(200, 0) // chunked
        val os = ex.getResponseBody
        var r = 0
        while (r < rounds) {
          val feed = graft.streaming.Ingest.changeFeed(spark, dir, last)
          // one collect: the event_id cursor and the JSON payload together
          val batch = feed.select(col("event_id"),
            to_json(struct(feed.columns.map(col): _*)).as("j")).collect()
          batch.foreach(row => os.write(s"data: ${row.getString(1)}\n\n".getBytes(UTF_8)))
          os.flush()
          last = batch.lastOption.map(_.getLong(0)).getOrElse(last)
          r += 1
          if (r < rounds) Thread.sleep(intervalMs)
        }
        os.close()
        ex.close()
      } catch { case _: Throwable => ex.close() }
}
