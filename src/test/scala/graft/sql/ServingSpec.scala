package graft.sql

import graft.{Catalog, SparkSpec}

class ServingSpec extends SparkSpec {

  test("every endpoint maps to an existing catalog query") {
    Serving.endpoints.values.foreach(n => assert(Catalog.byName.contains(n), s"missing $n"))
  }

  test("endpoint runs and serializes to a JSON array") {
    val json = Serving.toJson(Serving.run("/api/top-countries", spark, sf()), maxRows = 5)
    assert(json.startsWith("[{") && json.endsWith("}]"))
    assert(json.contains("\"region\""))
  }

  test("scheduled refresh ticks and can be stopped") {
    val out = java.nio.file.Files.createTempDirectory("graft_sched").toString + "/mv"
    val handle = Serving.scheduleRefresh(spark, sf(), "q07_user_segments", out, periodMillis = 60000)
    try {
      // wait for the commit marker, not the directory (which appears mid-write)
      val success = new java.io.File(out, "_SUCCESS")
      val deadline = System.currentTimeMillis() + 30000
      while (!success.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(success.exists(), "first refresh tick did not commit within 30s")
      assert(spark.read.parquet(out).count() > 0)
    } finally handle.close()
  }

  test("refresh overwrites the result table atomically") {
    val out = java.nio.file.Files.createTempDirectory("graft_refresh").toString + "/mv"
    Serving.refresh(spark, sf(), "q07_user_segments", out)
    val first = spark.read.parquet(out).count()
    Serving.refresh(spark, sf(), "q07_user_segments", out)
    assert(spark.read.parquet(out).count() == first && first > 0)
  }

  private def httpGet(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    conn.disconnect()
    (code, body)
  }

  test("HTTP shim serves endpoints over a real socket") {
    val handle = HttpServing.start(spark, sf())
    try {
      val base = s"http://127.0.0.1:${handle.port}"
      val (hc, hb) = httpGet(s"$base/health")
      assert(hc == 200 && hb.contains("ok"))
      for (route <- Seq("/api/top-countries", "/api/event-types", "/api/stats")) {
        val (code, body) = httpGet(s"$base$route")
        assert(code == 200, s"$route -> $code")
        assert(body.startsWith("[{") && body.endsWith("}]"), s"$route body: ${body.take(80)}")
      }
    } finally handle.close()
  }

  test("SSE change feed streams events and advances the cursor") {
    val handle = HttpServing.start(spark, sf())
    try {
      val (code, body) = httpGet(
        s"http://127.0.0.1:${handle.port}/api/stream?last_id=-1&rounds=2&interval_ms=50")
      assert(code == 200)
      val frames = body.split("\n\n").filter(_.startsWith("data: "))
      assert(frames.nonEmpty, s"no SSE frames in: ${body.take(120)}")
      assert(frames.head.contains("\"event_id\""))
      // the second round starts past the first round's cursor: ids never repeat
      val ids = frames.map(f => "\"event_id\":(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong)
      assert(ids.distinct.length == ids.length, "change feed re-emitted an event id")
    } finally handle.close()
  }
}
