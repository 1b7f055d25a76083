package graft.streaming

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("generated event stream produces deterministic, schema-complete batches") {
    val q = Ingest.generatedEventStream(spark, rowsPerBatch = 50)
      .writeStream.outputMode("append")
      .format("memory").queryName("gen_test").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("gen_test").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("gen_test").collect()
      assert(rows.nonEmpty, "stream produced no rows in 30s")
      rows.foreach { r =>
        assert(r.getAs[Long]("user_id") >= 0 && r.getAs[Long]("user_id") < 150)
        assert(Set("view", "click", "purchase", "signup", "error")(r.getAs[String]("event_type")))
        assert(r.getAs[Double]("value") > 0)
      }
      // determinism: same id → same derived attributes on a fresh run
      val ids = rows.map(_.getAs[Long]("event_id")).toSet
      assert(ids.size == rows.length, "event ids must be unique")
    } finally q.stop()
  }

  test("watermarked minute MV over the generated stream runs") {
    val q = Ingest.generatedMinuteMv(spark, rowsPerBatch = 200)
      .writeStream.outputMode("update")
      .format("memory").queryName("gen_mv_test").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("gen_mv_test").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(!spark.table("gen_mv_test").isEmpty)
    } finally q.stop()
  }

  test("JSONEachRow lines parse into the typed events schema; malformed -> nulls") {
    import spark.implicits._
    val lines = Seq(
      """{"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 7, "event_type": "view", "value": 1.5, "props": "{}"}""",
      """not json at all""",
    ).toDF("value")
    val parsed = Ingest.fromJsonLines(spark, lines).collect()
    assert(parsed.length == 2)
    val good = parsed.find(r => !r.isNullAt(0)).get
    assert(good.getLong(0) == 1 && good.getLong(2) == 7 && good.getString(3) == "view")
    assert(parsed.exists(_.isNullAt(0)), "malformed line should yield nulls, not fail")
  }

  test("stream-static enrichment joins the dim via broadcast") {
    import spark.implicits._
    val dim = Seq((0L, "seg_a"), (1L, "seg_b")).toDF("user_id", "segment")
    val enriched = Ingest.enrichedStream(spark, rowsPerBatch = 50, dim)
    assert(enriched.isStreaming)
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_test").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("enrich_test").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("enrich_test").collect()
      assert(rows.nonEmpty)
      // users 0/1 got a segment, everyone else null (left join)
      assert(rows.filter(r => r.getAs[Long]("user_id") <= 1)
        .forall(r => r.getAs[String]("segment") != null))
    } finally q.stop()
  }

  test("change feed: monotonic ids, respects cursor and limit") {
    val first = Ingest.changeFeed(spark, sf(), lastSeenId = 0, limit = 10).collect()
    assert(first.length == 10)
    val ids = first.map(_.getAs[Long]("event_id"))
    assert(ids.sorted.sameElements(ids) && ids.head > 0)
    val next = Ingest.changeFeed(spark, sf(), lastSeenId = ids.last, limit = 10).collect()
    assert(next.head.getAs[Long]("event_id") > ids.last)
  }
}
