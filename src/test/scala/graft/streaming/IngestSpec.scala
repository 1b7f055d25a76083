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

  test("change feed: monotonic ids, respects cursor and limit") {
    val first = Ingest.changeFeed(spark, sf(), lastSeenId = 0, limit = 10).collect()
    assert(first.length == 10)
    val ids = first.map(_.getAs[Long]("event_id"))
    assert(ids.sorted.sameElements(ids) && ids.head > 0)
    val next = Ingest.changeFeed(spark, sf(), lastSeenId = ids.last, limit = 10).collect()
    assert(next.head.getAs[Long]("event_id") > ids.last)
  }
}
