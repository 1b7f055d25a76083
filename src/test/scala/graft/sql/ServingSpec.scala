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
}
