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

  test("refresh overwrites the result table atomically") {
    val out = java.nio.file.Files.createTempDirectory("graft_refresh").toString + "/mv"
    Serving.refresh(spark, sf(), "q07_user_segments", out)
    val first = spark.read.parquet(out).count()
    Serving.refresh(spark, sf(), "q07_user_segments", out)
    assert(spark.read.parquet(out).count() == first && first > 0)
  }
}
