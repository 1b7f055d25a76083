package graft.sql

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SystemTablesSpec extends SparkSpec {

  test("footer-derived row counts match actual table counts without scanning") {
    val fromFooters = SystemTables.tables(spark, sf())
      .select("table_name", "total_rows")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromFooters("nation") == Tables(spark, sf()).nation.count())
    assert(fromFooters("events") == Tables(spark, sf()).events.count())
    assert(fromFooters.size == 10)
    // compression stats exist and are sane
    val ratio = SystemTables.tables(spark, sf())
      .filter(col("table_name") === "lineitem")
      .select("compression_ratio").head().getDouble(0)
    assert(ratio > 0.1 && ratio < 100.0)
  }

  test("introspection views are SQL-queryable (system_tables / system_parts / system_query_log)") {
    SystemTables.registerViews(spark, sf())
    val n = spark.sql(
      "SELECT total_rows FROM system_tables WHERE table_name = 'region'").head().getLong(0)
    assert(n == 5)
    assert(spark.sql("SELECT COUNT(*) FROM system_parts").head().getLong(0) >= 10)
    spark.sql("SELECT * FROM system_query_log").collect() // queryable, possibly empty
  }

  test("query log records completed actions with durations") {
    SystemTables.QueryLog.install(spark)
    Tables(spark, sf()).region.count()
    SystemTables.QueryLog.await("count", atLeast = 1)
    val log = SystemTables.QueryLog.frame(spark)
      .filter(col("fn") === "count" && col("status") === "QueryFinish")
    assert(log.count() >= 1)
    assert(log.filter(col("duration_ms") < 0).count() == 0)
  }
}
