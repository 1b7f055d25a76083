package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class LayoutSpec extends SparkSpec {

  private def syntheticEvents() = {
    import spark.implicits._
    Seq(
      (1L, Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "view", 1.0),
      (2L, Timestamp.valueOf("2024-01-20 11:00:00"), 2L, "click", 2.0),
      (3L, Timestamp.valueOf("2024-02-03 12:00:00"), 1L, "view", 3.0),
      (4L, Timestamp.valueOf("2024-03-15 13:00:00"), 3L, "purchase", 4.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("partitioned write produces monthly dirs; pruned read touches fewer files") {
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/events"
    Layout.writeEventsPartitioned(syntheticEvents(), out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("event_month="))
    assert(dirs.toSet == Set("event_month=202401", "event_month=202402", "event_month=202403"))

    val all = Layout.readEvents(spark, out)
    assert(all.count() == 4)
    val pruned = all.filter(col("event_month") === 202401)
    assert(pruned.count() == 2)
    // pruning shows up as a PartitionFilters clause on the scan node
    // (DataFrame.inputFiles lists the relation's files pre-pruning)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_month"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("TTL drops expired month partitions without touching the rest") {
    val out = java.nio.file.Files.createTempDirectory("graft_ttl").toString + "/events"
    Layout.writeEventsPartitioned(syntheticEvents(), out)
    val dropped = Layout.dropExpiredPartitions(out, cutoffMonth = 202402)
    assert(dropped == Seq("event_month=202401"))
    val rest = Layout.readEvents(spark, out)
    assert(rest.count() == 2)
    assert(rest.select(min("event_month")).collect()(0).getInt(0) == 202402)
  }

  test("compaction rewrites a partition to fewer files, same rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/events"
    // write with many shuffle partitions to force several small files
    val many = syntheticEvents().repartition(6)
    many.withColumn("event_month", date_format(col("ts"), "yyyyMM").cast("int"))
      .write.mode("overwrite").partitionBy("event_month").parquet(out)
    val before = spark.read.parquet(out).filter(col("event_month") === 202401)
    val filesBefore = new java.io.File(out + "/event_month=202401")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val rowsBefore = before.count()
    assert(filesBefore > 1)
    Layout.compactPartition(spark, out, 202401)
    val filesAfter = new java.io.File(out + "/event_month=202401")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 1)
    assert(spark.read.parquet(out).filter(col("event_month") === 202401).count() == rowsBefore)
  }

  test("sort-within-partitions layout is preserved in written files") {
    val out = java.nio.file.Files.createTempDirectory("graft_sort").toString + "/events"
    Layout.writeEventsPartitioned(syntheticEvents(), out)
    // within the Jan partition, rows must be ordered by the sort key
    val jan = spark.read.parquet(out + "/event_month=202401").collect()
    val key = jan.map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("ts").getTime))
    assert(key.sorted.sameElements(key), "rows should be sorted by (event_type, ts)")
  }

  test("schema evolution: mergeSchema unifies old and new file versions with null backfill") {
    import spark.implicits._
    // v1 writers knew (event_id, value); v2 adds a quality_score column —
    // the exact evolution an ingest layout sees when a new pipeline stage
    // starts stamping extra columns into later partitions
    val root = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "value")
      .write.parquet(s"$root/event_month=202401")
    Seq((3L, 30.0, 0.9), (4L, 40.0, 0.2)).toDF("event_id", "value", "quality_score")
      .write.parquet(s"$root/event_month=202402")
    val df = spark.read.option("mergeSchema", "true").parquet(root)
    assert(df.columns.toSet == Set("event_id", "value", "quality_score", "event_month"))
    val rows = df.collect().map(r =>
      r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("quality_score"))) None
         else Some(r.getAs[Double]("quality_score")))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old files must backfill NULL")
    assert(rows(3L).contains(0.9) && rows(4L).contains(0.2))
    // predicates on the evolved column stay pushable and never match old rows
    val hits = df.filter(col("quality_score") > 0.5).collect()
    assert(hits.map(_.getAs[Long]("event_id")).toSeq == Seq(3L))
  }

  test("zo01: Morton key is a bijection on the 256x256 grid and tiles are 8x8 squares") {
    val grid = spark.range(256L * 256L)
      .selectExpr("id % 256 AS ux", "id DIV 256 AS dy")
    val z = graft.Catalog.byName("zo01_zorder_layout") // entry under test builds its own key;
    assert(z != null)                                   // here we test the kernel directly
    val keyed = grid.selectExpr("ux", "dy",
      (0 until 8).map(i =>
        s"(((ux >> $i) & 1) << ${2 * i}) + (((dy >> $i) & 1) << ${2 * i + 1})")
        .mkString("(", " + ", ") AS zkey"))
    val rows = keyed.collect()
    // bijection: 65536 distinct codes covering exactly [0, 65535]
    val codes = rows.map(_.getAs[Long]("zkey"))
    assert(codes.distinct.length == 65536 && codes.min == 0L && codes.max == 65535L)
    // every 64-code tile is an aligned 8x8 square in (ux, dy)
    val byTile = rows.groupBy(_.getAs[Long]("zkey") / 64)
    byTile.foreach { case (_, rs) =>
      val us = rs.map(_.getAs[Long]("ux")); val ds = rs.map(_.getAs[Long]("dy"))
      assert(rs.length == 64)
      assert(us.max - us.min == 7 && us.min % 8 == 0, "aligned 8-wide user span")
      assert(ds.max - ds.min == 7 && ds.min % 8 == 0, "aligned 8-wide day span")
    }
  }
}
