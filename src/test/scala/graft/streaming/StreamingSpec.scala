package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 10.0),
    Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 5.0),
    Ev(3, ts("2024-01-01 11:00:00"), 2, "view", 7.0))
  private val batch2 = Seq(
    Ev(4, ts("2024-01-01 12:00:00"), 1, "purchase", 99.0),
    Ev(5, ts("2024-01-02 09:00:00"), 2, "view", 3.0),
    Ev(6, ts("2024-01-02 09:30:00"), 3, "view", 1.0))

  test("incremental streaming aggregation equals batch recomputation (MV property)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value").cast("decimal(18,2)")).as("val"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("mv_test").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("mv_test")
        .select("event_date", "event_type", "events", "val")
        .collect().map(_.toSeq).toSet
      val batch = (batch1 ++ batch2).toDF()
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("events"), sum(col("value").cast("decimal(18,2)")).as("val"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch partition upsert is idempotent under batch replay") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_upsert_test").toString + "/t"
    val b1 = batch1.toDF()
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("events"))
    StreamingMVs.upsertByPartition(b1, "event_date", out)
    val once = spark.read.parquet(out).collect().map(_.toSeq).toSet
    // checkpoint replay: the same micro-batch applied again must not duplicate
    StreamingMVs.upsertByPartition(b1, "event_date", out)
    val twice = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(once == twice)
  }

  test("upsert only overwrites partitions present in the batch") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_upsert_test2").toString + "/t"
    val day1 = Seq(("2024-01-01", "view", 3L)).toDF("event_date", "event_type", "events")
    val day2 = Seq(("2024-01-02", "view", 5L)).toDF("event_date", "event_type", "events")
    StreamingMVs.upsertByPartition(day1, "event_date", out)
    StreamingMVs.upsertByPartition(day2, "event_date", out)
    // day1 must survive the day2 batch
    assert(spark.read.parquet(out).count() == 2)
    val day2v2 = Seq(("2024-01-02", "view", 9L)).toDF("event_date", "event_type", "events")
    StreamingMVs.upsertByPartition(day2v2, "event_date", out)
    // partition column is type-inferred (Date) on read-back — compare as string
    val rows = spark.read.parquet(out).collect()
      .map(r => (String.valueOf(r.getAs[Any]("event_date")), r.getAs[Long]("events"))).toMap
    assert(rows == Map("2024-01-01" -> 3L, "2024-01-02" -> 9L))
  }

  test("checkpoint recovery: a restarted query reprocesses nothing (ST11)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_ckpt_sink").toString + "/mv"
    def runOnce(): Unit = {
      val agg = StreamingMVs.dailyMvStream(spark, sf())
        .withColumnRenamed("val_dec", "v")
        .select(col("event_date"), col("event_type"), col("events"), col("v").cast("double").as("total"))
      val q = agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          StreamingMVs.upsertByPartition(batch, "event_date", sink)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(sink).collect().map(_.toSeq).toSet
    assert(first.nonEmpty)
    // same source, same checkpoint: nothing new to process, sink unchanged
    runOnce()
    val second = spark.read.parquet(sink).collect().map(_.toSeq).toSet
    assert(second == first)
  }

  test("stream-stream interval self-join with watermarks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val v = views.toDF().select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases.toDF().select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = v.join(p,
      expr("v_user = p_user AND p_ts BETWEEN v_ts AND v_ts + INTERVAL 30 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_test").start()
    try {
      views.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0), Ev(2, ts("2024-01-01 10:00:00"), 2, "view", 0))
      purchases.addData(
        Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 9), // within 30 min of user 1's view
        Ev(4, ts("2024-01-01 11:10:00"), 2, "purchase", 9)) // outside the interval
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test").collect()
      assert(rows.length == 1, s"expected one attributed purchase, got ${rows.length}")
      assert(rows(0).getAs[Long]("v_user") == 1)
    } finally q.stop()
  }

  test("late rows fold into their group when no watermark is set (ST7 / ClickHouse parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = stream.toDF()
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("late_test").start()
    try {
      stream.addData(Ev(1, ts("2024-01-05 10:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // a row 4 days "late" relative to everything seen so far
      stream.addData(Ev(2, ts("2024-01-01 09:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late_test")
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
      // ClickHouse MV semantics: the late insert still lands in its key group
      assert(rows == Map("2024-01-05" -> 1L, "2024-01-01" -> 1L))
    } finally q.stop()
  }

  test("file-source streaming MV over testdata matches batch (AvailableNow)") {
    val agg = StreamingMVs.dailyMvStream(spark, sf())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("mv_file_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("mv_file_test").count()
    val batch = graft.Tables(spark, sf()).events
      .groupBy(to_date(col("ts")), col("event_type")).count().count()
    assert(streamed == batch && streamed > 0)
  }

  test("Residency.release between entries leaves memoized stream results intact (r7 item 7)") {
    // Residency.release now calls StateStore.stop() (unloads providers,
    // stops the maintenance pool) between timed entries, while the
    // heavyweight per-dir streams (st02 upsert sink, st10 interval join)
    // stay MEMOIZED for reuse — their catalog entries re-READ maintained
    // results without re-running the stream. This pins the interaction: a
    // release mid-sequence must not invalidate either memoized result, so
    // a future Spark upgrade that turns provider unload into state loss
    // fails here instead of as a silent wrong answer.
    val dir = sf()
    def readBoth(): (Seq[String], Seq[String]) = (
      graft.Catalog.byName("st02_streaming_upsert_sink").build(spark, dir)
        .collect().map(_.toString).toSeq,
      graft.Catalog.byName("st10_stream_stream_interval_join").build(spark, dir)
        .collect().map(_.toString).toSeq)
    val (st02First, st10First) = readBoth()
    assert(st02First.nonEmpty && st10First.nonEmpty)
    graft.Residency.release(spark)
    val (st02Again, st10Again) = readBoth()
    assert(st02Again == st02First, "st02 memoized sink changed across release")
    assert(st10Again == st10First, "st10 memoized join table changed across release")
    // and the release really did drop resident RDD state
    assert(graft.Residency.residentRddCount(spark) >= 0) // sanity: callable post-release
  }

  test("st13: gate partitions every event, discriminates, equals batch recompute") {
    import org.apache.spark.sql.functions._
    val r = graft.Catalog.byName("st13_streaming_quality_gate").build(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(1) == x.getLong(2) + x.getLong(3), s"${x.getString(0)}: gate must partition")
      assert(math.abs(x.getDouble(4) - x.getLong(2).toDouble / x.getLong(1)) < 1e-12)
    }
    // both verdicts occur on this corpus (value>100 exists), and totals match raw events
    assert(r.map(_.getLong(3)).sum > 0 && r.map(_.getLong(2)).sum > 0)
    val raw = graft.Tables(spark, sf()).events.count()
    assert(r.map(_.getLong(1)).sum == raw)
  }

  test("st15: streaming histogram MV equals batch recompute; bins bounded; totals exhaustive") {
    import org.apache.spark.sql.functions._
    val streamed = graft.Catalog.byName("st15_streaming_histogram")
      .build(spark, sf()).collect()
    assert(streamed.nonEmpty)
    // state is bounded by the MV definition: bin ∈ [0, 127]
    assert(streamed.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 127))
    // every event lands in exactly one (day, type, bin) — totals exhaustive
    val ev = graft.Tables(spark, sf()).events
    assert(streamed.map(_.getLong(3)).sum == ev.count())
    // independent batch recompute with the same pinned edges
    val bounds = ev.groupBy("event_type")
      .agg(min("value").as("mn"), max("value").as("mx"))
    val batch = ev.join(bounds, "event_type")
      .select(to_date(col("ts")).as("event_date"), col("event_type"),
        when(col("mx") === col("mn"), 0L)
          .otherwise(least(lit(127L),
            floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / 128.0d))))
          .as("bin"))
      .groupBy("event_date", "event_type", "bin")
      .agg(count(lit(1)).as("c")).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))
    assert(streamed.map(key).toSet == batch.map(key).toSet,
      "incremental histogram diverged from the batch recompute")
  }

  test("st14: streaming IVF routing equals an independent batch window-argmax recompute") {
    import org.apache.spark.sql.expressions.Window
    val streamed = graft.Catalog.byName("st14_streaming_ivf_routing")
      .build(spark, sf()).collect()
    assert(streamed.nonEmpty)
    // every vector routed exactly once
    val e = graft.Tables(spark, sf()).embeddings
    assert(streamed.map(_.getLong(1)).sum == e.count())
    // independent batch formulation: crossJoin + window argmax (the entry
    // uses a literal-centroid when() fold — this pins the tie-break match)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d").agg(avg(col("v").cast("double")).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        x => x.getField("c")).cast("array<float>").as("centroid"))
      .select(col("label").as("cent_label"), col("centroid"))
    val w = Window.partitionBy("vec_id").orderBy(desc("ccos"), asc("label"))
    val batch = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_label").as("label"),
        graft.pipeline.VectorOps.cosine(col("embedding"), col("centroid")).as("ccos"))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .groupBy(col("label").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_assigned"),
        min("ccos").as("min_cos"), max("ccos").as("max_cos"),
        sum(when(col("ccos") < 0.9, 1L).otherwise(0L)).cast("long").as("low_conf"))
      .collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(streamed.map(key).toSet == batch.map(key).toSet,
      "incremental routing diverged from the batch recompute")
  }

  test("st16: streaming retention MV equals q50's batch recompute row-for-row") {
    val streamed = graft.Catalog.byName("st16_streaming_retention")
      .build(spark, sf()).collect()
    val batch = graft.Catalog.byName("q50_retention").build(spark, sf()).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(streamed.map(key).toSeq == batch.map(key).toSeq,
      "incremental retention diverged from the batch recompute")
    assert(streamed.nonEmpty)
  }

  test("st20: streaming timeline MV equals lt01's batch recompute row-for-row") {
    val streamed = graft.Catalog.byName("st20_streaming_timeline")
      .build(spark, sf()).collect()
    val batch = graft.Catalog.byName("lt01_lttb_downsample").build(spark, sf()).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getTimestamp(1), r.getLong(2))
    assert(streamed.map(key).toSeq == batch.map(key).toSeq,
      "incremental timeline diverged from the batch recompute")
    assert(streamed.nonEmpty)
    // the serve read's window input is PROVABLY series×minutes: the
    // maintained MV has exactly one row per distinct (event_type, minute)
    // of the raw events — MV-sized, not event-history-sized
    val mv = StreamingMVs.timelineMv(spark, sf())
    val distinctMinutes = graft.Tables(spark, sf()).events
      .select(col("event_type"),
        graft.operators.Lttb.minuteCol(col("ts")))
      .distinct().count()
    assert(mv.count() == distinctMinutes,
      s"MV rows ${mv.count()} != distinct series-minutes $distinctMinutes")
  }

  test("st21: streaming URL dedup equals ur01's kept set; min-struct picks first-seen under any batch split") {
    // catalog-level: the maintained MV read equals ur01's first_seen rows
    val streamed = graft.Catalog.byName("st21_streaming_url_dedup")
      .build(spark, sf()).collect()
    val batch = graft.Catalog.byName("ur01_url_canonical").build(spark, sf())
      .filter(col("first_seen")).collect()
    val sKey = streamed.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq
    val bKey = batch.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(5))).toSeq // ur01: ..., first_seen, url_dups
    assert(sKey == bKey && sKey.nonEmpty,
      "streaming URL dedup diverged from ur01's kept set")
    // determinism under arrival order: the min-struct state must pick the
    // SMALLEST doc_id even when a duplicate's larger doc arrives first —
    // replay the same aggregate over a MemoryStream with adversarial batch
    // splits (larger doc first, then the true first-seen in a later batch)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val agg = ms.toDF().toDF("doc_id", "canon_url")
      .groupBy("canon_url")
      .agg(min(struct(col("doc_id"))).as("keep"), count(lit(1)).as("url_dups"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("st21_order_test").start()
    try {
      ms.addData((7L, "u1"), (9L, "u2"))
      q.processAllAvailable()
      ms.addData((3L, "u1"), (9L, "u3")) // true first-seen of u1 arrives LAST
      q.processAllAvailable()
      val got = spark.table("st21_order_test")
        .select(col("canon_url"), col("keep.doc_id"), col("url_dups"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("u1", 3L, 2L), ("u2", 9L, 1L), ("u3", 9L, 1L)), got.toString)
    } finally q.stop()
  }

  test("st19: streaming peak-concurrency MV equals q55's batch recompute") {
    val streamed = graft.Catalog.byName("st19_streaming_concurrency")
      .build(spark, sf()).collect()
    val batch = graft.Catalog.byName("q55_peak_concurrency").build(spark, sf()).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed(0).getLong(0) == batch(0).getLong(0),
      s"incremental peak ${streamed(0)} diverged from batch ${batch(0)}")
    assert(streamed(0).getTimestamp(1) == batch(0).getTimestamp(1),
      s"incremental peak instant ${streamed(0)} diverged from batch ${batch(0)}")
  }
}
