package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("merged HLL sketches estimate exact distincts within 5% (in-plan flag)") {
    val rows = Catalog.byName("uq01_hll_mergeable_distinct").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sketch_ok") == 1L,
        s"${r.getString(0)}: sketch estimate outside 5% of exact")
    }
  }

  test("uq06: rank-selected quantiles equal the sorted-collect answer") {
    val r = Catalog.byName("uq06_exact_quantile_rank").build(spark, sf()).collect()
    assert(r.length == 3)
    val vals = Tables(spark, sf()).lineitem
      .select(org.apache.spark.sql.functions.col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    r.foreach { row =>
      val (q, rank, v) = (row.getDouble(0), row.getLong(1), row.getDouble(2))
      assert(rank == math.ceil(q * vals.length).toLong)
      // ties on l_extendedprice make the rank-TH ORDER — (v, okey, lnum) —
      // unique but the VALUE at a rank is still the sorted array's element
      assert(v == vals((rank - 1).toInt), s"q=$q")
    }
  }

  test("uq08: weighted quantiles equal a sorted-collect weighted scan") {
    val r = Catalog.byName("uq08_weighted_quantile").build(spark, sf()).collect()
    assert(r.length == 3)
    val rows = Tables(spark, sf()).lineitem
      .selectExpr("l_extendedprice", "CAST(l_quantity AS BIGINT)",
        "l_orderkey", "CAST(l_linenumber AS BIGINT)").collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(x => (x._1, x._3, x._4))
    val tot = rows.map(_._2).sum.toDouble
    r.foreach { row =>
      val (q, v, cw) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
      val thr = q * tot
      var cum = 0L
      val hit = rows.find { x => cum += x._2; cum >= thr }.get
      assert(hit._1 == v && cum == cw, s"q=$q")
    }
  }

  test("raw HLL union estimate tracks exact distinct (no flag indirection)") {
    val events = Tables(spark, sf()).events
    val est = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"union est $est vs exact $exact")
  }

  test("quantile scalars are ordered and approx median flag holds") {
    val rows = Catalog.byName("uq03_quantiles").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("median_exact")
      val (q25, q75, q95) =
        (r.getAs[Double]("q25"), r.getAs[Double]("q75"), r.getAs[Double]("q95"))
      assert(q25 <= m + 1e-9 && m <= q75 + 1e-9 && q75 <= q95 + 1e-9)
      assert(r.getAs[Long]("approx_ok") == 1L)
    }
  }

  test("approx_count_distinct within 15% (3x default rsd) of exact") {
    val rows = Catalog.byName("uq02_uniq_approx").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("uniq_ok") == 1L))
  }

  test("uq04 histogram quantiles satisfy the rank property against raw values") {
    val est = Catalog.byName("uq04_histogram_quantiles").build(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Seq(0.5 -> r.getDouble(2), 0.9 -> r.getDouble(3), 0.99 -> r.getDouble(4))))
      .toMap
    assert(est.size == 5)
    // independent recomputation: collect raw values per type, rebuild the
    // 128-bin histogram in plain Scala, and check each estimate lands inside
    // the bin holding its target rank (the defining property — a width-based
    // error bound is wrong for sparse histograms with empty-bin gaps)
    val raw = graft.Tables(spark, sf()).events
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    est.foreach { case (tpe, (nTotal, qs)) =>
      val vs = raw(tpe)
      assert(nTotal == vs.length.toLong)
      val (mn, mx) = (vs.min, vs.max)
      val width = (mx - mn) / 128.0
      val counts = new Array[Long](128)
      vs.foreach(v => counts(math.min(127, math.floor((v - mn) / width).toInt)) += 1)
      val cum = counts.scanLeft(0L)(_ + _).tail
      qs.foreach { case (q, v) =>
        val target = q * vs.length
        val bin = cum.indexWhere(_ >= target)
        assert(v >= mn + width * bin - 1e-9 && v <= mn + width * (bin + 1) + 1e-9,
          s"$tpe q=$q est $v outside bin $bin [${mn + width * bin}, ${mn + width * (bin + 1)}]")
      }
      // and the three estimates are monotone
      assert(qs(0)._2 <= qs(1)._2 + 1e-9 && qs(1)._2 <= qs(2)._2 + 1e-9)
    }
  }

  test("uq05 equals the plain groupBy top-20 and reports coverage guaranteed") {
    val rows = Catalog.byName("uq05_heavy_hitters").build(spark, sf()).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("guaranteed")))
    val plain = Tables(spark, sf()).documents
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("word")).limit(20).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("uq05 refuses loudly when the MG coverage bound cannot certify the top-20") {
    // flat corpus: 50k distinct words, each once -> N=50000, kth freq=1,
    // 1 * 2049 <= 50000 — the candidate-only top-20 is NOT provably exact,
    // so the entry must refuse (ADVICE r9), not ship a maybe-wrong answer
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_uq05_flat").toString
    (0 until 500).map { d =>
      (d.toLong, (0 until 100).map(w => s"w${d}_$w").mkString(" "), "en", "syn", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      Catalog.byName("uq05_heavy_hitters").build(spark, dir).collect()
    }
    assert(ex.getMessage.contains("coverage NOT guaranteed"))
    assert(ex.getMessage.contains("MgCapacity"))
  }

  test("uq05 Misra-Gries: evictions fire and the superset guarantee holds on a skewed toy") {
    // 10k distinct terms, zipf-ish skew, capacity 64 — domain is 156x the
    // capacity, so the decrement-all path runs constantly
    val cap = 64
    val heavy = (0 until 30).flatMap(i => Seq.fill(2000 - i * 50)(s"hh$i"))
    val tail = (0 until 10000).flatMap(i => Seq.fill(3)(s"t$i"))
    val stream = scala.util.Random.shuffle(scala.util.Random.shuffle(heavy ++ tail))
    val n = stream.length.toLong
    val kept = Sketches.misraGries(stream.iterator, cap).toSet
    assert(kept.size <= cap, s"capacity violated: ${kept.size}")
    // MG guarantee: every item with count > n/(cap+1) must be retained
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
    val mustKeep = exact.filter(_._2 > n / (cap + 1)).keys.toSet
    assert(mustKeep.nonEmpty, "toy produced no guaranteed items — tighten the skew")
    assert(mustKeep.subsetOf(kept),
      s"guarantee broken: missing ${mustKeep.diff(kept).take(5)}")
    // and plenty of the 10k-term tail was evicted (the sketch actually sketches)
    assert(kept.size < 10030)
  }
}
