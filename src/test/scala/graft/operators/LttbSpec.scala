package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins lt01's downsample math end-to-end on hand-computed series: bucket
  * boundaries from the floor-division formula, the endpoint pass-through,
  * the neighbor-average anchors, the per-bucket argmax, and the
  * smallest-x tie-break.
  */
class LttbSpec extends SparkSpec {

  private def run(pts: Seq[(String, Long, Long)], k: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    Lttb.downsample(pts.toDF("series", "x", "y"), k)
      .orderBy("series", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("series with n <= k pass through unchanged") {
    val pts = (0L until 5L).map(x => ("a", x, x * x))
    assert(run(pts, 5) == pts)
    assert(run(pts, 60) == pts)
  }

  test("bucket boundaries follow floor((rn-1)*(k-2)/(n-2)) and endpoints are kept") {
    // n=8, k=4: interior rn 1..6 -> b = (rn-1)*2 div 6 = 0,0,0,1,1,1.
    // Flat series except one spike per bucket: the spike wins its bucket's
    // argmax (any non-collinear point beats collinear ones), endpoints kept.
    val ys = Seq(0L, 0L, 9L, 0L, 0L, 7L, 0L, 0L) // x = 0..7
    val pts = ys.zipWithIndex.map { case (y, x) => ("a", x.toLong, y) }
    val out = run(pts, 4)
    // endpoints (0,0) and (7,0); bucket 0 = x in 1..3 picks the spike at 2;
    // bucket 1 = x in 4..6 picks the spike at 5
    assert(out == Seq(("a", 0L, 0L), ("a", 2L, 9L), ("a", 5L, 7L), ("a", 7L, 0L)), out.toString)
  }

  test("equal-area ties break to the smallest x") {
    // n=7, k=3: ONE interior bucket (rn 1..5 all -> b=0), anchors are the two
    // endpoints. A constant interior y makes every interior triangle area
    // equal (collinear anchors at the same y): area2 identical -> smallest x.
    val pts = (0L until 7L).map(x => ("a", x, 4L))
    val out = run(pts, 3)
    assert(out == Seq(("a", 0L, 4L), ("a", 1L, 4L), ("a", 6L, 4L)), out.toString)
  }

  test("interior argmax subtends the largest triangle against neighbor-average anchors") {
    // n=7, k=3: single interior bucket, anchors = endpoints (0,0) and (6,0).
    // Triangle area vs the flat baseline is proportional to |y|, so the
    // largest |y| wins regardless of x position.
    val ys = Seq(0L, 3L, 1L, 8L, 2L, 3L, 0L)
    val pts = ys.zipWithIndex.map { case (y, x) => ("a", x.toLong, y) }
    val out = run(pts, 3)
    assert(out == Seq(("a", 0L, 0L), ("a", 3L, 8L), ("a", 6L, 0L)), out.toString)
  }

  test("multiple series downsample independently") {
    val a = (0L until 100L).map(x => ("a", x, x % 10))
    val b = (0L until 3L).map(x => ("b", x, 1L))
    val out = run(a ++ b, 10)
    val bySeries = out.groupBy(_._1)
    assert(bySeries("a").length == 10, s"a kept ${bySeries("a").length}")
    assert(bySeries("b") == b, "small series b must pass through")
    // endpoints of a present
    assert(bySeries("a").map(_._2).min == 0L && bySeries("a").map(_._2).max == 99L)
  }

  test("x rebase leaves selection invariant (translation invariance)") {
    val ys = Seq(0L, 3L, 1L, 8L, 2L, 3L, 0L)
    val base = ys.zipWithIndex.map { case (y, x) => ("a", x.toLong, y) }
    val shifted = base.map { case (s, x, y) => (s, x + 29_000_000L, y) }
    val outBase = run(base, 3).map { case (s, x, y) => (s, x + 29_000_000L, y) }
    assert(run(shifted, 3) == outBase)
  }

  test("area2 overflow guard fails loudly past the 2^31-per-factor budget") {
    // A series whose x-range breaks the per-operand budget: xr reaches
    // 2^33 > 2^31, so the guard must raise with its named message instead
    // of letting the BIGINT products overflow (silently pre-ANSI, with a
    // generic arithmetic error under ANSI). n=7 > k=3 forces the scored
    // (guarded) path; y values are non-collinear so area2 is load-bearing.
    val ys = Seq(0L, 3L, 1L, 8L, 2L, 3L, 0L)
    val pts = ys.zipWithIndex.map { case (y, x) => ("a", x.toLong << 31, y) }
    val ex = intercept[Exception] { run(pts, 3) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("lttb area2 would overflow")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("lt01 catalog entry runs green on testdata and is k-bounded per series") {
    val df = graft.Catalog.byName("lt01_lttb_downsample").build(spark, "/root/testdata/sf0.001")
    val perSeries = df.groupBy("event_type").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSeries.nonEmpty)
    perSeries.foreach { case (s, c) =>
      assert(c <= Lttb.K, s"series $s kept $c > K=${Lttb.K} points")
    }
  }
}
