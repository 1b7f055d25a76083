package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequencyScreenSpec extends SparkSpec {

  private def naiveLane(counts: Map[Long, Int], cells: Long, v: Long): Int = {
    // reference lane value: sum of saturated increments landing on v's cell
    val mask = cells - 1
    val cell = graft.functions.BloomHash.mix(v) & mask
    math.min(3, counts.collect {
      case (x, c) if (graft.functions.BloomHash.mix(x) & mask) == cell => c
    }.sum)
  }

  test("mergeSaturating == lane-wise min(3, a+b) on every lane pattern") {
    // exhaustive over one nibble pair is enough (SWAR is lane-local), but
    // run whole words with mixed lanes to catch cross-lane carries
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      def word(): Long = (0 until 32).map(l => (rnd.nextInt(4).toLong << (l * 2))).reduce(_ | _)
      val a = Array(word(), word()); val b = Array(word(), word())
      val expect = a.zip(b).map { case (x, y) =>
        (0 until 32).map { l =>
          val s = math.min(3L, ((x >>> (l * 2)) & 3L) + ((y >>> (l * 2)) & 3L))
          s << (l * 2)
        }.reduce(_ | _)
      }
      val got = FrequencyScreen.mergeSaturating(a.clone(), b)
      assert(got.toSeq == expect.toSeq)
    }
  }

  test("shared and partitioned builds produce the identical sketch") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(50000)(rnd.nextInt(8000).toLong)
    val df = vals.toDF("pk").repartition(13)
    val cells = 1L << 20
    val s1 = FrequencyScreen.buildThresholdSketch(df, "pk", cells, Some("shared"))
    val s2 = FrequencyScreen.buildThresholdSketch(df, "pk", cells, Some("partitioned"))
    assert(s1.toSeq == s2.toSeq)
    // and both agree with a driver-side reference on every present value
    val counts = vals.groupBy(identity).map { case (v, xs) => v -> xs.size }
    for (v <- counts.keys.take(500)) {
      val lane = naiveLane(counts, cells, v)
      assert(FrequencyScreen.saturated(s1, cells - 1, v) == (lane >= 3),
        s"value $v: lane $lane vs saturated=${FrequencyScreen.saturated(s1, cells - 1, v)}")
    }
  }

  test("screen admits every true >=3 value (no false negatives) through the codegen probe") {
    import spark.implicits._
    // skewed multiset: values 0..99 appear (v % 7) times -> thresholds vary
    val vals = for (v <- 0L until 4000L; _ <- 0 until (v % 7).toInt) yield v
    val df = vals.toDF("pk").repartition(9)
    val cells = 1L << 20
    val sketch = FrequencyScreen.buildThresholdSketch(df, "pk", cells)
    val bc = spark.sparkContext.broadcast(sketch)
    val screened = df.filter(FrequencyScreen.mightReachThree(col("pk"), bc, cells))
      .groupBy("pk").count().filter(col("count") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unscreened = df.groupBy("pk").count().filter(col("count") >= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(screened == unscreened && unscreened.nonEmpty)
  }

  test("cellsFor sizes to ~4x mass, clamps to [MinCells, MaxCells], refuses past MaxLoad") {
    assert(FrequencyScreen.cellsFor(0L).contains(FrequencyScreen.MinCells))
    assert(FrequencyScreen.cellsFor(1000L).contains(FrequencyScreen.MinCells))
    val m = 10L * 1000 * 1000
    val c = FrequencyScreen.cellsFor(m).get
    assert(c >= 2 * m && c <= 8 * m && (c & (c - 1)) == 0)
    assert(FrequencyScreen.cellsFor(Long.MaxValue / 8).isEmpty) // load too high
    // at exactly the cap the sf10-class mass still screens
    assert(FrequencyScreen.cellsFor(1300L * 1000 * 1000).contains(FrequencyScreen.MaxCells))
  }
}
