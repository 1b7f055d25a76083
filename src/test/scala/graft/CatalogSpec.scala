package graft

class CatalogSpec extends SparkSpec {

  test("query names are unique") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle query has matching sorted column names convention (no dup columns)") {
    // The driver sorts columns by name before hashing — duplicate names would
    // make the compare ambiguous.
    Catalog.all.foreach { d =>
      val cols = d.build(spark, sf()).columns
      assert(cols.distinct.length == cols.length, s"${d.name} has duplicate columns: ${cols.mkString(",")}")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("funnel is monotone: viewers >= clickers >= purchasers") {
    val r = Catalog.byName("q08_conversion_funnel").build(spark, sf()).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= 0 && c >= 0 && p >= 0)
    // funnel steps are independent event types in the testdata, so only
    // check they are all bounded by total users
    val users = Tables(spark, sf()).events.select("user_id").distinct().count()
    assert(v <= users && c <= users && p <= users)
  }

  test("tx08 vocab audit: counting identities hold per source") {
    val rows = Catalog.byName("tx08_vocab_audit").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length, "duplicate source rows")
    rows.foreach { r =>
      val (docs, tokens, distinct, hapax) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(docs > 0 && tokens >= distinct && distinct >= hapax && hapax >= 0,
        s"counting identity broken for ${r.getString(0)}: $r")
      val ttr = r.getDouble(5)
      assert(ttr > 0 && ttr <= 1.0 && math.abs(ttr - distinct.toDouble / tokens) < 1e-12)
      val topShare = r.getDouble(7)
      // the modal term's share can't be below the uniform floor 1/distinct
      assert(topShare >= 1.0 / distinct && topShare <= 1.0)
    }
  }

  test("re-aggregation of the MV rollup equals direct aggregation (A13 invariant)") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf())
    val direct = t.events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reagg = Catalog.byName("q29_reaggregation").build(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == reagg)
  }
}
