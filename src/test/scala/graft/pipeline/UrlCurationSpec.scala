package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ur01/ur02's canonicalization rules on hand-written URLs — the
  * generic parser, not the plant — plus the dedup/rollup invariants of the
  * catalog entries on testdata.
  */
class UrlCurationSpec extends SparkSpec {

  private def canon(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    val (c, e) = UrlCuration.canonCols(col("url"))
    urls.toDF("url").select(c.as("c"), e.as("e"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("scheme/host lowercase, fragment stripped, path kept verbatim") {
    assert(canon("HTTPS://WWW.Example.COM/A/b?x=1#frag") ==
      Seq(("https://www.example.com/A/b?x=1", "example.com")))
  }

  test("default ports dropped, non-default ports kept") {
    assert(canon(
      "http://a.example.com:80/p",
      "https://a.example.com:443/p",
      "http://a.example.com:8080/p",
      "https://a.example.com:80/p", // 80 is NOT https's default -> kept
    ).map(_._1) == Seq(
      "http://a.example.com/p",
      "https://a.example.com/p",
      "http://a.example.com:8080/p",
      "https://a.example.com:80/p"))
  }

  test("empty path becomes / (with and without query)") {
    assert(canon("http://example.com", "http://example.com?id=1#f").map(_._1) ==
      Seq("http://example.com/", "http://example.com/?id=1"))
  }

  test("tracking params removed, the rest kept in original order") {
    assert(canon(
      "http://e.com/p?utm_source=a&b=2&gclid=x&a=1&fbclid=y",
      "http://e.com/p?utm_campaign=z&msclkid=1&ref=tw&igshid=q",
      "http://e.com/p?refresh=1&utm=keepme", // 'ref' must not match 'refresh'; bare 'utm' is not utm_*
    ).map(_._1) == Seq(
      "http://e.com/p?b=2&a=1",
      "http://e.com/p",
      "http://e.com/p?refresh=1&utm=keepme"))
  }

  test("eTLD+1: multi-label suffixes, github.io, default last-2, single label") {
    assert(canon(
      "http://a.b.sample.co.uk/",
      "http://docs.github.io/",
      "http://cdn.media.example.net/",
      "http://example.org/",
      "http://localhost/",
    ).map(_._2) == Seq(
      "sample.co.uk", "docs.github.io", "example.net", "example.org", "localhost"))
  }

  test("ur01 invariants on testdata: real dups, first-seen wins, groups consistent") {
    val df = graft.Catalog.byName("ur01_url_canonical")
      .build(spark, "/root/testdata/sf0.001").cache()
    try {
      val n = df.count()
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
      assert(n == docs, s"expected one row per doc ($docs), got $n")
      // collisions exist by construction (G=20 < the doc count)
      assert(df.filter(col("url_dups") > 1).count() > 0)
      // one first_seen per canonical URL, and it is the min doc_id
      val perUrl = df.groupBy("canon_url").agg(
        sum(when(col("first_seen"), 1L).otherwise(0L)).as("firsts"),
        min("doc_id").as("mn"),
        min(when(col("first_seen"), col("doc_id"))).as("firstId"))
      assert(perUrl.filter(col("firsts") =!= 1L || col("mn") =!= col("firstId")).count() == 0)
      // raw urls in a canonical group differ while the canonical agrees
      assert(df.select("url").distinct().count() == n)
    } finally df.unpersist()
  }

  test("ur02 shares sum to 1 and kept tokens equal ur01's first-seen docs") {
    val roll = graft.Catalog.byName("ur02_domain_rollup")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(roll.nonEmpty)
    val share = roll.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(share - 1.0) < 1e-9, s"shares sum to $share")
    assert(roll.map(_.getAs[Long]("n_urls")).sum <= roll.map(_.getAs[Long]("n_docs")).sum)
  }
}
