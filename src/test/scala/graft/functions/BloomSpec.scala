package graft.functions

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import BloomExpressions._

  private def docs = Tables(spark, sf()).documents

  private def benchShingles = docs.filter(col("doc_id") % 20 === 0)
    .select(explode(array_distinct(TextExpressions.wordShingles(col("text")))).as("s"))
    .distinct()

  test("no false negatives: every inserted item passes the probe") {
    val shB = benchShingles
    val blob = shB.agg(bloomBuild(xxhash64(col("s")), 1 << 16, 7)).head().getAs[Array[Byte]](0)
    val misses = shB.crossJoin(
        spark.createDataFrame(Seq(Tuple1(blob))).toDF("bf"))
      .where(!BloomExpressions.bloomMightContain(col("bf"), xxhash64(col("s"))))
      .count()
    assert(misses == 0, s"$misses inserted items failed the bloom probe")
  }

  test("prunes: non-member probes pass at well under 1%") {
    val shB = benchShingles
    val blob = shB.agg(bloomBuild(xxhash64(col("s")), sizeBits(shB.count()), DefaultNumHashes))
      .head().getAs[Array[Byte]](0)
    // Probe with synthetic keys disjoint from any real shingle hash.
    val n = 100000L
    val fp = spark.range(n)
      .crossJoin(spark.createDataFrame(Seq(Tuple1(blob))).toDF("bf"))
      .where(BloomExpressions.bloomMightContain(col("bf"), xxhash64(concat(lit("nonmember:"), col("id")))))
      .count()
    assert(fp.toDouble / n < 0.01, s"false-positive rate ${fp.toDouble / n} too high")
  }

  test("merge is order-independent: partitioned build equals single-partition build") {
    val shB = benchShingles
    val many = shB.repartition(7)
      .agg(bloomBuild(xxhash64(col("s")), 1 << 16, 7)).head().getAs[Array[Byte]](0)
    val one = shB.coalesce(1)
      .agg(bloomBuild(xxhash64(col("s")), 1 << 16, 7)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(many, one),
      "bloom blob must be bit-identical regardless of partitioning (merge = OR)")
  }

  test("dc02 output is bit-identical to the bloom-free exact formulation") {
    val viaBloom = Catalog.byName("dc02_bloom_decontamination").build(spark, sf()).collect()
    val sh = (c: org.apache.spark.sql.Column) =>
      array_distinct(TextExpressions.wordShingles(c))
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), explode(sh(col("text"))).as("s"))
    val nc = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val matched = corpus.join(benchShingles, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
    val exact = nc.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast("double") / col("n_shingles")).as("overlap_frac"))
      .withColumn("contaminated", when(col("overlap_frac") >= 0.3, 1L).otherwise(0L))
      .orderBy("doc_id")
      .collect()
    assert(viaBloom.toSeq == exact.toSeq)
    assert(viaBloom.nonEmpty)
  }

  test("bloom prefilter actually prunes the corpus shingle stream") {
    val shB = benchShingles
    val blob = shB.agg(bloomBuild(xxhash64(col("s")), sizeBits(shB.count()), DefaultNumHashes))
      .head().getAs[Array[Byte]](0)
    val corpusSh = docs.filter(col("doc_id") % 20 =!= 0)
      .select(explode(array_distinct(TextExpressions.wordShingles(col("text")))).as("s"))
    val total = corpusSh.count()
    val survivors = corpusSh
      .crossJoin(spark.createDataFrame(Seq(Tuple1(blob))).toDF("bf"))
      .where(BloomExpressions.bloomMightContain(col("bf"), xxhash64(col("s"))))
      .count()
    val trueMatches = corpusSh.join(shB, "s").count()
    // survivors = true matches + false positives; fp mass must be tiny
    assert(survivors >= trueMatches)
    assert(survivors - trueMatches <= math.max(16L, (total * 0.01).toLong),
      s"bloom passed $survivors of $total (true matches $trueMatches) — not pruning")
  }
}
