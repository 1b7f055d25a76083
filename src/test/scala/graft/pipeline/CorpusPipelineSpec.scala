package graft.pipeline

import graft.{Catalog, SparkSpec}

class CorpusPipelineSpec extends SparkSpec {

  test("stage survival is monotone non-increasing and ends non-empty") {
    val counts = CorpusPipeline.stages(spark, sf()).map(s => s.name -> s.kept.count())
    assert(counts.head._2 > 0)
    counts.sliding(2).foreach { case Seq((a, na), (b, nb)) =>
      assert(nb <= na, s"$b ($nb) grew over $a ($na)")
    }
    assert(counts.last._2 > 0, "pipeline should not filter everything out")
  }

  test("near-dup stage removes exactly the LSH pair victims") {
    val st = CorpusPipeline.stages(spark, sf()).map(s => s.name -> s.kept).toMap
    val exact = st("2_exact_dedup").select("doc_id").collect().map(_.getLong(0)).toSet
    val after = st("3_near_dedup").select("doc_id").collect().map(_.getLong(0)).toSet
    val victims = Dedup.minhashPairs(spark, sf(), 0.5)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(after == exact -- victims)
  }

  test("pp01 reports one row per stage plus shards") {
    val rows = Catalog.byName("pp01_corpus_pipeline").build(spark, sf()).collect()
    val stages = rows.map(_.getString(0))
    assert(stages.count(_.startsWith("5_shard_")) > 0)
    assert(Seq("0_raw", "1_quality", "2_exact_dedup", "3_near_dedup", "4_language")
      .forall(stages.contains))
  }
}
