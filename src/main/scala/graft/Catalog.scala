package graft

/** The full query catalog — SparkEntry derives its `queries`/`oracleSql` maps
  * from this sequence. Add operator families here as they are implemented.
  */
object Catalog {
  val all: Seq[QueryDef] =
    operators.RelationalCore.defs ++
      operators.Analytics.defs ++
      operators.Windows.defs ++
      operators.ScalarsAndSets.defs ++
      operators.Sketches.defs ++
      operators.DistributedRank.defs ++
      operators.AsOfJoin.defs ++
      operators.Lttb.defs ++
      pipeline.Sampling.defs ++
      plans.TopKPerGroup.defs ++
      plans.MvRouting.defs ++
      functions.Dictionaries.defs ++
      pipeline.Dedup.defs ++
      pipeline.Decontam.defs ++
      pipeline.Similarity.defs ++
      pipeline.Clustering.defs ++
      pipeline.TextAnalysis.defs ++
      pipeline.Scrub.defs ++
      pipeline.UrlCuration.defs ++
      pipeline.Curation.defs ++
      pipeline.Multimodal.defs ++
      pipeline.CorpusPipeline.defs ++
      pipeline.SparseText.defs ++
      sources.Layout.defs ++
      streaming.StreamingMVs.defs ++
      streaming.MvCascade.defs ++
      sql.SqlGateway.defs ++
      sql.SystemTables.defs

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
