package graft.pipeline

import graft.SparkSpec

class SparseTextSpec extends SparkSpec {

  test("label propagation throws loudly when the round cap exits unconverged (r7 item 6)") {
    import spark.implicits._
    // A 12-node path graph: the min label (1) walks one hop per round, so
    // the fixpoint needs 11 propagation rounds plus one no-change round.
    // Capped at 3 the loop exits UNCONVERGED — the old code would silently
    // ship non-canonical cluster ids into dd07's survivor selection; now it
    // must refuse loudly, naming the knob.
    val edges = (1L to 11L).map(i => (i, i + 1))
    val undirected = edges.toDF("src", "dst")
      .unionByName(edges.map(_.swap).toDF("src", "dst"))
    val e = intercept[IllegalStateException] {
      SparseText.propagateMinLabels(undirected, maxIters = 3)
    }
    assert(e.getMessage.contains("UNCONVERGED") &&
      e.getMessage.contains(SparseText.LabelPropMaxItersKey))
    // and with an adequate cap the same graph converges to one cluster
    val labels = SparseText.propagateMinLabels(undirected, maxIters = 20)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 12 && got.values.forall(_ == 1L),
      s"path graph must collapse to cluster 1, got $got")
  }
}
