package graft.pipeline

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def rows(name: String) =
    Catalog.byName(name).build(spark, sf()).collect()

  test("dd09: first occurrence of every segment survives, later copies don't") {
    val r = rows("dd09_segment_dedup")
    assert(r.length == 500)
    r.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1), s"doc ${x.getLong(0)}: kept > total")
      assert(x.getLong(2) >= 0L)
      assert(x.getString(3).matches("[0-9a-f]{32}"))
    }
    // the corpus's planted replicas mean some docs MUST lose segments
    assert(r.exists(x => x.getLong(2) < x.getLong(1)))
    // and the corpus-wide kept-segment count equals the distinct segment count
    val segs = graft.Tables(spark, sf()).documents
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 5.0) as int) - 1)," +
          " i -> array_join(slice(split(text, ' '), i*5 + 1, 5), ' '))")).as("seg"))
    assert(r.map(_.getLong(2)).sum == segs.select("seg").distinct().count())
  }

  test("dd09: planted duplicates lose exactly the right segments") {
    import spark.implicits._
    // doc 10 repeats doc 1 verbatim → keeps 0 segments; doc 20 shares its
    // first 5-word segment with doc 1 but not its second → keeps 1
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      10L -> "a b c d e f g h i j",
      20L -> "a b c d e x y z w v",
    ).toDF("doc_id", "text")
    val r = Curation.segmentDedup(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 2 && r(1L).getLong(2) == 2)
    assert(r(10L).getLong(1) == 2 && r(10L).getLong(2) == 0)
    assert(r(20L).getLong(1) == 2 && r(20L).getLong(2) == 1)
    // md5 witnesses: full text for the keeper, empty string for the replica
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L).getString(3) == m("a b c d e f g h i j"))
    assert(r(10L).getString(3) == m(""))
    assert(r(20L).getString(3) == m("x y z w v"))
  }

  test("lm01: model is a probability distribution and scores sit inside it") {
    val r = rows("lm01_char_bigram_model")
    assert(r.length == 500)
    r.foreach { x =>
      val (avg, mn) = (x.getDouble(2), x.getDouble(3))
      assert(avg > 0.0 && avg <= 1.0)
      assert(mn > 0.0 && mn <= avg + 1e-9, s"doc ${x.getLong(0)}: min > avg")
      assert(x.getBoolean(4) == (avg < 0.25))
    }
    // conditional probabilities per first char sum to 1 (MLE normalization)
    val inst = graft.Tables(spark, sf()).documents
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
    val sums = inst
      .withColumn("c1", substring(col("bg"), 1, 1))
      .groupBy("c1").agg(sum("c").as("tot"))
      .join(inst.withColumn("c1", substring(col("bg"), 1, 1)), "c1")
      .groupBy("c1", "tot").agg(sum(col("c").cast("double") / col("tot")).as("psum"))
      .collect()
    sums.foreach(s => assert(math.abs(s.getDouble(2) - 1.0) < 1e-9, s"c1=${s.getString(0)}"))
  }

  test("sel01: selection is the quality-ranked prefix and respects the budget") {
    val r = rows("sel01_token_budget_select")
    assert(r.length == 500)
    val total = r.map(_.getLong(1)).sum
    val budget = total / 2
    val spent = r.filter(_.getBoolean(4)).map(_.getLong(1)).sum
    assert(spent <= budget, s"spent $spent > budget $budget")
    // prefix property: ordering docs by (quality desc, doc_id), the selected
    // flag is monotone true→false
    val ordered = r.sortBy(x => (-x.getDouble(3), x.getLong(0)))
    val flags = ordered.map(_.getBoolean(4))
    assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b }, "non-prefix selection")
    // and cum_tokens really is the running sum in that order
    var acc = 0L
    ordered.foreach { x => acc += x.getLong(1); assert(x.getLong(2) == acc) }
  }

  test("sp01: near-dup clusters never straddle a split boundary") {
    val split = rows("sp01_leakage_safe_split").map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(split.size == 500)
    val clusters = Catalog.byName("ts02_dedup_clusters").build(spark, sf()).collect()
      .groupBy(_.getLong(1)).values
    assume(clusters.nonEmpty)
    clusters.foreach { members =>
      val splits = members.map(m => split(m.getLong(0))).toSet
      assert(splits.size == 1, s"cluster ${members.head.getLong(1)} split across $splits")
    }
    // all three splits occur, and train dominates (800/100/100 permille)
    val hist = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(hist.keySet == Set("train", "valid", "test"), hist.toString)
    assert(hist("train") > hist("valid") && hist("train") > hist("test"))
  }

  test("sp02: contaminated and bench-adjacent clusters quarantine whole; the rest match sp01") {
    val r = rows("sp02_contamination_safe_split")
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    // corpus side only: every doc_id % 20 != 0
    assert(r.nonEmpty && r.keySet.forall(_ % 20 != 0))
    // no contaminated document may reach any non-quarantine split
    val contaminated = rows("dc01_decontamination")
      .filter(_.getLong(3) == 1L).map(_.getLong(0)).toSet
    assume(contaminated.nonEmpty)
    contaminated.foreach(d =>
      assert(r(d)._3 == "quarantine", s"contaminated doc $d in split ${r(d)._3}"))
    // quarantine propagates through the whole cluster: same rep => same verdict
    r.values.groupBy(_._1).foreach { case (rep, members) =>
      assert(members.map(_._3).toSet.size == 1, s"rep $rep split across verdicts")
    }
    // clusters containing a bench doc (id % 20 == 0) are quarantined too
    val clusters = Catalog.byName("ts02_dedup_clusters").build(spark, sf()).collect()
      .map(x => x.getLong(0) -> x.getLong(1))
    val benchReps = clusters.filter(_._1 % 20 == 0).map(_._2).toSet
    r.foreach { case (_, (rep, _, sp)) =>
      if (benchReps.contains(rep)) assert(sp == "quarantine", s"bench-adjacent rep $rep not quarantined")
    }
    // outside quarantine, the assignment is exactly sp01's
    val sp01 = rows("sp01_leakage_safe_split").map(x => x.getLong(0) -> x.getString(3)).toMap
    r.foreach { case (d, (_, q, sp)) =>
      if (q == 0L) assert(sp == sp01(d), s"doc $d: sp02 $sp != sp01 ${sp01(d)}")
    }
    // and the quarantine is not vacuous nor total
    val verdicts = r.values.map(_._3).toSet
    assert(verdicts.contains("quarantine") && verdicts.contains("train"))
  }

  test("ds01: every doc scored once, importance bounded, target langs separate") {
    val r = rows("ds01_importance_selection")
    val docs = graft.Tables(spark, sf()).documents
    assert(r.length.toLong == docs.count(), "one score per document")
    // n_bigrams = len(text) - 1, importance is a mean of per-bigram
    // advantages (each |adv| < 1), selected consistent with the score
    val lens = docs.select(col("doc_id"), (length(col("text")) - 1).cast("long"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      assert(x.getLong(2) == lens(x.getLong(0)))
      val imp = x.getDouble(3)
      assert(imp > -1.0 && imp < 1.0)
      assert(x.getBoolean(4) == imp > 0d)
    }
    // the importance weight separates the target population: target-lang
    // docs (the model's own training side) must average above the rest,
    // and be selected more often
    val (en, rest) = r.partition(_.getString(1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val meanEn = en.map(_.getDouble(3)).sum / en.length
    val meanRest = rest.map(_.getDouble(3)).sum / rest.length
    assert(meanEn > meanRest,
      s"target-lang mean importance $meanEn not above non-target $meanRest")
    val selEn = en.count(_.getBoolean(4)).toDouble / en.length
    val selRest = rest.count(_.getBoolean(4)).toDouble / rest.length
    assert(selEn > selRest,
      s"selected fraction en=$selEn not above rest=$selRest")
  }

  test("ds02: resample is deterministic and biased toward high-importance docs") {
    val d = graft.Catalog.byName("ds02_importance_resampling")
    val r = d.build(spark, sf()).collect()
    assert(r.length == 100)
    val again = d.build(spark, sf()).collect()
    assert(r.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq, "not deterministic")
    // importance resampling: the sample's mean importance must exceed the
    // corpus mean (weights track the min-shifted importance)
    val all = graft.Catalog.byName("ds01_importance_selection").build(spark, sf())
      .collect().map(_.getDouble(3))
    val corpusMean = all.sum / all.length
    val sampleMean = r.map(_.getDouble(2)).sum / r.length
    assert(sampleMean > corpusMean,
      s"resampling bias missing: sample $sampleMean <= corpus $corpusMean")
    // ranks are positive and ordered
    val ranks = r.map(_.getDouble(3))
    assert(ranks.forall(_ > 0d) && ranks.zip(ranks.tail).forall { case (a, b) => a <= b })
  }
}
