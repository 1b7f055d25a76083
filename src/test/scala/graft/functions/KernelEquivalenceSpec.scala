package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every codegen kernel must be value-identical to the interpreted
  * higher-order-function formulation it replaced — checked row-by-row on
  * randomized inputs (fixed seed) plus the edge cases that bite: empty
  * strings, repeated separators, single words, unicode, empty arrays.
  */
class KernelEquivalenceSpec extends SparkSpec {

  private val rnd = new scala.util.Random(1234)
  private val words = Seq("the", "a", "fox", "jumps", "über", "naïve", "b2b", "", "x")
  private def randText(): String =
    Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" ")

  private lazy val texts = {
    import spark.implicits._
    (Seq("", " ", "one", "two  spaces", "a b c d e f", "ü ü ü")
      ++ Seq.fill(200)(randText())).toDF("text")
  }

  private def assertColsEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(!(col("kernel") <=> col("hof"))).collect()
    assert(bad.isEmpty, s"kernel != HOF on ${bad.take(3).mkString("; ")}")
  }

  test("StringPolyHash == aggregate-HOF rolling hash") {
    assertColsEqual(texts.select(
      TextExpressions.polyHash(col("text")).as("kernel"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L).as("hof")))
  }

  test("ArrayCountInSet == size(filter(array_contains)) incl. duplicates") {
    val set = Seq("the", "a", "fox", "")
    assertColsEqual(texts.select(
      TextExpressions.countInSet(split(col("text"), " "), set).as("kernel"),
      size(filter(split(col("text"), " "),
        w => array_contains(typedLit(set), w))).as("hof")))
  }

  test("ArrayFilterNotInSet == filter(!array_contains), order and dupes kept") {
    val set = Seq("the", "a")
    assertColsEqual(texts.select(
      TextExpressions.filterNotInSet(split(col("text"), " "), set).as("kernel"),
      filter(split(col("text"), " "),
        w => !array_contains(typedLit(set), w)).as("hof")))
  }

  test("StringWordShingles == transform/slice/concat_ws window build") {
    val w = split(col("text"), " ")
    assertColsEqual(texts.select(
      TextExpressions.wordShingles(col("text")).as("kernel"),
      transform(sequence(lit(1), greatest(size(w) - 2, lit(1))),
        i => concat_ws(" ", slice(w, i, lit(3)))).as("hof")))
  }

  test("StringCharBigrams == transform(sequence, substring) on multi-char text, empty below 2 chars") {
    import spark.implicits._
    // ≥2 chars: identical to the HOF form (incl. multi-byte UTF-8)
    val multi = Seq("abcd", "ab", "spark sql", "héllo ☃ wörld").toDF("text")
    assertColsEqual(multi.select(
      TextExpressions.charBigrams(col("text")).as("kernel"),
      expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))").as("hof")))
    // 0/1 chars: the HOF's sequence(1, len-1) counts DOWN and fabricates rows;
    // the kernel matches the oracle's empty generate_series instead
    val degen = Seq("", "x", "é").toDF("text")
    assert(degen.select(TextExpressions.charBigrams(col("text")).as("k"))
      .collect().forall(_.getSeq[String](0).isEmpty))
  }

  test("ArrayLongEqCount == size(filter(zip_with(==)))") {
    import spark.implicits._
    val sigs = Seq.fill(120)((
      Seq.fill(16)(rnd.nextInt(4).toLong),
      Seq.fill(16)(rnd.nextInt(4).toLong))).toDF("a", "b")
    assertColsEqual(sigs.select(
      LshExpressions.eqCount(col("a"), col("b")).as("kernel"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), b => b)).as("hof")))
  }

  test("MinhashSignature == transform(perms, array_min) HOF formulation") {
    import spark.implicits._
    val p = 2147483647L
    val a = Seq(3L, 7L, 11L, 1000000006L)
    val b = Seq(0L, 5L, p - 1L, 42L)
    val hashes = Seq.fill(80)(Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong(p).abs))
      .toDF("hashes")
    val hof = transform(lit(a.indices.toArray), j =>
      array_min(transform(col("hashes"), h =>
        (element_at(lit(a.toArray), j + 1) * h + element_at(lit(b.toArray), j + 1)) % p)))
    assertColsEqual(hashes.select(
      LshExpressions.minhashSig(col("hashes"), a, b, p).as("kernel"),
      hof.as("hof")))
  }

  test("HyperplaneBuckets == nested transform/aggregate/zip_with formulation") {
    import spark.implicits._
    val L = 3
    val H = 4
    val dim = 8
    val planes = Seq.fill(L, H, dim)(rnd.nextGaussian())
    // nonzero per-plane thresholds exercise the mean-centering compare path
    val thr = Array.fill(L, H)(rnd.nextGaussian() * 0.1)
    val vecs = Seq.fill(100)(Seq.fill(dim)(rnd.nextFloat())).toDF("embedding")
    val planesLit = typedLit(planes)
    val thrLit = typedLit(thr.map(_.toSeq).toSeq)
    val emb = transform(col("embedding"), x => x.cast("double"))
    val hof = transform(sequence(lit(0), lit(L - 1)), t =>
      aggregate(sequence(lit(0), lit(H - 1)), lit(0L), (acc, i) => {
        val plane = element_at(element_at(planesLit, t + 1), i + 1)
        val c = element_at(element_at(thrLit, t + 1), i + 1)
        val d = aggregate(zip_with(emb, plane, (a, b) => a * b), lit(0.0), (s, v) => s + v)
        acc * 2 + when(d > c, 1L).otherwise(0L)
      }))
    assertColsEqual(vecs.select(
      LshExpressions.hyperplaneBuckets(col("embedding"), planes, thr).as("kernel"),
      hof.as("hof")))
  }

  test("FloatVecDot/SumSq == zip_with/aggregate folds") {
    import spark.implicits._
    import graft.pipeline.VectorOps
    val vecs = Seq.fill(100)((
      Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat()))).toDF("a", "b")
    val da = transform(col("a"), x => x.cast("double"))
    val db = transform(col("b"), x => x.cast("double"))
    assertColsEqual(vecs.select(
      VectorOps.dot(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(da, db, (x, y) => x * y), lit(0.0), (s, v) => s + v).as("hof")))
    assertColsEqual(vecs.select(
      VectorOps.norm(col("a")).as("kernel"),
      sqrt(aggregate(zip_with(da, da, (x, y) => x * y), lit(0.0), (s, v) => s + v)).as("hof")))
  }
}
