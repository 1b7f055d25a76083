package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class GenScaleSpec extends AnyFunSuite {

  test("affine substitution family: 312 pairwise-distinct bijections, Caesar-compatible below 26") {
    val maps = (0 until 312).map(GenScale.affine)
    // each is a permutation of the alphabet
    maps.foreach(m => assert(m.sorted == GenScale.alpha, m))
    // pairwise distinct — the factor>26 text-repeat bug (dd02 9.5x on 3.3x
    // at sf10) was exactly a period-26 family
    assert(maps.distinct.size == 312)
    // i < 26 is the historical Caesar rotation: sf1/sf3-era data unchanged
    for (i <- 0 until 26)
      assert(maps(i) == GenScale.alpha.drop(i) + GenScale.alpha.take(i), s"i=$i")
    // identity at replica 0
    assert(maps(0) == GenScale.alpha)
  }
}
