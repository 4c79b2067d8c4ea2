package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  test("mulMod matches BigInt reference on 10k seeded random pairs") {
    val p = (1L << 61) - 1
    val rng = new scala.util.Random(1234)
    (0 until 10000).foreach { _ =>
      val a = math.abs(rng.nextLong()) % p
      val b = math.abs(rng.nextLong()) % p
      val want = ((BigInt(a) * BigInt(b)) % BigInt(p)).longValue
      assert(Sketches.mulMod(a, b, p) == want, s"a=$a b=$b")
    }
  }

  test("shingles: short and empty texts") {
    assert(Sketches.shingles("", 5) == Set.empty)
    assert(Sketches.shingles("abc", 5) == Set("abc"))
    assert(Sketches.shingles("abcdef", 5) == Set("abcde", "bcdef"))
    assert(Sketches.shingles("A  B", 3) == Set("a b"))
  }

  test("jaccard properties: identity, disjoint, symmetry") {
    val a = Sketches.shingles("the quick brown fox", 3)
    val b = Sketches.shingles("the quick brown cat", 3)
    assert(Sketches.jaccard(a, a) == 1.0)
    assert(Sketches.jaccard(a, Set("zz")) == 0.0)
    assert(Sketches.jaccard(a, b) == Sketches.jaccard(b, a))
    assert(Sketches.jaccard(Set.empty, Set.empty) == 1.0)
  }

  test("minhash estimate tracks true jaccard within tolerance") {
    val family = Sketches.hashFamily(128)
    val t1 = (1 to 100).map(i => s"tok$i").mkString(" ")
    val t2 = (1 to 100).map(i => if (i % 10 == 0) s"x$i" else s"tok$i").mkString(" ")
    val s1 = Sketches.shingles(t1, 5)
    val s2 = Sketches.shingles(t2, 5)
    val truth = Sketches.jaccard(s1, s2)
    val est = Sketches.estJaccard(
      Sketches.minHash(s1, family), Sketches.minHash(s2, family))
    assert(math.abs(truth - est) < 0.15, s"truth=$truth est=$est")
  }

  test("simhash: identical texts → 0 hamming; unrelated texts → large hamming") {
    val a = (1 to 200).map(i => s"w$i").mkString(" ")
    val b = (1 to 200).map(i => s"q$i").mkString(" ")
    assert(Sketches.hamming(Sketches.simHash(a), Sketches.simHash(a)) == 0)
    assert(Sketches.hamming(Sketches.simHash(a), Sketches.simHash(b)) > 10)
  }

  test("scaledDot is exact integer math and symmetric") {
    val a = Array(0.5f, -0.25f, 0.125f)
    val b = Array(1.0f, 2.0f, -4.0f)
    // floor(500)*floor(1000) + floor(-250)*floor(2000) + floor(125)*floor(-4000)
    assert(Sketches.scaledDot(a, b) == 500L * 1000 + (-250L) * 2000 + 125L * (-4000))
    assert(Sketches.scaledDot(a, b) == Sketches.scaledDot(b, a))
  }

  test("band keys: equal signatures share all bands, different share few") {
    val family = Sketches.hashFamily(64)
    val s1 = Sketches.minHash(Sketches.shingles("aaa bbb ccc", 3), family)
    assert(Sketches.bandKeys(s1, 16).length == 16)
    assert(Sketches.bandKeys(s1, 16).toSet == Sketches.bandKeys(s1.clone(), 16).toSet)
  }
}
