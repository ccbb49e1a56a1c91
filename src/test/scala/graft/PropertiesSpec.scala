package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (SURVEY.md §5.3) on pure logic that doesn't need
  * a SparkSession: MinHash similarity estimation and the moments
  * aggregator's merge algebra. Raw ScalaCheck driven from funsuite (no
  * scalatestplus bridge in the offline cache). */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** Local mirror of the operator's seeded-hash minhash scheme. */
  private def minhashSim(a: Set[String], b: Set[String], k: Int): Double = {
    def sig(s: Set[String]): Seq[Int] =
      (0 until k).map(seed => s.map(x => scala.util.hashing.MurmurHash3.stringHash(x, seed)).min)
    sig(a).zip(sig(b)).count { case (x, y) => x == y }.toDouble / k
  }

  test("minhash similarity approximates exact jaccard") {
    val tokens = Gen.listOfN(30, Gen.oneOf((1 to 50).map("w" + _))).map(_.toSet)
    check(Prop.forAll(tokens, tokens) { (a0: Set[String], b0: Set[String]) =>
      a0.isEmpty || b0.isEmpty ||
        math.abs(minhashSim(a0, b0, 128) - jaccard(a0, b0)) < 0.35
    })
  }

  test("moments aggregator merge is order-insensitive") {
    import graft.functions.UserCode.{StableMoments => M}
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1e6, 1e6))) { xs: List[Double] =>
      xs.size <= 1 || {
        val whole = xs.foldLeft(M.zero)(M.reduce)
        val (l, r) = xs.splitAt(xs.size / 2)
        val merged = M.merge(l.foldLeft(M.zero)(M.reduce), r.foldLeft(M.zero)(M.reduce))
        val (m1, v1) = M.finish(whole)
        val (m2, v2) = M.finish(merged)
        math.abs(m1 - m2) <= 1e-6 * math.max(1.0, math.abs(m1)) &&
          math.abs(v1 - v2) <= 1e-5 * math.max(1.0, math.abs(v1))
      }
    })
  }

  test("semi + anti partition law") {
    check(Prop.forAll { (left: List[Int], right: List[Int]) =>
      val r = right.toSet
      val semi = left.filter(r.contains)
      val anti = left.filterNot(r.contains)
      semi.size + anti.size == left.size && semi.toSet.intersect(anti.toSet).isEmpty
    })
  }
}
