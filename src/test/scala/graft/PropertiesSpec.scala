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

  /** Local mirror of the z-order interleave (Analytics.sortZorderLayout
    * / AnalyticsSpec reference impl). */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, k) =>
      acc | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }

  test("z-order curve laws: bijective on 16-bit pairs, monotone per axis prefix") {
    val coord = Gen.chooseNum(0L, 65535L)
    // bijectivity: de-interleaving recovers both coordinates
    def unmorton(z: Long): (Long, Long) = {
      val x = (0 until 16).foldLeft(0L)((a, k) => a | (((z >> (2 * k)) & 1L) << k))
      val y = (0 until 16).foldLeft(0L)((a, k) => a | (((z >> (2 * k + 1)) & 1L) << k))
      (x, y)
    }
    check(Prop.forAll(coord, coord) { (x: Long, y: Long) =>
      unmorton(morton(x, y)) == ((x, y))
    })
    // locality: equal high bits of BOTH coords ⇒ equal high bits of z
    // (the property zone-map pruning relies on)
    check(Prop.forAll(coord, coord, coord, coord) { (x1: Long, y1: Long, x2: Long, y2: Long) =>
      val sameHigh = (x1 >> 8) == (x2 >> 8) && (y1 >> 8) == (y2 >> 8)
      !sameHigh || (morton(x1, y1) >> 16) == (morton(x2, y2) >> 16)
    })
  }

  test("bloom filter law: zero false negatives at any fill level") {
    import org.apache.spark.util.sketch.BloomFilter
    val keys = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(keys) { (ks: List[Long]) =>
      val bf = BloomFilter.create(math.max(ks.size.toLong, 1L), 0.01)
      ks.foreach(bf.putLong)
      ks.forall(bf.mightContainLong)
    })
  }

  test("chunk tiling law: 32/24 windows cover every token exactly once per stride") {
    // local mirror of text_chunk_overlap's index arithmetic
    def chunks(n: Int): Seq[(Int, Int)] = { // (start0, len)
      val nc = 1 + math.max(0, n - 9) / 24
      (0 until nc).map(i => (i * 24, math.min(n - i * 24, 32)))
    }
    check(Prop.forAll(Gen.chooseNum(1, 5000)) { n: Int =>
      val cs = chunks(n)
      val last = cs.last
      cs.head._1 == 0 &&                          // starts at the first token
        last._1 + last._2 == n &&                 // reaches exactly the end
        cs.init.forall(_._2 == 32) &&             // only the tail may be short
        cs.forall { case (s, l) => l >= 1 && s + l <= n } &&
        cs.sliding(2).forall {                    // fixed stride, 8-token overlap
          case Seq((a, _), (b, _)) => b - a == 24
          case _ => true
        }
    })
  }

  test("misra-gries law: k >= distinct is exact under any partition merge order") {
    import scala.collection.mutable
    def update(m: mutable.LongMap[Long], x: Long, k: Int): Unit =
      if (m.contains(x)) m(x) += 1
      else if (m.size < k) m(x) = 1
      else {
        val dead = m.collect { case (i, 1L) => i }.toSeq
        m.transform((_, c) => c - 1); dead.foreach(m.remove)
      }
    def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long], k: Int) = {
      b.foreachEntry { (i, c) => a(i) = a.getOrElse(i, 0L) + c }
      if (a.size > k) {
        val d = a.values.toArray.sorted(Ordering[Long].reverse)(k)
        val dead = a.collect { case (i, c) if c - d <= 0 => i }.toSeq
        a.transform((_, c) => c - d); dead.foreach(a.remove)
      }
      a
    }
    val input = Gen.listOf(Gen.chooseNum(0L, 7L)) // ≤ 8 distinct = k
    val cuts = Gen.chooseNum(1, 5)
    check(Prop.forAll(input, cuts) { (xs: List[Long], parts: Int) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val partials = xs.grouped(math.max(1, xs.size / parts + 1)).map { part =>
        val m = mutable.LongMap.empty[Long]; part.foreach(update(m, _, 8)); m
      }.toList
      val merged = partials match {
        case Nil => mutable.LongMap.empty[Long]
        case h :: t => t.foldLeft(h)((a, b) => merge(a, b, 8))
      }
      merged.toMap == exact
    })
  }

  test("skyline law: prefix-max rewrite equals brute-force dominance, distributively") {
    // local mirror of Analytics.skylinePareto's rewrite, on distinct
    // (price, size) pairs: sorted (price asc, size desc), survive iff
    // running max of size over the strict prefix < own size
    def rewrite(pairs: Set[(Int, Int)]): Set[(Int, Int)] = {
      val sorted = pairs.toList.sortBy { case (p, s) => (p, -s) }
      var pm = Int.MinValue
      sorted.filter { case (_, s) =>
        val keep = s > pm; pm = math.max(pm, s); keep
      }.toSet
    }
    def brute(pairs: Set[(Int, Int)]): Set[(Int, Int)] =
      pairs.filter { case (p, s) =>
        !pairs.exists { case (q, t) =>
          q <= p && t >= s && (q < p || t > s)
        }
      }
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20))).map(_.toSet)
    check(Prop.forAll(gen, Gen.chooseNum(1, 4)) { (pairs: Set[(Int, Int)], shards: Int) =>
      val direct = rewrite(pairs) == brute(pairs)
      // distributivity: frontier(∪ shard frontiers) == frontier(all) —
      // the phase-1/phase-2 split the operator relies on
      val sharded = rewrite(
        pairs.groupBy { case (p, s) => (p * 31 + s) % shards }
          .values.map(rewrite).fold(Set.empty)(_ ++ _))
      direct && sharded == brute(pairs)
    })
  }

  test("int8 quantization law: range bound and maxabs element saturates") {
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-1e3f, 1e3f)).map(_.toArray)
    def quantize(xs: Array[Float]): Array[Long] = {
      val m = xs.map(x => math.abs(x.toDouble)).max
      xs.map(x => if (m == 0.0) 0L else math.floor(x.toDouble * 127.0 / m + 0.5).toLong)
    }
    check(Prop.forAll(vec) { xs: Array[Float] =>
      val q = quantize(xs)
      q.forall(v => v >= -127 && v <= 127) &&
        (xs.forall(_ == 0f) || q.exists(v => v == 127 || v == -127))
    })
  }

  /** Local mirror of the BPE merge step (Indexing.textBpeMergeStep):
    * words as space-joined pieces, merges via String.replace — leftmost
    * non-overlapping, the same semantics Spark and DuckDB replace() use. */
  test("bpe merge law: greedy merge of the top pair strictly shrinks adjacent-pair mass") {
    val word = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val corpus = Gen.nonEmptyListOf(word)
    check(Prop.forAll(corpus) { ws: List[String] =>
      val spaced = ws.map(_.toList.map(_.toString).mkString(" "))
      def pairs(ss: List[String]): List[(String, String)] = ss.flatMap { s =>
        val ps = s.split(' ').toList
        ps.zip(ps.drop(1))
      }
      val counts = pairs(spaced).groupBy(identity).view.mapValues(_.size).toMap
      val ((ba, bb), cnt) = counts.toList
        .minBy { case ((a, b), c) => (-c, a, b) }
      val merged = spaced.map(_.replace(s"$ba $bb", s"$ba$bb"))
      def mass(ss: List[String]): Int = ss.map(_.split(' ').length - 1).sum
      val (before, after) = (mass(spaced), mass(merged))
      // strict progress, bounded by the elected count (overlaps halve it
      // at worst: of k overlapping occurrences, ceil(k/2) are replaced)
      after < before && before - after <= cnt && (before - after) * 2 >= cnt
    })
  }
}
