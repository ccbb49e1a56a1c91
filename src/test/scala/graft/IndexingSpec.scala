package graft

import org.apache.spark.sql.functions._
import graft.operators.Indexing

/** Laws for the winnowing fingerprint layer (operators/Indexing.scala)
  * — the properties the oracle hash-match proves equal but not correct:
  * the 2/(w+1) selection density, the SIGMOD '03 shared-run guarantee,
  * and the pair detector's signal/noise separation. */
class IndexingSpec extends SparkSuite {

  test("text_winnow_fingerprints: selection density tracks 2/(w+1) (sf0.001)") {
    import spark.implicits._
    val fps = Indexing.textWinnowFingerprints(spark, sf0001)
    val nFps = fps.count()
    // grams per doc = max(0, tokens − 3)
    val nGrams = Tables.documents(spark, sf0001)
      .select(greatest(lit(0),
        expr("size(filter(split(text, ' '), w -> w <> ''))") - 3)
        .cast("long").as("g"))
      .agg(sum($"g")).head().getLong(0)
    val density = nFps.toDouble / nGrams
    // E[density] = 2/(w+1) = 1/3 for w=5; generous band around it
    assert(density > 0.25 && density < 0.45,
      s"winnow density $density outside the 2/(w+1) band ($nFps/$nGrams)")
    // every hash below the modulus, every position non-negative
    assert(fps.filter($"h" < 0 || $"h" >= 1048573L || $"pos" < 0)
      .count() === 0L)
  }

  test("winnowing guarantee: an 8+-token shared run yields a shared fingerprint hash (injected)") {
    import spark.implicits._
    val dir = "/root/repo/target/tmp/winnowdocs"
    // docs 0 and 1 share a 9-token run (6 grams → one full 5-gram
    // window entirely inside the run); doc 2 is disjoint. The packed
    // (h, pos) key is dominated by h, so both docs elect the same MIN
    // HASH from the identical shared window even though positions
    // differ — the Schleimer/Wilkerson/Aiken match guarantee.
    val shared = (0 until 9).map(i => s"sh$i").mkString(" ")
    Seq(
      (0L, (0 until 10).map(i => s"a$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"b$i").mkString(" ")),
      (1L, (0 until 10).map(i => s"c$i").mkString(" ") + " " + shared +
        " " + (0 until 10).map(i => s"d$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byDoc = Indexing.textWinnowFingerprints(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert((byDoc(0L) intersect byDoc(1L)).nonEmpty,
      "shared 9-token run must contribute a common fingerprint hash")
    assert((byDoc(0L) intersect byDoc(2L)).isEmpty &&
      (byDoc(1L) intersect byDoc(2L)).isEmpty,
      "disjoint doc must share nothing")
  }

  test("dedup_winnow_pairs: a near-duplicate crosses the threshold, unrelated docs never pair (injected)") {
    import spark.implicits._
    val dir = "/root/repo/target/tmp/winnowpairs"
    val base = (0 until 60).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, base),
      // near-dup: same 60-token body, 3-token tail edit
      (1L, base + " tail x y"),
      (2L, (0 until 60).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Indexing.dedupWinnowPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)),
      s"near-dup pair must cross the shared-fingerprint threshold: $pairs")
    assert(pairs.keySet === Set((0L, 1L)),
      s"unrelated doc 2 must not pair with anything: $pairs")
    // verify tier: the 60-of-63-token overlap is a clear duplicate
    val v = Indexing.dedupWinnowVerify(spark, dir).collect()
    assert(v.length === 1)
    assert(v.head.getDouble(3) > 0.9 && v.head.getLong(4) === 1L,
      s"near-dup must verify as duplicate: ${v.head}")
  }

  test("dedup_winnow_verify: jaccard bounded and consistent with the verdict (sf0.001)") {
    import spark.implicits._
    val v = Indexing.dedupWinnowVerify(spark, sf0001)
    assert(v.count() > 0)
    assert(v.filter($"jaccard" <= 0 || $"jaccard" > 1).count() === 0L)
    assert(v.filter(($"jaccard" >= 0.5) =!= ($"is_dup" === 1L))
      .count() === 0L)
  }
}
