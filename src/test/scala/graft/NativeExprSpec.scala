package graft

import org.apache.spark.sql.functions._
import graft.functions.{PlaneSignature, SimHashAgg}

/** The native PlaneSignature and SimHashAgg must match the declarative
  * formulations they replaced (round-2 cold-codegen fixes). */
class NativeExprSpec extends SparkSuite {

  test("plane_signature == HOF per-plane fold signature") {
    val Planes = 12
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(Planes, 64)(rnd.nextGaussian())
    PlaneSignature.register(spark, planes)
    def planeDot(b: Int) = aggregate(
      zip_with(col("embedding"), typedLit(planes(b).toSeq), (x, w) => x.cast("double") * w),
      lit(0.0), (a, v) => a + v)
    val hofSig = (0 until Planes)
      .map(b => when(planeDot(b) > 0, lit(1 << b)).otherwise(lit(0)))
      .reduce(_ + _)
    val e = Tables.embeddings(spark, sf0001)
      .select(expr("plane_signature(embedding)").as("native"), hofSig.as("hof"))
    assert(e.filter(col("native") =!= col("hof")).count() === 0L)
    assert(e.count() === 500L)
  }

  test("plane_signature signs degenerate vectors to 0, like the HOF form") {
    import spark.implicits._
    val Planes = 12
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(Planes, 64)(rnd.nextGaussian())
    PlaneSignature.register(spark, planes)
    // zip_with against a 64-element literal null-pads/truncates and
    // propagates null elements -> every plane dot NULL -> bit 0; the
    // native expression must match (VERDICT round-2 review finding).
    val df = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(10)(1.0f)),
      (3L, Array.fill(70)(1.0f))
    ).toDF("id", "embedding")
      .union(Seq((4L, Array.fill(63)(1.0f))).toDF("id", "embedding")
        .select(col("id"), concat(col("embedding"),
          array(lit(null).cast("float"))).as("embedding")))
    val sigs = df.selectExpr("id", "plane_signature(embedding) AS sig")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sigs(1L) !== 0) // the well-formed vector signs normally
    assert(sigs(2L) === 0 && sigs(3L) === 0 && sigs(4L) === 0)
  }

  test("plane_signature interpreted eval == codegen eval") {
    val Planes = 12
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(Planes, 64)(rnd.nextGaussian())
    PlaneSignature.register(spark, planes)
    val e = Tables.embeddings(spark, sf0001)
    val viaCodegen = e.selectExpr("vec_id", "plane_signature(embedding) AS sig")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // interpreted path: eval the expression row by row off-plan
    val flat = planes.flatten
    val viaEval = e.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1)
      var sig = 0
      for (b <- 0 until Planes) {
        var dot = 0.0
        for (i <- v.indices) dot += v(i).toDouble * flat(b * 64 + i)
        if (dot > 0) sig |= 1 << b
      }
      r.getLong(0) -> sig
    }.toMap
    assert(viaCodegen === viaEval)
  }

  test("simhash_agg == 64 declarative sum(when) columns") {
    SimHashAgg.register(spark)
    val tok = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val native = tok.groupBy(col("doc_id")).agg(expr("simhash_agg(h)").as("fp"))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val decl = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("fp"))
    val joined = native.as("n").join(decl.as("d"), "doc_id")
    assert(joined.filter(col("n.fp") =!= col("d.fp")).count() === 0L)
    assert(joined.count() === 500L)
  }

  test("simhash_agg partial merge is order/partitioning independent") {
    SimHashAgg.register(spark)
    val tok = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val a = tok.repartition(2).groupBy(col("doc_id")).agg(expr("simhash_agg(h)").as("fp"))
    val b = tok.repartition(16, col("h")).groupBy(col("doc_id")).agg(expr("simhash_agg(h)").as("fp"))
    assert(a.as("a").join(b.as("b"), "doc_id")
      .filter(col("a.fp") =!= col("b.fp")).count() === 0L)
  }
}
