package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** User-code operator surface (SURVEY.md §2.10) — the MR reference
  * class's defining feature is arbitrary user map/reduce programs; in
  * Spark those become UDF (map), typed Aggregator/UDAF (reduce), a
  * generator/flatMap (multi-emit map), and mapPartitions (Hadoop
  * Streaming's per-partition pipe).
  *
  * Cost note (SURVEY.md §7 G6): a Scala UDF is a codegen black box and
  * blocks predicate pushdown — fine as a demonstrative projection, never
  * in a hot filter. The preferred path for everything else in this repo
  * is built-in `functions._`.
  */
object UserCode {

  /** Scalar UDF: deterministic text normalizer (trim, lowercase,
    * collapse runs of spaces). asNondeterministic NOT set — declaring
    * determinism lets Spark cache/reuse results. */
  private val normalize = udf((s: String) =>
    if (s == null) null else s.trim.toLowerCase.replaceAll(" +", " "))

  def udfScalar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        length(normalize($"text")).cast("long").as("norm_len"),
        substring(normalize($"text"), 1, 20).as("norm_prefix"))
      .orderBy($"doc_id")
  }

  /** Typed UDAF: numerically stable per-group mean/variance via a
    * Chan et al. parallel-merge of (count, mean, M2) — the reduce-side
    * user aggregate of the MR model, expressed as an Aggregator so the
    * buffer is a tiny fixed-size struct that merges associatively
    * (map-side combine works at any scale).
    * Bench-only (✖ oracle): FP merge order varies with partitioning, so
    * cross-engine bit-equality is not guaranteed; unit tests assert
    * against known values instead. */
  case class MomentBuf(n: Long, mean: Double, m2: Double)
  object StableMoments extends Aggregator[Double, MomentBuf, (Double, Double)] {
    def zero: MomentBuf = MomentBuf(0L, 0.0, 0.0)
    def reduce(b: MomentBuf, x: Double): MomentBuf = {
      val n = b.n + 1; val d = x - b.mean; val mean = b.mean + d / n
      MomentBuf(n, mean, b.m2 + d * (x - mean))
    }
    def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
      if (a.n == 0) b else if (b.n == 0) a else {
        val n = a.n + b.n; val d = b.mean - a.mean
        MomentBuf(n, a.mean + d * b.n / n, a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    def finish(b: MomentBuf): (Double, Double) =
      (b.mean, if (b.n > 1) b.m2 / (b.n - 1) else 0.0)
    def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
    def outputEncoder: Encoder[(Double, Double)] = Encoders.product[(Double, Double)]
  }

  def udafTyped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val moments = udaf(StableMoments)
    Tables.supplier(spark, dir)
      .groupBy($"s_nationkey")
      .agg(moments($"s_acctbal").as("mv"))
      .select($"s_nationkey", round($"mv._1", 4).as("mean_bal"), round($"mv._2", 4).as("var_bal"))
      .orderBy($"s_nationkey")
  }

  /** Generator (1→N map emit): tokenize documents with position.
    * Built-in posexplode — a codegen'd Generate node; a custom Generator
    * expression would buy nothing here. */
  def udtfExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos0", "token")))
      .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"token")
      .orderBy($"doc_id", $"pos")
  }

  /** Hadoop-Streaming analog: a per-partition imperative transform via
    * mapPartitions (kept JVM-internal — no subprocess). Computes a
    * per-document token count the "user code" way. The point is the
    * per-partition iterator contract; since the result is also
    * SQL-expressible it is oracled — imperative user code must not
    * lose or duplicate rows. */
  def pipePartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, text.split(" ").count(_.nonEmpty).toLong) }
      }
      .toDF("doc_id", "n_tokens")
      .orderBy($"doc_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "udf_scalar" -> (udfScalar(_, _)),
    "udaf_typed" -> (udafTyped(_, _)),
    "udtf_explode" -> (udtfExplode(_, _)),
    "pipe_partitions" -> (pipePartitions(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT doc_id,
        |  CAST(length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS BIGINT) AS norm_len,
        |  substring(lower(trim(regexp_replace(text, ' +', ' ', 'g'))), 1, 20) AS norm_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    // udaf_typed: ✖ FP merge order varies with partitioning — unit-tested instead
    "udtf_explode" ->
      """SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos, unnest(toks) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    // pipe_partitions: the operator under test is the per-partition
    // iterator contract; the result happens to be SQL-expressible, so
    // grade it too — imperative user code must not lose/dup rows.
    "pipe_partitions" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
