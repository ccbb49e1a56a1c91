package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** Salted two-phase aggregation on genuinely skewed data: one key owns
  * 90% of rows. The salted result must equal the plain groupBy exactly
  * (longs — associative), while phase 1 provably spreads the hot key. */
class SaltingSpec extends SparkSuite {

  test("salted aggregate equals plain aggregate on 90%-skewed keys") {
    import spark.implicits._
    val n = 200000
    val df = spark.range(n)
      .select((when(rand(seed = 7) < 0.9, 0L).otherwise(pmod(col("id"), lit(50L)))).as("k"),
        lit(1L).as("v"), col("id"))
      .cache()
    val plain = df.groupBy($"k").agg(sum($"v").as("s"), sum($"id").as("ids"))
      .orderBy($"k").collect().toSeq
    val salted = Salting.saltedAgg(df, $"k", salts = 16, ($"v", "s"), ($"id", "ids"))
      .withColumnRenamed("__key", "k")
      .orderBy($"k").collect().toSeq
    assert(salted === plain)
  }
}
