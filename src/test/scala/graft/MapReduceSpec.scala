package graft

import org.apache.spark.sql.functions._
import graft.mr.MapReduce
import graft.operators.Aggregations

/** The MR job facade must reproduce the declarative operators' results —
  * the "a user of the reference could port their map/reduce programs"
  * claim, checked. */
class MapReduceSpec extends SparkSuite {

  test("word count as a classic map/combine/reduce job equals the DataFrame form") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("text").as[String]
    val pairs = MapReduce.mapJob(docs)(line =>
      line.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L)))
    val counts = MapReduce.reduceJob(pairs)(_ + _)
    val got = counts.toDF("w", "cnt").orderBy("w").collect().toSeq
    val want = Aggregations.aggWordcount(spark, sf0001).collect().toSeq
    assert(got === want)
  }

  test("distributed grep as a map-only job equals the DataFrame filter") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)]
    val re = "\\bjoin\\b".r
    val grepped = MapReduce.mapJob(docs) { case (id, text) =>
      if (re.findFirstIn(text).isDefined) Iterator.single((id, text)) else Iterator.empty
    }
    assert(grepped.count() === 380L)
  }

  test("general reduce (no combiner): max-price order per customer") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)]
    val pairs = MapReduce.mapJob(orders) { case (c, o, p) => Iterator.single((c, (o, p))) }
    val top = MapReduce.reduceGroupsJob(pairs) { (c, vs) =>
      val (o, p) = vs.maxBy { case (o, p) => (p, -o) }
      (c, o, p)
    }
    val want = Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(max(struct($"o_totalprice", -$"o_orderkey")).as("m"))
      .select($"o_custkey", (-$"m.col2").as("o"), $"m.o_totalprice".as("p"))
      .as[(Long, Long, Double)]
    assert(top.orderBy("_1").collect().toSeq === want.orderBy("o_custkey").collect().toSeq)
  }
}
