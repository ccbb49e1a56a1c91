package graft

import org.apache.spark.sql.functions._

/** Dev-only: isolate the cost of graph_copurchase_pairs variants at
  * sf0.1 — (A) incidence self-join vs (B) per-part supplier-set
  * explode (no second shuffle of the incidence frame). */
object CopurchaseProbe {
  def main(a: Array[String]): Unit = {
    val spark = LocalSession.create(logLevel = "WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    def ps = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
    for (round <- 1 to 3) {
      println(s"--- round $round")
      t("distinct only      ") { ps.count() }
      t("A self-join pairs  ") {
        ps.as("a").join(ps.as("b"),
            $"a.l_partkey" === $"b.l_partkey" && $"a.l_suppkey" < $"b.l_suppkey")
          .groupBy($"a.l_suppkey".as("s1"), $"b.l_suppkey".as("s2"))
          .agg(count(lit(1)).as("shared_parts"))
          .filter($"shared_parts" >= 3).count()
      }
      t("B set-explode pairs") {
        ps.groupBy($"l_partkey").agg(sort_array(collect_set($"l_suppkey")).as("ss"))
          .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
          .select($"s1", explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
          .groupBy($"s1", $"s2").agg(count(lit(1)).as("shared_parts"))
          .filter($"shared_parts" >= 3).count()
      }
      t("C packed-key pairs ") {
        ps.groupBy($"l_partkey").agg(sort_array(collect_set($"l_suppkey")).as("ss"))
          .select($"ss", posexplode($"ss").as(Seq("i", "s1")))
          .select(explode(expr("transform(slice(ss, i + 2, size(ss)), x -> s1 * 2097152 + x)")).as("pk"))
          .groupBy($"pk").agg(count(lit(1)).as("shared_parts"))
          .filter($"shared_parts" >= 3)
          .select(($"pk" / 2097152L).cast("long").as("s1"),
            pmod($"pk", lit(2097152L)).as("s2"), $"shared_parts").count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
