package graft

/** Every declared query must survive ZERO-ROW inputs — the class of
  * bug the resize/frame-sample guards fixed (empty-array indexing,
  * descending sequence bounds, div-by-zero on degenerate aggregates).
  * A 100 TB pipeline routinely sees empty partitions, empty filter
  * results, and empty ingest batches; an operator that throws on them
  * is not production-shaped. Results are not compared (the oracle does
  * that on real data) — this asserts construction + execution succeed.
  */
class EmptyFixtureSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = Tables.scratch("empty_fixture")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      Tables.table(spark, sf0001, t).limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query executes on an all-empty fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, s"queries failing on empty input:\n${failures.mkString("\n")}")
  }
}
