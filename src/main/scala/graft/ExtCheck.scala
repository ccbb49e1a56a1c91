package graft


/** Dev-only: prove the spark.sql.extensions config path end-to-end in a
  * fresh JVM (getOrCreate in an existing JVM would silently reuse the
  * session and skip extension installation). Prints EXTCHECK_OK. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = LocalSession.create(cores = "2",
      extra = Map("spark.sql.extensions" -> "graft.GraftExtensions"))
    Tables.embeddings(spark, dir).createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT round(cosine_similarity(embedding, embedding), 6) AS c,
        |       dot_product(embedding, embedding) > 0 AS p
        |FROM emb LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5 &&
      rows.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6 && r.getBoolean(1)))
    println("EXTCHECK_OK")
    spark.stop()
  }
}
