package graft


/** Dev-only mirror of the driver's t1 smoke: SparkEntry.entry rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.create()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
