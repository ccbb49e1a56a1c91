package object graft {
  /** A declared operator: (session, sf-dir) => result frame.
    * Contract: deterministic output — total ORDER BY ending in a unique
    * key, exact-decimal aggregation of money columns, floats cast to
    * double before arithmetic (SURVEY.md §7 G2). */
  type QueryFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
