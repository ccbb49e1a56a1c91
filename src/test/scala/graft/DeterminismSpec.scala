package graft

/** Determinism regression (SURVEY.md §5.4): every declared query must
  * produce identical results across runs and across different
  * parallelism — the local proxy for the driver's hash-match gate.
  * Catches FP-order and sort-tie nondeterminism early. */
class DeterminismSpec extends SparkSuite {

  // csv roundtrip excluded: rewrites its own tmp input mid-plan
  private val skip = Set("source_csv_roundtrip")

  test("every query is run-to-run deterministic at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => None
      case (name, fn) =>
        val a = fn(spark, sf0001).collect().map(_.toString).toSeq
        val b = fn(spark, sf0001).collect().map(_.toString).toSeq
        if (a == b) None else Some(name)
    }
    assert(failures.isEmpty, s"nondeterministic queries: $failures")
  }

  test("no declared query output has array/map/struct columns") {
    // The driver canonicalizes EVERY declared output (even non-oracled
    // ones) via pandas sort_values; nested-typed cells arrive as numpy
    // arrays, which are unhashable and grade the key as a driver-side
    // error (round-1 lesson: multimodal_decode_stub). Scalar columns only.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => None
      case (name, fn) =>
        val nested = fn(spark, sf0001).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] => f.name
        }
        if (nested.isEmpty) None else Some(s"$name(${nested.mkString(",")})")
    }
    assert(offenders.isEmpty, s"nested-typed output columns: $offenders")
  }

  test("query results are invariant to shuffle partition count") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = SparkEntry.queries.toSeq.sortBy(_._1).collect {
        case (name, fn) if !skip(name) =>
          spark.conf.set("spark.sql.shuffle.partitions", "3")
          val a = fn(spark, sf0001).collect().map(_.toString).toSeq
          spark.conf.set("spark.sql.shuffle.partitions", "7")
          val b = fn(spark, sf0001).collect().map(_.toString).toSeq
          (name, a == b)
      }
      val bad = results.filter(!_._2).map(_._1)
      assert(bad.isEmpty, s"partition-count-sensitive queries: $bad")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("documents.text is pure ASCII at every fixture scale") {
    // multimodal_resize_stub's oracle parity rests on byte-strided
    // sampling == DuckDB character substring (and sha-over-bytes ==
    // sha-over-chars), which holds ONLY for 1-byte characters. A single
    // multi-byte character in a future fixture would silently diverge
    // the hash-match; this guard turns that into a loud failure.
    import org.apache.spark.sql.functions.{col, expr}
    // sf0.1 is driver-generated and absent on bare checkouts; guard it so
    // the suite skips that leg instead of failing on machines without it.
    val sf01 = Seq("/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "documents.parquet").exists())
    for (dir <- Seq(sf0001, sf001) ++ sf01) {
      val bad = Tables.documents(spark, dir)
        .filter(expr("octet_length(text) <> length(text)"))
      assert(bad.count() === 0L,
        s"multi-byte text in $dir breaks resize_stub's strided-byte == strided-char oracle")
    }
  }
}
