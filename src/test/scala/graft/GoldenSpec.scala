package graft

import java.nio.file.{Files, Paths}

/** Golden-file regression (SURVEY.md §5.5): flagship query results at
  * sf0.001 pinned as human-reviewable CSVs. Regenerate deliberately with
  * `graft.GoldenGen` after an intentional semantic change. */
class GoldenSpec extends SparkSuite {
  GoldenGen.all.foreach { name =>
    test(s"golden: $name") {
      val golden = Files.readString(
        Paths.get(s"/root/repo/src/test/resources/golden/$name.csv"))
      assert(GoldenGen.csvOf(spark, name, sf0001) === golden)
    }
  }
}
