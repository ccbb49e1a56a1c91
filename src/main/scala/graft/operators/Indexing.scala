package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Round-9 retrieval/tokenizer layer: the inverted-index build (the
  * classic MapReduce demo beyond wordcount, and the backbone of any
  * search layer over the corpus) and one corpus-wide BPE merge
  * iteration (the tokenizer-training primitive of an LLM pipeline).
  *
  * Determinism posture (both keys oracled): everything is integer
  * counts, integer positions, and strings; ordered aggregation is made
  * deterministic with sort_array / ORDER BY-inside-aggregate on a
  * unique key, and the BPE merge election carries a total (count desc,
  * pair asc) order. The fixture text is printable ASCII (verified), so
  * Java-regex vs RE2 differences on newlines/supplementary planes
  * cannot bite.
  */
object Indexing {

  /** Inverted index — term → postings list. Per term: document
    * frequency, total occurrences, and the full postings string
    * `docId:pos1,pos2|docId:pos…` with documents ascending and 1-based
    * token positions ascending — the text-serialized form of the
    * array<struct> a binary index would store (the oracle compare
    * rejects nested columns, and a flat string is hash-stable anyway).
    *
    * Scale shape: ONE shuffle, on the term key. The token stream is
    * repartitioned by term up front; both aggregation levels —
    * (term, doc) postings, then term rollup — satisfy their clustering
    * from that single hash partitioning (Spark accepts a partitioning
    * on a key SUBSET for grouping), so neither adds an exchange
    * (pinned in PlanRegressionSpec). There is no map-side combine to
    * lose: an inverted index ships every position regardless, so one
    * raw shuffle is strictly cheaper than two aggregate shuffles. At
    * 100 TB this is the term-partitioned index build; stopword terms
    * produce long postings rows — real engines cap or skip-list them,
    * here the fixture vocabulary is bounded (~31 terms). Positions
    * index the RAW split array (empty tokens from repeated spaces keep
    * their slot on both engines), so offsets stay engine-identical. */
  def textInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "term")))
      .filter($"term" =!= "")
      .select($"term", $"doc_id", ($"p0" + 1).cast("long").as("pos"))
      .repartition($"term")
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("n"),
        array_join(transform(sort_array(collect_list($"pos")),
          _.cast("string")), ",").as("poss"))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"),
        sum($"n").as("n_occurrences"),
        array_join(transform(sort_array(collect_list(struct($"doc_id", $"poss"))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("poss"))), "|").as("postings"))
      .orderBy($"term")
  }

  /** One BPE merge iteration over the corpus — the inner step of
    * byte-pair-encoding tokenizer training: words decompose into
    * single-character pieces, every adjacent piece pair is counted
    * corpus-wide, the most frequent pair (ties broken lexicographically
    * — the total order that makes the election deterministic) is merged
    * everywhere, and the corpus pair mass is re-counted. Output: the
    * top-20 pair table plus the elected merge's before/after adjacent-
    * pair totals — `pairs_after < pairs_before` is the monotone-
    * progress law a BPE trainer relies on (pinned in PropertiesSpec).
    *
    * The merge applies via string `replace` on the space-joined piece
    * string: leftmost-first non-overlapping replacement IS BPE's greedy
    * application order, and Spark and DuckDB replace() agree on it.
    *
    * Scale shape: pair counting is a map-side-combinable groupBy on the
    * (a, b) key (pair domain ≤ |alphabet|² initially — tiny); the
    * election is a global top-1 (TakeOrderedAndProject, never a
    * single-partition sort); the 1-row winner broadcasts back over the
    * piece strings for the merge pass. The piece frame is persisted
    * across its three uses (count, before-total, merge+after-total) so
    * the corpus is tokenized once. The rank window and final output
    * ingest ≤20 rows. */
  def textBpeMergeStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spaced = graft.PlanOnly.mark(
      Tables.documents(spark, dir)
        .select(explode(split($"text", " ")).as("w"))
        .filter($"w" =!= "")
        .select(trim(regexp_replace($"w", "(.)", "$1 ")).as("s")))
    // persisted: read twice (top-20 table + top-1 election) and tiny —
    // the pair domain is ≤|alphabet|² at the first iteration
    val pairCounts = graft.PlanOnly.mark(spaced
      .select(split($"s", " ").as("ps"))
      .filter(size($"ps") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ps) - 1),
          |  i -> struct(element_at(ps, i) AS a, element_at(ps, i + 1) AS b))"""
          .stripMargin)).as("p"))
      .select($"p.a", $"p.b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cnt")))
    val best = pairCounts.orderBy($"cnt".desc, $"a", $"b").limit(1)
      .select($"a".as("ba"), $"b".as("bb"))
    val before = spaced
      .agg(sum(size(split($"s", " ")) - 1).cast("long").as("pairs_before"))
    val after = spaced.crossJoin(broadcast(best))
      .select(replace($"s", concat($"ba", lit(" "), $"bb"),
        concat($"ba", $"bb")).as("s2"))
      .agg(sum(size(split($"s2", " ")) - 1).cast("long").as("pairs_after"))
    // rank window: ≤20 rows after the top-k cut, never the pair table
    val rk = Window.orderBy($"cnt".desc, $"a", $"b")
    pairCounts.orderBy($"cnt".desc, $"a", $"b").limit(20)
      .withColumn("rk", row_number().over(rk).cast("long"))
      .crossJoin(broadcast(before))
      .crossJoin(broadcast(after))
      .select($"rk", $"a", $"b", $"cnt", $"pairs_before", $"pairs_after")
      .orderBy($"rk")
  }

  val queries: Map[String, QueryFn] = Map(
    "text_inverted_index" -> (textInvertedIndex(_, _)),
    "text_bpe_merge_step" -> (textBpeMergeStep(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    // positions index the raw split array on both engines (1-based);
    // string_agg ORDER BY pos / doc_id mirrors sort_array-in-aggregate
    "text_inverted_index" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
        |    FROM documents),
        |tok AS (SELECT doc_id, unnest(generate_series(1, len(ts))) AS pos, ts
        |  FROM toks),
        |hit AS (SELECT doc_id, pos, ts[pos] AS term FROM tok
        |  WHERE ts[pos] <> ''),
        |perdoc AS (SELECT term, doc_id, count(*) AS n,
        |    string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS poss
        |  FROM hit GROUP BY term, doc_id)
        |SELECT term, count(*) AS df, CAST(sum(n) AS BIGINT) AS n_occurrences,
        |  string_agg(CAST(doc_id AS VARCHAR) || ':' || poss, '|'
        |    ORDER BY doc_id) AS postings
        |FROM perdoc GROUP BY term ORDER BY term""".stripMargin,
    "text_bpe_merge_step" ->
      """WITH words AS (SELECT w FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> ''),
        |spaced AS (SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS s
        |  FROM words),
        |pieces AS (SELECT string_split(s, ' ') AS ps FROM spaced),
        |pairs AS (SELECT ps[i] AS a, ps[i + 1] AS b
        |  FROM (SELECT ps, unnest(generate_series(1, len(ps) - 1)) AS i
        |        FROM pieces WHERE len(ps) >= 2)),
        |pc AS (SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b),
        |best AS (SELECT a AS ba, b AS bb FROM pc
        |  ORDER BY cnt DESC, a, b LIMIT 1),
        |bef AS (SELECT CAST(sum(len(ps) - 1) AS BIGINT) AS pairs_before
        |  FROM pieces),
        |merged AS (SELECT replace(s, ba || ' ' || bb, ba || bb) AS s2
        |  FROM spaced, best),
        |aft AS (SELECT CAST(sum(len(string_split(s2, ' ')) - 1) AS BIGINT)
        |    AS pairs_after FROM merged),
        |top AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rk
        |  FROM pc ORDER BY cnt DESC, a, b LIMIT 20)
        |SELECT rk, a, b, cnt, pairs_before, pairs_after
        |FROM top, bef, aft ORDER BY rk""".stripMargin
  )
}
