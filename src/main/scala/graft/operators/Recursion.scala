package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryFn, Tables}

/** Recursive-query surface (SQL:1999 `WITH RECURSIVE`), executed by
  * Spark 4's UnionLoop iterative machinery — the declarative twin of the
  * driver-coordinated loops in [[Pipelines.connectedComponents]] and
  * [[Analytics.graphPagerank]]: the engine, not the caller, owns the
  * iterate-until-done control flow.
  *
  * Scale posture: each recursion step is ONE equi-join of the current
  * frontier against the (small, distinct) edge list plus a union append
  * — the same per-round plan shape as the hand-rolled loops. The edge
  * relation is a DAG by construction (every star edge points to a
  * strictly smaller doc_id), so path length is bounded by the min-chain
  * depth; the explicit `depth < 8` cap additionally bounds the rounds on
  * ANY input, the way a production traversal must. Frontier rows are
  * 24-byte (id, id, int) tuples — the recursion shuffles ids, never text.
  */
object Recursion {

  /** Duplicate-lineage traversal: walk the bucket-star edge DAG (each
    * document points at the min doc_id of any shared first-4/last-4
    * token bucket — the dedup_cluster_cc edge set) and report, per
    * document, its reachable ancestor set: the min ancestor (candidate
    * canonical copy), how many distinct ancestors, and the longest
    * chain. The "which earlier documents does this near-duplicate
    * ultimately derive from" question a provenance audit asks. */
  def sqlRecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents_rcte")
    spark.sql(
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents_rcte),
        |keys AS (
        |  SELECT doc_id, concat('p', concat_ws(' ', slice(t, 1, 4))) AS k
        |  FROM toks WHERE size(t) >= 4
        |  UNION ALL
        |  SELECT doc_id, concat('s', concat_ws(' ', slice(t, -4, 4))) AS k
        |  FROM toks WHERE size(t) >= 4),
        |star AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS m FROM keys),
        |e0 AS (SELECT DISTINCT doc_id AS a, m AS b FROM star WHERE m <> doc_id),
        |reach(doc_id, anc, depth) AS (
        |  SELECT a, b, 1 FROM e0
        |  UNION ALL
        |  SELECT r.doc_id, e.b, r.depth + 1
        |  FROM reach r JOIN e0 e ON e.a = r.anc WHERE r.depth < 8)
        |SELECT doc_id, min(anc) AS min_anc, count(DISTINCT anc) AS n_anc,
        |  CAST(max(depth) AS BIGINT) AS max_depth
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  val queries: Map[String, QueryFn] = Map(
    "sql_recursive_cte" -> (sqlRecursiveCte(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "sql_recursive_cte" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |keys AS (
        |  SELECT doc_id, 'p' || array_to_string(list_slice(t, 1, 4), ' ') AS k
        |  FROM toks WHERE len(t) >= 4
        |  UNION ALL
        |  SELECT doc_id, 's' || array_to_string(list_slice(t, -4, -1), ' ') AS k
        |  FROM toks WHERE len(t) >= 4),
        |star AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS m FROM keys),
        |e0 AS (SELECT DISTINCT doc_id AS a, m AS b FROM star WHERE m <> doc_id),
        |reach(doc_id, anc, depth) AS (
        |  SELECT a, b, 1 FROM e0
        |  UNION ALL
        |  SELECT r.doc_id, e.b, r.depth + 1
        |  FROM reach r JOIN e0 e ON e.a = r.anc WHERE r.depth < 8)
        |SELECT doc_id, min(anc) AS min_anc, count(DISTINCT anc) AS n_anc,
        |  CAST(max(depth) AS BIGINT) AS max_depth
        |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
