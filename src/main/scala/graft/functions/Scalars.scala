package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryFn, Tables}

/** Scalar function families (SURVEY.md §2.8) — one combined query per
  * family. All built-in `functions._`, so everything stays inside
  * whole-stage codegen and never blocks parquet pushdown.
  *
  * Cross-engine determinism notes baked in:
  *  - string/date functions are exact → safe anywhere;
  *  - double +,-,*,/ and sqrt are IEEE-defined → identical bits in any
  *    engine; transcendentals (ln, pow) are NOT guaranteed correctly
  *    rounded and are kept off the oracle surface;
  *  - ceil/floor return BIGINT in Spark vs DOUBLE in DuckDB → cast.
  */
object Scalars {

  /** String family over part: case, substring, concat, split-index,
    * trim+length, regexp_extract. */
  def scalarString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        lower($"p_name").as("lname"),
        upper($"p_brand").as("ubrand"),
        substring($"p_type", 1, 6).as("t6"),
        concat($"p_brand", lit("-"), $"p_type").as("cc"),
        length(trim($"p_name")).cast("long").as("name_len"),
        regexp_extract($"p_brand", "Brand#(\\d+)", 1).cast("int").as("brand_num"),
        element_at(split($"p_type", " "), 1).as("type_word"))
      .orderBy($"p_partkey")
  }

  /** Date family over orders: calendar fields, month truncation,
    * day difference, epoch millis. Quarter/datediff cast to BIGINT to
    * match DuckDB's integer widths. */
  def scalarDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        quarter($"o_orderdate").cast("long").as("q"),
        date_trunc("month", $"o_orderdate").cast("date").as("mon_start"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate").cast("long").as("days_to_2002"),
        // o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
        // session tz is UTC so the cast is an identity relabel
        unix_millis($"o_orderdate".cast("timestamp")).as("epoch_ms"))
      .orderBy($"o_orderkey")
  }

  /** Math family over lineitem: ceil/floor/abs/sqrt/square/CASE.
    * sqrt is IEEE correctly-rounded (engine-independent); ln/pow are
    * not, and are deliberately absent. Ordered by every output column —
    * lineitem has no unique key. */
  def scalarMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        ceil($"l_discount" * 10).as("ce"),
        floor($"l_extendedprice" / 1000).as("fl"),
        abs($"l_quantity" - 25.0).as("ab"),
        sqrt($"l_quantity").as("sq"),
        ($"l_quantity" * $"l_quantity").as("q2"),
        when($"l_quantity" > 25, "big").otherwise("small").as("cls"))
    out.orderBy(out.columns.map(col): _*)
  }

  /** Array family over embeddings via higher-order functions: size,
    * element access, element-wise filter count, max, and a sequential
    * left-fold sum in double (identical fold order in DuckDB's
    * list_sum ⇒ identical bits; rounded anyway for safety). */
  def scalarArray(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        element_at($"embedding", 1).as("first_el"),
        array_max($"embedding").as("max_el"),
        size(filter($"embedding", x => x > 0)).cast("long").as("n_pos"),
        round(aggregate($"embedding", lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("sum6"))
      .orderBy($"vec_id")
  }

  /** JSON/map family over events: parse the props JSON string into a
    * typed struct and a map; extract field, key, and raw length. */
  def scalarJsonMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("k INT"))
          .getField("k").as("k"),
        element_at(map_keys(from_json($"props", lit("map<string,int>"))), 1).as("first_key"),
        length($"props").cast("long").as("props_len"))
      .orderBy($"event_id")
  }

  /** Collection family over documents: distinct/sort/slice/contains on
    * token arrays. Outputs flattened to scalars (concat_ws) — array-
    * typed result columns compare fragilely across engines. Ordering
    * normalized via array_sort (binary collation, identical for this
    * ASCII corpus in both engines). */
  def scalarCollection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        concat_ws(",", slice(array_sort(array_distinct(toks)), 1, 3)).as("first3_sorted"),
        array_contains(toks, "join").as("has_join"),
        element_at(array_sort(toks), -1).as("max_token"))
      .orderBy($"doc_id")
  }

  /** Bitwise family over the id columns: and/or/xor, shifts, popcount.
    * Pure two's-complement integer ops — identical in every engine —
    * and staple tooling for flag fields, hash mixing, and bitmap-index
    * style predicates. */
  def scalarBitwise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id", $"user_id",
        $"event_id".bitwiseAND($"user_id").as("b_and"),
        $"event_id".bitwiseOR($"user_id").as("b_or"),
        $"event_id".bitwiseXOR($"user_id").as("b_xor"),
        shiftleft($"user_id", 3).as("shl"),
        shiftright($"event_id", 2).as("shr"),
        bit_count($"event_id").cast("long").as("nbits"))
      .orderBy($"event_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "scalar_bitwise" -> (scalarBitwise(_, _)),
    "scalar_collection" -> (scalarCollection(_, _)),
    "scalar_string" -> (scalarString(_, _)),
    "scalar_date" -> (scalarDate(_, _)),
    "scalar_math" -> (scalarMath(_, _)),
    "scalar_array" -> (scalarArray(_, _)),
    "scalar_json_map" -> (scalarJsonMap(_, _))
  )

  val oracleSql: Map[String, String] = Map(
    "scalar_bitwise" ->
      """SELECT event_id, user_id,
        |  event_id & user_id AS b_and,
        |  event_id | user_id AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  user_id << 3 AS shl,
        |  event_id >> 2 AS shr,
        |  CAST(bit_count(event_id) AS BIGINT) AS nbits
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_collection" ->
      """SELECT doc_id,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',') AS first3_sorted,
        |  list_contains(string_split(text, ' '), 'join') AS has_join,
        |  list_sort(string_split(text, ' '))[-1] AS max_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_string" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        |  substring(p_type, 1, 6) AS t6, p_brand || '-' || p_type AS cc,
        |  CAST(length(trim(p_name)) AS BIGINT) AS name_len,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
        |  string_split(p_type, ' ')[1] AS type_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
        |  epoch_ms(o_orderdate) AS epoch_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ceil(l_discount * 10) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS fl,
        |  abs(l_quantity - 25.0) AS ab,
        |  sqrt(l_quantity) AS sq,
        |  l_quantity * l_quantity AS q2,
        |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS cls
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, ce, fl, ab, sq, q2, cls""".stripMargin,
    "scalar_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS first_el,
        |  list_aggregate(embedding, 'max') AS max_el,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum6
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "scalar_json_map" ->
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k,
        |  json_keys(props)[1] AS first_key,
        |  CAST(length(props) AS BIGINT) AS props_len
        |FROM events ORDER BY event_id""".stripMargin
  )
}
