package graft.queries

import graft.dsl.Ksql
import graft.functions.KFunctions
import graft.plans.Planner
import graft.sources.TestEntities._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar-function surface of SURVEY §2.3: string / math / date / cast /
  * conditional / JSON / URL / GEO / crypto. All column expressions are
  * built-in `functions._` (codegen'd — no UDFs in the hot path).
  * libm-dependent outputs (sin/exp/pow/log) are rounded to 6 decimals so
  * the DuckDB oracle compares stably across math libraries.
  */
object FunctionQueries extends QueryPack {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(customer)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_upper"),
            lower(col("c_name")).as("name_lower"),
            substring(col("c_name"), 1, 8).as("name_sub"),
            length(col("c_name")).as("name_len"),
            trim(col("c_name")).as("name_trim"),
            regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("name_repl"),
            KFunctions.containsStr(col("c_name"), "1").as("has_one"),
            col("c_name").startsWith("Customer").as("starts_cust"),
            col("c_name").endsWith("5").as("ends_five"),
            lpad(col("c_mktsegment"), 12, "*").as("seg_lpad"),
            rpad(col("c_mktsegment"), 12, "*").as("seg_rpad"),
            KFunctions.leftStr(col("c_name"), 4).as("name_left"),
            KFunctions.rightStr(col("c_name"), 4).as("name_right"),
            concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
            instr(col("c_name"), "5").as("idx_five")
          )
          .orderBy(col("c_custkey"))
          .build(),
        catalog(s, dir)
      )
    },

    "q_math_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(lineitem)
          .where(col("l_orderkey") < 200)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            abs(col("l_quantity") - 25.0).as("abs_dev"),
            round(col("l_extendedprice"), 1).as("price_round"),
            floor(col("l_discount") * 100).as("disc_floor"),
            ceil(col("l_discount") * 100).as("disc_ceil"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
            signum(col("l_quantity") - 25.0).as("qty_sign"),
            round(sin(col("l_quantity")), 6).as("qty_sin"),
            round(cos(col("l_quantity")), 6).as("qty_cos"),
            round(tan(col("l_quantity")), 6).as("qty_tan"),
            round(log(col("l_extendedprice")), 6).as("price_ln"),
            round(log10(col("l_extendedprice")), 6).as("price_log10"),
            round(exp(col("l_discount")), 6).as("disc_exp"),
            (col("l_orderkey") % 7).as("key_mod")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .build(),
        catalog(s, dir)
      )
    },

    "q_date_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .where(col("event_id") < 500)
          .select(
            col("event_id"),
            year(col("ts")).as("y"),
            month(col("ts")).as("mo"),
            dayofmonth(col("ts")).as("d"),
            hour(col("ts")).as("h"),
            minute(col("ts")).as("mi"),
            second(col("ts")).as("sec"),
            dayofweek(col("ts")).as("dow"),
            dayofyear(col("ts")).as("doy"),
            weekofyear(col("ts")).as("woy"),
            (col("ts") + expr("INTERVAL 1 DAY")).as("add_day"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("add_hours"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("add_minutes"),
            (col("ts") + expr("INTERVAL 45 SECONDS")).as("add_seconds")
          )
          .orderBy(col("event_id"))
          .build(),
        catalog(s, dir)
      )
    },

    "q_cast_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(lineitem)
          .where(col("l_orderkey") < 200)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_orderkey").cast("string").as("key_str"),
            // double→int is truncation in Spark; mirrored via TRUNC in SQL
            col("l_quantity").cast("int").as("qty_int"),
            col("l_linenumber").cast("long").as("line_long"),
            col("l_quantity").cast("string").cast("double").as("qty_roundtrip"),
            col("l_extendedprice").cast("decimal(18,2)").cast("double").as("price_dec"),
            concat(col("l_orderkey").cast("string"), lit("-"),
              col("l_linenumber").cast("string")).as("compound_key")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .build(),
        catalog(s, dir)
      )
    },

    "q_json_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(events)
          .where(col("event_id") < 500)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"),
            json_array_length(
              concat(lit("[1,2,"), get_json_object(col("props"), "$.k"), lit("]"))
            ).as("arr_len"),
            // array output serialized to a scalar string: the driver's
            // pandas comparator cannot hash ndarray cells
            array_join(json_object_keys(col("props")), ",").as("obj_keys"),
            KFunctions
              .jsonArrayContains(
                concat(lit("[1,2,"), get_json_object(col("props"), "$.k"), lit("]")),
                lit(5L),
                org.apache.spark.sql.types.LongType
              )
              .as("has_five"),
            get_json_object(col("props"), "$.missing").isNull.as("missing_is_null")
          )
          .orderBy(col("event_id"))
          .build(),
        catalog(s, dir)
      )
    },

    "q_url_funcs" -> { (s, dir) =>
      // testdata has no URL column; synthesize one deterministically and
      // run the real URL operators (parse_url ←
      // URL_EXTRACT_HOST/PATH/QUERY/PROTOCOL, registry :131-134)
      Planner.batch(
        Ksql
          .from(documents)
          .select(
            col("doc_id"),
            concat(lit("https://data.example.com/"), col("source"),
              lit("/doc?id="), col("doc_id").cast("string")).as("url")
          )
          .build(),
        catalog(s, dir)
      ).select(
        col("doc_id"),
        KFunctions.urlExtractHost(col("url")).as("host"),
        KFunctions.urlExtractPath(col("url")).as("path"),
        KFunctions.urlExtractQuery(col("url")).as("query"),
        KFunctions.urlExtractProtocol(col("url")).as("protocol")
      ).orderBy(col("doc_id"))
    },

    // full ARRAY_* registry (:95-105) over deterministic arrays; results
    // sorted so both engines' set-op ordering agrees
    "q_array_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(part)
          .select(
            col("p_partkey"),
            split(col("p_name"), " ").as("words"),
            array(col("p_type"), lit("ECONOMY"), lit("zz")).as("tags")
          )
          .build(),
        catalog(s, dir)
      ).select(
        // every array-valued result is serialized through array_join so the
        // driver's pandas comparator sees only scalar strings
        col("p_partkey"),
        size(col("words")).as("arr_len"),
        array_contains(col("words"), "widget").as("has_widget"),
        array_join(slice(col("words"), 1, 1), "_").as("first_word"),
        array_join(col("words"), "_").as("joined"),
        array_join(sort_array(array_distinct(col("tags"))), "|").as("tags_distinct"),
        array_join(sort_array(array_except(col("tags"), array(lit("ECONOMY")))), "|")
          .as("tags_except"),
        array_join(
          sort_array(array_intersect(col("tags"), array(lit("ECONOMY"), lit("PROMO")))),
          "|"
        ).as("tags_inter"),
        array_join(sort_array(array_union(col("words"), col("tags"))), "|").as("all_tokens"),
        array_join(sort_array(col("words")), "|").as("words_sorted"),
        array_max(col("words")).as("word_max"),
        array_min(col("words")).as("word_min")
      ).orderBy(col("p_partkey"))
    },

    "q_crypto_funcs" -> { (s, dir) =>
      Planner.batch(
        Ksql
          .from(customer)
          .select(
            col("c_custkey"),
            md5(col("c_name").cast("binary")).as("name_md5"),
            sha2(col("c_name").cast("binary"), 256).as("name_sha256")
          )
          .orderBy(col("c_custkey"))
          .build(),
        catalog(s, dir)
      )
    },

    // the SQL surface itself under the driver gate: the query text runs
    // through spark.sql with the GraftExtensions dialect (UCASE/LEN/
    // COUNT_DISTINCT/LATEST_BY_OFFSET/TOPK), not the DSL
    "q_sql_dialect" -> { (s, dir) =>
      graft.GraftExtensions.registerAll(s) // idempotent; covers non-extension sessions
      graft.sources.Tables.load(s, dir, "events").createOrReplaceTempView("events_sql")
      s.sql(
        """SELECT event_type,
          |       UCASE(SUBSTRING(event_type, 1, 3)) AS prefix_uc,
          |       LEN(event_type) AS etype_len,
          |       COUNT_DISTINCT(user_id) AS nu,
          |       LATEST_BY_OFFSET(value, event_id) AS last_v,
          |       get(TOPK(value, 3), 0) AS top1,
          |       get(TOPK(value, 3), 2) AS top3
          |FROM events_sql
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin
      )
    },

    "q_geo_funcs" -> { (s, dir) =>
      // deterministic synthetic coordinates from keys; real haversine
      // column math (GEO_DISTANCE registry :137) — no UDF
      Planner.batch(
        Ksql
          .from(customer)
          .select(
            col("c_custkey"),
            (col("c_custkey") % 80).cast("double").as("lat1"),
            (col("c_custkey") % 160).cast("double").as("lon1"),
            (col("c_nationkey") * 3).cast("double").as("lat2"),
            (col("c_nationkey") * 6).cast("double").as("lon2")
          )
          .build(),
        catalog(s, dir)
      ).select(
        col("c_custkey"),
        round(KFunctions.geoDistanceKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")), 4)
          .as("dist_km"),
        KFunctions.asGeoJson(col("lat1"), col("lon1")).as("geojson")
      ).orderBy(col("c_custkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       UPPER(c_name) AS name_upper,
        |       LOWER(c_name) AS name_lower,
        |       SUBSTRING(c_name, 1, 8) AS name_sub,
        |       LENGTH(c_name) AS name_len,
        |       TRIM(c_name) AS name_trim,
        |       REPLACE(c_name, 'Customer', 'Cust') AS name_repl,
        |       STRPOS(c_name, '1') > 0 AS has_one,
        |       STARTS_WITH(c_name, 'Customer') AS starts_cust,
        |       c_name LIKE '%5' AS ends_five,
        |       LPAD(c_mktsegment, 12, '*') AS seg_lpad,
        |       RPAD(c_mktsegment, 12, '*') AS seg_rpad,
        |       SUBSTRING(c_name, 1, 4) AS name_left,
        |       SUBSTRING(c_name, LENGTH(c_name) - 3, 4) AS name_right,
        |       CONCAT(c_mktsegment, '-', c_name) AS seg_name,
        |       STRPOS(c_name, '5') AS idx_five
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       ABS(l_quantity - 25.0) AS abs_dev,
        |       ROUND(l_extendedprice, 1) AS price_round,
        |       CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_floor,
        |       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_ceil,
        |       SQRT(l_quantity) AS qty_sqrt,
        |       ROUND(POW(l_quantity, 2), 6) AS qty_sq,
        |       CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
        |       ROUND(SIN(l_quantity), 6) AS qty_sin,
        |       ROUND(COS(l_quantity), 6) AS qty_cos,
        |       ROUND(TAN(l_quantity), 6) AS qty_tan,
        |       ROUND(LN(l_extendedprice), 6) AS price_ln,
        |       ROUND(LOG10(l_extendedprice), 6) AS price_log10,
        |       ROUND(EXP(l_discount), 6) AS disc_exp,
        |       l_orderkey % 7 AS key_mod
        |FROM lineitem
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_date_funcs" ->
      """SELECT event_id,
        |       CAST(EXTRACT(YEAR FROM ts) AS INT) AS y,
        |       CAST(EXTRACT(MONTH FROM ts) AS INT) AS mo,
        |       CAST(EXTRACT(DAY FROM ts) AS INT) AS d,
        |       CAST(EXTRACT(HOUR FROM ts) AS INT) AS h,
        |       CAST(EXTRACT(MINUTE FROM ts) AS INT) AS mi,
        |       CAST(FLOOR(EXTRACT(SECOND FROM ts)) AS INT) AS sec,
        |       CAST(DAYOFWEEK(ts) + 1 AS INT) AS dow,
        |       CAST(DAYOFYEAR(ts) AS INT) AS doy,
        |       CAST(WEEKOFYEAR(ts) AS INT) AS woy,
        |       ts + INTERVAL 1 DAY AS add_day,
        |       ts + INTERVAL 2 HOUR AS add_hours,
        |       ts + INTERVAL 30 MINUTE AS add_minutes,
        |       ts + INTERVAL 45 SECOND AS add_seconds
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,
    "q_cast_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_orderkey AS VARCHAR) AS key_str,
        |       CAST(TRUNC(l_quantity) AS INT) AS qty_int,
        |       CAST(l_linenumber AS BIGINT) AS line_long,
        |       CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |       CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS compound_key
        |FROM lineitem
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |       CAST(props->>'$.k' AS VARCHAR) AS k_str,
        |       CAST(props->>'$.k' AS INT) AS k_int,
        |       CAST(JSON_ARRAY_LENGTH('[1,2,' || (props->>'$.k') || ']') AS INT) AS arr_len,
        |       ARRAY_TO_STRING(CAST(JSON_KEYS(props) AS VARCHAR[]), ',') AS obj_keys,
        |       JSON_CONTAINS('[1,2,' || (props->>'$.k') || ']', '5') AS has_five,
        |       (props->>'$.missing') IS NULL AS missing_is_null
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,
    "q_url_funcs" ->
      """SELECT doc_id,
        |       'data.example.com' AS host,
        |       '/' || source || '/doc' AS path,
        |       'id=' || CAST(doc_id AS VARCHAR) AS query,
        |       'https' AS protocol
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_array_funcs" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |         STRING_SPLIT(p_name, ' ') AS words,
        |         [p_type, 'ECONOMY', 'zz'] AS tags
        |  FROM part)
        |SELECT p_partkey,
        |       CAST(LEN(words) AS INT) AS arr_len,
        |       LIST_CONTAINS(words, 'widget') AS has_widget,
        |       ARRAY_TO_STRING(words[1:1], '_') AS first_word,
        |       ARRAY_TO_STRING(words, '_') AS joined,
        |       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(tags)), '|') AS tags_distinct,
        |       ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(LIST_DISTINCT(tags), x -> x <> 'ECONOMY')), '|') AS tags_except,
        |       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_FILTER(tags, x -> x IN ('ECONOMY','PROMO')))), '|') AS tags_inter,
        |       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_CONCAT(words, tags))), '|') AS all_tokens,
        |       ARRAY_TO_STRING(LIST_SORT(words), '|') AS words_sorted,
        |       LIST_MAX(words) AS word_max,
        |       LIST_MIN(words) AS word_min
        |FROM p
        |ORDER BY p_partkey""".stripMargin,
    "q_crypto_funcs" ->
      """SELECT c_custkey,
        |       MD5(c_name) AS name_md5,
        |       SHA256(c_name) AS name_sha256
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q_sql_dialect" ->
      """SELECT event_type,
        |       UPPER(SUBSTRING(event_type, 1, 3)) AS prefix_uc,
        |       CAST(LENGTH(event_type) AS INT) AS etype_len,
        |       COUNT(DISTINCT user_id) AS nu,
        |       MAX_BY(value, event_id) AS last_v,
        |       LIST_SORT(LIST(value), 'DESC')[1] AS top1,
        |       LIST_SORT(LIST(value), 'DESC')[3] AS top3
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_geo_funcs" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 80 AS DOUBLE) AS lat1,
        |         CAST(c_custkey % 160 AS DOUBLE) AS lon1,
        |         CAST(c_nationkey * 3 AS DOUBLE) AS lat2,
        |         CAST(c_nationkey * 6 AS DOUBLE) AS lon2
        |  FROM customer)
        |SELECT c_custkey,
        |       ROUND(2 * 6371.0 * ASIN(SQRT(
        |         POW(SIN((lat2 - lat1) * PI() / 180 / 2), 2) +
        |         COS(lat1 * PI() / 180) * COS(lat2 * PI() / 180) *
        |         POW(SIN((lon2 - lon1) * PI() / 180 / 2), 2))), 4) AS dist_km,
        |       '{"type":"Point","coordinates":[' || CAST(lon1 AS VARCHAR) || ',' ||
        |         CAST(lat1 AS VARCHAR) || ']}' AS geojson
        |FROM c
        |ORDER BY c_custkey""".stripMargin
  )

  private def catalog(s: SparkSession, dir: String) =
    graft.sources.TestEntities.catalog(s, dir)
}
