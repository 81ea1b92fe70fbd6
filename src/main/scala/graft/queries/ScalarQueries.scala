package graft.queries

import graft.{Dsl, GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Scalar expression surface (SURVEY §2.8): the reference implements NO
  * scalar functions — per-shard SQL is executed by PostgreSQL
  * (`combine_query_planner.c:1-10`) — so the deliverable is PG-compatible
  * semantics from Spark's built-in, codegen'd expression library.
  * Transcendentals (exp/ln/pow) are deliberately excluded from
  * oracle-checked outputs: libm last-ulp differences across engines.
  */
object ScalarQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** String functions over nation/customer names. */
  private val strings = GraftQuery(
    "scalar_string_funcs",
    (s, dir) =>
      t(s, dir, "nation")
        .select(
          col("n_nationkey"),
          upper(col("n_name")).as("up"),
          lower(col("n_name")).as("low"),
          length(col("n_name")).as("len"),
          substring(col("n_name"), 1, 6).as("sub"),
          concat_ws("-", col("n_name"), col("n_regionkey").cast(StringType))
            .as("concat"),
          regexp_replace(col("n_name"), "[0-9]+", "#").as("re_repl"),
          col("n_name").like("%1%").as("has_one"),
          trim(lit("  x  ")).as("trimmed"),
          lpad(col("n_nationkey").cast(StringType), 4, "0").as("padded"),
          reverse(col("n_name")).as("rev"),
          translate(col("n_name"), "_", "-").as("trans"),
          instr(col("n_name"), "_").as("pos"))
        .orderBy(col("n_nationkey")),
    Some("""SELECT n_nationkey,
      UPPER(n_name) AS up, LOWER(n_name) AS low, LENGTH(n_name) AS len,
      SUBSTRING(n_name, 1, 6) AS sub,
      CONCAT_WS('-', n_name, CAST(n_regionkey AS VARCHAR)) AS concat,
      REGEXP_REPLACE(n_name, '[0-9]+', '#', 'g') AS re_repl,
      n_name LIKE '%1%' AS has_one,
      TRIM('  x  ') AS trimmed,
      LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
      REVERSE(n_name) AS rev,
      TRANSLATE(n_name, '_', '-') AS trans,
      STRPOS(n_name, '_') AS pos
      FROM nation ORDER BY n_nationkey"""))

  /** Date/time functions on order dates. */
  private val dates = GraftQuery(
    "scalar_date_funcs",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 200)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_trunc("year", col("o_orderdate")).as("year_start"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
          datediff(ts("2000-01-01"), col("o_orderdate")).as("days_to_y2k"),
          col("o_orderdate").cast(DateType).as("as_date"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      DATE_TRUNC('month', o_orderdate) AS month_start,
      DATE_TRUNC('year', o_orderdate) AS year_start,
      CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
      CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
      CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
      CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
      o_orderdate + INTERVAL 90 DAY AS due_date,
      CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
           DATE '2000-01-01') AS INT) AS days_to_y2k,
      CAST(o_orderdate AS DATE) AS as_date,
      LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"""))

  /** Math on exact types (abs/ceil/floor/mod/sign/greatest/least/sqrt). */
  private val maths = GraftQuery(
    "scalar_math_funcs",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 300)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("abs_off"),
          ceil(col("p_retailprice")).as("ceil_price"),
          floor(col("p_retailprice")).as("floor_price"),
          (col("p_partkey") % 7).as("mod7"),
          signum(col("p_size") - 25).cast(IntegerType).as("sign_off"),
          greatest(col("p_size"), lit(10)).as("size_floor10"),
          least(col("p_size"), lit(40)).as("size_cap40"),
          sqrt(col("p_size")).as("sqrt_size"),
          round(money(col("p_retailprice")) / 10, 1).cast(DoubleType)
            .as("price_tenth"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      ABS(p_size - 25) AS abs_off,
      CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
      CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
      p_partkey % 7 AS mod7,
      CAST(SIGN(p_size - 25) AS INT) AS sign_off,
      GREATEST(p_size, 10) AS size_floor10,
      LEAST(p_size, 40) AS size_cap40,
      SQRT(p_size) AS sqrt_size,
      CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) / 10, 1) AS DOUBLE)
        AS price_tenth
      FROM part WHERE p_partkey <= 300 ORDER BY p_partkey"""))

  /** CASE / COALESCE / NULLIF / IF — conditional expressions. */
  private val conditionals = GraftQuery(
    "scalar_conditionals",
    (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") <= 300)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("(default)")).as("seg_or_default"),
          when(col("c_nationkey") % 2 === 0, col("c_nationkey"))
            .otherwise(-col("c_nationkey")).as("signed_nation"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'overdrawn'
           WHEN c_acctbal < 5000 THEN 'standard'
           ELSE 'premium' END AS tier,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(default)') AS seg_or_default,
      CASE WHEN c_nationkey % 2 = 0 THEN c_nationkey
           ELSE -c_nationkey END AS signed_nation
      FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"""))

  /** Cast matrix across exact types (PG `::` casts ≙ CAST). */
  private val casts = GraftQuery(
    "scalar_casts",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 60)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          col("l_quantity").cast(LongType).as("qty_long"),
          col("l_quantity").cast(DecimalType(10, 2)).cast(StringType)
            .as("qty_str"),
          col("l_linenumber").cast(StringType).as("line_str"),
          concat(lit(""), col("l_orderkey")).as("key_str"),
          col("l_shipdate").cast(DateType).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber,
      CAST(l_quantity AS INT) AS qty_int,
      CAST(l_quantity AS BIGINT) AS qty_long,
      CAST(CAST(l_quantity AS DECIMAL(10,2)) AS VARCHAR) AS qty_str,
      CAST(l_linenumber AS VARCHAR) AS line_str,
      CAST(l_orderkey AS VARCHAR) AS key_str,
      CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem WHERE l_orderkey <= 60
      ORDER BY l_orderkey, l_linenumber"""))

  /** JSON extraction from the events.props string column
    * (reference corpus: multi_jsonb_agg.sql flavor — JSON as data). */
  private val jsonExtract = GraftQuery(
    "scalar_json_extract",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Array ops via higher-order functions (PG array surface ≙ Spark
    * transform/filter/aggregate; DuckDB list_*). */
  private val arrays = GraftQuery(
    "scalar_array_funcs",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          split(col("text"), " ").as("words"))
        .select(
          col("doc_id"),
          size(col("words")).as("n_words"),
          size(array_distinct(col("words"))).as("n_distinct_words"),
          array_contains(col("words"), "spark").as("mentions_spark"),
          element_at(col("words"), 1).as("first_word"),
          array_join(slice(array_sort(array_distinct(col("words"))), 1, 3), ",")
            .as("first3_sorted"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      len(string_split(text, ' ')) AS n_words,
      len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
      list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
      string_split(text, ' ')[1] AS first_word,
      array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
        AS first3_sorted
      FROM documents ORDER BY doc_id"""))

  /** Regex functions (PG ~, substring(from), regexp_replace): extract,
    * match test, global replace, and a derived match count — same RE2
    * subset in both engines. */
  private val regexes = GraftQuery(
    "scalar_regex_funcs",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          col("p_name").rlike("bolt|rod").as("is_hardware"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
          (length(col("p_name")) -
            length(regexp_replace(col("p_name"), "[aeiou]", "")))
            .cast(LongType).as("n_vowels"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey,
      regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      regexp_matches(p_name, 'bolt|rod') AS is_hardware,
      regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
      CAST(length(p_name)
        - length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT)
        AS n_vowels
      FROM part ORDER BY p_partkey"""))

  /** Interval arithmetic + fixed-width time bucketing (PG `date_bin` /
    * DuckDB `time_bucket`): Spark lacks date_bin, so the bucket is
    * epoch-floor arithmetic — a pure codegen'd map expression, no UDF.
    * Also exercises interval addition and day-diff. */
  private val intervals = GraftQuery(
    "scalar_interval_funcs",
    (s, dir) => {
      val origin = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val bucketSec = 15L * 86400L
      t(s, dir, "orders")
        .withColumn("bucket",
          timestamp_seconds(
            floor((unix_timestamp(col("o_orderdate")) -
              unix_timestamp(origin)).cast("double") / bucketSec)
              .cast("long") * bucketSec + unix_timestamp(origin)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          avg(datediff(lit(java.sql.Date.valueOf("1997-01-01")),
            col("o_orderdate").cast("date"))).as("avg_days_to_cutoff"),
          min(col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("first_due"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT
      time_bucket(INTERVAL 15 DAYS, o_orderdate,
        TIMESTAMP '1996-01-01') AS bucket,
      COUNT(*) AS n_orders,
      CAST(AVG(date_diff('day', CAST(o_orderdate AS DATE),
        DATE '1997-01-01')) AS DOUBLE) AS avg_days_to_cutoff,
      MIN(o_orderdate + INTERVAL 90 DAY) AS first_due
      FROM orders GROUP BY 1 ORDER BY bucket"""))

  override val queries: Seq[GraftQuery] = Seq(
    strings, dates, maths, conditionals, casts, jsonExtract, arrays, regexes,
    intervals)
}
