package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scalar-function surface (SURVEY.md §2.8): strings, regex, date/time,
  * JSON, conditionals, struct/list. All codegen'd builtins — no UDFs —
  * so every expression stays inside WholeStageCodegen and is pushdown-
  * friendly at scale.
  */
object ScalarQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Strings: LEFT/substr, split_part, lower/upper, ||-concat, rtrim
    // (reference schema.sql:151,291-296; bird_schema.sql:598,803).
    "q21_string_funcs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 10)).as("head10"),
          split_part(col("source"), lit("rc"), lit(2)).as("src_num"),
          length(col("text")).as("n"),
          concat(col("lang"), lit(":"), col("source")).as("tag"),
          substring(col("text"), 1, 5).as("l5"),
          rtrim(substring(col("text"), 1, 20)).as("t20"))
        .orderBy(col("doc_id"))
    },

    // Regex: regexp_extract group capture + boolean match
    // (schema.sql:45-46 partition-path extraction; bird_schema.sql:836-838).
    "q22_regex_funcs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("source"), "src([0-9]+)", 1).as("src_id"),
          when(col("text").rlike("error|fail"), 1).otherwise(0).as("has_err"),
          size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_words"))
        .orderBy(col("doc_id"))
    },

    // Date/time: extract, cast-to-date, date_trunc, epoch millis
    // (schema.sql:119,128-135). events.ts is ns in parquet: emit only
    // ms-or-coarser derivations so Spark (µs) and DuckDB (ns) agree.
    "q23_date_funcs" -> { (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          hour(col("ts")).as("h"),
          dayofmonth(col("ts")).as("d"),
          col("ts").cast("date").as("dt"),
          unix_millis(col("ts")).as("epoch_ms"))
        .orderBy(col("event_id"))
    },

    // Date arithmetic + calendar bucketing (age-bucket shape,
    // schema.sql:128-135): days since a fixed anchor, bucketed.
    "q24_age_buckets" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("age_days"))
        .withColumn("age_bucket",
          when(col("age_days") < 365, "recent")
            .when(col("age_days") < 365 * 3, "old")
            .otherwise("ancient"))
        .orderBy(col("o_orderkey"))
    },

    // JSON: ->> path extraction (bird_schema.sql:866-882).
    "q25_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 90)
        .orderBy(col("event_id"))
    },

    // Conditionals: CASE/COALESCE status badge (schema.sql:28-33,
    // blq_status_badge bird_schema.sql:423-430).
    "q26_status_badge" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "OK")
            .when(col("o_orderstatus") === "P", "PENDING")
            .otherwise("OPEN").as("badge"),
          coalesce(nullif(col("o_orderpriority"), lit("")), lit("none")).as("prio"))
        .orderBy(col("o_orderkey"))
    },

    // Ref helpers (F1): blq_ref / blq_location string building with null
    // handling (schema.sql:290-309) — pure concat/when Column exprs.
    "q27_ref_location" -> { (s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          concat(col("user_id").cast("string"), lit(":"), col("event_id").cast("string")).as("ref"),
          when(col("event_type").isNotNull,
            concat(col("event_type"), lit(":"),
              coalesce(get_json_object(col("props"), "$.k"), lit("?"))))
            .otherwise(lit(null)).as("location"))
        .orderBy(col("event_id"))
    },

    // Math: ABS, arithmetic on aggregates (schema.sql:283 ORDER BY ABS(delta)).
    // Exactness: sum integer cents (exact in both engines regardless of
    // summation order), divide exact longs → bit-identical doubles.
    "q28_math_delta" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      val byUser = ev.groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("cents")).as("uc"), count(lit(1)).as("un"))
      val overall = ev.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("gc"), count(lit(1)).as("gn"))
      byUser.join(broadcast(overall), Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          round(abs(col("uc") / col("un") - col("gc") / col("gn")) / 100, 4).as("abs_delta"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // Struct/list: named_struct + explode round-trip (unnest analog,
    // bird_schema.sql:798-799).
    "q29_struct_explode" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 100)
        .orderBy(col("word"))
    })

  val oracles: Map[String, String] = Map(
    "q21_string_funcs" ->
      """SELECT doc_id, upper(substr(text, 1, 10)) AS head10,
        | split_part(source, 'rc', 2) AS src_num, length(text) AS n,
        | lang || ':' || source AS tag, substr(text, 1, 5) AS l5,
        | rtrim(substr(text, 1, 20)) AS t20
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_regex_funcs" ->
      """SELECT doc_id, regexp_extract(source, 'src([0-9]+)', 1) AS src_id,
        | CASE WHEN regexp_matches(text, 'error|fail') THEN 1 ELSE 0 END AS has_err,
        | len(regexp_extract_all(text, '[a-z]+')) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q23_date_funcs" ->
      """SELECT event_id, extract(hour FROM ts) AS h, extract(day FROM ts) AS d,
        | CAST(ts AS DATE) AS dt, epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "q24_age_buckets" ->
      """SELECT o_orderkey,
        | datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
        | CASE WHEN datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') < 365 THEN 'recent'
        |      WHEN datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') < 1095 THEN 'old'
        |      ELSE 'ancient' END AS age_bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q25_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
        |ORDER BY event_id""".stripMargin,
    "q26_status_badge" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'OK'
        |      WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE 'OPEN' END AS badge,
        | coalesce(nullif(o_orderpriority, ''), 'none') AS prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q27_ref_location" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS ref,
        | CASE WHEN event_type IS NOT NULL
        |      THEN event_type || ':' || coalesce(json_extract_string(props, '$.k'), '?')
        |      ELSE NULL END AS location
        |FROM events ORDER BY event_id""".stripMargin,
    "q28_math_delta" ->
      """WITH cents AS (
        |  SELECT user_id, event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events),
        |by_user AS (
        |  SELECT user_id, event_type, sum(c) AS uc, count(*) AS un
        |  FROM cents GROUP BY user_id, event_type),
        |overall AS (
        |  SELECT event_type, sum(c) AS gc, count(*) AS gn
        |  FROM cents GROUP BY event_type)
        |SELECT user_id, by_user.event_type AS event_type,
        | round(abs(CAST(uc AS DOUBLE) / un - CAST(gc AS DOUBLE) / gn) / 100, 4) AS abs_delta
        |FROM by_user JOIN overall ON by_user.event_type = overall.event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q29_struct_explode" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) sub
        |WHERE length(word) > 0
        |GROUP BY word HAVING count(*) > 100 ORDER BY word""".stripMargin)
}
