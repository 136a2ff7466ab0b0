package graft.operators

import org.apache.spark.sql.functions._

/** JSON scalar functions + percentiles (SURVEY.md §2 Part B scalar-fn
  * row): semi-structured extraction over `events.props` and exact
  * interpolated percentiles. */
object Json {

  /** JSON extraction from the events.props payload column, aggregated per
    * event type. */
  val q53JsonExtract = Q(
    "q53_json_extract",
    """SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS distinct_k
       FROM events GROUP BY event_type ORDER BY event_type""") { (spark, dir) =>
    T(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"), countDistinct(col("k")).as("distinct_k"))
      .orderBy("event_type")
  }

  /** Exact interpolated percentiles (both engines: pos = (n-1)·q, linear
    * interpolation over sorted values — identical double arithmetic on the
    * small-integer quantity domain). */
  val q27Percentiles = Q(
    "q27_percentiles",
    """SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90,
       MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax"))
      .orderBy("l_returnflag")
  }

  /** Sketch-based percentiles — the 100 TB path. Spark's
    * `approx_percentile` (Greenwald-Khanna summaries) is MERGEABLE:
    * map-side partial sketches combine associatively, so memory is
    * bounded per task and no per-group sort/collect happens — unlike the
    * exact `percentile`, which materializes each group. Accuracy 10000
    * bounds rank error to n/10000; on the integer quantity domain that
    * pins the sketch value within one quantity unit of the exact
    * interpolated percentile. The oracle states the exact values and the
    * accuracy contract (q25's pattern: the bound itself is the checked
    * claim — a sketch regression flips the flag on both engines'
    * comparison, not just in a spec). */
  val q30ApproxPercentile = Q(
    "q30_approx_percentile",
    """SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS exact_p25,
       quantile_cont(l_quantity, 0.75) AS exact_p75,
       TRUE AS p25_within_1q, TRUE AS p75_within_1q
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (spark, dir) =>
    T(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.25, 10000)").as("a25"),
        expr("approx_percentile(l_quantity, 0.75, 10000)").as("a75"),
        expr("percentile(l_quantity, 0.25)").as("exact_p25"),
        expr("percentile(l_quantity, 0.75)").as("exact_p75"))
      .select(col("l_returnflag"), col("exact_p25"), col("exact_p75"),
        (abs(col("a25") - col("exact_p25")) <= 1.0).as("p25_within_1q"),
        (abs(col("a75") - col("exact_p75")) <= 1.0).as("p75_within_1q"))
      .orderBy("l_returnflag")
  }

  /** Struct ↔ JSON round trip — from_json / to_json (the shaping half of
    * the SURVEY §2 JSON row; q53 covers path extraction). Each event's
    * props payload is parsed into a typed struct, re-serialized with
    * to_json, and re-parsed; the emitted JSON string `j` and the re-parsed
    * fields are themselves checked values, so the two engines must agree
    * on the rendering byte-for-byte (both emit compact
    * `{"k":<int>,"et":"<str>"}` — verified). The struct must be null-free
    * for that: Spark's to_json OMITS null fields while DuckDB renders
    * `"k":null`, so both sides FILTER k IS NOT NULL rather than assume
    * the data provides it — a props payload lacking `$.k` (or carrying a
    * non-numeric k) is excluded identically on both engines instead of
    * silently diverging the rendering. roundtrip_ok pins
    * from_json(to_json(s)) == s per row. */
  val q62JsonShape = Q(
    "q62_json_shape",
    """WITH s AS (SELECT event_id,
                  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                  event_type AS et FROM events
                  WHERE k IS NOT NULL),
       j AS (SELECT event_id, k, et,
                    to_json(struct_pack(k := k, et := et)) AS j FROM s),
       r AS (SELECT event_id, k, et, j,
                    CAST(json_extract(j, '$.k') AS BIGINT) AS k2,
                    json_extract_string(j, '$.et') AS et2 FROM j)
       SELECT event_id, k, j, k2, et2,
              (k2 = k AND et2 = et) AS roundtrip_ok
       FROM r ORDER BY event_id""") { (spark, dir) =>
    val s = T(spark, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String]).getField("k").as("k"),
        col("event_type").as("et"))
      .filter(col("k").isNotNull)
    s.withColumn("j", to_json(struct(col("k"), col("et"))))
      .withColumn("s2", from_json(col("j"), "k BIGINT, et STRING", Map.empty[String, String]))
      .select(col("event_id"), col("k"), col("j"),
        col("s2.k").as("k2"), col("s2.et").as("et2"),
        (col("s2.k") === col("k") && col("s2.et") === col("et"))
          .as("roundtrip_ok"))
      .orderBy("event_id")
  }

  /** q94: VARIANT semi-structured extraction — Spark 4's open-ended
    * semi-structured type (`parse_json` → binary VARIANT → typed
    * `variant_get` path extraction), the engine-native answer to
    * schema-on-read JSON at scale: parse ONCE into the binary encoding,
    * extract many paths without re-tokenizing the text per path (the
    * get_json_object q53 uses re-parses the string on every call).
    * Each row's props payload is enriched into a nested document
    * (object + array) built from the row's own columns, parsed to
    * VARIANT, and three paths are extracted typed — a nested long, the
    * original k, and an array element. The oracle builds the SAME
    * logical document with DuckDB's JSON type and extracts the same
    * paths, so the comparison pins semantics, not wire format.
    * Scale: parse+extract is map-only codegen'd work; the aggregate is
    * one partial-merged shuffle. */
  val q94VariantExtract = Q(
    "q94_variant_extract",
    """WITH j AS (SELECT event_type,
                        concat('{"meta":{"user":', CAST(user_id AS VARCHAR),
                               ',"k":', json_extract_string(props, '$.k'),
                               '},"tags":["', event_type, '","evt"]}') AS payload
                 FROM events),
       x AS (SELECT event_type,
                    CAST(json_extract(payload, '$.meta.user') AS BIGINT) AS vu,
                    CAST(json_extract(payload, '$.meta.k') AS BIGINT) AS vk,
                    json_extract_string(payload, '$.tags[0]') AS tag
             FROM j)
       SELECT event_type, COUNT(*) AS n,
              CAST(SUM(vk) AS BIGINT) AS sum_k,
              COUNT(DISTINCT vu) AS n_users,
              MIN(tag) AS tag0
       FROM x GROUP BY event_type ORDER BY event_type""") { (spark, dir) =>
    T(spark, dir, "events")
      .selectExpr("event_type",
        """parse_json(concat('{"meta":{"user":', cast(user_id as string),
           ',"k":', get_json_object(props, '$.k'),
           '},"tags":["', event_type, '","evt"]}')) as v""")
      .selectExpr("event_type",
        "cast(variant_get(v, '$.meta.user', 'long') as long) as vu",
        "cast(variant_get(v, '$.meta.k', 'long') as long) as vk",
        "variant_get(v, '$.tags[0]', 'string') as tag")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("vk")).as("sum_k"),
        countDistinct(col("vu")).as("n_users"), min(col("tag")).as("tag0"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q53JsonExtract, q27Percentiles, q30ApproxPercentile,
    q62JsonShape, q94VariantExtract)
}
