package graft.ops

import org.apache.spark.sql.functions._

/** SURVEY.md §2.7 — scalar function surface: one composite query per
  * family (string / date / math / array / map / json / conditional /
  * scalar UDF / generator), every column mirrored in the DuckDB oracle.
  *
  * Flink anchors: built-in Table functions, ScalarFunction, TableFunction
  * (the genre's ik-analyzer keyword UDTF ≙ posexplode).
  *
  * Scale notes: everything is a codegen'd Catalyst expression except the
  * one deliberate scalar UDF (`udf_scalar`, the genre's mapping-UDF shape);
  * array ops use higher-order functions, never per-row JVM lambdas on
  * exploded data.
  */
object Fns {
  import Tables._

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
          substring(col("c_name"), 1, 8).as("sub8"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]", "").as("letters"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          length(col("c_name")).as("len"),
          element_at(split(col("c_name"), "#"), 1).as("first_part"))
        .orderBy("c_custkey")),

    // Second string family: positional/constructive functions.
    "fn_string2" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          expr("left(c_name, 8)").as("l8"),
          expr("right(c_name, 4)").as("r4"),
          reverse(col("c_mktsegment")).as("rev"),
          repeat(col("c_mktsegment"), 2).as("rep2"),
          translate(col("c_name"), "#0", "-O").as("tr"),
          instr(col("c_name"), "#").as("pos_hash"),
          ascii(col("c_mktsegment")).as("first_code"),
          chr(lit(65) + pmod(col("c_custkey"), lit(26))).as("bucket_chr"))
        .orderBy("c_custkey")),

    // Bitwise family (flag fields, shard masks, bit-packed encodings).
    "fn_bitwise" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("b_and"),
          col("event_id").bitwiseOR(lit(4096L)).as("b_or"),
          col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
          shiftleft(col("event_id"), 3).as("b_shl"),
          shiftright(col("event_id"), 2).as("b_shr"),
          bit_count(col("event_id")).cast("int").as("b_cnt"))
        .orderBy("event_id")),

    // Content hashing/fingerprint functions (dedup keys, cache keys).
    "fn_hash" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
        .orderBy("doc_id")),

    "fn_date" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          ep(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
          ep(date_add(to_date(col("o_orderdate")), 30).cast("timestamp"))
            .as("plus30_us"),
          datediff(lit("1999-01-01").cast("date"), to_date(col("o_orderdate")))
            .as("days_to_99"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          round(abs(col("l_discount") - 0.05), 4).as("ab"),
          round(pow(col("l_quantity"), 2), 2).as("sq"),
          round(sqrt(col("l_quantity")), 4).as("rt"),
          round(log(col("l_extendedprice")), 4).as("lg"),
          round(greatest(col("l_tax"), col("l_discount")), 2).as("gr"),
          round(least(col("l_tax"), col("l_discount")), 2).as("ls"),
          pmod(col("l_orderkey"), lit(7)).as("pm"),
          signum(col("l_quantity") - 25).cast("int").as("sg"))
        // (orderkey, linenumber) is not unique in the fixture: order by
        // every output column for a deterministic sequence.
        .orderBy("l_orderkey", "l_linenumber", "r1", "ab", "sq", "gr", "ls",
          "flr", "cl", "rt", "lg", "pm", "sg")),

    "fn_array" -> ((s, d) => {
      // staged: the array functions run interpreted (higher-order fns
      // have no codegen), so mentioning split(text) five times in one
      // select would re-split five times per row — materialize the
      // token array once and reference the attribute
      val toks = col("toks")
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(toks).as("n_toks"),
          array_contains(toks, "data").as("has_data"),
          array_join(slice(sort_array(array_distinct(toks)), 1, 3), ",")
            .as("first3_sorted"),
          size(filter(toks, x => length(x) > 5)).as("n_long"),
          array_join(transform(slice(toks, 1, 3), x => upper(x)), ",")
            .as("up3"))
        .orderBy("doc_id")
    }),

    "fn_map" -> ((s, d) => {
      val m = map(lit("base"), col("value"), lit("twice"), col("value") * 2)
      t(s, d, "events")
        .select(col("event_id"),
          round(element_at(m, "base"), 2).as("base_v"),
          round(element_at(m, "twice"), 2).as("twice_v"),
          size(m).as("m_size"),
          array_join(map_keys(m), ",").as("keys"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), lit("k LONG")).getField("k").as("k_long"),
          json_tuple(col("props"), "k").as("k_tup"),
          to_json(struct(col("user_id"))).as("uj"))
        .orderBy("event_id")),

    // Dirty-data JSON cleaning (the genre's DWD side-output case): every
    // 10th payload is truncated mid-object (trailing-garbage corruption
    // is NOT used — Spark's Jackson parser tolerates it); malformed rows
    // parse to NULL and are flagged instead of killing the job.
    "fn_json_malformed" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("raw",
          when(pmod(col("event_id"), lit(10)) === 0,
            expr("substring(props, 1, length(props) - 1)"))
            .otherwise(col("props")))
        // PERMISSIVE from_json yields a struct of NULL fields (not a null
        // struct) on malformed input, so the corrupt flag keys off the
        // always-present `k` field. Staged: JSON parsing is non-codegen
        // (JsonToStructs), so parse once per row and derive both outputs
        // from the materialized struct.
        .select(col("event_id"),
          from_json(col("raw"), lit("k LONG")).getField("k").as("k_parsed"))
        .select(col("event_id"), col("k_parsed"),
          col("k_parsed").isNull.as("is_corrupt"))
        .orderBy("event_id")),

    // VARIANT-type JSON (round-12 verdict item 7): Spark 4's
    // parse_json/variant_get is the modern public-API face of the
    // genre's props parsing — parse ONCE into the binary VARIANT
    // encoding, then typed path extraction without re-parsing per
    // field (the from_json complement above re-parses text per
    // expression tree). Payload is a deterministic NESTED document
    // built from base columns (the fn_url/fn_xml pattern — the flat
    // props fixture can't exercise object/array paths): an object
    // path, an array index, a conditional JSON null (is_variant_null
    // distinguishes "present but null" from "absent"), and a missing
    // path through try_variant_get (NULL, never an error). Staged so
    // the parse runs once per row; map-side only like every fn_ key.
    "fn_json_variant" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("payload",
          concat(lit("{\"meta\":{\"type\":\""), col("event_type"),
            lit("\",\"k\":"), col("k_str"),
            lit("},\"ids\":["), col("user_id"), lit(","), col("event_id"),
            lit("],\"extra\":"),
            when(col("k_str").cast("long") > 50, col("k_str"))
              .otherwise(lit("null")),
            lit("}")))
        .select(col("event_id"), parse_json(col("payload")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.meta.type', 'string')").as("vtype"),
          expr("variant_get(v, '$.meta.k', 'long')").as("k_long"),
          expr("variant_get(v, '$.ids[1]', 'long')").as("second_id"),
          expr("variant_get(v, '$.extra', 'long')").as("extra_long"),
          expr("is_variant_null(variant_get(v, '$.extra'))")
            .as("extra_is_null"),
          expr("try_variant_get(v, '$.meta.missing', 'long')").as("missing"))
        .orderBy("event_id")),

    // ANSI-safe arithmetic (round 13): Spark 4 runs ANSI mode by
    // default, where overflow and division-by-zero THROW — the
    // public-API answer for pipelines that must degrade to NULL
    // instead of dying mid-job is the try_* family. div0 exercises
    // x/0 → NULL (the oracle writes the literal NULL: DuckDB would
    // error); ovf exercises guaranteed BIGINT overflow → NULL (same);
    // per_qty is the well-defined arm proving try_* passes normal
    // values through untouched.
    "fn_try_arith" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, l_discount - l_discount)")
            .as("div0"),
          // raw IEEE division, NO rounding: both engines produce the
          // bit-identical double, while round-to-4dp disagreed on a
          // half-boundary row (HALF_UP vs HALF_EVEN)
          expr("try_divide(l_extendedprice, l_quantity)").as("per_qty"),
          expr("try_add(CAST('9223372036854775807' AS BIGINT), " +
            "CAST(l_orderkey AS BIGINT) + 1)").as("ovf"),
          expr("try_multiply(l_orderkey, 0)").as("times0"))
        .orderBy("l_orderkey", "l_linenumber", "per_qty")),

    // COLLATION-aware comparison (round 13; Spark 4's COLLATE —
    // locale/case semantics as a TYPE property instead of lower()
    // scattered through every predicate): a mixed-case segment column
    // filtered under UTF8_LCASE matches both cases in one equality,
    // and the collated ORDER BY interleaves cases (ties broken by key
    // so both engines walk one deterministic order). Oracle via
    // lower() equivalence.
    "fn_collation" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("seg_mixed",
          when(pmod(col("c_custkey"), lit(2)) === 0,
            lower(col("c_mktsegment"))).otherwise(col("c_mktsegment")))
        .where(expr("collate(seg_mixed, 'UTF8_LCASE')") ===
          lit("building"))
        .select(col("c_custkey"), col("seg_mixed"))
        .orderBy(expr("collate(seg_mixed, 'UTF8_LCASE')"),
          col("c_custkey"))),

    "fn_conditional" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          when(col("value") < 1.0, "low")
            .when(col("value") < 5.0, "mid")
            .otherwise("high").as("tier_case"),
          coalesce(nullif(col("event_type"), lit("error")), lit("clean"))
            .as("cleaned"),
          nvl(col("user_id"), lit(-1L)).as("uid"))
        .orderBy("event_id")),

    // Genre mapping UDF (keyword/province lookup). Deliberately a JVM UDF
    // to cover the extension point; everything else stays codegen'd.
    "udf_scalar" -> ((s, d) => {
      val tier = udf((v: Double) =>
        if (v < 1.0) "bronze" else if (v < 5.0) "silver" else "gold")
      t(s, d, "events")
        .select(col("event_id"), tier(col("value")).as("tier"))
        .orderBy("event_id")
    }),

    // Table function: one row -> N rows with position (ik-analyzer UDTF ≙).
    "udtf_generator" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("word"))
        .orderBy("doc_id", "pos")),

    // Dedicated regex family: boolean match, match count, all-matches
    // extraction, regex split arity, anchored replace — the content-
    // filtering toolkit a text pipeline leans on (all codegen'd).
    "fn_regex" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          col("text").rlike("data|spark").as("has_kw"),
          size(expr("regexp_extract_all(text, 'data|spark', 0)"))
            .as("n_kw"),
          array_join(slice(expr("regexp_extract_all(text, '\\\\b[a-z]{6,}\\\\b', 0)"),
            1, 5), ",").as("long_words"),
          size(split(col("text"), "\\s+")).as("n_split"),
          regexp_replace(col("text"), "^the\\s+", "").substr(1, 20)
            .as("de_articled"))
        .orderBy("doc_id")),

    // URL parsing (the genre's page-log enrichment: every realtime
    // warehouse splits page URLs into host/path/params at ODS→DWD).
    // Builds a URL from event fields, then parses it back with the
    // codegen'd parse_url; the oracle uses equivalent regexes (DuckDB
    // has no parse_url).
    "fn_url" -> ((s, d) =>
      t(s, d, "events")
        .where(col("event_id") < 500)
        .select(col("event_id"),
          concat(lit("https://shop.example.com/"), col("event_type"),
            lit("?uid="), col("user_id").cast("string"),
            lit("&eid="), col("event_id").cast("string")).as("url"))
        .select(col("event_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("uid")).as("q_uid"))
        .orderBy("event_id")),

    // XML payload parsing (Spark 4's built-in XML support; the genre's
    // legacy-system ingest — industrial/ERP feeds still deliver XML
    // where the web side delivers JSON). Builds a deterministic XML
    // payload from event fields (the fn_url pattern), then parses it
    // back with the native from_xml expression against an explicit
    // schema; every 7th payload is TRUNCATED mid-element, and the
    // malformed-input contract mirrors fn_json_malformed: fields null,
    // a corrupt flag raised, the row never dropped. Values ride as
    // %.2f strings so the double round-trips exactly (2-dp fixture).
    // Oracle recomputes the expected fields straight from the base
    // columns — a parse that silently mangled anything hash-fails.
    "fn_xml" -> ((s, d) => {
      val xmlSchema = org.apache.spark.sql.types.StructType
        .fromDDL("uid BIGINT, t STRING, v DOUBLE")
      t(s, d, "events")
        .where(col("event_id") < 500)
        .withColumn("xml0",
          concat(lit("<e><uid>"), col("user_id"), lit("</uid><t>"),
            col("event_type"), lit("</t><v>"),
            format_string("%.2f", col("value")), lit("</v></e>")))
        .withColumn("xml",
          when(pmod(col("event_id"), lit(7)) === 0,
            substring(col("xml0"), 1, 12)).otherwise(col("xml0")))
        .withColumn("p", from_xml(col("xml"), xmlSchema))
        .select(col("event_id"), col("p.uid").as("uid"),
          col("p.t").as("t"), round(col("p.v"), 2).as("v"),
          (col("p.uid").isNull && col("p.t").isNull && col("p.v").isNull)
            .as("corrupt"))
        .orderBy("event_id")
    }),

    // Live rules evaluation — the batch face of the Flink
    // BroadcastProcessFunction pattern (streaming form:
    // graft.streaming.Streams.broadcastRulesToSink, which re-reads and
    // re-broadcasts this table every micro-batch so a mid-stream rules
    // swap takes effect on the next batch). A small rules relation
    // (rule_id, event_type, min_value, tag) broadcast-joins the events
    // fact on event_type with the threshold as residual — the fact
    // side never shuffles, exactly how a 100 TB stream applies a
    // k-row rules table. An event matches every rule it satisfies
    // (one output row per (event, rule) hit).
    "fn_rules_apply" -> ((s, d) =>
      t(s, d, "events")
        .join(broadcast(defaultRules(s)), Seq("event_type"))
        .where(coalesce(col("value"), lit(0.0)) >= col("min_value"))
        .select(col("event_id"), col("user_id"), col("rule_id"),
          col("tag"))
        .orderBy("event_id", "rule_id"))
  )

  /** The canonical embedded rules snapshot `fn_rules_apply` and the
    * streaming parity tests share. */
  def defaultRules(s: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Seq(
      (1L, "purchase", 50.0, "high_value"),
      (2L, "purchase", 0.0, "any_purchase"),
      (3L, "click", 0.0, "click_track"),
      (4L, "error", 0.0, "error_alert"))
      .toDF("rule_id", "event_type", "min_value", "tag")
  }

  val oracleSql: Map[String, String] = Map(
    "fn_regex" ->
      """SELECT doc_id,
        | regexp_matches(text, 'data|spark') AS has_kw,
        | CAST(len(regexp_extract_all(text, 'data|spark')) AS INT) AS n_kw,
        | coalesce(array_to_string(
        |     regexp_extract_all(text, '\b[a-z]{6,}\b')[1:5], ','), '')
        |   AS long_words,
        | CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_split,
        | substring(regexp_replace(text, '^the\s+', ''), 1, 20) AS de_articled
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        | trim('  ' || c_name || '  ') AS trimmed,
        | substring(c_name, 1, 8) AS sub8,
        | concat_ws('-', c_mktsegment, c_name) AS cw,
        | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        | regexp_replace(c_name, '[0-9]', '', 'g') AS letters,
        | regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        | CAST(length(c_name) AS INT) AS len,
        | string_split(c_name, '#')[1] AS first_part
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_string2" ->
      """SELECT c_custkey,
        | left(c_name, 8) AS l8,
        | right(c_name, 4) AS r4,
        | reverse(c_mktsegment) AS rev,
        | repeat(c_mktsegment, 2) AS rep2,
        | translate(c_name, '#0', '-O') AS tr,
        | CAST(instr(c_name, '#') AS INT) AS pos_hash,
        | CAST(ascii(c_mktsegment) AS INT) AS first_code,
        | chr(CAST(65 + c_custkey % 26 AS INT)) AS bucket_chr
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        | event_id & 255 AS b_and,
        | event_id | 4096 AS b_or,
        | xor(event_id, user_id) AS b_xor,
        | event_id << 3 AS b_shl,
        | event_id >> 2 AS b_shr,
        | CAST(bit_count(event_id) AS INT) AS b_cnt
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        | epoch_us(CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)) AS plus30_us,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice, 1) AS r1,
        | CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        | round(abs(l_discount - 0.05), 4) AS ab,
        | round(pow(l_quantity, 2), 2) AS sq,
        | round(sqrt(l_quantity), 4) AS rt,
        | round(ln(l_extendedprice), 4) AS lg,
        | round(greatest(l_tax, l_discount), 2) AS gr,
        | round(least(l_tax, l_discount), 2) AS ls,
        | l_orderkey % 7 AS pm,
        | CAST(sign(l_quantity - 25) AS INT) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, r1, ab, sq, gr, ls,
        | flr, cl, rt, lg, pm, sg""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS INT) AS n_toks,
        | list_contains(string_split(text,' '), 'data') AS has_data,
        | array_to_string(list_sort(list_distinct(string_split(text,' ')))[1:3], ',') AS first3_sorted,
        | CAST(len(list_filter(string_split(text,' '), x -> length(x) > 5)) AS INT) AS n_long,
        | array_to_string(list_transform(string_split(text,' ')[1:3], x -> upper(x)), ',') AS up3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        | round(value, 2) AS base_v,
        | round(value * 2, 2) AS twice_v,
        | 2 AS m_size,
        | 'base,twice' AS keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        | json_extract_string(props, '$.k') AS k_tup,
        | CAST(to_json(struct_pack(user_id := user_id)) AS VARCHAR) AS uj
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json_malformed" ->
      """WITH r AS (SELECT event_id,
        |  CASE WHEN event_id % 10 = 0
        |       THEN substring(props, 1, length(props) - 1)
        |       ELSE props END AS raw
        | FROM events)
        |SELECT event_id,
        | CASE WHEN json_valid(raw)
        |      THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k_parsed,
        | NOT json_valid(raw) AS is_corrupt
        |FROM r ORDER BY event_id""".stripMargin,
    // same payload rebuilt in DuckDB's JSON dialect: json_extract for
    // typed paths, json_type(...)='NULL' for the JSON-null probe (JSON
    // null ≠ SQL NULL there too), TRY_CAST absorbing the null arm
    "fn_json_variant" ->
      """WITH p AS (SELECT event_id,
        |  '{"meta":{"type":"' || event_type || '","k":' ||
        |  json_extract_string(props, '$.k') ||
        |  '},"ids":[' || user_id || ',' || event_id || '],"extra":' ||
        |  CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |       THEN json_extract_string(props, '$.k') ELSE 'null' END ||
        |  '}' AS payload
        | FROM events)
        |SELECT event_id,
        | json_extract_string(payload, '$.meta.type') AS vtype,
        | CAST(json_extract(payload, '$.meta.k') AS BIGINT) AS k_long,
        | CAST(json_extract(payload, '$.ids[1]') AS BIGINT) AS second_id,
        | TRY_CAST(json_extract(payload, '$.extra') AS BIGINT) AS extra_long,
        | json_type(payload, '$.extra') = 'NULL' AS extra_is_null,
        | CAST(NULL AS BIGINT) AS missing
        |FROM p ORDER BY event_id""".stripMargin,
    "fn_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(NULL AS DOUBLE) AS div0,
        | l_extendedprice / l_quantity AS per_qty,
        | CAST(NULL AS BIGINT) AS ovf,
        | CAST(0 AS BIGINT) AS times0
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, per_qty""".stripMargin,
    "fn_collation" ->
      """WITH m AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
        |       ELSE c_mktsegment END AS seg_mixed
        | FROM customer)
        |SELECT c_custkey, seg_mixed FROM m
        |WHERE lower(seg_mixed) = 'building'
        |ORDER BY lower(seg_mixed), c_custkey""".stripMargin,
    "fn_conditional" ->
      """SELECT event_id,
        | CASE WHEN value < 1.0 THEN 'low' WHEN value < 5.0 THEN 'mid'
        |      ELSE 'high' END AS tier_case,
        | coalesce(nullif(event_type, 'error'), 'clean') AS cleaned,
        | coalesce(user_id, -1) AS uid
        |FROM events ORDER BY event_id""".stripMargin,
    "udf_scalar" ->
      """SELECT event_id,
        | CASE WHEN value < 1.0 THEN 'bronze' WHEN value < 5.0 THEN 'silver'
        |      ELSE 'gold' END AS tier
        |FROM events ORDER BY event_id""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id,
        | CAST(generate_subscripts(string_split(text,' '), 1) - 1 AS INT) AS pos,
        | unnest(string_split(text,' ')) AS word
        |FROM documents ORDER BY doc_id, pos""".stripMargin,
    "fn_url" ->
      """WITH u AS (SELECT event_id,
        |  concat('https://shop.example.com/', event_type,
        |    '?uid=', CAST(user_id AS VARCHAR),
        |    '&eid=', CAST(event_id AS VARCHAR)) AS url
        | FROM events WHERE event_id < 500)
        |SELECT event_id, url,
        | regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        | regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        | regexp_extract(url, '[?&]uid=([^&#]*)', 1) AS q_uid
        |FROM u ORDER BY event_id""".stripMargin,
    "fn_xml" ->
      """SELECT event_id,
        | CASE WHEN event_id % 7 <> 0 THEN user_id END AS uid,
        | CASE WHEN event_id % 7 <> 0 THEN event_type END AS t,
        | CASE WHEN event_id % 7 <> 0 THEN round(value, 2) END AS v,
        | (event_id % 7 = 0) AS corrupt
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,
    "fn_rules_apply" ->
      """WITH rules(rule_id, event_type, min_value, tag) AS (VALUES
        |  (CAST(1 AS BIGINT), 'purchase', 50.0, 'high_value'),
        |  (CAST(2 AS BIGINT), 'purchase', 0.0, 'any_purchase'),
        |  (CAST(3 AS BIGINT), 'click', 0.0, 'click_track'),
        |  (CAST(4 AS BIGINT), 'error', 0.0, 'error_alert'))
        |SELECT e.event_id, e.user_id, r.rule_id, r.tag
        |FROM events e JOIN rules r ON e.event_type = r.event_type
        |WHERE coalesce(e.value, 0) >= r.min_value
        |ORDER BY event_id, rule_id""".stripMargin
  )
}
