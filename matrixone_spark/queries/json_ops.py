"""JSON processing coverage — SURVEY §2.8 JSON family + §2.10 unnest.

Reference: func_builtin_json.go (extract/valid/length/keys/set/insert/
replace/remove/merge_patch/unquote), bytejson storage, unnest TVF
(table_function/unnest.go). Spark: get_json_object/from_json/to_json stay
JVM-side (hot path); mutators are pandas UDFs (functions/json_fns.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from matrixone_spark.catalog import Catalog
from matrixone_spark.functions import json_fns as J
from matrixone_spark.queries import register


@register(
    "json_extract_battery",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_valid(props)                                 AS is_valid,
       CAST(len(json_keys(props)) AS INT)                AS n_keys,
       json_extract_string(props, '$.missing')           AS missing
FROM events WHERE event_id < 2000
""",
    tags=("json",),
    doc="json_extract/json_valid/json_length/json_keys (func_builtin_json.go) → get_json_object + from_json; missing path → NULL both engines.",
)
def json_extract_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.from_json("props", "map<string,string>").isNotNull().alias("is_valid"),
        F.size(F.map_keys(F.from_json("props", "map<string,string>"))).alias("n_keys"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "json_construct_nested",
    oracle="""
SELECT o_orderkey,
       to_json(struct_pack(key := o_orderkey,
                           status := o_orderstatus,
                           price := CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR))) AS obj,
       to_json([o_orderkey % 10, o_orderkey % 100])  AS arr,
       json_extract_string(
         to_json(struct_pack(o := struct_pack(deep := o_orderpriority))),
         '$.o.deep')                                  AS deep_val
FROM orders WHERE o_orderkey <= 500
""",
    tags=("json",),
    doc="json_object/json_array construction + nested path extraction (func_builtin_json.go json_object/json_array/json_extract).",
)
def json_construct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("key"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price"),
            )
        ).alias("obj"),
        F.to_json(F.array(F.col("o_orderkey") % 10, F.col("o_orderkey") % 100)).alias("arr"),
        F.get_json_object(
            F.to_json(F.struct(F.struct(F.col("o_orderpriority").alias("deep")).alias("o"))),
            "$.o.deep",
        ).alias("deep_val"),
    )


@register(
    "json_mutators",
    oracle="""
SELECT event_id,
       json_merge_patch(props, '{"tag":"x","k":null}') AS patched,
       json_merge_patch(props, CONCAT('{"u":', CAST(user_id AS VARCHAR), '}')) AS with_user
FROM events WHERE event_id < 1000
""",
    tags=("json", "udf"),
    doc="json_merge_patch RFC 7396 (func_builtin_json.go json_merge_patch) as Arrow-batched pandas UDF; json_set/insert/replace/remove covered in tests/test_json_fns.py.",
)
def json_mutators(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        J.json_merge_patch(F.col("props"), F.lit('{"tag":"x","k":null}')).alias("patched"),
        J.json_merge_patch(
            F.col("props"),
            F.concat(F.lit('{"u":'), F.col("user_id").cast("string"), F.lit("}")),
        ).alias("with_user"),
    )


@register(
    "json_unnest_array",
    oracle="""
SELECT event_id, u.elem
FROM (SELECT event_id,
             from_json(CONCAT('[', CAST(user_id AS VARCHAR), ',',
                              CAST(event_id % 5 AS VARCHAR), ',7]'), '["BIGINT"]') AS arr
      FROM events WHERE event_id < 300) t,
     LATERAL (SELECT unnest(arr) AS elem) u
""",
    tags=("json", "tvf"),
    doc="unnest(json_array) TVF (table_function/unnest.go) → from_json + explode (LATERAL VIEW).",
)
def json_unnest_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("event_id") < 300)
    arr_json = F.concat(
        F.lit("["),
        F.col("user_id").cast("string"),
        F.lit(","),
        (F.col("event_id") % 5).cast("string"),
        F.lit(",7]"),
    )
    return e.select(
        "event_id",
        F.explode(F.from_json(arr_json, ArrayType(LongType()))).alias("elem"),
    )


@register(
    "json_type_quote_battery",
    oracle="""
WITH v AS (
  SELECT event_id, event_type, props,
         CASE CAST(event_id % 6 AS INT)
           WHEN 0 THEN props
           WHEN 1 THEN concat('[1, 2, ', CAST(event_id % 9 AS VARCHAR), ']')
           WHEN 2 THEN concat('"', event_type, '"')
           WHEN 3 THEN CAST(event_id % 100 AS VARCHAR)
           WHEN 4 THEN concat(CAST(event_id % 100 AS VARCHAR), '.25')
           ELSE 'true' END AS j
  FROM events WHERE event_id < 600)
SELECT event_id,
       CASE json_type(CAST(j AS JSON))
         WHEN 'VARCHAR' THEN 'STRING'
         WHEN 'UBIGINT' THEN 'INTEGER'
         WHEN 'BIGINT'  THEN 'INTEGER'
         ELSE json_type(CAST(j AS JSON)) END              AS jt,
       concat('"', replace(replace(event_type, '\\', '\\\\'), '"', '\\"'), '"') AS jq,
       CAST(j AS JSON) ->> '$'                            AS uq,
       json_contains(concat('[1, 2, 3, ', CAST(event_id % 9 AS VARCHAR), ']'),
                     CAST(event_id % 5 AS VARCHAR))       AS in_arr,
       json_contains(props, concat('{"k": ', CAST(event_id % 100 AS VARCHAR), '}')) AS in_obj
FROM v
""",
    tags=("json",),
    doc=(
        "JSON type/quote/containment family (func_builtin_json.go json_type/"
        "json_quote/json_unquote/json_contains; function_id.go:870-1131): "
        "first-token type classifier and quote/unquote as pure expressions, "
        "MySQL containment walk as an Arrow-batched UDF — gated against "
        "DuckDB's json_type (name-mapped) and json_contains."
    ),
)
def json_type_quote_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("event_id") < 600)
    k = F.col("event_id")
    j = (
        F.when(k % 6 == 0, F.col("props"))
        .when(k % 6 == 1, F.concat(F.lit("[1, 2, "), (k % 9).cast("string"), F.lit("]")))
        .when(k % 6 == 2, F.concat(F.lit('"'), F.col("event_type"), F.lit('"')))
        .when(k % 6 == 3, (k % 100).cast("string"))
        .when(k % 6 == 4, F.concat((k % 100).cast("string"), F.lit(".25")))
        .otherwise(F.lit("true"))
    )
    arr = F.concat(F.lit("[1, 2, 3, "), (k % 9).cast("string"), F.lit("]"))
    obj_cand = F.concat(F.lit('{"k": '), (k % 100).cast("string"), F.lit("}"))
    return e.select(
        "event_id",
        J.json_type(j).alias("jt"),
        J.json_quote(F.col("event_type")).alias("jq"),
        J.json_unquote(j).alias("uq"),
        J.json_contains(arr, (k % 5).cast("string")).alias("in_arr"),
        J.json_contains(F.col("props"), obj_cand).alias("in_obj"),
    )


@register(
    "json_objectagg_sorted",
    oracle="""
SELECT event_type,
       concat('{', string_agg(entry, ',' ORDER BY entry), '}') AS agg_obj
FROM (
  SELECT event_type,
         concat('"u', CAST(user_id AS VARCHAR), '":', CAST(COUNT(*) AS VARCHAR)) AS entry
  FROM events WHERE user_id < 40
  GROUP BY event_type, user_id)
GROUP BY event_type
""",
    tags=("json", "agg"),
    doc=(
        "JSON_OBJECTAGG (function_id.go json_objectagg) with sorted keys — "
        "MySQL's insertion order is not reproducible under distributed "
        "aggregation, so sorted-key rendering is the batch-stable contract "
        "(functions/json_fns.py json_objectagg_sorted)."
    ),
)
def json_objectagg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("user_id") < 40)
    per_user = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    return per_user.groupBy("event_type").agg(
        J.json_objectagg_sorted(
            F.concat(F.lit("u"), F.col("user_id").cast("string")), F.col("n")
        ).alias("agg_obj")
    )


@register(
    "json2_battery",
    oracle="""
SELECT event_id,
       (json_extract(props, '$.k') IS NOT NULL
        OR json_extract(props, '$.missing') IS NOT NULL)  AS cp_one,
       (json_extract(props, '$.k') IS NOT NULL
        AND json_extract(props, '$.missing') IS NOT NULL) AS cp_all,
       ((user_id % 5 = user_id % 3) OR (7 = user_id % 3)
        OR (user_id % 5 = 8))                             AS ovl_arr,
       CAST(json_object('k', json_array(json_extract(props, '$.k'), 5),
                        't', 'x') AS VARCHAR)             AS mp,
       11 + length(CAST(json_extract(props, '$.k') AS VARCHAR)) AS pretty_len,
       CAST(json_extract_string(props, '$.k') AS BIGINT)  AS jv_int,
       CAST(json_extract_string(props, '$.k') AS DOUBLE)  AS jx_f64
FROM events WHERE event_id < 1000
""",
    tags=("json", "udf"),
    doc=(
        "JSON family part 2 (func_builtin_json.go registry): "
        "json_contains_path one/all, json_overlaps (array element overlap), "
        "json_merge_preserve (scalar→array pairing), json_pretty (2-space "
        "canonical form, checked via rendered length), json_value RETURNING "
        "cast, json_extract_float64. Oracle expresses each via DuckDB-native "
        "json_extract + reconstructed expected values."
    ),
)
def json2_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events").filter(F.col("event_id") < 1000)
    props = F.col("props")
    arr_a = F.concat(F.lit("["), (F.col("user_id") % 5).cast("string"), F.lit(", 7]"))
    arr_b = F.concat(F.lit("["), (F.col("user_id") % 3).cast("string"), F.lit(", 8]"))
    return e.select(
        "event_id",
        J.json_contains_path(props, F.lit("one"), F.lit("$.k|$.missing")).alias("cp_one"),
        J.json_contains_path(props, F.lit("all"), F.lit("$.k|$.missing")).alias("cp_all"),
        J.json_overlaps(arr_a, arr_b).alias("ovl_arr"),
        J.json_merge_preserve(props, F.lit('{"k": 5, "t": "x"}')).alias("mp"),
        F.length(J.json_pretty(props)).alias("pretty_len"),
        J.json_value(props, "$.k", "bigint").alias("jv_int"),
        J.json_extract_float64(props, "$.k").alias("jx_f64"),
    )


@register(
    "func_jq_battery",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR)                            AS jq_key,
       '"' || o_orderpriority || '"'                          AS jq_prio,
       '2'                                                    AS jq_len,
       '["key","prio","tags"]'                                AS jq_keys,
       '"' || o_orderstatus || '"'                            AS jq_tag0,
       CAST(NULL AS VARCHAR)                                  AS jq_err,
       CAST(o_orderkey * 2 + 1 AS VARCHAR)                    AS jq_arith,
       CASE WHEN o_orderkey > 150 THEN CAST(o_orderkey AS VARCHAR) ELSE '' END AS jq_select,
       CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN '"hot"' ELSE '"cold"' END AS jq_cond,
       CAST(length(o_orderstatus) + length(o_orderpriority) AS VARCHAR) AS jq_map_add
FROM orders WHERE o_orderkey <= 300
""",
    tags=("json", "udf"),
    doc=(
        "jq / try_jq (func_builtin_jq.go, gojq-backed in the reference; here "
        "the jq_mini.py parser/evaluator covering identity, multi-segment "
        "paths, array index/iterate, pipes, keys/length/add/not/floor/abs, "
        "select()/map(), arithmetic, comparisons, if/then/else): programs "
        "run against a per-row JSON doc built with to_json(struct(...)); "
        "try_jq on an invalid program (indexing a scalar) yields NULL. "
        "Oracle reconstructs each program's output from the base columns — "
        "engine-neutral since extracted scalars serialize identically."
    ),
)
def func_jq_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders").filter(F.col("o_orderkey") <= 300)
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderpriority").alias("prio"),
            F.array(F.col("o_orderstatus"), F.col("o_orderpriority")).alias("tags"),
        )
    )
    base = o.select("o_orderkey", doc.alias("doc"))
    d = F.col("doc")
    return base.select(
        "o_orderkey",
        J.jq(d, F.lit(".key")).alias("jq_key"),
        J.jq(d, F.lit(".prio")).alias("jq_prio"),
        J.jq(d, F.lit(".tags | length")).alias("jq_len"),
        J.jq(d, F.lit("keys")).alias("jq_keys"),
        J.jq(d, F.lit(".tags[0]")).alias("jq_tag0"),
        J.try_jq(d, F.lit(".key[0]")).alias("jq_err"),
        J.jq(d, F.lit(".key * 2 + 1")).alias("jq_arith"),
        J.jq(d, F.lit(".key | select(. > 150)")).alias("jq_select"),
        J.jq(d, F.lit('if .prio == "1-URGENT" then "hot" '
                      'else (if .prio == "2-HIGH" then "hot" else "cold" end) end')
             ).alias("jq_cond"),
        J.jq(d, F.lit(".tags | map(length) | add")).alias("jq_map_add"),
    )


@register(
    "json_search_battery",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN '"$.seg"' END AS seg_one,
       CASE WHEN c_mktsegment = 'AUTOMOBILE'
            THEN '["$.seg","$.nest.seg"]' END                   AS seg_all,
       CASE WHEN c_name LIKE 'Customer#00000000_'
            THEN '"$.name"' END                                 AS name_like,
       CASE WHEN c_mktsegment LIKE '%MOBILE'
            THEN '"$.seg"' END                                  AS seg_suffix
FROM customer WHERE c_custkey <= 500
""",
    tags=("json",),
    doc="MySQL JSON_SEARCH one/all with LIKE %/_ patterns over constructed "
    "docs; 'all' folds two hits into a JSON path array. MySQL-compat surface "
    "(not in reference function_id.go registry); functions/json_fns.py.",
)
def json_search_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer").filter(F.col("c_custkey") <= 500)
    doc = F.to_json(
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("seg"),
            F.struct(F.col("c_mktsegment").alias("seg")).alias("nest"),
        )
    )
    base = c.select("c_custkey", doc.alias("doc"))
    d = F.col("doc")
    return base.select(
        "c_custkey",
        J.json_search(d, "one", F.lit("AUTOMOBILE")).alias("seg_one"),
        J.json_search(d, "all", F.lit("AUTOMOBILE")).alias("seg_all"),
        J.json_search(d, "one", F.lit("Customer#00000000_")).alias("name_like"),
        J.json_search(d, "one", F.lit("%MOBILE")).alias("seg_suffix"),
    ).drop("doc")
