"""Scalar-function family queries, each hash-checked against DuckDB.

Covers the 73-function contract of SURVEY.md §2.B.9 (vendored enum
``datafusion.proto:448-521``) family by family.  Math/trig results are
quantized with the portable rounding macro (see ``queries.R``) because
libm implementations differ in the last ulp across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.queries import R, cround, query


@query(
    "fn_math",
    f"""
SELECT p_partkey,
       abs(p_size - 25)                   AS abs_v,
       CAST(ceil(p_retailprice / 100) AS BIGINT)  AS ceil_v,
       CAST(floor(p_retailprice / 100) AS BIGINT) AS floor_v,
       {R('sqrt(p_size)', 9)}             AS sqrt_v,
       {R('exp(p_size / 50.0)', 9)}       AS exp_v,
       {R('ln(p_size)', 9)}               AS ln_v,
       {R('log10(p_size)', 9)}            AS log10_v,
       {R('log2(p_size)', 9)}             AS log2_v,
       {R('power(p_size, 2)', 4)}         AS pow_v,
       CAST(sign(p_size - 25) AS INT)     AS sign_v,
       {R('sin(p_size)', 9)}              AS sin_v,
       {R('cos(p_size)', 9)}              AS cos_v,
       {R('atan2(p_size, 10)', 9)}        AS atan2_v,
       CAST(trunc(p_retailprice / 100) AS DOUBLE) AS trunc_v
FROM part
""",
    doc="math functions (ref datafusion.proto:449-468; Abs..Trunc)",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size, price = F.col("p_size"), F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(size - 25).alias("abs_v"),
        F.ceil(price / 100).alias("ceil_v"),
        F.floor(price / 100).alias("floor_v"),
        cround(F.sqrt(size), 9).alias("sqrt_v"),
        cround(F.exp(size / F.lit(50.0)), 9).alias("exp_v"),
        cround(F.log(size.cast("double")), 9).alias("ln_v"),
        cround(F.log10(size), 9).alias("log10_v"),
        cround(F.log2(size), 9).alias("log2_v"),
        cround(F.pow(size, F.lit(2)), 4).alias("pow_v"),
        F.signum(size - 25).cast("int").alias("sign_v"),
        cround(F.sin(size), 9).alias("sin_v"),
        cround(F.cos(size), 9).alias("cos_v"),
        cround(F.atan2(size.cast("double"), F.lit(10.0)), 9).alias("atan2_v"),
        F.when(price / 100 < 0, F.ceil(price / 100))
        .otherwise(F.floor(price / 100))
        .cast("double")
        .alias("trunc_v"),
    )


@query(
    "fn_string",
    """
SELECT p_partkey,
       upper(p_name)                          AS upper_v,
       lower(p_brand)                         AS lower_v,
       CAST(length(p_name) AS INT)            AS len_v,
       substr(p_name, 1, 4)                   AS substr_v,
       p_brand || '-' || p_type               AS concat_op,
       concat_ws('/', p_brand, p_type)        AS concat_ws_v,
       lpad(CAST(p_size AS VARCHAR), 4, '0')  AS lpad_v,
       rpad(p_brand, 12, '.')                 AS rpad_v,
       trim('  ' || p_type || ' ')            AS trim_v,
       ltrim('xxy' || p_type, 'xy')           AS ltrim_v,
       rtrim(p_type || 'yxx', 'xy')           AS rtrim_v,
       replace(p_name, ' ', '_')              AS replace_v,
       reverse(p_brand)                       AS reverse_v,
       left(p_name, 3)                        AS left_v,
       right(p_name, 3)                       AS right_v,
       repeat(p_brand, 2)                     AS repeat_v,
       ascii(p_name)                          AS ascii_v,
       chr(65 + p_size % 26)                  AS chr_v,
       split_part(p_name, ' ', 1)             AS split_part_v,
       starts_with(p_name, 'small')           AS startswith_v
FROM part
""",
    doc="string functions (ref datafusion.proto:469-512)",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    name, brand, ptype = F.col("p_name"), F.col("p_brand"), F.col("p_type")
    return p.select(
        "p_partkey",
        F.upper(name).alias("upper_v"),
        F.lower(brand).alias("lower_v"),
        F.length(name).cast("int").alias("len_v"),
        F.substring(name, 1, 4).alias("substr_v"),
        F.concat(brand, F.lit("-"), ptype).alias("concat_op"),
        F.concat_ws("/", brand, ptype).alias("concat_ws_v"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("lpad_v"),
        F.rpad(brand, 12, ".").alias("rpad_v"),
        F.trim(F.concat(F.lit("  "), ptype, F.lit(" "))).alias("trim_v"),
        F.expr("ltrim('xy', 'xxy' || p_type)").alias("ltrim_v"),
        F.expr("rtrim('xy', p_type || 'yxx')").alias("rtrim_v"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("replace_v"),
        F.reverse(brand).alias("reverse_v"),
        F.expr("left(p_name, 3)").alias("left_v"),
        F.expr("right(p_name, 3)").alias("right_v"),
        F.repeat(brand, 2).alias("repeat_v"),
        F.ascii(name).alias("ascii_v"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("chr_v"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("split_part_v"),
        F.startswith(name, F.lit("small")).alias("startswith_v"),
    )


@query(
    "fn_string_binary",
    """
SELECT doc_id,
       CAST(bit_length(substr(text, 1, 20)) AS INT)           AS bitlen_v,
       CAST(octet_length(encode(substr(text, 1, 20))) AS INT) AS octlen_v,
       strpos(text, 'data')                                   AS strpos_v,
       translate(substr(text, 1, 20), 'aeiou', 'AEIOU')       AS translate_v,
       lower(to_hex(doc_id + 255))                            AS hex_v,
       md5(substr(text, 1, 40))                               AS md5_v,
       sha256(substr(text, 1, 40))                            AS sha256_v
FROM documents
""",
    doc="bit/octet length, strpos, translate, to_hex, md5/sha2 "
        "(ref datafusion.proto:470,489,504,511,515-520)",
)
def fn_string_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    head20 = F.substring(F.col("text"), 1, 20)
    head40 = F.substring(F.col("text"), 1, 40)
    return d.select(
        "doc_id",
        F.bit_length(head20).cast("int").alias("bitlen_v"),
        F.octet_length(head20).cast("int").alias("octlen_v"),
        F.instr(F.col("text"), "data").alias("strpos_v"),
        F.translate(head20, "aeiou", "AEIOU").alias("translate_v"),
        F.lower(F.hex(F.col("doc_id") + 255)).alias("hex_v"),
        F.md5(head40.cast("binary")).alias("md5_v"),
        F.sha2(head40.cast("binary"), 256).alias("sha256_v"),
    )


@query(
    "fn_regex",
    """
SELECT doc_id,
       regexp_matches(text, 'data [a-z]+')              AS has_match,
       regexp_extract(text, 'data ([a-z]+)', 1)         AS first_word_after,
       substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 30) AS devoweled,
       CAST(len(regexp_extract_all(text, 'the')) AS INT) AS the_count
FROM documents
""",
    doc="regex family (ref RegexpMatch/RegexpReplace datafusion.proto:477,510; "
        "LIKE/ILIKE/SIMILAR TO map to like/ilike/rlike)",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        t.rlike("data [a-z]+").alias("has_match"),
        F.regexp_extract(t, "data ([a-z]+)", 1).alias("first_word_after"),
        F.substring(F.regexp_replace(t, "[aeiou]", ""), 1, 30).alias(
            "devoweled"
        ),
        F.regexp_count(t, F.lit("the")).cast("int").alias("the_count"),
    )


@query(
    "fn_datetime",
    """
SELECT event_id,
       CAST(extract(year   FROM ts) AS INT) AS y,
       CAST(extract(month  FROM ts) AS INT) AS mo,
       CAST(extract(day    FROM ts) AS INT) AS d,
       CAST(extract(hour   FROM ts) AS INT) AS h,
       CAST(extract(minute FROM ts) AS INT) AS mi,
       date_trunc('day', ts)     AS trunc_day,
       date_trunc('month', ts)   AS trunc_month,
       ts + INTERVAL 3 DAY       AS plus3d,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       time_bucket(INTERVAL '900 seconds', ts, TIMESTAMP '2024-01-01')
           AS bin15m
FROM events
WHERE event_id < 1000
""",
    doc="date/time family (ref DatePart/DateTrunc/DateBin/ToTimestamp, "
        "datafusion.proto:478-480,496-503)",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.functions.compat import date_bin

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).cast("int").alias("y"),
        F.month(ts).cast("int").alias("mo"),
        F.dayofmonth(ts).cast("int").alias("d"),
        F.hour(ts).cast("int").alias("h"),
        F.minute(ts).cast("int").alias("mi"),
        F.date_trunc("day", ts).cast("timestamp_ntz").alias("trunc_day"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("trunc_month"),
        (ts + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        F.unix_timestamp(ts.cast("timestamp")).alias("epoch_s"),
        date_bin(900, ts, "2024-01-01").cast("timestamp_ntz").alias("bin15m"),
    )


@query(
    "fn_conditional",
    """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END                                    AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')        AS status_v,
       greatest(o_totalprice, 150000e0)                       AS greatest_v,
       least(o_totalprice, 150000e0)                          AS least_v,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS if_v,
       CAST(floor(o_totalprice) AS BIGINT)                    AS cast_long,
       TRY_CAST(o_orderpriority AS DOUBLE)                    AS try_cast_v,
       o_totalprice BETWEEN 100000 AND 200000                 AS between_v,
       o_orderstatus IN ('F', 'P')                            AS in_v
FROM orders
WHERE o_orderkey < 2000
""",
    doc="CASE/NULLIF/COALESCE/CAST/TRY_CAST/BETWEEN/IN "
        "(ref datafusion.proto:596-644,481-492)",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    price, status = F.col("o_totalprice"), F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "high")
        .when(price > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(status, F.lit("P")), F.lit("PENDING")).alias(
            "status_v"
        ),
        F.greatest(price, F.lit(150000.0)).alias("greatest_v"),
        F.least(price, F.lit(150000.0)).alias("least_v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("if_v"),
        F.floor(price).alias("cast_long"),
        F.col("o_orderpriority").try_cast("double").alias("try_cast_v"),
        price.between(100000, 200000).alias("between_v"),
        status.isin("F", "P").alias("in_v"),
    )


@query(
    "fn_nested",
    """
SELECT p_partkey,
       [p_size, p_size * 2, p_size * 3][1]        AS arr_first,
       [p_size, p_size * 2, p_size * 3][3]        AS arr_third,
       CAST(len([p_size, p_size * 2]) AS INT)     AS arr_len,
       struct_pack(sz := p_size, brand := p_brand).sz    AS struct_field,
       struct_pack(sz := p_size, brand := p_brand).brand AS struct_brand
FROM part
WHERE p_partkey < 500
""",
    doc="array/struct construction + nested access (ref Array/StructFun "
        "datafusion.proto:505-506, GetIndexedField :384-388)",
)
def fn_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    size = F.col("p_size")
    arr = F.array(size, size * 2, size * 3)
    st = F.struct(size.alias("sz"), F.col("p_brand").alias("brand"))
    return p.select(
        "p_partkey",
        F.element_at(arr, 1).alias("arr_first"),
        F.element_at(arr, 3).alias("arr_third"),
        F.size(F.array(size, size * 2)).cast("int").alias("arr_len"),
        st.getField("sz").alias("struct_field"),
        st.getField("brand").alias("struct_brand"),
    )


@query(
    "fn_like_patterns",
    """
SELECT p_partkey, p_name,
       p_name LIKE 'small%'        AS like_v,
       p_name LIKE '%gear%'        AS contains_v,
       p_name NOT LIKE '%widget%'  AS not_like_v,
       p_name ILIKE 'SMALL%'       AS ilike_v,
       p_name LIKE '_ed%'          AS underscore_v
FROM part
""",
    doc="LIKE/ILIKE patterns (ref datafusion.proto:603-623; TPC-H q13/q16 "
        "usage)",
)
def fn_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        "p_name",
        name.like("small%").alias("like_v"),
        name.like("%gear%").alias("contains_v"),
        (~name.like("%widget%")).alias("not_like_v"),
        name.ilike("SMALL%").alias("ilike_v"),
        name.like("_ed%").alias("underscore_v"),
    )
