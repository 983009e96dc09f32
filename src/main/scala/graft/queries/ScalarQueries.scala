package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2b): string / date-time / math /
  * conditional / regexp-over-JSON / array families. All codegen'd
  * built-ins — no UDFs — so every expression stays inside whole-stage
  * codegen.
  */
object ScalarQueries {
  type Q = (SparkSession, String) => DataFrame

  /** String family over part names. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 5).as("name5"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(lit("  padded  ")).as("trimmed"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        levenshtein(col("p_type"), lit("PROMO")).as("type_dist"))
      .orderBy(col("p_partkey"))

  /** Date/time family over orders. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_trunc("day", col("o_orderdate")).as("day_start"))
      .orderBy(col("o_orderkey"))

  /** Date arithmetic family: month-clamped add_months, last_day,
    * quarter, fixed-day offsets — semantics agreed by both engines
    * (month addition clamps to the target month's last day). */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 4000)
      .select(
        col("o_orderkey"),
        // DATE results are re-cast to TIMESTAMP purely for the compare
        // harness: pandas renders DuckDB DATE as datetime64 but parquet
        // date32 as datetime.date, so date-typed outputs never
        // string-match across engines
        add_months(col("o_orderdate").cast("date"), 2).cast("timestamp")
          .as("plus2m"),
        last_day(col("o_orderdate").cast("date")).cast("timestamp")
          .as("month_end"),
        quarter(col("o_orderdate")).as("qtr"),
        date_add(col("o_orderdate").cast("date"), 7).cast("timestamp")
          .as("plus7d"),
        date_sub(col("o_orderdate").cast("date"), 30).cast("timestamp")
          .as("minus30d"))
      .orderBy(col("o_orderkey"))

  /** Math family over lineitem measures. Only libm-exact ops stay
    * unrounded (sqrt is IEEE-correctly-rounded); log is rounded to 6
    * decimals to absorb last-ulp libm differences across engines. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("rounded"),
        abs(col("l_discount") - 0.05).as("abs_diff"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("log_price"),
        least(col("l_tax"), col("l_discount")).as("least_rate"),
        greatest(col("l_tax"), col("l_discount")).as("greatest_rate"),
        ceil(col("l_quantity") / 7.0).cast("long").as("ceil7"),
        floor(col("l_quantity") / 7.0).cast("long").as("floor7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Conditional family: CASE WHEN ladder, coalesce, nullif. */
  def conditionalFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000.0, "high")
          .when(col("o_totalprice") > 50000.0, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_label"))
      .orderBy(col("o_orderkey"))

  /** JSON-ish extraction from events.props ({"k": N}) via regexp (both
    * engines run the same pattern; from_json is exercised in ScalaTest
    * where DuckDB needs no mirror). */
  def regexpJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int")
          .as("k_value"),
        col("event_type"))
      .filter(col("k_value") > 50)
      .orderBy(col("event_id"))

  /** Array family over embeddings: size, indexing, slicing; exact float
    * passthrough (no arithmetic → no summation-order hazard). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        element_at(col("embedding"), -1).as("last_elem"),
        array_max(col("embedding")).as("max_elem"),
        array_min(col("embedding")).as("min_elem"),
        element_at(slice(col("embedding"), 5, 3), 2).as("slice_mid"),
        element_at(sort_array(col("embedding"), asc = false), 2)
          .as("second_largest"))
      .orderBy(col("vec_id"))

  /** Map family: construction (from arrays / from entries), key/value
    * extraction, cardinality. Output is scalars only — map columns
    * themselves stringify differently across engines. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 50)
      .withColumn("m", map_from_arrays(
        array(lit("qty"), lit("price")),
        array(col("l_quantity"), col("l_extendedprice"))))
      .withColumn("me", map_from_entries(
        array(struct(lit("t").as("k"), col("l_tax").as("v")))))
      .select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
        element_at(col("m"), "qty").as("qty_v"),
        concat_ws(",", map_keys(col("m"))).as("m_keys"),
        element_at(map_values(col("m")), 2).as("second_v"),
        size(col("m")).cast("int").as("m_size"),
        element_at(col("me"), "t").as("tax_v"))
      .orderBy(col("okey"), col("line"))

  /** Bitwise family: and/or/xor, shifts, popcount — pure integer ops,
    * identical in any engine. */
  def bitwiseFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255L).as("band"),
        col("o_orderkey").bitwiseOR(15L).as("bor"),
        col("o_orderkey").bitwiseXOR(255L).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"),
        bit_count(col("o_orderkey")).cast("int").as("nbits"))
      .orderBy(col("o_orderkey"))

  val defs: Map[String, Q] = Map(
    "scalar_bitwise" -> (bitwiseFuncs _),
    "scalar_map" -> (mapFuncs _),
    "scalar_string" -> (stringFuncs _),
    "scalar_hash" -> (hashFuncs _),
    "scalar_date" -> (dateFuncs _),
    "scalar_date_arith" -> (dateArith _),
    "scalar_math" -> (mathFuncs _),
    "scalar_conditional" -> (conditionalFuncs _),
    "scalar_regexp_json" -> (regexpJson _),
    "scalar_array" -> (arrayFuncs _))

  /** Cryptographic/row-fingerprint hashes — the storage-engine
    * primitive behind content addressing, dedup keys, and change
    * detection. md5/sha-256 produce identical lowercase hex in any
    * engine (exact-dedup and the snapshot diff already rely on that;
    * this declares the scalar surface itself). */
  def hashFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        md5(col("p_name")).as("md5_name"),
        sha2(col("p_name"), 256).as("sha_name"))
      .orderBy(col("p_partkey"))

  val sql: Map[String, String] = Map(
    "scalar_bitwise" ->
      """SELECT o_orderkey,
        | CAST(o_orderkey & 255 AS BIGINT) AS band,
        | CAST(o_orderkey | 15 AS BIGINT) AS bor,
        | CAST(xor(o_orderkey, 255) AS BIGINT) AS bxor,
        | CAST(o_orderkey << 2 AS BIGINT) AS shl,
        | CAST(o_orderkey >> 3 AS BIGINT) AS shr,
        | CAST(bit_count(o_orderkey) AS INT) AS nbits
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "scalar_map" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line,
        | m['qty'][1] AS qty_v,
        | array_to_string(map_keys(m), ',') AS m_keys,
        | map_values(m)[2] AS second_v,
        | CAST(cardinality(m) AS INT) AS m_size,
        | map_from_entries([('t', l_tax)])['t'][1] AS tax_v
        |FROM (SELECT *, map(['qty','price'], [l_quantity, l_extendedprice]) AS m
        |      FROM lineitem WHERE l_orderkey <= 50)
        |ORDER BY okey, line""".stripMargin,
    "scalar_hash" ->
      """SELECT p_partkey, md5(p_name) AS md5_name,
        | sha256(p_name) AS sha_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_string" ->
      """SELECT p_partkey,
        | substr(p_name, 1, 5) AS name5,
        | upper(p_name) AS uname,
        | lower(p_brand) AS lbrand,
        | CAST(length(p_name) AS INT) AS name_len,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | trim('  padded  ') AS trimmed,
        | regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
        | regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
        | CAST(levenshtein(p_type, 'PROMO') AS INT) AS type_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mo,
        | CAST(day(o_orderdate) AS INT) AS dom,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        | epoch_ms(o_orderdate) // 1000 AS epoch_s,
        | date_trunc('day', o_orderdate) AS day_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_date_arith" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        | CAST(quarter(o_orderdate) AS INT) AS qtr,
        | CAST(CAST(o_orderdate AS DATE) + 7 AS TIMESTAMP) AS plus7d,
        | CAST(CAST(o_orderdate AS DATE) - 30 AS TIMESTAMP) AS minus30d
        |FROM orders WHERE o_orderkey <= 4000
        |ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice, 1) AS rounded,
        | abs(l_discount - 0.05) AS abs_diff,
        | sqrt(l_quantity) AS sqrt_qty,
        | pow(l_quantity, 2) AS qty_sq,
        | round(ln(l_extendedprice), 6) AS log_price,
        | least(l_tax, l_discount) AS least_rate,
        | greatest(l_tax, l_discount) AS greatest_rate,
        | CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scalar_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000.0 THEN 'high'
        |      WHEN o_totalprice > 50000.0 THEN 'mid'
        |      ELSE 'low' END AS bucket,
        | COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_regexp_json" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k_value,
        | event_type
        |FROM events
        |WHERE CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) > 50
        |ORDER BY event_id""".stripMargin,
    "scalar_array" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INT) AS dim,
        | embedding[1] AS first_elem,
        | embedding[-1] AS last_elem,
        | list_max(embedding) AS max_elem,
        | list_min(embedding) AS min_elem,
        | embedding[5:7][2] AS slice_mid,
        | list_reverse_sort(embedding)[2] AS second_largest
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
