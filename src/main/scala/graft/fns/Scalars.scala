package graft.fns

import graft.GraftQuery
import graft.fns.VecExpressions.vecDot
import graft.io.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface (B8): one representative query per family —
  * string, date/time, math, array, map/JSON.  All expressions are built-in
  * (codegen'd); derived integer columns are cast to long to match DuckDB's
  * BIGINT results.
  */
object Scalars {

  val scalarString: GraftQuery = GraftQuery("q_scalar_string",
    """SELECT p_partkey,
      |  lower(p_name) AS name_lc,
      |  upper(p_brand) AS brand_uc,
      |  substr(p_type, 1, 6) AS type6,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS bt,
      |  regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
      |  string_split(p_type, ' ')[1] AS type_first,
      |  CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS lev
      |FROM part""".stripMargin) { (spark, sfDir) =>
    part(spark, sfDir).select(
      col("p_partkey"),
      lower(col("p_name")).as("name_lc"),
      upper(col("p_brand")).as("brand_uc"),
      substring(col("p_type"), 1, 6).as("type6"),
      length(col("p_name")).cast(LongType).as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
      regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("brand_num"),
      element_at(split(col("p_type"), " "), 1).as("type_first"),
      levenshtein(col("p_brand"), lit("Brand#1")).cast(LongType).as("lev"))
  }

  val scalarDatetime: GraftQuery = GraftQuery("q_scalar_datetime",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d_since,
      |  epoch_us(o_orderdate) AS ts_us,
      |  CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS DATE) AS next_month
      |FROM orders""".stripMargin) { (spark, sfDir) =>
    orders(spark, sfDir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("yr"),
      month(col("o_orderdate")).cast(LongType).as("mo"),
      date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).cast(LongType).as("d_since"),
      unix_micros(col("o_orderdate").cast(TimestampType)).as("ts_us"),
      add_months(date_trunc("month", col("o_orderdate")).cast(DateType), 1).as("next_month"))
  }

  val scalarMath: GraftQuery = GraftQuery("q_scalar_math",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25.0) AS absdev,
      |  round(sqrt(l_extendedprice), 6) AS sq6,
      |  round(ln(l_extendedprice), 6) AS ln6,
      |  power(2.0, l_linenumber) AS p2,
      |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
      |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
      |  l_orderkey % 7 AS pm
      |FROM lineitem""".stripMargin) { (spark, sfDir) =>
    lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25.0).as("absdev"),
      round(sqrt(col("l_extendedprice")), 6).as("sq6"),
      round(log(col("l_extendedprice")), 6).as("ln6"),
      pow(lit(2.0), col("l_linenumber")).as("p2"),
      floor(col("l_discount") * 100).cast(LongType).as("disc_pct"),
      ceil(col("l_tax") * 100).cast(LongType).as("tax_pct"),
      pmod(col("l_orderkey"), lit(7L)).as("pm"))
  }

  /** Array ops over the embedding column; reductions use the scaled-integer
    * dot (exact in both engines — see [[Exact]]).  Array-valued results are
    * serialized to CSV strings (`concat_ws` / `array_to_string`) so the
    * driver's hash comparator — which cannot hash ndarray cells — checks
    * them end to end. */
  val scalarArray: GraftQuery = GraftQuery("q_scalar_array",
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  array_to_string(list_transform(embedding[1:4], x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)), ',') AS head4_csv,
      |  array_to_string(list_sort(list_transform(embedding[1:4], x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))), ',') AS head4_sorted_csv,
      |  list_max(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))) AS max_mill,
      |  list_dot_product(
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)),
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))) / 1000000000000.0 AS norm2
      |FROM embeddings""".stripMargin) { (spark, sfDir) =>
    val mill = transform(col("embedding"),
      x => round(x.cast(DoubleType) * 1000).cast(LongType))
    val q = transform(col("embedding"),
      x => round(x.cast(DoubleType) * 1000000).cast(LongType))
    val dot = vecDot(spark, q, q)
    embeddings(spark, sfDir).select(
      col("vec_id"),
      size(col("embedding")).cast(LongType).as("dim"),
      concat_ws(",", transform(slice(col("embedding"), 1, 4),
        x => round(x.cast(DoubleType) * 1000).cast(LongType))).as("head4_csv"),
      concat_ws(",", sort_array(transform(slice(col("embedding"), 1, 4),
        x => round(x.cast(DoubleType) * 1000).cast(LongType)))).as("head4_sorted_csv"),
      array_max(mill).as("max_mill"),
      (dot.cast(DoubleType) / lit(1000000000000.0)).as("norm2"))
  }

  val scalarJson: GraftQuery = GraftQuery("q_scalar_json",
    """SELECT event_id,
      |  CAST(props::JSON ->> 'k' AS BIGINT) AS k_val,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys
      |FROM events""".stripMargin) { (spark, sfDir) =>
    val structSchema = StructType(Seq(StructField("k", IntegerType)))
    events(spark, sfDir).select(
      col("event_id"),
      from_json(col("props"), structSchema).getField("k").cast(LongType).as("k_val"),
      get_json_object(col("props"), "$.k").as("k_str"),
      size(map_keys(from_json(col("props"), MapType(StringType, IntegerType))))
        .cast(LongType).as("n_keys"))
  }

  /** Regex scalar family (B8): search (`regexp_like`/`regexp_matches`),
    * global replace, and group extract.  Patterns are restricted to
    * character classes + literals — the dialect subset where Java regex
    * (Spark) and RE2 (DuckDB) agree; DuckDB's replace needs the explicit
    * 'g' flag to match Spark's replace-all semantics. */
  val scalarRegex: GraftQuery = GraftQuery("q_scalar_regex",
    """SELECT lang,
      |  CAST(count(CASE WHEN regexp_matches(text, 'key [a-z]+ value') THEN 1 END) AS BIGINT) AS n_kv,
      |  CAST(sum(length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS chars_novowel,
      |  min(regexp_extract(text, '^([a-z]+)', 1)) AS first_word_min
      |FROM documents GROUP BY lang""".stripMargin) { (spark, sfDir) =>
    graft.io.Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(
        count(when(col("text").rlike("key [a-z]+ value"), 1)).as("n_kv"),
        sum(length(regexp_replace(col("text"), "[aeiou]", "")))
          .cast(LongType).as("chars_novowel"),
        min(regexp_extract(col("text"), "^([a-z]+)", 1)).as("first_word_min"))
  }

  val all: Seq[GraftQuery] =
    Seq(scalarString, scalarDatetime, scalarMath, scalarArray, scalarJson,
      scalarRegex)
}
