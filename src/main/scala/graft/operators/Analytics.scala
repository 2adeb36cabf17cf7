package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det.{r4, r4Sql}
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Analytics breadth beyond the reference surface: classic text/statistics
  * operators a warehouse-grade engine is expected to have — TF-IDF,
  * n-gram frequency, exact interpolated percentiles, moment statistics,
  * grouped rollups. All scan+agg/window shapes that scale like q24–q27.
  */
object Analytics {

  // ---- Q34: top TF-IDF term per document ------------------------------

  def q34(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // tf is distinct-by-construction on (doc_id, term), so document
    // frequency derives from the (much smaller) tf frame — one pass over
    // the exploded tokens instead of two
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count()
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_raw").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("tfidf_raw", col("tf") * log(lit(n.toDouble) / col("df")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("term"), r4(col("tfidf_raw")).as("tfidf"))
      // per-document output (corpus-sized at 100 TB) → parallel range sort
      .orderBy(col("doc_id"))
  }

  val q34Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf * ln(n.n / df) AS tfidf_raw
       |  FROM tf JOIN dfreq USING (term), n),
       |ranked AS (
       |  SELECT doc_id, term, tfidf_raw,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY tfidf_raw DESC, term) AS rk
       |  FROM scored)
       |SELECT doc_id, term, ${r4Sql("tfidf_raw")} AS tfidf
       |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin

  // ---- Q35: corpus bigram frequency (top 20) --------------------------

  def q35(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 2)
      // zip_with over two shifted slices, not transform+element_at over an
      // index sequence: same bigrams, ~27% less per-row work (measured at
      // sf0.1 by examples/HotspotBench — the element_at chain paid two
      // bounds-checked array probes per bigram where zip_with streams both
      // slices linearly)
      .select(explode(expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), " +
          "(a, b) -> concat(a, ' ', b))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  val q35Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
      |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
      |  FROM documents),
      |bi AS (
      |  SELECT a.tok || ' ' || b.tok AS bigram
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
      |SELECT bigram, count(*) AS n FROM bi
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // ---- Q36: exact interpolated percentiles per event type -------------

  def q36(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        r4(expr("percentile(value, 0.5)")).as("p50"),
        r4(expr("percentile(value, 0.95)")).as("p95"),
        r4(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy(col("event_type"))

  val q36Sql: String =
    s"""SELECT event_type,
       |       ${r4Sql("quantile_cont(value, 0.5)")} AS p50,
       |       ${r4Sql("quantile_cont(value, 0.95)")} AS p95,
       |       ${r4Sql("quantile_cont(value, 0.99)")} AS p99
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- Q37: moment statistics + cross-column correlation --------------

  def q37(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        r4(avg(col("value"))).as("avg_value"),
        r4(stddev_samp(col("value"))).as("sd_value"),
        r4(corr(col("value"), col("k"))).as("corr_vk"))
      .orderBy(col("event_type"))

  val q37Sql: String =
    s"""SELECT event_type, count(*) AS n,
       |       ${r4Sql("avg(value)")} AS avg_value,
       |       ${r4Sql("stddev_samp(value)")} AS sd_value,
       |       ${r4Sql("corr(value, json_extract_string(props, '$.k')::DOUBLE)")} AS corr_vk
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- Q38: revenue rollup (grouping sets) ----------------------------

  def q38(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q38Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |       coalesce(l_linestatus, 'ALL') AS linestatus,
       |       ${r4Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue,
       |       count(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_tfidf_top_term" -> (q34 _),
    "q35_bigram_freq" -> (q35 _),
    "q36_value_percentiles" -> (q36 _),
    "q37_type_stats" -> (q37 _),
    "q38_revenue_rollup" -> (q38 _))

  val oracles: Map[String, String] = Map(
    "q34_tfidf_top_term" -> q34Sql,
    "q35_bigram_freq" -> q35Sql,
    "q36_value_percentiles" -> q36Sql,
    "q37_type_stats" -> q37Sql,
    "q38_revenue_rollup" -> q38Sql)
}
