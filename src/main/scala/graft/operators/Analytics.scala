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
    val tf = StandingCache.frame(dir, "an_q34_tf")(
      toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
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
        // value is cent-grid: average the exact integer cents (order-
        // exact sums) and divide once — a mean of grid doubles can sit
        // ON an r4 half-boundary and flip with summation order (the
        // q117 lesson). stddev/corr readouts land off-grid (sqrt/ratio)
        // so their boundary stays measure-zero.
        r4(avg(floor(col("value") * 100 + lit(0.5))) / lit(100.0))
          .as("avg_value"),
        r4(stddev_samp(col("value"))).as("sd_value"),
        r4(corr(col("value"), col("k"))).as("corr_vk"))
      .orderBy(col("event_type"))

  val q37Sql: String =
    s"""SELECT event_type, count(*) AS n,
       |       ${r4Sql("avg(floor(value * 100 + 0.5)) / 100.0")} AS avg_value,
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

  // ---- Q99: bigram PMI (collocation / association mining) -------------

  /** Pointwise mutual information over adjacent-token pairs —
    * `ln( p(ab) / (p(a)·p(b)) )` — the association statistic behind
    * collocation extraction and SGNS-era feature selection: q35 ranks
    * bigrams by RAW count (dominated by frequent words), PMI ranks by
    * how much MORE often a pair co-occurs than its unigrams predict.
    * Distributed shape: ONE tokenize feeds both the unigram and bigram
    * counts (the q65 single-pass discipline); the two corpus totals are
    * 1-row collects; the bigram→unigram joins are vocabulary-sized (the
    * q89 broadcast shape — a vocabulary is millions of rows at 100 TB,
    * the corpus is billions, and the join must broadcast the former,
    * never shuffle the latter twice). The final cut is orderBy+limit →
    * TakeOrderedAndProject. Ordering is on the ROUNDED pmi (r4, the q89
    * ln-parity recipe) with (a, b) tie-break, so the top-20 boundary is
    * engine-stable; the `cab ≥ 5` floor keeps log arguments off the
    * 1-count noise floor. */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.table(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
    // one tokenize: totals + both joins read this; dir-pure → standing
    val uni = StandingCache.frame(dir, "an_q99_uni")(
      toks.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cn")))
    val totalT = uni.agg(sum(col("cn"))).collect()(0).getLong(0)
    val bi = toks.where(size(col("toks")) >= 2)
      .select(explode(expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), " +
          "(a, b) -> struct(a AS a, b AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .transform(f => StandingCache.frame(dir, "an_q99_bi")(f))
    val totalB = bi.agg(sum(col("cab"))).collect()(0).getLong(0)
    bi.where(col("cab") >= 5)
      .join(broadcast(uni.select(col("tok").as("a"), col("cn").as("ca"))), Seq("a"))
      .join(broadcast(uni.select(col("tok").as("b"), col("cn").as("cb"))), Seq("b"))
      .select(col("a"), col("b"), col("cab"),
        r4(log((col("cab").cast("double") / lit(totalB.toDouble)) /
          ((col("ca").cast("double") / lit(totalT.toDouble)) *
            (col("cb").cast("double") / lit(totalT.toDouble))))).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(20)
  }

  val q99Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
       |         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
       |  FROM documents),
       |uni AS (SELECT tok, count(*) AS cn FROM toks GROUP BY tok),
       |tt AS (SELECT sum(cn)::DOUBLE AS t FROM uni),
       |bi AS (
       |  SELECT x.tok AS a, y.tok AS b, count(*) AS cab
       |  FROM toks x JOIN toks y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
       |  GROUP BY 1, 2),
       |tb AS (SELECT sum(cab)::DOUBLE AS t FROM bi)
       |SELECT a, b, cab,
       |       ${r4Sql("ln((cab::DOUBLE / tb.t) / ((ua.cn::DOUBLE / tt.t) * (ub.cn::DOUBLE / tt.t)))")} AS pmi
       |FROM bi
       |JOIN uni ua ON ua.tok = a
       |JOIN uni ub ON ub.tok = b, tt, tb
       |WHERE cab >= 5
       |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin

  // ---- Q97: pivot (long→wide reshape in one aggregation pass) ---------

  /** Per-cohort event counts pivoted to one COLUMN per event type — the
    * long→wide reshape every report/feature-matrix step needs. The value
    * list is passed EXPLICITLY: `pivot(col)` without one runs a separate
    * distinct-scan job over the corpus just to learn the column set (and
    * caps it at `spark.sql.pivotMaxValues`), while with the list Spark
    * plans ONE aggregation pass whose map-side partials carry 5
    * conditional counters per cohort — at 100 TB the discovery scan is
    * the difference between one job and two. Missing combinations
    * surface as pivot NULLs; they are coalesced to 0 to match the
    * relational FILTER formulation (the oracle) at any scale factor. */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, dir)
      .withColumn("cohort", col("user_id") % 100)
      .groupBy(col("cohort"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p)((d, t) => d.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("cohort"))
  }

  val q97Sql: String =
    s"""SELECT user_id % 100 AS cohort,
       |       count(*) FILTER (WHERE event_type = 'click') AS click,
       |       count(*) FILTER (WHERE event_type = 'error') AS error,
       |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       |       count(*) FILTER (WHERE event_type = 'view') AS view
       |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin

  // ---- Q98: set operators (INTERSECT / EXCEPT) ------------------------

  /** Customer retention cohorts via the SQL SET OPERATORS: custkeys
    * ordering in BOTH 1996 and 1997 (INTERSECT), in 1996 ONLY (EXCEPT),
    * and in 1997 ONLY — the audience-overlap shape every corpus/user
    * comparison reduces to. Spark plans INTERSECT as a left-semi join
    * over distinct keys and EXCEPT as a left-anti: one shuffle each on
    * the compared key with partial distinct upstream, never a full
    * materialized cross-comparison; the three label branches reuse the
    * same two year-scans (Catalyst dedups the cached scan via exchange
    * reuse). Counts, not key lists, are reported — label-sized output
    * regardless of scale. */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    def custs(y: Int) = o
      .where(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    def labeled(name: String, d: DataFrame) =
      d.agg(count(lit(1)).as("n")).select(lit(name).as("cohort"), col("n"))
    labeled("both", custs(1996).intersect(custs(1997)))
      .unionAll(labeled("only_1996", custs(1996).except(custs(1997))))
      .unionAll(labeled("only_1997", custs(1997).except(custs(1996))))
      .orderBy(col("cohort"))
  }

  val q98Sql: String =
    s"""WITH y96 AS (SELECT o_custkey FROM orders
       |             WHERE year(o_orderdate) = 1996),
       |     y97 AS (SELECT o_custkey FROM orders
       |             WHERE year(o_orderdate) = 1997)
       |SELECT 'both' AS cohort,
       |       (SELECT count(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)) AS n
       |UNION ALL
       |SELECT 'only_1996',
       |       (SELECT count(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97))
       |UNION ALL
       |SELECT 'only_1997',
       |       (SELECT count(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96))
       |ORDER BY cohort""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_tfidf_top_term" -> (q34 _),
    "q35_bigram_freq" -> (q35 _),
    "q36_value_percentiles" -> (q36 _),
    "q37_type_stats" -> (q37 _),
    "q38_revenue_rollup" -> (q38 _),
    "q97_pivot_cohorts" -> (q97 _),
    "q98_setops_retention" -> (q98 _),
    "q99_bigram_pmi" -> (q99 _))

  val oracles: Map[String, String] = Map(
    "q34_tfidf_top_term" -> q34Sql,
    "q35_bigram_freq" -> q35Sql,
    "q36_value_percentiles" -> q36Sql,
    "q37_type_stats" -> q37Sql,
    "q38_revenue_rollup" -> q38Sql,
    "q97_pivot_cohorts" -> q97Sql,
    "q98_setops_retention" -> q98Sql,
    "q99_bigram_pmi" -> q99Sql)
}
