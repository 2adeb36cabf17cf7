package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.sources.Tables

/** Sketch operators — the fixed-memory frequency/cardinality tools a
  * 100 TB pipeline reaches for when exact groupBy state would be
  * corpus-sized: Count-Min (frequency over-estimates, q76) and
  * HyperLogLog (distinct estimates, q77).
  *
  * Both are built from PLAIN aggregations over arithmetic on an
  * md5-derived hash (the q41 split-bucket pattern), because that is
  * exactly what makes a sketch distributed-friendly: the per-partition
  * state is the bounded cell/register matrix (map-side combine collapses
  * every partition to ≤ d×w or ≤ m rows), merges are max/sum — Spark's
  * native partial-aggregation shapes — and the estimate is a scalar
  * epilogue. No custom expression is needed; the whole pipeline stays in
  * whole-stage codegen until the final tiny agg. Determinism: the hash
  * is md5 hex arithmetic evaluated identically by Spark and DuckDB, so
  * the ESTIMATES themselves (not just bounds) hash-match the oracle.
  *
  * The graded shapes deliberately report `(true, estimate)` pairs: the
  * gate then pins both the sketch arithmetic AND the exact path, and the
  * over-estimate / error properties are visible in the output rather
  * than asserted in prose (DedupSpec-style property checks live in
  * SketchSpec).
  */
object Sketches {

  // ---- Q76: Count-Min frequency sketch over the token stream ----------
  //
  // d×w = 3×16 — deliberately tiny against the 31-token vocabulary so
  // collisions (the thing Count-Min is ABOUT) actually occur and the
  // over-estimates are visible in the graded output. Each occurrence
  // increments d cells; a token's estimate is the MIN over its d cells —
  // ≥ the true count always, with equality when some row isolates it.
  // The matrix build is one explode + hash-bucket groupBy: partitions
  // combine to ≤ d×w rows each before the exchange, the stream itself
  // is never shuffled — the CMS contract, expressed as a Spark agg.

  private val CmD = 3
  private val CmW = 16

  private def cmCell(r: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"cm${r}_"), tok)), 1, 8), 16, 10)
      .cast("long") % CmW

  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))

  def q76(spark: SparkSession, dir: String): DataFrame = {
    val occ = toks(spark, dir)
    // matrix: every occurrence lands in one cell per row r
    val mat = occ
      .select(posexplode(array((0 until CmD).map(r => cmCell(r, col("tok"))): _*)))
      .groupBy(col("pos").as("r"), col("col").as("cell"))
      .agg(count(lit(1)).as("total"))
    // per-token estimate: min over its d cells (vocabulary-sized probe
    // joined against the ≤ d×w matrix — both sides tiny, broadcast)
    val cnt = occ.groupBy(col("tok")).agg(count(lit(1)).as("n_true"))
    val probes = cnt
      .select(col("tok"), col("n_true"),
        posexplode(array((0 until CmD).map(r => cmCell(r, col("tok"))): _*)))
      .withColumnsRenamed(Map("pos" -> "r", "col" -> "cell"))
    probes.join(broadcast(mat), Seq("r", "cell"))
      .groupBy(col("tok"), col("n_true"))
      .agg(min(col("total")).as("n_est"))
      .orderBy(col("tok"))
  }

  val q76Sql: String =
    s"""WITH occ AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
       |  FROM documents),
       |cnt AS (SELECT tok, count(*) AS n_true FROM occ GROUP BY tok),
       |mat AS (
       |  SELECT g.r,
       |         ('0x' || substr(md5('cm' || g.r || '_' || c.tok), 1, 8))::BIGINT % $CmW AS cell,
       |         sum(c.n_true) AS total
       |  FROM cnt c, range($CmD) g(r) GROUP BY 1, 2),
       |est AS (
       |  SELECT c.tok, c.n_true, min(m.total)::BIGINT AS n_est
       |  FROM cnt c, range($CmD) g(r)
       |  JOIN mat m ON m.r = g.r
       |   AND m.cell = ('0x' || substr(md5('cm' || g.r || '_' || c.tok), 1, 8))::BIGINT % $CmW
       |  GROUP BY 1, 2)
       |SELECT tok, n_true, n_est FROM est ORDER BY tok""".stripMargin

  // ---- Q77: HyperLogLog distinct-users per event type ------------------
  //
  // m = 256 registers (p = 8) over a 48-bit md5-derived hash: bucket =
  // low 8 bits, rho = leading-zero rank of the remaining 40 bits
  // (computed on the binary STRING — lpad(bin(v)) + instr — because
  // string ops are bit-identical across engines, where float log2 at a
  // power-of-two boundary is not). Registers aggregate as
  // groupBy(type, bucket).max(rho): per-partition state is ≤ m rows per
  // group, merge is max — the HLL mergeability property IS Spark's
  // partial aggregation here. The estimate applies the standard
  // alpha·m²/Σ2^−M with the small-range linear-counting branch; at
  // sf0.01 (150 users/type) the correction branch fires, at sf0.1
  // (1500) the raw path does — the gate exercises both.

  private val HllM = 256
  private val HllHashBits = 48
  private val HllVBits = HllHashBits - 8 // 40

  def q77(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
    val h = conv(substring(md5(concat(lit("hll_"),
      col("user_id").cast("string"))), 1, HllHashBits / 4), 16, 10)
      .cast("long")
    val hashed = ev.select(col("event_type"), col("user_id"),
      (h % HllM).as("bucket"), shiftright(h, 8).as("v"))
    val regs = hashed
      .withColumn("rho",
        when(col("v") === 0, lit(HllVBits + 1))
          .otherwise(instr(lpad(bin(col("v")), HllVBits, "0"), "1")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble))
    val est = regs.groupBy(col("event_type"))
      .agg((sum(pow(lit(2.0), -col("rho"))) +
        (lit(HllM) - count(lit(1))).cast("double")).as("s"),
        (lit(HllM) - count(lit(1))).cast("double").as("zeros"))
      .withColumn("raw",
        alpha * lit(HllM.toDouble) * lit(HllM.toDouble) / col("s"))
      .withColumn("n_est", Det.r4(
        when(col("raw") <= lit(2.5 * HllM) && col("zeros") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")))
          .otherwise(col("raw"))))
    val truth = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_true"))
    truth.join(est.select(col("event_type"), col("n_est")), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  val q77Sql: String =
    s"""WITH h AS (
       |  SELECT event_type, user_id,
       |         ('0x' || substr(md5('hll_' || user_id), 1, ${HllHashBits / 4}))::BIGINT AS hv
       |  FROM events),
       |b AS (SELECT event_type, hv % $HllM AS bucket, hv // $HllM AS v FROM h),
       |r AS (
       |  SELECT event_type, bucket,
       |         max(CASE WHEN v = 0 THEN ${HllVBits + 1}
       |             ELSE strpos(lpad(bin(v), $HllVBits, '0'), '1') END) AS rho
       |  FROM b GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type,
       |         sum(power(2.0, -rho)) + ($HllM - count(*))::DOUBLE AS s,
       |         ($HllM - count(*))::DOUBLE AS zeros
       |  FROM r GROUP BY 1),
       |e AS (
       |  SELECT event_type, zeros,
       |         (0.7213 / (1.0 + 1.079 / ${HllM.toDouble})) * ${HllM.toDouble} * ${HllM.toDouble} / s AS raw
       |  FROM agg),
       |t AS (SELECT event_type, count(DISTINCT user_id) AS n_true
       |      FROM events GROUP BY 1)
       |SELECT t.event_type, t.n_true,
       |       ${Det.r4Sql(s"CASE WHEN e.raw <= ${2.5 * HllM} AND e.zeros > 0 " +
        s"THEN ${HllM.toDouble} * ln(${HllM.toDouble} / e.zeros) ELSE e.raw END")} AS n_est
       |FROM t JOIN e USING (event_type) ORDER BY event_type""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_countmin_freq" -> (q76 _),
    "q77_hll_distinct" -> (q77 _))

  val oracles: Map[String, String] = Map(
    "q76_countmin_freq" -> q76Sql,
    "q77_hll_distinct" -> q77Sql)
}
