package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-mitigation primitives (SCALING.md): two-phase salted aggregation
  * and a salted broadcast-side explosion for joins against skewed keys.
  *
  * AQE's skew-join splitting handles most cases automatically at runtime;
  * these explicit forms are for the cases AQE can't see — a single hot
  * GROUP BY key whose partial aggregate still overwhelms one task, or a
  * non-AQE context (streaming state, RDD-adjacent code).
  */
object Skew {

  /** Two-phase aggregation: `groupBy(key, salt) → partial` then
    * `groupBy(key) → final`. The hot key's rows spread over `salts`
    * tasks in phase 1; phase 2 combines `salts` rows per key. Sum and
    * count come out of ONE pass — separate salted-sum and salted-count
    * calls joined on key would scan and shuffle the fact table twice
    * AND drop NULL group keys (inner join on key is null-unsafe); a
    * single grouped pass has neither problem, and a caller wanting only
    * one of the two just drops the other column. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum"),
        sum(col("__pcnt")).cast("long").as("count"))

  /** Salted join for a skewed fact side: fact rows get a random salt in
    * [0, salts); the (small) dimension side is exploded `salts`× so every
    * (key, salt) bucket finds its match. Exact join semantics, `salts`×
    * dimension replication — only sensible when dim ≪ fact. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val explodedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  // ---- q49: salted aggregation behind the correctness gate -------------

  /** q49: the two-phase salted aggregation over lineitem's 3-value
    * `l_returnflag` — maximal skew: every row is one of three hot keys,
    * exactly the regime the salt exists for. The contract is that
    * salting changes the SCHEDULE, never the ANSWER, so the oracle is
    * the plain one-phase SQL aggregate. `l_quantity` is integral, so the
    * re-associated double sums are exact and hash-identical. */
  def q49(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(Tables.table(spark, dir, "lineitem"),
      col("l_returnflag"), col("l_quantity"), salts = 16)
      .select(col("key"), col("sum").as("sum_qty"), col("count").as("n"))
      .orderBy(col("key"))

  val q49Sql: String =
    """SELECT l_returnflag AS key, sum(l_quantity) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin

  // ---- q52: salted join behind the correctness gate --------------------

  /** q52: [[saltedJoin]] of the lineitem fact against the supplier dim
    * (the smallest keyed dim — the dim ≪ fact regime the primitive is
    * for), aggregated to a per-supplier report so the hash grades join
    * MULTIPLICITY, not just membership: a row dropped or duplicated by
    * the salt explode/strip changes some supplier's count. The contract
    * is q49's — salting changes the SCHEDULE, never the ANSWER — so the
    * oracle is the plain unsalted SQL join. `l_quantity` is integral:
    * re-associated double sums stay exact. */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.table(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val dim = Tables.table(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    saltedJoin(fact, dim, "suppkey", salts = 8)
      .groupBy(col("suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("suppkey"))
  }

  val q52Sql: String =
    """SELECT s.s_suppkey AS suppkey, s.s_name AS s_name,
      |       count(*) AS n, sum(l.l_quantity) AS sum_qty
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY 1, 2 ORDER BY suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q49_salted_agg" -> (q49 _),
      "q52_salted_join" -> (q52 _))

  val oracles: Map[String, String] =
    Map("q49_salted_agg" -> q49Sql,
      "q52_salted_join" -> q52Sql)
}
