package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    * tasks in phase 1; phase 2 combines `salts` rows per key. Works for
    * any algebraic aggregate supplied as (partial, combine) pairs; the
    * common count/sum forms are wrapped below. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("sum"))

  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("count"))

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
}
