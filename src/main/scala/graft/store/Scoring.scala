package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scoring/ranking contract shared by BOTH store facades. One definition,
  * no twin to drift: [[VectorStore]] (in-memory) and
  * [[DurableVectorStore]] (partitioned layout) must stay metric-for-metric
  * interchangeable on the read path — DurableStoreSpec pins the parity,
  * this object enforces it structurally.
  *
  * Contract (from the reference, `index.py:125-127` + SURVEY §2.6):
  * scores are RAW doubles (callers round for reports); "cosine" ranks
  * similarity DESCENDING, "l2"/"ip" rank distance ascending; ties break
  * by string id ascending.
  */
private[store] object Scoring {

  /** Above this many ids, literal `isInCollection` predicates give way to
    * broadcast join forms: the literal plan grows with the batch (codegen
    * size, analysis time) while the join stays constant-size. The REST
    * contract caps request batches at 1000, so serving always takes the
    * literal path. */
  val InListMax = 1000

  def litVec(q: Seq[Float]): Column =
    array(q.map(v => lit(v)): _*).cast("array<float>")

  def score(metric: String, values: Column, qv: Column): Column = metric match {
    case "l2"     => l2sq(values, qv)
    case "cosine" => cosineSim(values, qv)
    case "ip"     => ipDist(values, qv)
    case other    => throw new IllegalArgumentException(
      s"unknown metric '$other' (expected l2 | cosine | ip)")
  }

  def ranked(df: DataFrame, metric: String): DataFrame =
    if (metric == "cosine") df.orderBy(col("score").desc, col("id"))
    else df.orderBy(col("score"), col("id"))
}
