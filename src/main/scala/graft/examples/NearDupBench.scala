package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Stage/shape timing for the exact near-dup path (q15's below-gate
  * branch): where do 2M broadcast-theta-join pairs actually spend time?
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *   sbt 'runMain graft.examples.NearDupBench'`
  */
object NearDupBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-neardup-bench")
    val t = 0.35

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[neardupbench] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val v = Tables.vectors(spark, dir).select(col("id"), col("values"))
      .localCheckpoint(eager = true)
    println(s"[neardupbench] corpus rows: ${v.count()}")

    (1 to 2).foreach { pass =>
      println(s"[neardupbench] --- pass $pass ---")
      // A: current shape — hoisted norms, broadcast theta join
      time("A broadcast theta join, hoisted norms") {
        val a = v.select(col("id").as("id_a"), col("values").as("va"))
          .withColumn("norm_a", l2norm(col("va")))
        val b = v.select(col("id").as("id_b"), col("values").as("vb"))
          .withColumn("norm_b", l2norm(col("vb")))
        val den = col("norm_a") * col("norm_b")
        val cos = when(den === 0.0, 0.0).otherwise(dot(col("va"), col("vb")) / den)
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("score", round(cos, 4))
          .where(col("score") >= t)
          .select(col("id_a"), col("id_b"), col("score"))
          .write.format("noop").mode("overwrite").save()
      }
      // B: fused cos kernel inside the same join (no hoisting)
      time("B broadcast theta join, fused cos") {
        val a = v.select(col("id").as("id_a"), col("values").as("va"))
        val b = v.select(col("id").as("id_b"), col("values").as("vb"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("score", round(cosineSim(col("va"), col("vb")), 4))
          .where(col("score") >= t)
          .select(col("id_a"), col("id_b"), col("score"))
          .write.format("noop").mode("overwrite").save()
      }
      // C: join first on ids only, fetch vectors by id after the filter?
      // (not expressible without scoring first). Instead: narrow-side
      // projection — join carries (id, values) but scores BEFORE any
      // other columns exist (minimal row width either way at 2 cols).
      // E: the shipped shape — corpus matrix inside one codegen
      // expression, single scan (see functions/CosNeighbors)
      time("E CosNeighbors kernel, single scan") {
        val rows = v.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
        v.select(col("id").as("id_a"),
            explode(graft.functions.CosNeighbors(col("id"), col("values"),
              rows.map(_._1), rows.map(_._2), t)).as("p"))
          .select(col("id_a"), col("p.id_b").as("id_b"),
            round(col("p.score"), 4).as("score"))
          .where(col("score") >= t)
          .write.format("noop").mode("overwrite").save()
      }
      // D: pure scan cost reference — score every row against ONE vector
      time("D reference: 1-vs-all scan (2000 rows)") {
        val q = v.limit(1).select(col("values")).collect()(0).getSeq[Float](0)
        val qv = array(q.map(x => lit(x)): _*).cast("array<float>")
        v.withColumn("score", round(cosineSim(col("values"), qv), 4))
          .where(col("score") >= t)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
