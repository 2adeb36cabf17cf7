package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.{VectorDistance, VectorFunctions}
import graft.sources.Tables

/** Micro-benchmark: composed (`zip_with`+`aggregate`) vs codegen
  * (`VectorDistance`) kernels on the sf0.1 all-pairs cosine workload
  * (2k × 2k ÷ 2 ≈ 2M pairs × 64 dims), plus a bit-identity check.
  * Run: `sbt 'runMain graft.examples.KernelBench [sfDir]'`. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8, "graft-kernel-bench")

    val e = Tables.table(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(broadcast(e.select(col("vec_id").as("ib"), col("embedding").as("vb"))),
        col("ia") < col("ib"))
      .localCheckpoint(true) // materialize once so only the kernel is timed

    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      body
      println(f"[kernel] $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    time("composed") {
      pairs.select(sum(VectorFunctions.cosineSimComposed(col("va"), col("vb")))).collect()
    }
    time("codegen") {
      pairs.select(sum(VectorDistance.cosineSim(col("va"), col("vb")))).collect()
    }
    val maxDiff = pairs.select(max(abs(
      VectorFunctions.cosineSimComposed(col("va"), col("vb")) -
        VectorDistance.cosineSim(col("va"), col("vb"))))).head().getDouble(0)
    println(s"[kernel] max |composed - codegen| = $maxDiff")
    spark.stop()
  }
}
