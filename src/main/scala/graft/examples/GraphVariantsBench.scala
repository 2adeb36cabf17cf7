package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** r21 measurement lab for the q126 PageRank rework (VERDICT r20 "Next
  * round" #1: the r20 union-aggregate form measured 0.76× vs its own
  * pre-opt baseline; fix or revert WITH numbers). Runs each candidate
  * round-loop form N times over the same sf dir and prints per-variant
  * medians plus job counts — the adjudication instrument for choosing
  * the shipped form. Variants share the edge build verbatim, and every
  * variant's 20-row result is asserted identical to the shipped q126's,
  * so the lab cannot elect a semantics change.
  */
object GraphVariantsBench {

  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val cs = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().persist()
    cs.select(col("c").as("src"), (-col("s") - 1).as("dst"))
      .union(cs.select((-col("s") - 1).as("src"), col("c").as("dst")))
  }

  private val Rounds = 3
  private val TopN = 20

  /** r20 union-aggregate form (shipped; the regression under test). */
  private def vUnion(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    val adj = edges.join(broadcast(outdeg), "src")
      .join(broadcast(nodes.withColumnRenamed("node", "dst")),
        Seq("dst"), "left_semi")
      .persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    var pinned: DataFrame = null
    for (_ <- 1 to Rounds) {
      val next = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .unionByName(nodes.select(col("node"), lit(150000L).as("contrib")))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("pr"))
        .persist()
      next.count()
      if (pinned != null) pinned.unpersist(blocking = false)
      pinned = next
      ranks = next
    }
    adj.unpersist(blocking = false)
    val out = ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
    if (pinned != null) pinned.unpersist(blocking = false)
    out
  }

  /** r19 left-join form (the revert candidate). */
  private def vJoin(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    val adj = edges.join(broadcast(outdeg), "src").persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    var pinned: DataFrame = null
    for (_ <- 1 to Rounds) {
      val inMass = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
      val next = nodes.join(inMass, nodes("node") === inMass("dst"), "left")
        .select(nodes("node"),
          (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("pr"))
        .persist()
      next.count()
      if (pinned != null) pinned.unpersist(blocking = false)
      pinned = next
      ranks = next
    }
    adj.unpersist(blocking = false)
    val out = ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
    if (pinned != null) pinned.unpersist(blocking = false)
    out
  }

  /** Lazy chain: r19 join form with NO per-round persist/count — the
    * three rounds stay one logical plan; each round's broadcast build
    * executes the prior round's (adj-cached) subplan as a driver job,
    * and there is no per-round CacheManager traffic at all. */
  private def vLazy(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    val adj = edges.join(broadcast(outdeg), "src").persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to Rounds) {
      val inMass = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
      ranks = nodes.join(inMass, nodes("node") === inMass("dst"), "left")
        .select(nodes("node"),
          (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("pr"))
    }
    ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
  }

  /** Lazy union form: the r20 one-aggregate round with NO per-round
    * persist/count (sink prune kept — required for union semantics). */
  private def vLazyUnion(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    val adj = edges.join(broadcast(outdeg), "src")
      .join(broadcast(nodes.withColumnRenamed("node", "dst")),
        Seq("dst"), "left_semi")
      .persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to Rounds) {
      ranks = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .unionByName(nodes.select(col("node"), lit(150000L).as("contrib")))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("pr"))
    }
    ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
  }

  /** Direct bipartite adj build: per-side degree aggregates over the
    * 587k-row distinct pair set instead of one aggregate over the 2.34M
    * doubled union, and no left_semi prune (every node of the symmetric
    * build provably has out-edges). Rounds stay the lazy union chain. */
  private def vDirectAdj(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val cs = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().persist()
    val degC = cs.groupBy(col("c")).agg(count(lit(1)).as("outdeg"))
    val degS = cs.groupBy(col("s")).agg(count(lit(1)).as("outdeg"))
    val outdeg = degC.select(col("c").as("src"), col("outdeg"))
      .union(degS.select((-col("s") - 1).as("src"), col("outdeg")))
    val nodes = outdeg.select(col("src").as("node"))
    val adj = cs.join(broadcast(degC), "c")
      .select(col("c").as("src"), (-col("s") - 1).as("dst"), col("outdeg"))
      .union(cs.join(broadcast(degS), "s")
        .select((-col("s") - 1).as("src"), col("c").as("dst"), col("outdeg")))
      .persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to Rounds) {
      ranks = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .unionByName(nodes.select(col("node"), lit(150000L).as("contrib")))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("pr"))
    }
    ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
  }

  /** lazy_union over an adj pinned at 8 partitions — fewer tasks per
    * round stage on the node-sized loop. */
  private def vLazyUnionC8(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    val adj = edges.join(broadcast(outdeg), "src")
      .join(broadcast(nodes.withColumnRenamed("node", "dst")),
        Seq("dst"), "left_semi")
      .coalesce(8)
      .persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to Rounds) {
      ranks = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .unionByName(nodes.select(col("node"), lit(150000L).as("contrib")))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("pr"))
    }
    ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
  }

  private def finish(pr: DataFrame): DataFrame =
    pr.select(
      when(col("node") >= 0, concat(lit("c"), col("node")))
        .otherwise(concat(lit("s"), -col("node") - 1)).as("node"),
      col("pr"), col("outdeg"))
      .orderBy(col("pr").desc, col("node")).limit(TopN)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val samples = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-graph-lab")
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    spark.range(1000).selectExpr("sum(id)").collect()

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "lazy_union" -> (() => vLazyUnion(edges(spark, sfDir))),
      "lazy_union_c8" -> (() => vLazyUnionC8(edges(spark, sfDir))),
      "direct_adj" -> (() => vDirectAdj(spark, sfDir)))

    var golden: Seq[String] = null
    def persistedIds(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    variants.foreach { case (name, fn) =>
      val pre = persistedIds()
      // correctness gate before timing: every variant must equal q126
      val rows = finish(fn()).collect().map(_.toString).toSeq
      if (golden == null) golden = rows
      require(rows == golden, s"$name diverged from the shipped q126 result")
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pre.contains(id)) rdd.unpersist(blocking = false)
      }
      val times = (1 to samples).map { _ =>
        val p0 = persistedIds()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        finish(fn())
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val jD = jobs.get() - j0
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!p0.contains(id)) rdd.unpersist(blocking = false)
        }
        (dt, jD)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      println(f"GRAPHLAB $name%-14s median=${med}%.3fs samples=${times.map(t => f"${t._1}%.3f").mkString(",")} jobs=${times.map(_._2).mkString(",")}")
    }
    spark.stop()
  }
}
