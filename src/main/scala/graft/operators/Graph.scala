package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over relations the star schema implies — here the
  * customer–supplier interaction graph (who bought from whom, via
  * lineitem ⋈ orders). The dedup family already runs connected
  * components (`Dedup.q64`); this adds the other canonical iterative
  * graph kernel, PageRank, as authority scoring over the trade graph.
  *
  * INTEGER-EXACT iteration: ranks are integer micro-units (r₀ = 10⁶ per
  * node) and every per-edge contribution is `((rank · 17) div 20) div
  * outdeg` — integer floor-division at each step, so per-round sums are
  * order-independent and the cross-engine replay is byte-exact with NO
  * float-summation-order risk (the residual-risk class documented for
  * the r6-quantized float loops, SCALING.md, simply does not arise).
  * The damping formulation is per-node teleport: r′(v) = 0.15·r₀ +
  * 0.85·Σ_{u→v} r(u)/outdeg(u), i.e. classic PageRank scaled by N.
  *
  * 100 TB shape: the edge list (with outdeg attached) is built once,
  * hash-partitioned by src, and checkpointed; each round is one
  * edge-scan join against the node-keyed rank frame plus one dst-keyed
  * aggregate — rounds × (join + agg), zero driver traffic (no collect
  * anywhere; the final top-20 cut is a TakeOrderedAndProject). This is
  * the standard distributed PageRank data layout (edges partitioned by
  * source, ranks re-keyed per round).
  */
object Graph {

  private val PrRounds = 3
  private val PrTopN = 20

  /** Symmetric customer↔supplier edge list (distinct trade pairs).
    * Nodes are INTEGER-encoded until the final cut (customer k → k ≥ 0,
    * supplier k → −(k+1) < 0 — the +1 keeps supplier 0 off customer
    * 0's id): the distinct/join/aggregate loop runs on 8-byte keys, not
    * strings — the string form exists only on the 20 output rows. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    // materialized once: the degree pass and the adjacency build both
    // consume it from separate jobs (no cross-job exchange reuse).
    // persist, not localCheckpoint: the pin is reclaimable by the bench
    // hygiene sweep and keeps lineage (the r12 checkpoint-debt fix)
    val cs = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().persist()
    cs.select(col("c").as("src"), (-col("s") - 1).as("dst"))
      .union(cs.select((-col("s") - 1).as("src"), col("c").as("dst")))
  }

  // ---- Q126: PageRank over the customer–supplier graph ----------------

  /** Integer-exact PageRank over a directed (src, dst) edge frame:
    * returns (node, pr, outdeg) for every node with out-edges — including
    * source-only nodes, which keep their teleport mass every round (the
    * r12 form rebuilt ranks from groupBy(dst), so a node with no
    * in-edges vanished after round 1 and its later out-contributions
    * were silently dropped: edges {a→b} returned an EMPTY frame). Each
    * round left-joins the in-mass against the stable node set instead.
    * Library surface; q126 runs it on the trade graph. */
  def pagerank(edges: DataFrame, rounds: Int): DataFrame = {
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).persist()
    val nodes = outdeg.select(col("src").as("node"))
    // One materialization of the degree-annotated edge list; every round
    // re-scans it. The per-round rank frame is NODE-sized (≪ edges), so
    // it rides the broadcast side of the join and the edge frame never
    // shuffles for the join; the dst aggregate partial-combines to
    // node-sized partitions before its shuffle. (At billion-node scale
    // the same loop works with the broadcast dropped: pre-partition adj
    // by src and let the rank frame shuffle — AQE picks per size.)
    // Loop pins are persist + explicit free of the superseded round
    // (r12 left one never-unpersisted localCheckpoint per round).
    //
    // Edges into SINK-ONLY nodes (dst with no out-edges) are dropped at
    // build (r20): the result is keyed by the out-degree node set, so
    // their in-mass was computed and then discarded by the old per-round
    // left join — pruning them once here lets every round run as ONE
    // aggregation with zero joins after the broadcast (guide §2.4:
    // remove the per-round exchange+join outright). On q126's symmetric
    // trade graph the semi-join drops nothing.
    // The adj pin inherits the union's partition count (2 × the distinct
    // exchange = 64 here), and AQE cannot re-coalesce a cached plan — so
    // every round stage ran 64 near-empty tasks. Coalesce the pin to the
    // conf'd count (r21; default cores/4, floor 2 — measured 2.57 →
    // 2.06 s on q126): the rounds join adj by BROADCAST, so its
    // partition count only sets per-round task count, never join
    // parallelism. A production caller sizes it to adjacency bytes /
    // target-partition-size via spark.graft.graph.adjPartitions, the
    // same sizing it applies to spark.sql.shuffle.partitions.
    val spark = edges.sparkSession
    val adjParts = spark.conf.getOption("spark.graft.graph.adjPartitions")
      .map(_.toInt)
      .getOrElse(math.max(spark.sparkContext.defaultParallelism / 4, 2))
    val adj = edges.join(broadcast(outdeg), "src")
      .join(broadcast(nodes.withColumnRenamed("node", "dst")),
        Seq("dst"), "left_semi")
      .coalesce(adjParts)
      .persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("pr"))
    var pinned: DataFrame = null
    for (r <- 1 to rounds) {
      // r′(v) = 0.15·r₀ + 0.85·Σ in-contrib, computed as one union +
      // one integer-sum aggregate: the teleport term rides in as one
      // row per node, so source-only nodes keep their mass WITHOUT the
      // old nodes-LEFT-JOIN-inMass round-trip (r20; integer sums are
      // order-independent, so the regrouping is byte-exact)
      ranks = adj.join(broadcast(ranks), adj("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("((pr * 17) div 20) div outdeg").as("contrib"))
        .unionByName(nodes.select(col("node"), lit(150000L).as("contrib")))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("pr"))
      // NO per-round materialization (r21 — VERDICT r20 #1, measured by
      // GraphVariantsBench over 5 samples each on sf0.1: the r20 form's
      // per-round persist + count + broadcast-of-persisted ran 38 jobs
      // at a 7.46 s median where this lazy chain runs 10 jobs at 3.33 s
      // — the r19 join form sat between, 36 jobs / 7.13 s, so the r20
      // regression's mechanism was the round-boundary materialization
      // traffic, not the union shape). The rounds stay ONE logical plan:
      // each round's broadcast build executes the prior round's subplan
      // (adj scans ride the cache pin) as a driver job — rounds + 1
      // jobs total instead of ~3 per round. Deep chains would stack
      // planning cost, so long loops checkpoint every MatEvery rounds
      // (a no-op for q126's 3); at billion-node scale the same loop
      // drops the broadcast and lets the node-sized rank frame shuffle.
      if (r % MatEvery == 0 && r < rounds) {
        val mat = ranks.persist()
        mat.count()
        if (pinned != null) pinned.unpersist(blocking = false)
        pinned = mat
        ranks = mat
      }
    }
    adj.unpersist(blocking = false)
    // a still-live round pin (rounds > MatEvery) stays pinned — the
    // returned plan reads it; external cache hygiene reclaims it (the
    // r12 convention: only SUPERSEDED round pins are freed here)
    ranks.join(broadcast(outdeg), ranks("node") === outdeg("src"))
      .select(col("node"), col("pr"), col("outdeg"))
  }

  /** Lazy-chain materialization stride for long pagerank loops — plan
    * depth is bounded to this many rounds between checkpoints. */
  private val MatEvery = 8

  def q126(spark: SparkSession, dir: String): DataFrame =
    pagerank(edges(spark, dir), PrRounds)
      .select(
        when(col("node") >= 0, concat(lit("c"), col("node")))
          .otherwise(concat(lit("s"), -col("node") - 1)).as("node"),
        col("pr"), col("outdeg"))
      .orderBy(col("pr").desc, col("node")).limit(PrTopN)

  val q126Sql: String = {
    // each round: in-mass grouped by dst, LEFT-joined back to the node
    // set so source-only nodes keep their teleport term (the engine's
    // coalesce(in_mass, 0) round; identical on q126's symmetric graph)
    val rounds = (1 to PrRounds).map { r =>
      s"""c$r AS (
         |  SELECT e.dst AS node,
         |         sum(((r.pr * 17) // 20) // e.outdeg)::BIGINT AS m
         |  FROM e JOIN r${r - 1} r ON e.src = r.node
         |  GROUP BY 1),
         |r$r AS (
         |  SELECT n.node, (150000 + coalesce(c.m, 0))::BIGINT AS pr
         |  FROM nodes n LEFT JOIN c$r c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |ed AS (
       |  SELECT c AS src, s AS dst FROM cs
       |  UNION ALL SELECT s AS src, c AS dst FROM cs),
       |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM ed GROUP BY 1),
       |nodes AS (SELECT src AS node FROM od),
       |e AS (SELECT ed.src, ed.dst, od.outdeg FROM ed JOIN od USING (src)),
       |r0 AS (SELECT src AS node, 1000000::BIGINT AS pr FROM od),
       |$rounds
       |SELECT r.node, r.pr, od.outdeg
       |FROM r$PrRounds r JOIN od ON r.node = od.src
       |ORDER BY r.pr DESC, r.node LIMIT $PrTopN""".stripMargin
  }

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_pagerank" -> (q126 _))

  val oracles: Map[String, String] = Map(
    "q126_pagerank" -> q126Sql)
}
