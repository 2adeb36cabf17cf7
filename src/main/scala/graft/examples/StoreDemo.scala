package graft.examples


import graft.store.VectorStore

/** End-to-end walkthrough of the serving facade — the reference's REST
  * example client (`examples/api_client.py`) replayed against the Spark
  * engine's public API. Run: `sbt 'runMain graft.examples.StoreDemo'`. */
object StoreDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "graft-store-demo")

    val store = new VectorStore(spark)

    // batch upsert into two namespaces
    val ids = store.upsertMany(Seq(
      (Seq(1f, 0f, 0f), Map("label" -> "x-axis", "active" -> "true")),
      (Seq(0f, 1f, 0f), Map("label" -> "y-axis", "active" -> "true")),
      (Seq(0.9f, 0.1f, 0f), Map("label" -> "near-x", "active" -> "false"))),
      namespace = "demo")
    store.insert(Seq(5f, 5f, 5f), Map("label" -> "other"), "other_ns")
    println(s"[demo] inserted ${ids.length}+1 vectors; namespaces=${store.listNamespaces()}")

    // top-k cosine search
    val hits = store.findSimilar(Seq(1f, 0.05f, 0f), k = 2, namespace = "demo")
    println("[demo] top-2 cosine: " + hits.map(h => f"${h.metadata("label")}%s@${h.score}%.4f").mkString(", "))

    // hybrid: metadata filter ∧ knn
    val hybrid = store.findSimilar(Seq(1f, 0f, 0f), k = 5, namespace = "demo",
      filter = Map("active" -> "true"))
    println("[demo] hybrid(active=true): " + hybrid.map(_.metadata("label")).mkString(", "))

    // range + threshold
    val near = store.rangeSearch(Seq(1f, 0f, 0f), r = 0.05, metric = "l2", namespace = "demo")
    println("[demo] range(l2<=0.05): " + near.map(_.metadata("label")).mkString(", "))

    // delete + visibility
    val deleted = store.delete(Seq(ids.head, "ghost-id"), "demo")
    println(s"[demo] delete reported ${deleted.length} of 2 requested")
    val after = store.findSimilar(Seq(1f, 0.05f, 0f), k = 5, namespace = "demo")
    println("[demo] post-delete results: " + after.map(_.metadata("label")).mkString(", "))

    // error paths: bad metric, k out of the reference's [1,1000] bounds
    for ((label, op) <- Seq(
      "bad metric" -> (() => store.findSimilar(Seq(1f, 0f, 0f), metric = "chebyshev", namespace = "demo")),
      "k=0" -> (() => store.findSimilar(Seq(1f, 0f, 0f), k = 0, namespace = "demo")),
      "k=5000" -> (() => store.findSimilar(Seq(1f, 0f, 0f), k = 5000, namespace = "demo")))) {
      try { op(); println(s"[demo] $label: UNEXPECTEDLY SUCCEEDED") }
      catch { case e: IllegalArgumentException => println(s"[demo] $label -> ${e.getMessage}") }
    }

    val info = store.info()
    println(s"[demo] info: total=${info.totalVectors} namespaces=${info.namespaces} bytes=${info.estBytes}")

    // explain: the documented-but-unimplemented reference surface, made real
    val explain = store.explainSearch(Seq(1f, 0f, 0f), k = 2, namespace = "demo")
    println(s"[demo] explain: branch=${explain.branch} (first 2 plan lines): " +
      explain.plan.linesIterator.filter(_.nonEmpty).take(2).mkString(" | "))

    // durable form: persist the embeddings corpus partitioned by namespace,
    // read it back with a namespace predicate (pruned to one partition dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_store").toString
    graft.sources.VectorParquet.write(
      graft.sources.Tables.vectors(spark, "/root/testdata/sf0.001"), tmp)
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName).sorted
    println(s"[demo] durable layout: ${dirs.mkString(", ")}")
    val pruned = graft.sources.VectorParquet.read(spark, tmp)
      .where(org.apache.spark.sql.functions.col("namespace") === "ns_2")
    println(s"[demo] pruned read ns_2: ${pruned.count()} rows; plan prunes: " +
      pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(namespace"))
    spark.stop()
  }
}
