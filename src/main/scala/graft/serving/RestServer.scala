package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.store.VectorStore

/** Route-for-route HTTP facade over [[VectorStore]] — the reference's REST
  * surface (`/root/reference/src/mlvectordb/api/rest_api.py:96-311`)
  * reimplemented on the JDK's built-in HttpServer + the Jackson shipped on
  * Spark's classpath (zero new dependencies).
  *
  * Routes (reference line cites):
  *  - `POST /vectors?namespace=`        insert one (rest_api.py:96-124)
  *  - `PUT  /vectors/batch?namespace=`  batch upsert (:126-161)
  *  - `POST /search?namespace=`         top-k search (:163-203)
  *  - `DELETE /vectors?namespace=`      delete ids (:205-246; empty list → 400 like :216-221)
  *  - `GET  /namespaces`                list + counts (:248-261)
  *  - `GET  /namespaces/{ns}/vectors`   namespace dump (:263-276)
  *  - `GET  /storage/info`              storage report (:278-291)
  *  - `GET  /health`                    liveness (:292-297)
  *  - `POST /log-level`                 set Spark log level (:298-311)
  *
  * Validation mirrors the reference: `top_k ∈ [1,1000]` (Pydantic bound at
  * rest_api.py:24) → 422; malformed JSON → 400. Not correctness-bearing
  * for the driver gates (SURVEY §7 step 6) but completes "a user of the
  * reference could switch".
  */
class RestServer(store: VectorStore, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  // ---- helpers --------------------------------------------------------

  private def respond(ex: HttpExchange, code: Int, body: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def error(ex: HttpExchange, code: Int, msg: String): Unit = {
    val o = mapper.createObjectNode()
    o.put("detail", msg)
    respond(ex, code, o)
  }

  private def queryParam(ex: HttpExchange, key: String, default: String): String = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").iterator.map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == key => v }
      .getOrElse(default)
  }

  private def readJson(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  /** Fetch a required field or fail with the 422 path (mirrors Pydantic's
    * field-required validation, rest_api.py models) — a bare `get` would
    * NPE into a 500. */
  private def required(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    if (v == null || v.isNull)
      throw new IllegalArgumentException(s"field '$field' is required")
    v
  }

  private def floats(n: JsonNode): Seq[Float] =
    n.elements().asScala.map(_.floatValue()).toSeq

  private def metadataOf(n: JsonNode): Map[String, String] =
    Option(n.get("metadata")).filter(_.isObject).map { m =>
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)

  private def hitJson(h: graft.model.SearchHit): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", h.id)
    o.put("score", h.score)
    val vs = o.putArray("values")
    h.values.foreach(vs.add)
    val md = o.putObject("metadata")
    h.metadata.foreach { case (k, v) => md.put(k, v) }
    o
  }

  private def handle(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        error(ex, 400, s"malformed JSON: ${e.getOriginalMessage}")
      case e: IllegalArgumentException => error(ex, 422, e.getMessage)
      case NonFatal(e) => error(ex, 500, String.valueOf(e))
    }

  // ---- routes ---------------------------------------------------------

  server.createContext("/vectors/batch", ex => handle(ex) {
    ex.getRequestMethod match {
      case "PUT" =>
        val ns = queryParam(ex, "namespace", "default")
        val vs = required(readJson(ex), "vectors").elements().asScala.toSeq
          .map(v => (floats(required(v, "values")), metadataOf(v)))
        val ids = store.upsertMany(vs, ns)
        val o = mapper.createObjectNode()
        val arr = o.putArray("ids")
        ids.foreach(arr.add)
        o.put("count", ids.length)
        respond(ex, 200, o)
      case m => error(ex, 405, s"method $m not allowed")
    }
  })

  server.createContext("/vectors", ex => handle(ex) {
    val ns = queryParam(ex, "namespace", "default")
    ex.getRequestMethod match {
      case "POST" =>
        val body = readJson(ex)
        val id = store.insert(floats(required(body, "values")), metadataOf(body), ns)
        val o = mapper.createObjectNode()
        o.put("id", id)
        o.put("namespace", ns)
        respond(ex, 200, o)
      case "DELETE" =>
        val ids = required(readJson(ex), "ids").elements().asScala.map(_.asText()).toSeq
        if (ids.isEmpty) error(ex, 400, "ids must be non-empty") // rest_api.py:216-221
        else {
          val deleted = store.delete(ids, ns)
          val o = mapper.createObjectNode()
          val arr = o.putArray("deleted")
          deleted.foreach(arr.add)
          o.put("success", deleted.nonEmpty) // rest_api.py:231-234
          respond(ex, 200, o)
        }
      case m => error(ex, 405, s"method $m not allowed")
    }
  })

  server.createContext("/search", ex => handle(ex) {
    ex.getRequestMethod match {
      case "POST" =>
        val ns = queryParam(ex, "namespace", "default")
        val body = readJson(ex)
        val k = Option(body.get("top_k")).map(_.asInt()).getOrElse(10)
        val metric = Option(body.get("metric")).map(_.asText()).getOrElse("cosine")
        val hits = store.findSimilar(floats(required(body, "query")), k, metric, ns)
        val o = mapper.createObjectNode()
        val arr = o.putArray("results")
        hits.foreach(h => arr.add(hitJson(h)))
        respond(ex, 200, o)
      case m => error(ex, 405, s"method $m not allowed")
    }
  })

  server.createContext("/namespaces", ex => handle(ex) {
    val path = ex.getRequestURI.getPath
    if (path == "/namespaces" || path == "/namespaces/") {
      val o = mapper.createObjectNode()
      val counts = o.putObject("namespaces")
      // one groupBy job via info(), not listNamespaces + N counts
      store.info().namespaces.toSeq.sortBy(_._1)
        .foreach { case (ns, n) => counts.put(ns, n) }
      respond(ex, 200, o)
    } else path.split("/").toList match {
      case _ :: "namespaces" :: ns :: "vectors" :: Nil =>
        val o = mapper.createObjectNode()
        val arr: ArrayNode = o.putArray("vectors")
        store.dumpNamespace(ns).foreach { r =>
          val v = mapper.createObjectNode()
          v.put("id", r.id)
          val vs = v.putArray("values")
          r.values.foreach(vs.add)
          val md = v.putObject("metadata")
          r.metadata.foreach { case (key, value) => md.put(key, value) }
          arr.add(v)
        }
        respond(ex, 200, o)
      case _ => error(ex, 404, s"no route for $path")
    }
  })

  server.createContext("/storage/info", ex => handle(ex) {
    val info = store.info()
    val o = mapper.createObjectNode()
    o.put("storage_type", info.storageType)
    o.put("total_vectors", info.totalVectors)
    o.put("est_bytes", info.estBytes)
    val counts = o.putObject("namespaces")
    info.namespaces.foreach { case (ns, n) => counts.put(ns, n) }
    respond(ex, 200, o)
  })

  server.createContext("/health", ex => handle(ex) {
    val o = mapper.createObjectNode()
    o.put("status", "ok")
    o.put("total_vectors", store.totalCount())
    respond(ex, 200, o)
  })

  server.createContext("/log-level", ex => handle(ex) {
    val level = required(readJson(ex), "level").asText()
    store.spark.sparkContext.setLogLevel(level.toUpperCase)
    val o = mapper.createObjectNode()
    o.put("level", level.toUpperCase)
    respond(ex, 200, o)
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
}
