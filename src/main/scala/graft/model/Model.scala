package graft.model

/** Core data model (SURVEY §1): the reference's only abstraction is a
  * namespaced vector record `(id: UUID, values: float32[], metadata)`
  * (`implementations/vector.py:10-42`). Metadata is kept two ways, per the
  * SURVEY §1.4 mapping: `metadata` is the flat string map of top-level
  * scalar keys (filterable with a plain column predicate), `metadataJson`
  * is the full original document — nested dicts, lists, ints, None — as a
  * JSON string (the reference round-trips arbitrary nesting,
  * `tests/test_storage_engine_in_memory.py:202-218`; here it filters via
  * `get_json_object` and round-trips verbatim).
  */
final case class VectorRecord(
    id: String,
    namespace: String,
    values: Array[Float],
    metadata: Map[String, String],
    metadataJson: String = "{}") {

  /** Vector equality = id AND values AND metadata
    * (`implementations/vector.py:35-42`) — Array needs structural compare. */
  override def equals(other: Any): Boolean = other match {
    case o: VectorRecord =>
      id == o.id && namespace == o.namespace &&
        java.util.Arrays.equals(values, o.values) && metadata == o.metadata &&
        metadataJson == o.metadataJson
    case _ => false
  }
  override def hashCode(): Int =
    (id, namespace, values.toSeq, metadata, metadataJson).hashCode()
}

/** Search result enriched with the stored record
  * (`query_processor.py:43-48`: `{id, values, metadata, score}`). */
final case class SearchHit(
    id: String,
    score: Double,
    values: Array[Float],
    metadata: Map[String, String],
    metadataJson: String = "{}")

/** Storage introspection report
  * (`storage_engine_in_memory.py:61-69` / REST `rest_api.py:278-291`). */
final case class StorageInfo(
    storageType: String,
    totalVectors: Long,
    namespaces: Map[String, Long],
    estBytes: Long)

/** Plan-time disclosure of the branch a search WOULD take — the
  * reference's documented-but-unimplemented `POST /query/explain`
  * (`README.md:332,481-487`; its QueryProcessor protocol lists
  * `explain_query`, `README.md:317`; `examples/api_client.py:76-81`
  * already calls it). Produced WITHOUT executing the search: the
  * stores' explainSearch peeks their layout/starvation caches and
  * plans (never runs) the authoritative scan, so explaining a query
  * costs no Spark job. `branch` ∈ exact | exact-asof | indexed-probe |
  * starved-skip-exact; `notes` carries the caveats that keep the
  * disclosure honest (cold caches, staleness election at search time). */
final case class SearchExplain(
    mount: String,
    branch: String,
    index: Option[String],
    metric: String,
    k: Int,
    filtered: Boolean,
    asOf: Option[Long],
    layoutCached: Boolean,
    layoutBuiltSeq: Option[Long],
    probedCells: Seq[Int],
    starvedSkip: Boolean,
    plan: String,
    notes: Seq[String])
