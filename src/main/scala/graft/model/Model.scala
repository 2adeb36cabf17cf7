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
