package graft

/** Collision-free path component for a free-form string (corpus dir,
  * namespace). Sanitizing alone (`replaceAll("[^A-Za-z0-9._-]", "_")`)
  * is AMBIGUOUS — `/a/b` and `_a_b`, or two namespaces differing only
  * in punctuation, map to one component, and a collision conflates two
  * corpora's (or namespaces') persisted layouts under one root — so the
  * readable sanitized form is suffixed with a content hash (the
  * `plans.IndexedTopK` registry discipline, now shared). */
object PathToken {
  def token(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + sha1Hex(s).take(8)

  private def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
