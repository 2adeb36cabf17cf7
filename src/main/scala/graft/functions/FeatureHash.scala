package graft.functions

/** Driver-side feature-hash embedding kernel — the SAME semantics as the
  * distributed q129 operator (`TextAnalysis.q129`: unigram+bigram
  * features, md5 bucket + sign, 64 dims), reimplemented over
  * java.security so a serving request embeds ONE text without a Spark
  * job. TextAnalysisSpec pins byte-parity between this kernel and the
  * distributed form; the REST `/embed` route serves it.
  */
object FeatureHash {

  val Dims = 64

  private val TokenRe = "[a-z0-9]+".r

  def tokens(text: String): Seq[String] =
    TokenRe.findAllIn(text.toLowerCase).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Dense signed-count embedding; all-zero for token-free text.
    * Accumulates in Long (exact at any input size — float increments
    * silently lose exactness past 2^24 per-dim counts; r12 ADVICE) and
    * converts at the serialization boundary, matching the Long-based
    * distributed kernel ([[FeatureHashVec]]). */
  def embed(text: String): Array[Float] = counts(text).map(_.toFloat)

  /** The raw Long per-dim counts (the [[FeatureHashVec]] element type) —
    * the quality scorer's driver kernel consumes these so its long →
    * double cast matches the distributed frame bit-for-bit. */
  def counts(text: String): Array[Long] = {
    val toks = tokens(text)
    val feats = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
    val v = new Array[Long](Dims)
    feats.foreach { f =>
      val h = md5hex("fh_" + f)
      val dim = (java.lang.Long.parseLong(h.take(8), 16) % Dims).toInt
      val sgn = if (Integer.parseInt(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
      v(dim) += sgn
    }
    v
  }
}
