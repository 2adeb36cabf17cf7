package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (dedup, language ID,
  * quality scoring, fingerprinting) — all pure Catalyst built-ins so they
  * stay inside whole-stage codegen and scale linearly with no UDF overhead.
  *
  * Hash convention shared with the DuckDB oracles: a token/shingle hashes to
  * the first 8 (32-bit) or 15 (60-bit) hex digits of its md5, parsed as an
  * integer — identical on both engines, so signatures are hash-stable.
  */
object TextFunctions {

  /** Whitespace-collapsed, lowercased canonical text. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Lowercased word tokens — semantics of
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`, executed by the
    * single-pass [[Tokenize]] expression (the regex scan dominated every
    * text query; TextFunctionsSpec pins byte-equivalence). */
  def tokens(c: Column): Column = Tokenize(c)

  /** The regex form tokens() is specified against. */
  def tokensRegex(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Distinct word n-gram shingles of a token array. Guards short docs
    * (fewer than n tokens → empty set, never a negative `sequence`). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Composite document-quality score (the q21 contract, reused verbatim
    * by q42's training-set gate): 0.4·min(1, n_tok/100) +
    * 0.3·(1 − stop_ratio) + 0.3·min(1, avg_tok_len/8). One definition on
    * each engine so the two queries can never drift apart. */
  def qualityScore(nTok: Column, stopRatio: Column, avgLen: Column): Column =
    lit(0.4) * least(lit(1.0), nTok.cast("double") / 100.0) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(lit(1.0), avgLen / 8.0)

  /** DuckDB text of [[qualityScore]] over the given SQL expressions. */
  def qualityScoreSql(nTok: String, stopRatio: String, avgLen: String): String =
    s"0.4 * least(1.0, $nTok / 100.0)" +
      s" + 0.3 * (1.0 - $stopRatio)" +
      s" + 0.3 * least(1.0, $avgLen / 8.0)"

  /** 32-bit token hash: first 8 md5 hex digits as a long in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit token hash: first 15 md5 hex digits as a non-negative long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash permutation family: h_i(x) = (a_i·x + b_i) mod p with p prime
    * > 2^32 and a,b < 2^31 (no 64-bit overflow: a·x < 2^63).
    * Deterministic seed → stable signatures across runs/executors. */
  val MinhashP: Long = 4294967311L

  def minhashParams(numPerm: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPerm)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
                       rnd.nextInt(Int.MaxValue).toLong))
  }

  /** One minhash slot: min over the doc's shingle-hash column (used under
    * groupBy(doc) agg). */
  def minhashSlot(h32: Column, a: Long, b: Long): Column =
    min((lit(a) * h32 + lit(b)) % lit(MinhashP))
}
