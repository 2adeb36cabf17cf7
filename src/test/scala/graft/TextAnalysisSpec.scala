package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Semantic invariants of the text-pipeline operators that the oracle
  * hash-compare can't see (it replays the same formula; these check the
  * formula MEANS what it claims). */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q115 DSIR weights separate the target domain from the rest") {
    val rows = TextAnalysis.q115(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val corpus = graft.sources.Tables.table(spark, dir, "documents").count()
    assert(rows.length == corpus, "one weight per document")
    rows.foreach { case (id, _, nTok, w, keep) =>
      assert(nTok > 0, s"doc $id scored over zero tokens")
      assert(keep == (w >= TextAnalysis.DsirKeepFloor),
        s"doc $id: keep flag diverges from the rounded-score comparison")
    }
    // importance weighting must rank the target domain above the rest on
    // average — that is the operator's entire purpose
    val (en, rest) = rows.partition(_._2 == TextAnalysis.DsirTarget)
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._4).sum / en.length
    val restMean = rest.map(_._4).sum / rest.length
    assert(enMean > restMean,
      f"target mean $enMean%.5f not above non-target mean $restMean%.5f")
    // and the kept set must be enriched in the target domain
    val keptEnRate = en.count(_._5).toDouble / en.length
    val keptRestRate = rest.count(_._5).toDouble / rest.length
    assert(keptEnRate > keptRestRate,
      f"keep rate (target) $keptEnRate%.3f <= (rest) $keptRestRate%.3f")
  }

  test("q174 semantic decontamination: near-rewrites caught, the two gates complement") {
    val sem = TextAnalysis.q174(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(sem.nonEmpty && sem.forall(_._1 >= 10),
      "bench docs must not grade themselves")
    // the flag is the raw-threshold compare; max_cos is its r4 display
    sem.foreach { case (id, _, cos, c) =>
      if (c) assert(cos >= 0.7999, s"doc $id flagged below tau")
      else assert(cos <= 0.8001, s"doc $id unflagged above tau")
    }
    // the > 0.98 class is the planted near-rewrites — they exist at this
    // sf and every one is flagged (the operator's entire purpose)
    val hot = sem.filter(_._3 > 0.98)
    assert(hot.nonEmpty, "no near-rewrite class at this sf — retune tau or fixture")
    assert(hot.forall(_._4), "a near-rewrite escaped the gate")
    // both decontamination gates earn their place: each flags docs the
    // other misses (paraphrases slip the n-gram gate; short verbatim
    // spans vanish in a 64-dim count-vector cosine)
    val semSet = sem.filter(_._4).map(_._1).toSet
    val ng = TextAnalysis.q63(spark, dir).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert((semSet -- ng).nonEmpty, "semantic gate adds nothing over n-gram")
    assert((ng -- semSet).nonEmpty, "n-gram gate adds nothing over semantic")
  }

  test("q124 BPE training: monotone merge loop over the word histogram") {
    val rows = TextAnalysis.q124(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1 to 8), "one row per round, in order")
    rows.foreach { case (r, lhs, rhs, merged, cnt, total) =>
      assert(merged == lhs + rhs, s"round $r: merged != lhs||rhs")
      assert(cnt > 0 && total > 0)
    }
    // round 1 merges two single characters by construction
    assert(rows.head._2.length == 1 && rows.head._3.length == 1)
    // the max pair count is non-increasing: merging never raises an old
    // pair's count, and pairs created around the new symbol are bounded
    // by the number of applied merges
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 <= a._5, s"round ${b._1}: pair count rose ${a._5}->${b._5}")
    }
    // each round shrinks the corpus token mass by the number of APPLIED
    // merges: at least one, at most pair_cnt (overlaps merge fewer)
    val w0 = TextAnalysis.q124InitialTokens(spark, dir)
    val totals = w0 +: rows.map(_._6).toSeq
    totals.sliding(2).zip(rows.iterator).foreach {
      case (Seq(prev, cur), row) =>
        val drop = prev - cur
        assert(drop >= 1 && drop <= row._5,
          s"round ${row._1}: token-mass drop $drop outside (0, ${row._5}]")
    }
  }

  test("q127 BPE apply: compression profile is consistent with training") {
    val rows = TextAnalysis.q127(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val totToks = rows.map(_._5).sum
    rows.foreach { case (lang, nDocs, nWords, nChars, nToks, cpt) =>
      assert(nDocs > 0 && nWords > 0)
      // a BPE token covers >= 1 char and a word is >= 1 token
      assert(nToks <= nChars, s"$lang: more tokens than chars")
      assert(nToks >= nWords, s"$lang: fewer tokens than words")
      assert(cpt >= 1.0, s"$lang: chars/token $cpt < 1")
    }
    // 8 applied merges must compress SOMETHING: corpus-wide BPE tokens
    // strictly below characters, and the totals must tie out to q124's
    // final round token mass
    val nChars = rows.map(_._4).sum
    assert(totToks < nChars, "no merge compressed the corpus")
    val lastRound = TextAnalysis.q124(spark, dir).collect().last.getLong(5)
    assert(totToks == lastRound,
      s"apply totals $totToks != training final token mass $lastRound")
  }

  test("q128 shard manifest ties out against the corpus") {
    val rows = TextAnalysis.q128(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val corpus = graft.sources.Tables.table(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == corpus, "manifest drops or double-counts")
    // shards are contiguous, non-overlapping, in order, and full except
    // possibly the last
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._4 + 1, s"gap between shards ${a._1} and ${b._1}")
      assert(a._2 == 128L, s"non-final shard ${a._1} not full")
    }
    assert(rows.head._3 == 0L && rows.last._4 == corpus - 1)
    assert(rows.map(_._5).distinct.length == rows.length,
      "duplicate shard digests")
  }

  test("q129 feature hashing spreads mass and stays sparse-consistent") {
    val rows = TextAnalysis.q129(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, dim, v) =>
      assert(dim >= 0 && dim < 64)
      assert(v != 0L, "zero entries must be dropped from the sparse form")
    }
    // a uniform hash must touch every dimension corpus-wide
    assert(rows.map(_._2).distinct.length == 64,
      "some hash dimension never used — bucket mapping is off")
    // kernel/operator parity: the driver-side serving kernel
    // (FeatureHash.embed — java.security MD5, no Spark) must reproduce
    // every document's sparse vector bit-for-bit
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    import org.apache.spark.sql.functions._
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySpark = rows.groupBy(_._1)
    texts.foreach { case (id, text) =>
      val expected = graft.functions.FeatureHash.embed(text).zipWithIndex
        .collect { case (v, d) if v != 0f => (d, v.toLong) }.toSeq.sortBy(_._1)
      val got = bySpark.getOrElse(id, Array.empty)
        .map(t => (t._2, t._3)).sortBy(_._1).toSeq
      assert(got == expected, s"doc $id: spark $got vs kernel $expected")
    }
  }

  test("q131 curriculum: bands are contiguous and positions a permutation") {
    val rows = TextAnalysis.q131(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
      "curriculum positions are not an exact permutation")
    // band-major: every band-b position precedes every band-(b+1) one
    val maxByBand = rows.groupBy(_._2).view.mapValues(_.map(_._3).max)
    val minByBand = rows.groupBy(_._2).view.mapValues(_.map(_._3).min)
    val bands = rows.map(_._2).distinct.sorted
    assert(bands.length >= 2, s"thresholds degenerate: only bands $bands")
    bands.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(maxByBand(a) < minByBand(b),
        s"band $a overlaps band $b in curriculum order")
    }
  }

  test("q139 lang-id report: shares sum to 1 per label, classifier is honest") {
    val rows = TextAnalysis.q139(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // per-label shares sum to ~1 and doc counts tie out to the corpus
    val corpus = graft.sources.Tables.table(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == corpus, "confusion matrix drops docs")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 0.01, s"$lang shares sum to $s")
    }
    // r14: the deterministic marker injection gives the classifier real
    // signal — per label the diagonal cell dominates (the in-script
    // require pins strictness; here pin the shape), while the unmarked
    // 20% residue still shows the shared-vocabulary confusion (those
    // docs can only predict 'en' or 'und')
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val diag = cells.collectFirst { case (_, p, n, _) if p == lang => n }
        .getOrElse(0L)
      assert(cells.forall { case (_, p, n, _) => p == lang || n < diag },
        s"$lang lost diagonal dominance: ${cells.toSeq}")
      assert(cells.map(_._2).toSet.subsetOf(Set(lang, "en", "und")),
        s"$lang residue predicted outside {self, en, und}: ${cells.toSeq}")
    }
  }

  test("q141 PII redaction: injected PII is counted and scrubbed, docs intact") {
    val rows = TextAnalysis.q141(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    val n = graft.sources.Tables.table(spark, dir, "documents").count()
    assert(rows.length == n, "one audit row per document")
    rows.foreach { case (id, e, p, ip, digest) =>
      assert(e == (if (id % 7 == 0) 1 else 0), s"doc $id email count $e")
      assert(p == (if (id % 11 == 0) 1 else 0), s"doc $id phone count $p")
      assert(ip == (if (id % 13 == 0) 1 else 0), s"doc $id ip count $ip")
      assert(digest.length == 32)
    }
    // a doc divisible by 7, 11 AND 13 (1001) carries all three kinds
    rows.find(_._1 == 0L).foreach { case (_, e, p, ip, _) =>
      assert(e == 1 && p == 1 && ip == 1, "doc 0 should carry all three")
    }
  }

  test("q124 merge semantics: greedy left-to-right fixpoint (Sennrich)") {
    // the cross-engine contract both replays rely on: the padded replace
    // applied to a fixpoint (bounded passes) — adjacent repeats whose
    // delimiter a previous occurrence consumed still merge ("p a p a"
    // with winner (p,a) -> "pa pa", canonical BPE), while genuinely
    // overlapping occurrences merge non-overlapping ("a a a" -> "aa a")
    import spark.implicits._
    def fix(s0: String, a: String, b: String): String = {
      var s = " " + s0 + " "
      for (_ <- 1 to TextAnalysis.BpeMergePasses)
        s = s.replace(s" $a $b ", s" $a$b ")
      s.trim
    }
    assert(fix("p a p a", "p", "a") == "pa pa")
    assert(fix("a a a", "a", "a") == "aa a")
    assert(fix("a a a a", "a", "a") == "aa aa")
    assert(fix("p a p a p a p a", "p", "a") == "pa pa pa pa")
    // the engine's Column form agrees with the driver-side replay
    val got = Seq("p a p a").toDF("sym").selectExpr(
      (1 to TextAnalysis.BpeMergePasses)
        .foldLeft("' ' || sym || ' '")((in, _) =>
          s"replace($in, ' p a ', ' pa ')") match { case e => s"trim($e)" })
      .collect()(0).getString(0)
    assert(got == "pa pa", s"engine replace semantics drifted: got '$got'")
  }
}
