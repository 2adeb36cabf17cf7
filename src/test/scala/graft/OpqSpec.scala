package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Opq, Pq}

/** Semantic invariants of the OPQ rotation the oracle replay cannot
  * check (it replays the persisted policy; these pin that the policy IS
  * a rotation): orthogonality, distance preservation through the
  * distributed apply, eigenvalue balance, and the q138 contract. */
class OpqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def trainedRotation(): Array[Array[Double]] = {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val total = e.count()
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    Opq.trainRotation(Ann.sampleVectors(e, "vec_id", "embedding", total), dim)
  }

  test("trained rotation is orthogonal and norm-preserving") {
    val r = trainedRotation()
    val n = r.length
    for (i <- 0 until n; j <- i until n) {
      val dot = (0 until n).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rᵀ[$i][$j] = $dot")
    }
  }

  test("jacobi eigendecomposition reconstructs a known symmetric matrix") {
    // hand-built: eigenvalues {3, 1} under a 45° rotation
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (eig, vecs) = Opq.jacobiEigen(m)
    assert(eig.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 }, eig.toSeq.toString)
    // each eigenpair satisfies M v = λ v
    eig.indices.foreach { i =>
      val v = vecs(i)
      val mv = m.map(row => row(0) * v(0) + row(1) * v(1))
      assert(math.abs(mv(0) - eig(i) * v(0)) < 1e-9)
      assert(math.abs(mv(1) - eig(i) * v(1)) < 1e-9)
    }
  }

  test("eigenvalue allocation balances log-variance across subspaces") {
    val r = trainedRotation()
    // recompute the per-direction eigenvalues through the moment matrix
    // is overkill here; instead check the STRUCTURAL property on a
    // synthetic spectrum: 8 buckets of 8 from a decaying spectrum end
    // up within one top-eigenvalue of each other in log-product
    val eig = Array.tabulate(64)(i => math.pow(0.9, i))
    val vecs = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val rot = Opq.allocateRotation(eig, vecs, Pq.SubSpaces)
    assert(rot.length == 64 && r.length == 64)
    val subDim = 8
    val logs = (0 until Pq.SubSpaces).map { b =>
      (0 until subDim).map { s =>
        val row = rot(b * subDim + s)
        val idx = row.indexWhere(_ == 1.0) // identity eigenvectors
        math.log(eig(idx))
      }.sum
    }
    assert(logs.max - logs.min < -math.log(0.9) * subDim,
      s"unbalanced log-products: $logs")
  }

  test("OPQ recall beats plain PQ on a correlated corpus (the rotation's raison d'etre)") {
    // PqBench's replica corpus has no correlated structure, so both
    // paths saturate there; this pins the claim where it is testable: a
    // corpus whose energy lives in a few strong latent directions MIXED
    // across raw dims by a fixed rotation. Plain PQ quantizes raw
    // contiguous subspaces that each see correlated mixtures; OPQ's PCA
    // basis + eigenvalue allocation recovers and balances the latent
    // axes. Everything driver-side and seeded - an independent
    // re-implementation of encode/ADC, not a replay of the operator.
    val dim = 64
    val n = 2000
    val scales = Array.tabulate(dim)(i => if (i < 8) 8.0 - i * 0.7 else 0.15)
    val symRnd = new scala.util.Random(13)
    val sym = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val v = symRnd.nextGaussian(); sym(i)(j) = v; sym(j)(i) = v
    }
    val mix = Opq.jacobiEigen(sym)._2 // orthonormal rows: the hidden mixing
    val rnd = new scala.util.Random(7)
    def draw(): Array[Float] = {
      val z = Array.tabulate(dim)(i => rnd.nextGaussian() * scales(i))
      Array.tabulate(dim) { r =>
        var a = 0.0; var j = 0
        while (j < dim) { a += mix(j)(r) * z(j); j += 1 }
        a.toFloat
      }
    }
    val corpus = Array.fill(n)(draw())

    val subSpaces = Pq.SubSpaces
    val subDim = dim / subSpaces
    def normalized(v: Array[Float]): Array[Double] = {
      val d = v.map(_.toDouble)
      val sq = d.map(x => x * x).sum
      if (sq > 0) d.map(_ / math.sqrt(sq)) else d
    }
    def sub(v: Array[Double], m: Int): Array[Float] =
      Array.tabulate(subDim)(j => v(m * subDim + j).toFloat)
    def codebooks(vs: Array[Array[Float]]): Array[Array[Array[Float]]] = {
      val norm = vs.map(normalized)
      Array.tabulate(subSpaces)(m =>
        Ann.lloyds(norm.map(sub(_, m)), 16, iters = 5, seed = 7L + m))
    }
    def encode(v: Array[Float], cb: Array[Array[Array[Float]]]): Array[Int] = {
      val nv = normalized(v)
      Array.tabulate(subSpaces) { m =>
        val s = sub(nv, m)
        cb(m).indices.minBy { k =>
          val ct = cb(m)(k)
          (0 until subDim).map(j => { val d = s(j) - ct(j); d * d }).sum
        }
      }
    }
    def adc(q: Array[Float], code: Array[Int],
            cb: Array[Array[Array[Float]]]): Double = {
      val nq = normalized(q)
      (0 until subSpaces).map { m =>
        val s = sub(nq, m); val ct = cb(m)(code(m))
        (0 until subDim).map(j => { val d = s(j) - ct(j); d * d }).sum
      }.sum
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (na, nb) = (normalized(a), normalized(b))
      (0 until dim).map(j => na(j) * nb(j)).sum
    }

    val rot = Opq.trainRotation(corpus, dim)
    def rotate(v: Array[Float]): Array[Float] =
      Array.tabulate(dim) { r =>
        var a = 0.0; var j = 0
        while (j < dim) { a += rot(r)(j) * v(j); j += 1 }
        a.toFloat
      }
    val rotated = corpus.map(rotate)
    val cbPlain = codebooks(corpus)
    val cbRot = codebooks(rotated)
    val codesPlain = corpus.map(encode(_, cbPlain))
    val codesRot = rotated.map(encode(_, cbRot))

    val queries = (0 until 20).toArray
    val candN = 20
    val k = 10
    def recall(codes: Array[Array[Int]], cb: Array[Array[Array[Float]]],
               qOf: Int => Array[Float]): Double = {
      queries.map { qi =>
        val exact = corpus.indices.filter(_ != qi)
          .sortBy(i => -cos(corpus(qi), corpus(i))).take(k).toSet
        val cand = corpus.indices.filter(_ != qi)
          .sortBy(i => adc(qOf(qi), codes(i), cb)).take(candN)
        val hits = cand.sortBy(i => -cos(corpus(qi), corpus(i))).take(k)
        hits.count(exact).toDouble / k
      }.sum / queries.length
    }
    val plainRec = recall(codesPlain, cbPlain, i => corpus(i))
    val rotRec = recall(codesRot, cbRot, i => rotated(i))
    info(f"correlated-corpus recall@10: plain=$plainRec%.3f opq=$rotRec%.3f")
    assert(rotRec >= plainRec,
      f"rotation hurt recall on a correlated corpus: $rotRec%.3f < $plainRec%.3f")
    assert(rotRec - plainRec >= 0.03,
      f"rotation gave no measurable gain where it structurally must: " +
        f"opq=$rotRec%.3f plain=$plainRec%.3f")
  }

  test("q138: rotated candidates rerank to valid top-k; recall >= plain PQ floor") {
    val got = Opq.opqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until Ann.NumQueries.toLong).toSet)
    byQ.values.foreach { hits =>
      assert(hits.map(_._2).sorted.toSeq == (1 to hits.length))
      // scores descend with rank (rounded ties resolve by id upstream)
      assert(hits.sortBy(_._2).map(_._4).toSeq
        .sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
      assert(!hits.map(_._3).contains(hits.head._1), "self-match leaked")
    }
    // recall@10 vs the exact cosine answer, averaged over the queries:
    // the sampled-rotation + 16-code budget must stay a real ANN (the
    // same floor HnswSpec/PqBench use at this scale)
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val rec = byQ.keys.toSeq.map { q =>
      val want = exact(q).map(_._2).toSet
      byQ(q).map(_._3).count(want) / want.size.toDouble
    }.sum / byQ.size
    assert(rec >= 0.5, s"opq recall@10 collapsed: $rec")
  }
}
