package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** ScalaCheck-generated properties for the distance kernels (SURVEY §5:
  * symmetry, d(x,x)=0, cosine bounds, float32-in/double-accumulate
  * determinism). Samples are batched into one DataFrame per property so
  * the whole suite stays fast.
  */
class DistanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecPair: Gen[(Seq[Float], Seq[Float])] = for {
    n <- Gen.choose(1, 32)
    a <- Gen.listOfN(n, Gen.choose(-10f, 10f))
    b <- Gen.listOfN(n, Gen.choose(-10f, 10f))
  } yield (a, b)

  private def eval(pairs: Seq[(Seq[Float], Seq[Float])]) = {
    pairs.toDF("a", "b")
      .select(
        l2sq(col("a").cast("array<float>"), col("b").cast("array<float>")).as("l2"),
        cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")).as("cos"),
        dot(col("a").cast("array<float>"), col("b").cast("array<float>")).as("dot"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
  }

  test("l2sq is non-negative, zero on self, symmetric; matches plain-Scala double fold") {
    val pairs = Gen.listOfN(50, vecPair).sample.get
    val results = eval(pairs)
    pairs.zip(results).foreach { case ((a, b), (l2, _, dt)) =>
      val refL2 = a.zip(b).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d
      }.sum
      val refDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(l2 >= 0.0)
      assert(math.abs(l2 - refL2) <= 1e-9 * math.max(1.0, refL2.abs))
      assert(math.abs(dt - refDot) <= 1e-9 * math.max(1.0, refDot.abs))
    }
    // self-distance and symmetry on the same batch
    val self = eval(pairs.map { case (a, _) => (a, a) })
    self.foreach { case (l2, _, _) => assert(l2 == 0.0) }
    val sym = eval(pairs.map(_.swap))
    results.zip(sym).foreach { case ((l2ab, _, _), (l2ba, _, _)) =>
      assert(l2ab == l2ba)
    }
  }

  test("cosine similarity stays in [-1, 1] (+ fp slack) and is 1 on self") {
    val nonZero = Gen.listOfN(50, vecPair).sample.get
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val results = eval(nonZero)
    results.foreach { case (_, c, _) =>
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
    val self = eval(nonZero.map { case (a, _) => (a, a) })
    self.foreach { case (_, c, _) => assert(math.abs(c - 1.0) < 1e-12) }
  }

  test("codegen kernels are bit-identical to the composed built-in forms") {
    val pairs = Gen.listOfN(60, vecPair).sample.get
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val rows = pairs.toDF("a", "b")
      .select(
        (l2sq(col("a").cast("array<float>"), col("b").cast("array<float>")) -
          l2sqComposed(col("a").cast("array<float>"), col("b").cast("array<float>"))).as("dl2"),
        (cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")) -
          cosineSimComposed(col("a").cast("array<float>"), col("b").cast("array<float>"))).as("dcos"),
        (dot(col("a").cast("array<float>"), col("b").cast("array<float>")) -
          dotComposed(col("a").cast("array<float>"), col("b").cast("array<float>"))).as("ddot"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    }
  }

  test("hoisted-norm cosine (dot/(|a||b|)) is bit-identical to the fused kernel") {
    // q15's exact all-pairs path computes per-row norms once and a dot per
    // pair; the score must be the same DOUBLE the fused cos kernel yields,
    // zero vectors included (both sides guard den==0 -> 0.0).
    val pairs = Gen.listOfN(60, vecPair).sample.get ++
      Seq((List.fill(8)(0f), List.fill(8)(1f)), (List.fill(8)(0f), List.fill(8)(0f)))
    val a = col("a").cast("array<float>")
    val b = col("b").cast("array<float>")
    val den = l2norm(a) * l2norm(b)
    val hoisted = when(den === 0.0, 0.0).otherwise(dot(a, b) / den)
    val rows = pairs.toDF("a", "b")
      .select((hoisted - cosineSim(a, b)).as("diff"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == 0.0))
  }

  test("hoisted-norm cosine DIVERGES from the fused kernel on mismatched lengths (equal-length precondition)") {
    // The fused kernel truncates dot AND norms to min(len_a, len_b); the
    // hoisted form norms the FULL vectors. The generators above only emit
    // equal lengths, so without this pin the 'bit-identical' claim would
    // be latent-false off the fixed-dim corpus — this makes the
    // divergence (and so the documented precondition at the q15 exact
    // path) explicit.
    val a = col("a").cast("array<float>")
    val b = col("b").cast("array<float>")
    val den = l2norm(a) * l2norm(b)
    val hoisted = when(den === 0.0, 0.0).otherwise(dot(a, b) / den)
    val r = Seq((Seq(1f, 2f, 3f, 4f), Seq(1f, 2f)))
      .toDF("a", "b")
      .select(cosineSim(a, b).as("fused"), hoisted.as("hoist"))
      .head
    // fused = cos of the 2-dim prefixes = 1.0 up to sqrt rounding
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // hoisted norms the full 4-dim vector -> strictly smaller
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) > 0.1)
  }

  test("ip distance is 1 - dot") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(0.5f, -1f, 2f))).toDF("a", "b")
    val r = df.select(
      ipDist(col("a").cast("array<float>"), col("b").cast("array<float>"))).head.getDouble(0)
    assert(math.abs(r - (1.0 - (0.5 - 2.0 + 6.0))) < 1e-12)
  }

  test("cosine never yields NaN: zero vectors AND non-finite components score 0") {
    val inf = Float.PositiveInfinity
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)),      // zero norm
      (Seq(inf, 1f), Seq(1f, 2f)),     // Inf/Inf → NaN without the guard
      (Seq(inf, 1f), Seq(inf, 2f)),
      (Seq(1f, 1f), Seq(1f, 2f))       // control: a real score
    ).toDF("a", "b")
    val rs = df.select(
      cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")))
      .collect().map(_.getDouble(0))
    assert(!rs.exists(_.isNaN), s"NaN leaked from the cos kernel: ${rs.toSeq}")
    assert(rs(0) == 0.0 && rs(1) == 0.0 && rs(2) == 0.0)
    assert(rs(3) > 0.9) // the control row still scores normally
  }
}
