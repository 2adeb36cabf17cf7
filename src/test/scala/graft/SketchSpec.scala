package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sketch property checks the hash-match gate can't express: Count-Min
  * may only ever OVER-count, and HyperLogLog must land inside its
  * theoretical error band (1.04/√m ≈ 6.5% at m=256; the 15% bound here
  * is ~2.3σ).
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("count-min never under-counts, and a tiny matrix visibly over-counts") {
    val rows = graft.operators.Sketches.q76(spark, dir).collect()
    assert(rows.length == 31) // the corpus vocabulary
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"under-estimate for ${r.getString(0)}")
    }
    // 31 tokens into 16 cells per row: some token MUST share every row
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "no collision over-count despite w < vocabulary")
  }

  test("hll estimates land within the error band on every group") {
    val rows = graft.operators.Sketches.q77(spark, dir).collect()
    assert(rows.length == 5) // one per event_type
    rows.foreach { r =>
      val t = r.getLong(1).toDouble
      val e = r.getDouble(2)
      assert(math.abs(e - t) / t < 0.15,
        s"${r.getString(0)}: est $e vs true $t")
    }
  }
}
