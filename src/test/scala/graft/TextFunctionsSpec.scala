package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Pins the fused Tokenize expression to its regex specification on nasty
  * inputs: unicode, punctuation runs, case folds, leading/trailing
  * delimiters, empty strings, digits. */
class TextFunctionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nasty = Seq(
    "plain words here",
    "  leading and trailing  ",
    "MIXED Case AND CAPS",
    "punct,separated;tokens!and2digits34",
    "",
    "!!!???",
    "tabs\tand\nnewlines\r\nsplit",
    "unicode: héllo wörld çafé — em-dash",
    "Ångström İstanbul STRASSE ß",
    "a",
    "1 22 333 a1b2c3",
    "underscores_do_not_join tokens")

  test("Tokenize equals regexp_extract_all(lower, '[a-z0-9]+') on nasty inputs") {
    val rows = nasty.toDF("t")
      .select(
        TextFunctions.tokens(col("t")).as("fused"),
        TextFunctions.tokensRegex(col("t")).as("regex"))
      .collect()
    nasty.zip(rows).foreach { case (input, r) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch on input: '$input'")
    }
  }

  test("Tokenize equals the regex on ScalaCheck-fuzzed strings (ascii + unicode)") {
    import org.scalacheck.Gen
    val charPool = Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', ',', '.', '!', '-', '_'),
      1 -> Gen.oneOf('é', 'ß', 'Å', 'İ', 'K', '中', '☃'))
    val strGen = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, charPool))
    val samples = Gen.listOfN(300, strGen).sample.get
    val rows = samples.toDF("t")
      .select(
        TextFunctions.tokens(col("t")).as("fused"),
        TextFunctions.tokensRegex(col("t")).as("regex"))
      .collect()
    samples.zip(rows).foreach { case (input, r) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch on fuzzed input: '$input'")
    }
  }
}
