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
}
