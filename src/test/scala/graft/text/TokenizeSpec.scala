package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercases, strips punctuation, drops stopwords, keeps duplicates") {
    val df = Seq("The CAT, the cat; and a DOG!").toDF("text")
    val got = df.select(Tokenize.tokens(col("text")).as("t")).as[Seq[String]].head()
    assert(got == Seq("cat", "cat", "dog"))
  }

  test("tokens: digits survive, empties dropped") {
    val df = Seq("  42 blue---bolts  ").toDF("text")
    val got = df.select(Tokenize.tokens(col("text")).as("t")).as[Seq[String]].head()
    assert(got == Seq("42", "blue", "bolts"))
  }

  test("rawTokens keeps stopwords") {
    val df = Seq("the cat").toDF("text")
    val got = df.select(Tokenize.rawTokens(col("text")).as("t")).as[Seq[String]].head()
    assert(got == Seq("the", "cat"))
  }

  test("empty and punctuation-only text yield no tokens") {
    val df = Seq("", "!!! ... ---").toDF("text")
    val got = df.select(Tokenize.tokens(col("text")).as("t")).as[Seq[String]].collect()
    assert(got.forall(_.isEmpty))
  }
}
