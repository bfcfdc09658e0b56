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

  test("stem: plural/verb/undouble rules, guards, and Column/String twins agree") {
    // the t15 stemmer (the reference's disabled Stemmer annotator analog):
    // every expectation is hand-derived from the documented three stages
    val cases = Seq(
      "caresses" -> "caress", // -sses → -ss
      "ponies" -> "pony",     // -ies → -y (len > 4)
      "queries" -> "query",
      "ties" -> "tie",        // len-4 -ies guard falls through to the -s rule
      "glass" -> "glass",     // -ss kept
      "tables" -> "table",    // -s dropped (len > 3)
      "gas" -> "gas",         // len-3 guard keeps short -s words
      "running" -> "run",     // -ing dropped, nn undoubled
      "falling" -> "fall",    // -ing dropped, ll NOT undoubled (l excluded)
      "sing" -> "sing",       // len-5 guard keeps short -ing words
      "troubled" -> "troubl", // -ed dropped (len > 4)
      "agreed" -> "agre",
      "red" -> "red",         // len-4 guard keeps short -ed words
      "meetings" -> "meet",   // -s then -ing in one pass
      "42" -> "42")           // digits untouched
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), Tokenize.stem(col("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (w, want) =>
      assert(got(w) == want, s"Column stem($w) = ${got(w)}, want $want")
      assert(Tokenize.stemString(w) == want,
        s"stemString($w) = ${Tokenize.stemString(w)}, want $want")
    }
    // the t15_stemmed_search query literal contract: the registered
    // engine literal comes from stemString("tables") — pin its value
    assert(Tokenize.stemString("tables") == "table")
  }
}
