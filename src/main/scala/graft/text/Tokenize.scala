package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-prep operator: lowercase → strip non-alphanumerics →
  * split → drop empties/stopwords.
  *
  * Replaces the reference's Spark-NLP DocumentAssembler→…→Finisher chain
  * (ref: ScalaNotebooks/MovieSearchEngine.scala:44-95 — Normalizer regex
  * `[^a-zA-Z0-9]` + lowercase at :62-63) and its ml Tokenizer +
  * StopWordsRemover combo (ref: StandaloneScala/AirlineSentimentAnalysis.scala:43-50)
  * with pure built-in expressions: everything stays inside whole-stage
  * codegen, no RDD hop, no per-row JVM object churn. At 100 TB the
  * tokenizer is the hottest scan expression in the pipeline, so it must
  * be codegen-friendly: `lower`/`regexp_replace`/`split`/`filter` all are.
  *
  * NOTE `filter` (higher-order fn) keeps duplicates — unlike
  * `array_except`, which dedups and would corrupt term frequencies.
  */
object Tokenize {
  /** Small English stopword list, mirroring the reference's explicit
    * stopword files (ref: MovieSearchEngine.scala:38,78-83). Kept fixed so
    * DuckDB-oracle SQL can inline the identical list. */
  val stopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "was", "for", "on", "as", "with", "at", "by", "from")

  /** SQL fragment of the stopword list, for oracle authoring. */
  def stopwordsSql: String = stopwords.map(s => s"'$s'").mkString(", ")

  /** Clean tokens (duplicates preserved) from a text column. */
  def tokens(text: Column): Column = {
    val arr = split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +")
    filter(arr, t => t =!= lit("") && !t.isin(stopwords: _*))
  }

  /** Tokens without stopword removal (for raw token counting). */
  def rawTokens(text: Column): Column = {
    val arr = split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +")
    filter(arr, t => t =!= lit(""))
  }

  /** DuckDB-equivalent expression over a text column reference, used by
    * oracle SQL strings. Must stay semantically identical to [[tokens]]:
    * DuckDB regexp_replace needs the 'g' flag (Spark replaces globally by
    * default). */
  def tokensSql(textCol: String): String =
    s"list_filter(string_split_regex(regexp_replace(lower($textCol), '[^a-z0-9 ]', ' ', 'g'), ' +'), " +
      s"t -> t <> '' AND t NOT IN ($stopwordsSql))"

  def rawTokensSql(textCol: String): String =
    s"list_filter(string_split_regex(regexp_replace(lower($textCol), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')"

  // ------------------------------------------------------------- stemming

  /** Light inflectional stemmer — the engine's analog of the reference's
    * DISABLED Spark-NLP Stemmer annotator (ref MovieSearchEngine.scala:66-68,
    * commented out there; spark-nlp is absent by mandate, and DuckDB's
    * Snowball `stem()` lives in the unavailable fts extension, so full
    * Porter cannot be oracle-checked — these rules CAN, because every
    * branch is plain ends_with/substring/length logic with bit-identical
    * semantics in both engines, no regex).
    *
    * Three deterministic stages (the high-yield inflectional subset of
    * Porter step 1, plus Porter's consonant undoubling with its l/s/z
    * exclusions):
    *  1. plurals: -sses→-ss, -ies→-y (len>4), -ss kept, -s dropped (len>3)
    *  2. verb endings: -ing dropped (len>5), -ed dropped (len>4)
    *  3. undouble a trailing doubled consonant in {b,d,f,g,m,n,p,r,t}
    *     (len>3), so running→runn→run but falling→fall stays.
    *
    * All three stages stay inside whole-stage codegen (when/endsWith/
    * substr are codegen'd built-ins) — same hot-scan discipline as
    * [[tokens]]. */
  private def dropEnd(w: Column, n: Int): Column = w.substr(lit(1), length(w) - n)

  private val undoubleSet = Seq("b", "d", "f", "g", "m", "n", "p", "r", "t")

  def stemStep1(w: Column): Column =
    when(w.endsWith("sses"), dropEnd(w, 2))
      .when(w.endsWith("ies") && length(w) > 4, concat(dropEnd(w, 3), lit("y")))
      .when(w.endsWith("ss"), w)
      .when(w.endsWith("s") && length(w) > 3, dropEnd(w, 1))
      .otherwise(w)

  def stemStep2(w: Column): Column =
    when(w.endsWith("ing") && length(w) > 5, dropEnd(w, 3))
      .when(w.endsWith("ed") && length(w) > 4, dropEnd(w, 2))
      .otherwise(w)

  def stemUndouble(w: Column): Column = {
    val last = w.substr(length(w), lit(1))
    val prev = w.substr(length(w) - 1, lit(1))
    when(length(w) > 3 && last === prev && last.isin(undoubleSet: _*),
      dropEnd(w, 1)).otherwise(w)
  }

  /** Full stem = step1 → step2 → undouble. */
  def stem(w: Column): Column = stemUndouble(stemStep2(stemStep1(w)))

  /** Pure-Scala twin of [[stem]] for specs and for stemming literal
    * QUERY terms at plan-build time (the engine and the literal must
    * use one rule set so they cannot drift). */
  def stemString(w: String): String = {
    val s1 =
      if (w.endsWith("sses")) w.dropRight(2)
      else if (w.endsWith("ies") && w.length > 4) w.dropRight(3) + "y"
      else if (w.endsWith("ss")) w
      else if (w.endsWith("s") && w.length > 3) w.dropRight(1)
      else w
    val s2 =
      if (s1.endsWith("ing") && s1.length > 5) s1.dropRight(3)
      else if (s1.endsWith("ed") && s1.length > 4) s1.dropRight(2)
      else s1
    if (s2.length > 3 && s2.length >= 2 &&
      s2.charAt(s2.length - 1) == s2.charAt(s2.length - 2) &&
      undoubleSet.contains(s2.takeRight(1))) s2.dropRight(1)
    else s2
  }

  /** DuckDB twins of the three stages — each takes a column REFERENCE
    * string and must stay semantically identical to the Column form
    * (plain CASE/ends_with/substring/length; staged as CTEs by callers
    * so the composed expression never needs textual self-repetition). */
  def stemStep1Sql(w: String): String =
    s"""CASE WHEN ends_with($w, 'sses') THEN substring($w, 1, length($w) - 2)
       |  WHEN ends_with($w, 'ies') AND length($w) > 4 THEN substring($w, 1, length($w) - 3) || 'y'
       |  WHEN ends_with($w, 'ss') THEN $w
       |  WHEN ends_with($w, 's') AND length($w) > 3 THEN substring($w, 1, length($w) - 1)
       |  ELSE $w END""".stripMargin

  def stemStep2Sql(w: String): String =
    s"""CASE WHEN ends_with($w, 'ing') AND length($w) > 5 THEN substring($w, 1, length($w) - 3)
       |  WHEN ends_with($w, 'ed') AND length($w) > 4 THEN substring($w, 1, length($w) - 2)
       |  ELSE $w END""".stripMargin

  def stemUndoubleSql(w: String): String = {
    val set = undoubleSet.map(c => s"'$c'").mkString(", ")
    s"""CASE WHEN length($w) > 3
       |  AND substring($w, length($w), 1) = substring($w, length($w) - 1, 1)
       |  AND substring($w, length($w), 1) IN ($set)
       |  THEN substring($w, 1, length($w) - 1) ELSE $w END""".stripMargin
  }
}
