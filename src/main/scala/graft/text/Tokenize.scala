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
}
