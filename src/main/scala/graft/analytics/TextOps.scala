package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are narrow (per-row expressions, whole-stage-codegen
  * friendly) — they scale linearly with input partitions and introduce no
  * shuffle by themselves. Designed for a `documents(doc_id, text, …)` table
  * of arbitrary size.
  */
object TextOps {

  /** Whitespace token count (split on single spaces — the corpus is
    * space-delimited; use `tokensRegex` for free text).
    */
  def tokenCount(text: Column): Column = size(split(text, " "))

  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: words, numbers, or single punctuation marks. */
  def tokensRegex(text: Column): Column =
    // \p{L}+ letters | \p{N}+ digits | single non-space symbol
    regexp_extract_all(text, lit("""[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"""), lit(0))

  /** Occurrences of a literal pattern, via the length-difference identity —
    * pure string ops, no regex engine in the hot path.
    */
  def occurrences(text: Column, pattern: String): Column =
    ((length(text) - length(replace(text, lit(pattern), lit("")))) / pattern.length).cast("int")

  /** Language-ID by stopword scoring: count hits of per-language marker
    * words, predict the argmax (ties broken by fixed language priority).
    * N-gram-heuristic class of detector; deterministic.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " and "),
    "fr" -> Seq(" le ", " la ", " et "),
    "de" -> Seq(" der ", " die ", " und "),
    "es" -> Seq(" el ", " los ", " y "))

  def langScores(text: Column): Map[String, Column] = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.map { case (lang, ms) =>
      lang -> ms.map(occurrences(padded, _)).reduce(_ + _)
    }
  }

  def predictLang(text: Column): Column = {
    val s = langScores(text)
    when(s("en") >= s("fr") && s("en") >= s("de") && s("en") >= s("es"), "en")
      .when(s("fr") >= s("de") && s("fr") >= s("es"), "fr")
      .when(s("de") >= s("es"), "de")
      .otherwise("es")
  }

  /** Quality-scoring signals: length, token count, mean token length,
    * stopword ratio. Ratios are single FP divisions of exact ints —
    * deterministic across engines.
    */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val nTok = tokenCount(text)
    df.withColumn("len_chars", length(text))
      .withColumn("n_tokens", nTok)
      .withColumn("nonspace_chars", length(replace(text, lit(" "), lit(""))))
      .withColumn("mean_token_len", col("nonspace_chars").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio",
        occurrences(concat(lit(" "), text, lit(" ")), " the ").cast("double") / nTok)
  }

  // PII scrub patterns — restricted to the regex subset where Java's
  // engine (Spark) and RE2 (DuckDB oracle) agree exactly: literal
  // classes, bounded quantifiers, \b, \d. Training-corpus prep standard:
  // redact before dedup/packing so signatures never key on PII.
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIp = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PiiNum = "\\d{7,}"

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, then 7+-digit runs →
    * `<NUM>` (in that order: emails/IPs contain digit runs). Narrow
    * per-row expression — codegen'd, no UDF, no shuffle.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiIp, "<IP>"),
      PiiNum, "<NUM>")

  /** Match counts per PII class (computed on the UNscrubbed text). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(PiiEmail), lit(0))),
    "n_ips" -> size(regexp_extract_all(text, lit(PiiIp), lit(0))),
    "n_nums" -> size(regexp_extract_all(text, lit(PiiNum), lit(0))))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Content-defined identity for exact-after-normalization dedup.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}
