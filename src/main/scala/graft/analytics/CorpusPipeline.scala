package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composable corpus-cleaning pipeline: the end-to-end shape of a
  * training-data preparation job — length/quality gate → language gate →
  * normalize-fingerprint dedup → deterministic sampling.
  *
  * Every stage is a DataFrame → DataFrame transformer, so the whole
  * pipeline is ONE Catalyst plan: gates push down to the scan, the dedup
  * is the only shuffle (on the fingerprint), and sampling is a narrow
  * hash filter. At 100 TB that plan reads each document exactly once.
  */
object CorpusPipeline {

  /** Keep documents within a character-length band (cheap first gate —
    * pushed to the parquet scan).
    */
  def lengthGate(min: Int, max: Int)(df: DataFrame): DataFrame =
    df.filter(length(col("text")).between(min, max))

  /** Keep documents whose predicted language is in the allow-list. */
  def langGate(langs: Set[String])(df: DataFrame): DataFrame =
    df.filter(TextOps.predictLang(col("text")).isin(langs.toSeq: _*))

  /** Normalize-fingerprint dedup: keep the smallest doc_id per
    * whitespace/case-normalized fingerprint.
    */
  def fingerprintDedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    df.withColumn("_fp", TextOps.fingerprint(col("text")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")
  }

  /** Deterministic 1-in-2^bits sampling by content hash — reproducible
    * across runs/engines, no RNG state, splits uniformly at any scale.
    * Keeps docs whose first md5 hex char falls in the first 16/2^bits
    * values.
    */
  def hashSample(hexChars: Seq[String])(df: DataFrame): DataFrame =
    df.filter(substring(md5(col("text")), 1, 1).isin(hexChars: _*))

  /** Sequence packing plan: assign documents (in deterministic `orderCol`
    * order) to fixed-capacity token bins — the pretraining "sample
    * packing" step that turns a cleaned corpus into training-batch
    * assignments. Greedy-by-cumulative-sum: bin = floor(tokens-before /
    * capacity), the industry-standard streaming approximation (a document
    * may straddle its bin boundary and is truncated/continued by the
    * loader — exact first-fit would need a sequential scan, which no
    * engine does at corpus scale).
    *
    * Scale: one global ordering — expressed as a window cumsum over
    * `orderCol`. Spark executes the empty-frame window as a single-
    * partition sort at small scale; at 100 TB the same plan runs as a
    * range-partitioned sort (the ORDER is the contract, and packing is a
    * per-epoch planning job, not a hot path).
    */
  def packSequences(docs: DataFrame, orderCol: Column, tokens: Column,
                    capacity: Long): DataFrame = {
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_tok", tokens.cast("long"))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .withColumn("bin", ((col("_cum") - col("_tok")) / capacity).cast("long"))
      .drop("_cum")
      .withColumnRenamed("_tok", "n_tokens")
  }

  /** The full cleaning pipeline with output stats. Stats and fingerprint
    * are computed BEFORE the dedup window so only (ids, fp, stats) — not
    * raw text — go through the single shuffle.
    */
  def clean(docs: DataFrame, minLen: Int, maxLen: Int,
            langs: Set[String]): DataFrame = {
    val gated = docs.transform(lengthGate(minLen, maxLen)).transform(langGate(langs))
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("len_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        TextOps.fingerprint(col("text")).as("_fp"))
    val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    gated.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")
  }
}
