package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a handful of hot keys (a viral document, a default user id)
  * serialize an entire shuffle partition. AQE's skew-join splitting
  * handles sort-merge cases automatically; explicit salting is the
  * deterministic fallback and works for any join type:
  *
  *  - fact side: add `salt = pmod(hash(cols…), S)` — splits each hot key
  *    into S sub-keys;
  *  - dim side: explode each row S times (one per salt value);
  *  - join on (key, salt). Dim inflation is S× a SMALL table — the fact
  *    table, which is the big one, is never inflated.
  */
object SkewJoin {

  /** Inner-join `fact` with `dim` on `key`, salted `salt` ways. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame =
    saltedJoin(fact, dim, key, spark(fact).range(1).select(lit(salt).as("_saltf")))

  /** Data-driven variant: the salt factor arrives as a ONE-ROW stats
    * table (column `_saltf`, e.g. the q_key_skew planner's `top_salt`
    * clamped to a floor/ceiling) broadcast onto both sides — the factor
    * stays in-plan (no driver collect) and tracks the data instead of a
    * hand-pinned constant. The fact table is never inflated; the dim
    * explodes `_saltf` ways as before.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltRow: DataFrame): DataFrame = {
    val saltedFact = fact.crossJoin(broadcast(saltRow))
      .withColumn("_salt",
        pmod(hash(fact.columns.map(col).toIndexedSeq: _*), col("_saltf")))
      .drop("_saltf")
    val saltedDim = dim.crossJoin(broadcast(saltRow))
      .withColumn("_salt", explode(sequence(lit(0), col("_saltf") - 1)))
      .drop("_saltf")
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Skew diagnosis: rows per key, top offenders first. */
  def keyHistogram(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n")).orderBy(col("n").desc)
}
