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
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew diagnosis: rows per key, top offenders first. */
  def keyHistogram(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n")).orderBy(col("n").desc)
}
