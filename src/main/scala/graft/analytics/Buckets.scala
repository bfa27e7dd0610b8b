package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared bucket-join machinery for every LSH family (MinHash bands,
  * hyperplane bands, SimHash pigeonhole bands).
  */
object Buckets {

  /** Candidate pairs from shared (band, band_key) buckets with a
    * population skew cap: buckets above `maxBucket` are dropped from pair
    * expansion — a hot bucket IS a near-dup cluster and must be surfaced
    * as one, never as O(n²) pairs. Bounds worst-case expansion to
    * maxBucket²/2 per bucket at any corpus size.
    *
    * @param banded (band, band_key, idCol [, carry...]) rows
    * @param carry  extra columns to carry onto both sides of each pair,
    *               emitted as `<name>_a` / `<name>_b`
    */
  def cappedPairs(banded: DataFrame, idCol: String, maxBucket: Int,
                  outA: String, outB: String,
                  carry: Seq[String] = Nil): DataFrame = {
    val small = banded
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col("band"), col("band_key"))))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    def side(suffix: String, outId: String) =
      small.select((Seq(col("band"), col("band_key"), col(idCol).as(outId)) ++
        carry.map(c => col(c).as(s"$c$suffix"))): _*)
    side("_a", outA).join(side("_b", outB), Seq("band", "band_key"))
      .filter(col(outA) < col(outB))
      .select((Seq(col(outA), col(outB)) ++
        carry.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))): _*)
      .distinct()
  }
}
