package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Pre-fan-out repartitioning.
  *
  * An `explode` that multiplies row count 100-1000× (shingling,
  * tokenization, per-plane expansion) must be spread BEFORE the fan-out:
  * the input is small (so AQE happily coalesces it to one partition) but
  * the output work is large. `repartition(col)` alone is AQE-optimizable
  * and collapses right back to a single partition for kilobyte inputs —
  * the explicit partition count pins it.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
