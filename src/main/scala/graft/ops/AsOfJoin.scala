package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * right.time <= left.time within the same key.
  *
  * Spark lacks a native ASOF JOIN; the scalable composition is
  * union-then-window: tag both sides, sort within key by
  * (time, side, tie) — right rows (side 0) sort before left rows (side 1)
  * at equal time, giving "<=" semantics — and carry the last seen right
  * payload forward with `last(_, ignoreNulls = true)`. One shuffle on the
  * key, same cost as the sort-merge join a native ASOF implementation
  * performs, and no range-explosion. (Preference order per project
  * guidance: compose built-ins before writing a custom SparkPlan.)
  */
object AsOfJoin {

  /** @param left    rows needing a match; must contain `key`, `time`, `tie`
    * @param right   reference rows; must contain `key`, `time`, `tie` and
    *                every column named in `payload`
    * @param tie     unique-ish tiebreak column present on both sides, makes
    *                the window order total (deterministic results)
    * @param payload right columns carried onto matching left rows
    * @return left rows (all original columns) plus `payload` columns
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           tie: String, payload: Seq[String]): DataFrame = {
    val meta = Set(key, time, tie)
    val leftOther = left.columns.filterNot(meta.contains).toSeq
    val common: Seq[Column] = Seq(col(key), col(time), col(tie))

    val lSel = left.select(common ++ Seq(lit(1).as("_side")) ++
      leftOther.map(col) ++
      payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rSel = right.select(common ++ Seq(lit(0).as("_side")) ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      payload.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col(tie))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(lSel.unionByName(rSel)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }
}
