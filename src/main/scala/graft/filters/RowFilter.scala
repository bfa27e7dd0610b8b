package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Snapshot row filter.
  *
  * Reproduces the reference's `RowFilter{Column, Condition, Values[],
  * Operator}` config (/root/reference/config/config.go:170-176), which is
  * compiled into `WHERE (col cond 'v1' OP col cond 'v2') AND (…)` and pushed
  * into the snapshot SELECT (/root/reference/snapshot/snapshot.go:71-137,
  * applied at /root/reference/snapshot/mysql.go:71-72).
  *
  * Spark-first: each filter becomes a `Column` predicate; the list is ANDed.
  * Catalyst pushes the resulting conjunction into the scan (parquet filter
  * pushdown / JDBC `WHERE` pushdown) — i.e. the same SQL the reference
  * generates by hand, derived for free from the declarative plan.
  */
final case class RowFilter(
    column: String,
    condition: String, // "=", "!=", ">", ">=", "<", "<="
    values: Seq[String],
    operator: String = "OR" // how multiple values combine: OR | AND
) {
  def toColumn: Column = {
    require(values.nonEmpty, s"RowFilter on $column needs at least one value")
    val c = col(column)
    val preds = values.map { v =>
      condition match {
        case "="          => c === v
        case "!=" | "<>"  => c =!= v
        case ">"          => c > v
        case ">="         => c >= v
        case "<"          => c < v
        case "<="         => c <= v
        case other => throw new IllegalArgumentException(s"bad condition: $other")
      }
    }
    operator.toUpperCase match {
      case "AND" => preds.reduce(_ && _)
      case _     => preds.reduce(_ || _)
    }
  }
}

object RowFilter {
  /** Conjunction of all filters — the reference joins filter groups with
    * AND (/root/reference/snapshot/snapshot.go:120-135).
    */
  def compile(filters: Seq[RowFilter]): Column =
    filters.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}
