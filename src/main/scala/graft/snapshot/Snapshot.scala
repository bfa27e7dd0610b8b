package graft.snapshot

import org.apache.spark.sql.DataFrame
import graft.filters.RowFilter

/** Consistent-snapshot scan: filter + projection with PK protection.
  *
  * Reference behavior: the snapshot reader runs
  * `SELECT * FROM t <WHERE row-filter> FORCE INDEX (primary)`
  * (/root/reference/snapshot/mysql.go:71-73) and the encoder then drops
  * columns not present in the registered output schema, refusing to drop
  * primary-key columns (/root/reference/encoder/json.go:344-373,
  * /root/reference/doc/endpoints.md:33-36).
  *
  * Spark-first: the filter and projection are declared on the DataFrame and
  * Catalyst pushes BOTH into the scan (`PushedFilters`, `ReadSchema`) — an
  * improvement over the reference, which always reads every column. The
  * JDBC path uses the same code: `spark.read.jdbc` with
  * partitionColumn/numPartitions on the PK gives intra-table parallelism
  * the reference's single cursor lacks.
  */
object Snapshot {

  /** Apply row filters then project to `keep` columns, always retaining
    * `pkCols` (PK cannot be filtered out — encoder/json.go:368-371).
    */
  def scan(df: DataFrame, filters: Seq[RowFilter], keep: Seq[String], pkCols: Seq[String]): DataFrame = {
    val projected = (pkCols ++ keep.filterNot(pkCols.contains)).distinct
    df.filter(RowFilter.compile(filters)).select(projected.map(df.col): _*)
  }
}
