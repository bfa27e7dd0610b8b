package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality / audit query batch: the checks a production ingestion
  * pipeline runs continuously (SURVEY §2.5 O12 liveness is process-level;
  * these are data-level).
  */
object QueriesQuality {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** Referential-integrity audit: child rows with/without parents
    * (orphans indicate lost events or out-of-order application).
    */
  def fkAudit(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir).select(col("l_orderkey"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"), "left")
      .groupBy()
      .agg(count(lit(1)).as("n_lineitems"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_orphans"))
  }

  /** Null/blank audit per column (schema-drift detection). */
  def nullAudit(s: SparkSession, dir: String): DataFrame =
    events(s, dir).groupBy()
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        sum(when(col("props").isNull || col("props") === "", 1L).otherwise(0L)).as("blank_props"))

  /** Duplicate-key audit: PK uniqueness violations (must be zero after
    * correct snapshot+changelog application).
    */
  def pkAudit(s: SparkSession, dir: String): DataFrame =
    li(s, dir).groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .groupBy()
      .agg(count(lit(1)).as("dup_keys"), coalesce(sum(col("n")), lit(0L)).as("dup_rows"))

  /** Value-distribution histogram (drift monitoring): floor buckets. */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select((floor(col("value") / 25) * 25).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** First event per user per day — windowed dedup (batch twin of
    * stream.StatefulDedup with a daily key).
    */
  def firstPerDay(s: SparkSession, dir: String): DataFrame = {
    val day = unix_millis(date_trunc("day", col("ts"))).as("day_ms")
    val w = Window.partitionBy(col("user_id"), col("day_ms"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), day, col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day_ms"), col("event_id"), col("event_type"))
  }

  /** Semi-structured extraction: the JSON `props` payload parsed through
    * the TYPED path (`from_json` with an explicit schema — codegen'd
    * struct access, not per-call string probing) and profiled per event
    * type. The shape every ingest layer needs for event payloads: declare
    * the fields you use, let the scan prune the rest, aggregate on the
    * extracted column like any other. At 100 TB the schema declaration is
    * what keeps JSON columns from becoming a per-row parser bottleneck —
    * one parse per row into a struct, every downstream reference free.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        countDistinct(col("k")).as("k_distinct"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_extract" -> jsonExtract _,
    "q_fk_audit" -> fkAudit _,
    "q_null_audit" -> nullAudit _,
    "q_pk_audit" -> pkAudit _,
    "q_value_histogram" -> valueHistogram _,
    "q_first_per_day" -> firstPerDay _)

  val oracleSql: Map[String, String] = Map(
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_parsed,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
        |  CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    "q_fk_audit" ->
      """SELECT COUNT(*) AS n_lineitems,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "q_null_audit" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        |  CAST(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_props
        |FROM events""".stripMargin,

    "q_pk_audit" ->
      """SELECT COUNT(*) AS dup_keys, CAST(COALESCE(SUM(n), 0) AS BIGINT) AS dup_rows FROM (
        |  SELECT l_orderkey, l_linenumber, COUNT(*) AS n FROM lineitem
        |  GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)""".stripMargin,

    "q_value_histogram" ->
      """SELECT CAST(FLOOR(value / 25) * 25 AS BIGINT) AS bucket, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q_first_per_day" ->
      """SELECT user_id, epoch_ms(date_trunc('day', ts)) AS day_ms, event_id, event_type
        |FROM (SELECT user_id, ts, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |          ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin)
}
