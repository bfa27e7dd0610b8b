package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Spread, Tables}

/** Incremental-maintenance and sampling operators: what a CDC changelog
  * FEEDS downstream of the pipe — materialized aggregates kept current by
  * delta folding instead of recompute (the reason to stream a changelog at
  * all, per the reference's SQL/file consumers,
  * /root/reference/pipe/file.go, /root/reference/encoder/sql.go), plus the
  * weighted-sampling primitive a training-data pipeline uses to draw
  * mixture corpora. Same determinism conventions as [[QueriesCdc]].
  */
object QueriesIncremental {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  /** Incremental materialized-view maintenance — the delta-fold identity
    * that makes a CDC-fed aggregate affordable at 100 TB. The changelog
    * (insert/update/delete ops on simulated PK `rid`, ordered per key by
    * commit time) is folded as retract-old/add-new deltas:
    * `delta = cur - lag(cur)` per key, then ONE aggregation of deltas per
    * MV group. The sums telescope to exactly the final state, so the
    * oracle recomputes the MV the expensive way (last row version per key,
    * then aggregate) and the hash match PROVES fold == recompute — the
    * incremental-view-maintenance theorem as a correctness gate.
    *
    * Plan shape: one keyed window shuffle (per-key op order — the same
    * partitioning a changelog topic already has, so in production the
    * exchange is free) and one tiny MV-group aggregation. Per-batch cost
    * scales with the DELTA, not the table: this is what a consumer does
    * with the reference's stream instead of re-scanning the source.
    */
  def incrMv(s: SparkSession, dir: String): DataFrame = {
    val ops = events(s, dir)
      .filter(col("event_type").isin("signup", "click", "error"))
      .select(
        (col("event_id") % 997).cast("long").as("rid"),
        unix_millis(col("ts")).as("tms"),
        col("event_id"),
        // upsert semantics: insert/update set the row image, delete clears it
        when(col("event_type") === "error", lit(0L))
          .otherwise(round(col("value") * 100).cast("long")).as("cur"),
        when(col("event_type") === "error", lit(0L)).otherwise(lit(1L)).as("live"))
    foldDeltas(ops)
  }

  /** The fold itself, reusable over any op stream with columns
    * (rid, tms, event_id, cur, live) — PropertySpec-style fuzzing drives
    * it with synthetic changelogs.
    */
  private[graft] def foldDeltas(ops: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("rid")).orderBy(col("tms"), col("event_id"))
    ops
      .withColumn("delta_cents", col("cur") - lag(col("cur"), 1, 0L).over(w))
      .withColumn("delta_live", col("live") - lag(col("live"), 1, 0L).over(w))
      .groupBy((col("rid") % 10).cast("long").as("mv_group"))
      .agg(sum(col("delta_live")).cast("long").as("n_live"),
        sum(col("delta_cents")).cast("long").as("sum_cents"))
  }

  /** Weighted sampling (Efraimidis-Spirakis), integer-exact: rank by
    * `u^(1/w)` is distributed EXACTLY as rank by `max of w iid uniforms`
    * (both have CDF x^w), so each document draws `w` deterministic
    * md5-derived 60-bit replica hashes and keeps the max as its priority —
    * no floating-point pow/ln whose last-ulp engine differences could flip
    * a ranking, and DuckDB replays the draw bit-exactly. Weight = one
    * replica per 100 chars of text (capped at 8): a doc twice the length
    * is proportionally likelier to win a slot, which is the mixture-
    * sampling contract.
    *
    * Scale shape: the replica explode is bounded (<= 8x), max-combines
    * map-side to one row per doc before any shuffle, and the global top-k
    * plans as TakeOrderedAndProject (per-partition heads, no full sort).
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(1L) + least(lit(7L), (length(col("text")) / lit(100)).cast("long"))).as("w")
    def replicaHash(rep: Column): Column =
      conv(substring(md5(concat_ws(":", col("doc_id"), rep)), 1, 15), 16, 10).cast("long")
    Spread.byKey(docs(s, dir), col("doc_id"))
      .select(col("doc_id"), w)
      .select(col("doc_id"), col("w"), explode(sequence(lit(1L), col("w"))).as("rep"))
      .groupBy(col("doc_id"), col("w"))
      .agg(max(replicaHash(col("rep"))).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(20)
  }

  /** Cohort retention matrix: users bucketed by the absolute week of
    * their first event, counted in each later week they were active —
    * the (cohort x offset) triangle every product-analytics warehouse
    * derives from an event stream. One groupBy(user) pass carries BOTH
    * the cohort min and the distinct-week set (bounded by the calendar,
    * not the event count), so the plan is two shuffles total and no
    * countDistinct over raw events.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val wk = floor(unix_millis(col("ts")) / lit(604800000L)).cast("long")
    events(s, dir)
      .select(col("user_id"), wk.as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"), collect_set(col("wk")).as("wks"))
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Statistical anomaly gate — the drift/quality monitor a pipeline
    * runs over what it lands: events more than 3 population sigmas from
    * their type's mean, decided by the EXACT cross-multiplied integer
    * inequality (n*v - S)^2 > 9*(n*S2 - S^2) in decimal(38,0)/int128 —
    * no sqrt, no doubles, so both engines agree on every boundary case
    * bit-for-bit.
    *
    * Scale shape: one map-side-combined moments pass (3 numbers per
    * group, mergeable — the same shape a streaming monitor keeps as
    * state), moments broadcast back, and a stateless flag scan. Nothing
    * shuffles but the tiny moment and result tables.
    */
  def anomalyEvents(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = events(s, dir).select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val m = e.groupBy(col("event_type")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("cents").cast(dec)).as("s"),
      sum((col("cents") * col("cents")).cast(dec)).as("s2"))
    val dev = col("n") * col("cents").cast(dec) - col("s")
    e.join(broadcast(m), "event_type")
      .filter(dev * dev > lit(9).cast(dec) * (col("n") * col("s2") - col("s") * col("s")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_anomalies"),
        min(col("event_id")).as("first_anom"),
        max(col("event_id")).as("last_anom"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incr_mv" -> incrMv _,
    "q_weighted_sample" -> weightedSample _,
    "q_retention" -> retention _,
    "q_anomaly_events" -> anomalyEvents _)

  val oracleSql: Map[String, String] = Map(
    // the RECOMPUTE path: last row version per key, then aggregate — a
    // hash match proves the Spark side's delta fold telescopes to it
    "q_incr_mv" ->
      """WITH ops AS (
        |  SELECT event_id % 997 AS rid, epoch_ms(ts) AS tms, event_id,
        |    CASE WHEN event_type = 'error' THEN 0
        |         ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cur,
        |    CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS live
        |  FROM events WHERE event_type IN ('signup', 'click', 'error')),
        |last AS (
        |  SELECT rid, cur, live,
        |    row_number() OVER (PARTITION BY rid ORDER BY tms DESC, event_id DESC) AS rn
        |  FROM ops)
        |SELECT CAST(rid % 10 AS BIGINT) AS mv_group,
        |  CAST(SUM(live) AS BIGINT) AS n_live,
        |  CAST(SUM(cur) AS BIGINT) AS sum_cents
        |FROM last WHERE rn = 1 GROUP BY 1""".stripMargin,

    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, 1 + least(7, length(text) // 100) AS w FROM documents),
        |r AS (SELECT doc_id, w, unnest(generate_series(1, w)) AS rep FROM w),
        |p AS (SELECT doc_id, w,
        |  CAST(concat('0x', substr(md5(doc_id || ':' || rep), 1, 15)) AS BIGINT) AS h
        |  FROM r)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, MAX(h) AS priority
        |FROM p GROUP BY 1, 2 ORDER BY priority DESC, doc_id LIMIT 20""".stripMargin,

    // HUGEINT (int128) mirrors Spark's decimal(38,0): both exact, both
    // agree on every strict-inequality boundary
    "q_anomaly_events" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(cents) AS HUGEINT) AS s,
        |        CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        |      FROM e GROUP BY 1),
        |a AS (SELECT e.event_type, e.event_id
        |      FROM e JOIN m USING (event_type)
        |      WHERE (m.n * cents - m.s) * (m.n * cents - m.s)
        |            > 9 * (m.n * m.s2 - m.s * m.s))
        |SELECT event_type, COUNT(*) AS n_anomalies,
        |  MIN(event_id) AS first_anom, MAX(event_id) AS last_anom
        |FROM a GROUP BY 1""".stripMargin,

    "q_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch_ms(ts) // 604800000 AS BIGINT) AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1)
        |SELECT c.cohort_wk, CAST(uw.wk - c.cohort_wk AS BIGINT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM uw JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin)
}
