package graft.core

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Output topic/path naming (/root/reference/config/topic.go:46-58).
  *
  * The reference renders Go templates of the form
  * `hp.{{.Service}}.{{.Db}}.{{.Table}}` with an optional snapshot
  * timestamp suffix so each periodic snapshot lands in a fresh
  * topic/directory. Same semantics, Scala-side.
  */
object Topics {

  final case class TopicParams(service: String, cluster: String, db: String,
      table: String, version: Int = 0, snapshottedAt: Option[Instant] = None)

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss").withZone(ZoneOffset.UTC)

  /** Default changelog topic: one stream per (service, db, table, version). */
  def changelogTopic(p: TopicParams): String =
    s"hp.${p.service}.${p.db}.${p.table}.v${p.version}"

  /** Snapshot topic: timestamped so re-snapshots never overwrite
    * (O8 — config/topic.go takes SnapshottedAt).
    */
  def snapshotTopic(p: TopicParams): String = {
    val ts = p.snapshottedAt.map(t => s".${tsFmt.format(t)}").getOrElse("")
    s"hp.${p.service}.${p.db}.${p.table}.v${p.version}$ts"
  }

  /** Render a custom template with {{.Field}} placeholders (the reference
    * exposes the template in config; we support the same variables).
    */
  def render(template: String, p: TopicParams): String =
    template
      .replace("{{.Service}}", p.service)
      .replace("{{.Cluster}}", p.cluster)
      .replace("{{.Db}}", p.db)
      .replace("{{.Table}}", p.table)
      .replace("{{.Version}}", p.version.toString)
}
