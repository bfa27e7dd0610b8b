package graft.changelog

import scala.util.matching.Regex

/** DDL query classification for binlog QUERY events.
  *
  * The reference matches quoted/unquoted `ALTER TABLE` / `RENAME TABLE`
  * forms with a handler table of regexes and ignores BEGIN/COMMIT/
  * heartbeat/FLUSH statements (/root/reference/changelog/mysql.go:110-120,
  * :685-716). Semantics re-derived here (not copied): MySQL identifiers may
  * be bare or backquoted, optionally db-qualified.
  */
object Ddl {
  sealed trait DdlEvent
  final case class AlterTable(db: Option[String], table: String, rest: String) extends DdlEvent
  final case class RenameTable(db: Option[String], from: String, to: String) extends DdlEvent
  case object Ignored extends DdlEvent
  case object NotDdl extends DdlEvent

  private val ident = """(?:`([^`]+)`|([A-Za-z0-9_$]+))"""
  private val qualified = s"""(?:$ident\\s*\\.\\s*)?$ident"""

  private val alterRe: Regex =
    ("""(?is)^\s*ALTER\s+(?:ONLINE\s+|OFFLINE\s+)?(?:IGNORE\s+)?TABLE\s+""" + qualified + """\s+(.*)$""").r
  private val renameRe: Regex =
    ("""(?is)^\s*RENAME\s+TABLE\s+""" + qualified + """\s+TO\s+""" + qualified + """.*$""").r
  private val ignoredRe: Regex =
    """(?is)^\s*(BEGIN|COMMIT|ROLLBACK|FLUSH\b.*|GRANT\b.*|SET\b.*|ANALYZE\b.*|#.*)\s*$""".r

  private def pick(quoted: String, bare: String): Option[String] =
    Option(quoted).orElse(Option(bare))

  def classify(sql: String): DdlEvent = sql match {
    case alterRe(dbQ, dbB, tQ, tB, rest) =>
      AlterTable(pick(dbQ, dbB), pick(tQ, tB).get, rest.trim)
    case renameRe(dbQ, dbB, fQ, fB, _, _, tQ, tB) =>
      RenameTable(pick(dbQ, dbB), pick(fQ, fB).get, pick(tQ, tB).get)
    case ignoredRe(_) => Ignored
    case _            => NotDdl
  }

  def isDdl(sql: String): Boolean = classify(sql) match {
    case _: AlterTable | _: RenameTable => true
    case _                              => false
  }
}
