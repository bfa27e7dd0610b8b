package graft.state

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.types.StructType

import graft.core.Schema.TableSchema

/** Control-plane state: registrations + versioned schemas + offsets.
  *
  * The reference keeps 7 MySQL tables (`state/manager.go:179-321`) because
  * N worker processes coordinate through row locks. On Spark the driver is
  * the single coordinator, so state collapses to a small durable store:
  * registrations (which tables to ingest, where to), schema versions
  * (gtid-fenced — state/state.go:404-475), and per-task positions
  * (GTID/seqno high-watermarks; streaming offsets live in Spark
  * checkpoints). Work distribution is Spark's scheduler, so the single-
  * driver deployment needs no row locks; for the multi-driver/HA shape
  * the reference's `GetTableTask FOR UPDATE SKIP LOCKED` leases
  * (state/lock.go:31-169) are implemented as SQL-backed claim/heartbeat/
  * expiry-steal in [[Lease]] (LeaseSpec runs them against live Derby).
  *
  * Storage is a JSON-lines file per collection (tiny control data, not a
  * data path); swap `StateBackend` for JDBC in a multi-driver deployment.
  */
object StateStore {

  /** One ingestion task: (source table × output × format × version) —
    * types.TableLoc, /root/reference/types/types.go:35-43.
    */
  final case class Registration(
      service: String,
      cluster: String,
      db: String,
      table: String,
      input: String, // mysql | file | kafka
      output: String, // kafka | file | hdfs | s3 | sql
      outputFormat: String, // json | avro | msgpack | mysql | ansisql | *_idempotent
      version: Int = 0,
      params: Map[String, String] = Map.empty, // RowFilter / NoDeleteOnUpdate / schedule...
      state: String = "unsynced") { // unsynced -> synced (state/state.go:633-654)
    def key: String = s"$service/$cluster/$db/$table/$output/v$version"
  }

  /** gtid-fenced schema version (state/state.go:451-475: versioned replace
    * guarded by schema_gtid compare).
    */
  final case class SchemaVersion(db: String, table: String, gtid: String,
      schemaJson: String, at: Long)

  /** Durable position: seqno high-watermark + GTID set per cluster
    * (changelog/mysql.go:394-402 persistence; O4/O5).
    */
  final case class Position(cluster: String, seqno: Long, gtid: String)

  /** Source cluster connection record (server/cluster_handler.go:41-195).
    *
    * `password` is preferably a SECRET REFERENCE, not a literal:
    * `env:NAME` resolves from the environment and `file:/path` from an
    * operator-managed file, both at connect time via [[resolvedPassword]]
    * — so `clusters.jsonl` never holds the credential itself. Literals
    * still pass through for test fixtures; the store additionally keeps
    * the state dir owner-only (0700/0600).
    */
  final case class Cluster(name: String, host: String, port: Int,
                           user: String, password: String) {
    def resolvedPassword: String = StateStore.resolveSecret(password)
  }

  /** Resolve `env:NAME` / `file:/path` secret references; anything else is
    * returned as-is.
    */
  def resolveSecret(ref: String): String =
    if (ref == null) null
    else if (ref.startsWith("env:")) {
      // fail loudly, matching the file: branch — a misconfigured deployment
      // must not silently connect with an empty password
      val name = ref.stripPrefix("env:")
      sys.env.getOrElse(name, throw new IllegalStateException(
        s"secret ref 'env:$name' points at an unset environment variable"))
    }
    else if (ref.startsWith("file:"))
      new String(Files.readAllBytes(Paths.get(ref.stripPrefix("file:"))),
        java.nio.charset.StandardCharsets.UTF_8).trim
    else ref
}

/** Simple durable JSONL-backed store. All writes append + atomic-rename
  * compact; reads are full scans (control data is tiny).
  */
class StateStore(dir: String) {
  import StateStore._
  Files.createDirectories(Paths.get(dir))
  // Control-plane records can carry credentials (cluster registry): keep
  // the whole state dir owner-only. Best-effort — non-POSIX filesystems
  // (e.g. Windows) skip silently.
  restrict(Paths.get(dir), "rwx------")

  // NonFatal, not just UnsupportedOperationException: a state dir owned by
  // another user throws IOException/SecurityException, and "best-effort"
  // must not crash store construction over a permissions tighten.
  private def restrict(p: java.nio.file.Path, perms: String): Unit =
    try Files.setPosixFilePermissions(p,
      java.nio.file.attribute.PosixFilePermissions.fromString(perms))
    catch { case scala.util.control.NonFatal(_) => () }

  private def file(name: String) = Paths.get(dir, s"$name.jsonl")

  // Real JSON reader/writer (one line per record): params can carry row
  // filters with quotes/commas/newlines — regex splitting mis-parses those.
  private val mapper = new ObjectMapper()

  // --- registrations -------------------------------------------------------

  def register(r: Registration): Unit = synchronized {
    val others = listRegistrations.filterNot(_.key == r.key)
    writeRegistrations(others :+ r)
  }

  def deregister(key: String): Unit = synchronized {
    writeRegistrations(listRegistrations.filterNot(_.key == key))
  }

  def markSynced(key: String): Unit = synchronized {
    writeRegistrations(listRegistrations.map(r =>
      if (r.key == key) r.copy(state = "synced") else r))
  }

  def listRegistrations: Seq[Registration] = synchronized {
    val p = file("registrations")
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(parseRegistration)
  }

  private def writeRegistrations(rs: Seq[Registration]): Unit = {
    val tmp = Paths.get(dir, "registrations.tmp")
    Files.write(tmp, rs.map(renderRegistration).mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, file("registrations"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    restrict(file("registrations"), "rw-------")
  }

  private def renderRegistration(r: Registration): String = {
    val n = mapper.createObjectNode()
    n.put("service", r.service); n.put("cluster", r.cluster)
    n.put("db", r.db); n.put("table", r.table)
    n.put("input", r.input); n.put("output", r.output)
    n.put("outputFormat", r.outputFormat); n.put("version", r.version)
    val p = n.putObject("params")
    r.params.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    n.put("state", r.state)
    mapper.writeValueAsString(n)
  }

  private def parseRegistration(line: String): Registration = {
    val n = mapper.readTree(line)
    def str(k: String): String = { val v = n.get(k); if (v == null) "" else v.asText }
    val params = Option(n.get("params")).map { p =>
      p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    Registration(str("service"), str("cluster"), str("db"), str("table"),
      str("input"), str("output"), str("outputFormat"),
      Option(n.get("version")).map(_.asInt).getOrElse(0), params, str("state"))
  }

  // --- schema versions -----------------------------------------------------

  def pushSchema(db: String, table: String, gtid: String, schema: StructType): Unit =
    synchronized {
      val n = mapper.createObjectNode()
      n.put("db", db); n.put("table", table); n.put("gtid", gtid)
      n.put("at", System.currentTimeMillis()); n.put("schema", schema.json)
      Files.write(file("schemas"), (mapper.writeValueAsString(n) + "\n").getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  /** GTID fence: has a schema version for this table already been pushed
    * under `gtid`? (state/state.go:451-475 — versioned replace guarded by
    * schema_gtid compare; a replayed DDL event must be a no-op.)
    */
  def schemaApplied(db: String, table: String, gtid: String): Boolean = synchronized {
    val p = file("schemas")
    Files.exists(p) && Files.readAllLines(p).asScala.exists { l =>
      l.nonEmpty && {
        val n = mapper.readTree(l)
        n.get("db").asText == db && n.get("table").asText == table &&
          n.get("gtid").asText == gtid
      }
    }
  }

  def currentSchema(db: String, table: String): Option[StructType] = synchronized {
    val p = file("schemas")
    if (!Files.exists(p)) None
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      .map(mapper.readTree)
      .filter(n => n.get("db").asText == db && n.get("table").asText == table)
      .lastOption
      .map(n => org.apache.spark.sql.types.DataType
        .fromJson(n.get("schema").asText).asInstanceOf[StructType])
  }

  /** Latest pushed version per (db, table), for the UI's schema listing
    * (server/schema_handler.go:165-204 — the reference lists one row per
    * registered schema name).
    */
  def listSchemas: Seq[StateStore.SchemaVersion] = synchronized {
    val p = file("schemas")
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      .map { l =>
        val n = mapper.readTree(l)
        StateStore.SchemaVersion(n.get("db").asText, n.get("table").asText,
          n.get("gtid").asText, n.get("schema").asText, n.get("at").asLong)
      }
      .groupBy(v => (v.db, v.table)).values.map(_.last).toSeq
      .sortBy(v => (v.db, v.table))
  }

  /** Drop every pushed version of `db`.`table` (schema_handler.go:260-267
    * cmd=del). Atomic rewrite, same discipline as the cluster registry.
    */
  def delSchema(db: String, table: String): Unit = synchronized {
    val p = file("schemas")
    if (Files.exists(p)) {
      val keep = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).filterNot { l =>
        val n = mapper.readTree(l)
        n.get("db").asText == db && n.get("table").asText == table
      }
      val tmp = Paths.get(dir, "schemas.tmp")
      Files.write(tmp, keep.mkString("\n").getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  // --- clusters (source connection registry) -------------------------------

  def addCluster(c: Cluster): Unit = synchronized {
    writeClusters(listClusters.filterNot(_.name == c.name) :+ c)
  }

  def delCluster(name: String): Unit = synchronized {
    writeClusters(listClusters.filterNot(_.name == name))
  }

  def listClusters: Seq[Cluster] = synchronized {
    val p = file("clusters")
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val n = mapper.readTree(l)
      Cluster(n.get("name").asText, n.get("host").asText, n.get("port").asInt,
        n.get("user").asText, n.get("password").asText)
    }
  }

  private def writeClusters(cs: Seq[Cluster]): Unit = {
    val tmp = Paths.get(dir, "clusters.tmp")
    val lines = cs.map { c =>
      val n = mapper.createObjectNode()
      n.put("name", c.name); n.put("host", c.host); n.put("port", c.port)
      n.put("user", c.user); n.put("password", c.password)
      mapper.writeValueAsString(n)
    }
    Files.write(tmp, lines.mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, file("clusters"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    restrict(file("clusters"), "rw-------")
  }

  // --- positions (seqno / gtid high-watermarks) ----------------------------

  def savePosition(cluster: String, seqno: Long, gtid: String): Unit = synchronized {
    val n = mapper.createObjectNode()
    n.put("cluster", cluster); n.put("seqno", seqno); n.put("gtid", gtid)
    Files.write(file("positions"), (mapper.writeValueAsString(n) + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Monotone restore: on restart the seqno is skipped forward past the
    * last persisted watermark (changelog/mysql.go:415-417 semantics).
    */
  def lastPosition(cluster: String): Option[StateStore.Position] = synchronized {
    val p = file("positions")
    if (!Files.exists(p)) None
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      .map(mapper.readTree)
      .filter(_.get("cluster").asText == cluster)
      .lastOption.map(n => StateStore.Position(cluster,
        n.get("seqno").asLong, n.get("gtid").asText))
  }
}
