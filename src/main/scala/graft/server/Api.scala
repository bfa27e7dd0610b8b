package graft.server

import graft.state.StateStore
import graft.state.StateStore.Registration

/** Thin control-plane layer (§2.7): the reference's HTTP endpoints
  * (/root/reference/server/server.go:37-43 — /table /schema /cluster
  * /health) reduced to a command API over the state store. A REST wrapper
  * would bind these 1:1; the engine only needs the state mutations.
  */
object Api {
  sealed trait Result { def ok: Boolean; def message: String }
  final case class Ok(message: String) extends Result { val ok = true }
  final case class Err(message: String) extends Result { val ok = false }
}

class Api(state: StateStore) {
  import Api.{Err, Ok, Result}

  /** POST /table {"cmd":"add", ...} — server/table_handler.go:90-131. */
  def tableAdd(service: String, cluster: String, db: String, table: String,
               input: String, output: String, outputFormat: String,
               version: Int = 0, params: Map[String, String] = Map.empty): Result = {
    val validFormats = Set("json", "avro", "msgpack", "mysql", "ansisql",
      "mysql_idempotent", "ansisql_idempotent")
    if (!validFormats.contains(outputFormat))
      Err(s"unknown output format: $outputFormat")
    else {
      val r = Registration(service, cluster, db, table, input, output, outputFormat,
        version, params)
      state.register(r)
      Ok(s"registered ${r.key}")
    }
  }

  /** POST /table {"cmd":"del"} — deregistration. */
  def tableDel(key: String): Result =
    if (state.listRegistrations.exists(_.key == key)) {
      state.deregister(key); Ok(s"deregistered $key")
    } else Err(s"not registered: $key")

  /** GET /table list. */
  def tableList(service: Option[String] = None): Seq[Registration] =
    state.listRegistrations.filter(r => service.forall(_ == r.service))

  /** POST /schema register — MySQL schema → versioned state entry
    * (server/schema_handler.go:47-89).
    */
  def schemaRegister(db: String, table: String, gtid: String,
                     schema: org.apache.spark.sql.types.StructType): Result = {
    state.pushSchema(db, table, gtid, schema)
    Ok(s"schema for $db.$table at $gtid")
  }

  /** GET /cluster pos — positions per cluster. */
  def clusterPos(cluster: String): Option[StateStore.Position] =
    state.lastPosition(cluster)

  /** GET /health. */
  def health: Result = Ok("OK")
}
