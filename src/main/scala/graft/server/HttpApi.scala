package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.state.StateStore

/** REST binding for the control-plane [[Api]] (§2.7), mirroring the
  * reference's endpoint surface (/root/reference/server/server.go:37-43):
  *
  *  - `GET  /health`            → 200 "OK"
  *  - `GET  /table?service=`    → registrations JSON list
  *  - `POST /table`             → `{"cmd":"add"| "del", ...}`
  *    (server/table_handler.go:90-131 command shape)
  *  - `POST /schema`            → `{"db","table","gtid","schema"}` with
  *    `schema` as a Spark StructType JSON (schema_handler.go:47-89)
  *  - `GET  /schema?db=&table=` → current schema JSON
  *  - `GET  /cluster?cluster=`  → last position
  *  - `POST /cluster`           → save position `{"cluster","seqno","gtid"}`
  *
  * Built on the JDK's HttpServer — zero extra dependencies; the reference's
  * 705-line HTML UI (`server/index.go`) is intentionally out of scope, the
  * JSON surface is the operable contract. Control-plane only: request
  * volume is humans + schedulers, so a single small thread pool is right.
  */
class HttpApi(api: Api, state: StateStore,
              config: Map[String, String] = HttpApi.defaultConfig) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def port: Int = server.getAddress.getPort

  def start(bindPort: Int = 0): Int = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    server.createContext("/health", (ex: HttpExchange) => respond(ex, 200, textOk("OK")))
    server.createContext("/table", (ex: HttpExchange) => safely(ex)(handleTable))
    server.createContext("/schema", (ex: HttpExchange) => safely(ex)(handleSchema))
    server.createContext("/cluster", (ex: HttpExchange) => safely(ex)(handleCluster))
    server.createContext("/config", (ex: HttpExchange) => safely(ex)(handleConfig))
    pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    server.setExecutor(pool)
    server.start()
    port
  }

  def stop(): Unit = synchronized {
    if (server != null) server.stop(0)
    // HttpServer.stop does NOT shut down a caller-supplied executor; its
    // non-daemon threads would keep the JVM alive after stop()
    if (pool != null) pool.shutdown()
  }

  // ----------------------------------------------------------- handlers

  private def handleTable(ex: HttpExchange): Unit = ex.getRequestMethod match {
    case "GET" =>
      val svc = Option(queryParam(ex, "service"))
      val arr = mapper.createArrayNode()
      api.tableList(svc).foreach { r =>
        val n = arr.addObject()
        n.put("key", r.key); n.put("service", r.service); n.put("cluster", r.cluster)
        n.put("db", r.db); n.put("table", r.table); n.put("input", r.input)
        n.put("output", r.output); n.put("outputFormat", r.outputFormat)
        n.put("version", r.version); n.put("state", r.state)
      }
      respond(ex, 200, mapper.writeValueAsString(arr))
    case "POST" =>
      val body = readJson(ex)
      body.get("cmd").asText match {
        case "add" =>
          val params = Option(body.get("params")).map { p =>
            val it = p.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText) }
            b.result()
          }.getOrElse(Map.empty[String, String])
          val res = api.tableAdd(
            body.get("service").asText, body.get("cluster").asText,
            body.get("db").asText, body.get("table").asText,
            body.get("input").asText, body.get("output").asText,
            body.get("outputFormat").asText,
            Option(body.get("version")).map(_.asInt).getOrElse(0), params)
          respond(ex, if (res.ok) 200 else 400, resultJson(res))
        case "del" =>
          val res = api.tableDel(body.get("key").asText)
          respond(ex, if (res.ok) 200 else 404, resultJson(res))
        case other => respond(ex, 400, resultJson(Api.Err(s"unknown cmd: $other")))
      }
    case _ => respond(ex, 405, textOk("method not allowed"))
  }

  private def handleSchema(ex: HttpExchange): Unit = ex.getRequestMethod match {
    case "GET" =>
      val (db, table) = (queryParam(ex, "db"), queryParam(ex, "table"))
      state.currentSchema(db, table) match {
        case Some(st) => respond(ex, 200, st.json)
        case None => respond(ex, 404, textOk(s"no schema for $db.$table"))
      }
    case "POST" =>
      val body = readJson(ex)
      Option(body.get("cmd")).map(_.asText).getOrElse("register") match {
        case "register" =>
          val schema = org.apache.spark.sql.types.DataType
            .fromJson(body.get("schema").toString match {
              case s if s.startsWith("\"") => body.get("schema").asText // json-as-string
              case s => s
            }).asInstanceOf[org.apache.spark.sql.types.StructType]
          val res = api.schemaRegister(body.get("db").asText, body.get("table").asText,
            body.get("gtid").asText, schema)
          respond(ex, 200, resultJson(res))
        case "change" =>
          // schema_handler.go:91-125 MutateTable: apply an ALTER clause to
          // the current version and push the result
          val (db, table) = (body.get("db").asText, body.get("table").asText)
          state.currentSchema(db, table) match {
            case None => respond(ex, 404, textOk(s"no schema for $db.$table"))
            case Some(cur) =>
              val ts = graft.core.Schema.fromStructType(db, table, cur)
              graft.changelog.AlterSchema.mutate(ts, body.get("alter").asText) match {
                case Right(next) =>
                  val res = api.schemaRegister(db, table, body.get("gtid").asText,
                    graft.core.Schema.toStructType(next))
                  respond(ex, 200, resultJson(res))
                case Left(reason) => respond(ex, 400, textOk(reason))
              }
          }
        case other => respond(ex, 400, textOk(s"unknown cmd: $other"))
      }
    case _ => respond(ex, 405, textOk("method not allowed"))
  }

  private def handleCluster(ex: HttpExchange): Unit = ex.getRequestMethod match {
    case "GET" => queryParam(ex, "cluster") match {
      case null => // list registered clusters (cluster_handler.go list)
        val arr = mapper.createArrayNode()
        state.listClusters.foreach { c =>
          val n = arr.addObject()
          n.put("name", c.name); n.put("host", c.host); n.put("port", c.port)
          n.put("user", c.user) // password never echoed
        }
        respond(ex, 200, mapper.writeValueAsString(arr))
      case cluster =>
        api.clusterPos(cluster) match {
          case Some(p) =>
            val n = mapper.createObjectNode()
            n.put("cluster", p.cluster); n.put("seqno", p.seqno); n.put("gtid", p.gtid)
            respond(ex, 200, mapper.writeValueAsString(n))
          case None => respond(ex, 404, textOk("no position"))
        }
    }
    case "POST" =>
      val body = readJson(ex)
      Option(body.get("cmd")).map(_.asText).getOrElse("pos") match {
        case "add" =>
          state.addCluster(StateStore.Cluster(body.get("name").asText,
            body.get("host").asText, body.get("port").asInt,
            body.get("user").asText,
            Option(body.get("password")).map(_.asText).getOrElse("")))
          respond(ex, 200, resultJson(Api.Ok(s"cluster ${body.get("name").asText} added")))
        case "del" =>
          state.delCluster(body.get("name").asText)
          respond(ex, 200, resultJson(Api.Ok(s"cluster ${body.get("name").asText} deleted")))
        case "pos" =>
          state.savePosition(body.get("cluster").asText, body.get("seqno").asLong,
            body.get("gtid").asText)
          respond(ex, 200, resultJson(Api.Ok("position saved")))
        case other => respond(ex, 400, textOk(s"unknown cmd: $other"))
      }
    case _ => respond(ex, 405, textOk("method not allowed"))
  }

  private def handleConfig(ex: HttpExchange): Unit = ex.getRequestMethod match {
    case "GET" =>
      val n = mapper.createObjectNode()
      config.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
      respond(ex, 200, mapper.writeValueAsString(n))
    case _ => respond(ex, 405, textOk("method not allowed"))
  }

  // ------------------------------------------------------------ plumbing

  private def safely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try f(ex)
    catch { case t: Throwable => respond(ex, 400, textOk(s"bad request: ${t.getMessage}")) }

  private def resultJson(r: Api.Result): String = {
    val n = mapper.createObjectNode()
    n.put("ok", r.ok); n.put("message", r.message)
    mapper.writeValueAsString(n)
  }

  private def textOk(msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("message", msg)
    mapper.writeValueAsString(n)
  }

  private def readJson(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  private def queryParam(ex: HttpExchange, name: String): String =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&"))
      .map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name =>
        java.net.URLDecoder.decode(v, StandardCharsets.UTF_8) }
      .orNull

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}

object HttpApi {
  /** Throughput-bounding defaults surfaced at /config — the reference's
    * knobs (config/config.go:216-226).
    */
  val defaultConfig: Map[String, String] = Map(
    "max_batch_size" -> "4096",
    "max_batch_size_bytes" -> "33554432",
    "max_file_size" -> "1073741824",
    "max_message_bytes" -> "31457280",
    "shuffle_partitions" -> "32")
}
