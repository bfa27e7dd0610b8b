package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.state.StateStore

/** REST binding for the control-plane [[Api]] (§2.7), mirroring the
  * reference's endpoint surface (/root/reference/server/server.go:37-43):
  *
  *  - `GET  /`                  → the operator HTML UI ([[WebUi]],
  *    counterpart of server/index.go:701-704)
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
  * Each mutating endpoint additionally accepts the reference UI's
  * form-encoded dialect (table_handler.go:195-239 parses both): `cmd` in the
  * query string or form body, `cmd=list` returning newline-delimited JSON
  * rows honoring `filter`/`offset`/`limit` (limit 0 with a non-zero offset
  * means unbounded, table_handler.go:157-161), and `GET /config?cmd=get` /
  * `POST /config?cmd=set` as the editable-text config round trip.
  *
  * Built on the JDK's HttpServer — zero extra dependencies. Control-plane
  * only: request volume is humans + schedulers, so a single small thread
  * pool is right.
  */
class HttpApi(api: Api, state: StateStore,
              config: Map[String, String] = HttpApi.defaultConfig) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Mutable view of the config knobs, editable via `POST /config?cmd=set`
    * (the reference persists the edited YAML the same way,
    * server/config.go). Reads and writes are whole-map swaps.
    */
  @volatile private var liveConfig: Map[String, String] = config

  def port: Int = server.getAddress.getPort

  def start(bindPort: Int = 0): Int = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    // "/" is the JDK server's fallback context: serve the UI on the exact
    // root path only, 404 anything else unrouted
    server.createContext("/", (ex: HttpExchange) =>
      if (ex.getRequestURI.getPath == "/") respondHtml(ex, WebUi.page)
      else respond(ex, 404, textOk("not found")))
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
      api.tableList(svc).foreach(r => arr.add(tableObj(r)))
      respond(ex, 200, mapper.writeValueAsString(arr))
    case "POST" =>
      val raw = readBody(ex)
      if (isForm(ex, raw)) handleTableForm(ex, formParams(ex, raw))
      else {
        val body = mapper.readTree(raw)
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
      }
    case _ => respond(ex, 405, textOk("method not allowed"))
  }

  /** The UI's form dialect for /table (index.go:489-523, 541-546, 618-622):
    * list → NDJSON, add/del → form fields instead of a JSON object. del
    * accepts either the registration key directly or the listed row's
    * fields (the page posts the whole row back).
    */
  private def handleTableForm(ex: HttpExchange, p: Map[String, String]): Unit =
    p.getOrElse("cmd", "") match {
      case "list" => respondText(ex, listRows(api.tableList(None).map(tableObj), p))
      case "add" =>
        val params = p.getOrElse("params", "").split(",").toSeq
          .filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k.trim -> v.trim }.toMap
        val res = api.tableAdd(p("service"), p("cluster"), p("db"), p("table"),
          p("input"), p("output"), p("outputFormat"),
          p.get("version").flatMap(_.toIntOption).getOrElse(0), params)
        respond(ex, if (res.ok) 200 else 400, resultJson(res))
      case "del" =>
        val key = p.getOrElse("key",
          s"${p("service")}/${p("cluster")}/${p("db")}/${p("table")}/${p("output")}/v${p.getOrElse("version", "0")}")
        val res = api.tableDel(key)
        respond(ex, if (res.ok) 200 else 404, resultJson(res))
      case other => respond(ex, 400, resultJson(Api.Err(s"unknown cmd: $other")))
    }

  private def handleSchema(ex: HttpExchange): Unit = ex.getRequestMethod match {
    case "GET" =>
      val (db, table) = (queryParam(ex, "db"), queryParam(ex, "table"))
      state.currentSchema(db, table) match {
        case Some(st) => respond(ex, 200, st.json)
        case None => respond(ex, 404, textOk(s"no schema for $db.$table"))
      }
    case "POST" =>
      val raw = readBody(ex)
      if (isForm(ex, raw)) { handleSchemaForm(ex, formParams(ex, raw)); return }
      val body = mapper.readTree(raw)
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

  /** UI form dialect for /schema: rows are `{name: "db.table", type, body}`
    * (schema_handler.go:165-204's SchemaRow shape); add registers the posted
    * StructType JSON as the current version, del drops every version.
    */
  private def handleSchemaForm(ex: HttpExchange, p: Map[String, String]): Unit =
    p.getOrElse("cmd", "") match {
      case "list" => respondText(ex, listRows(state.listSchemas.map(schemaObj), p))
      case "add" | "register" =>
        val Array(db, table) = p("name").split("\\.", 2)
        val st = org.apache.spark.sql.types.DataType.fromJson(p("body"))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val res = api.schemaRegister(db, table, p.getOrElse("gtid", ""), st)
        respond(ex, 200, resultJson(res))
      case "del" =>
        val Array(db, table) = p("name").split("\\.", 2)
        state.delSchema(db, table)
        respond(ex, 200, resultJson(Api.Ok(s"schema $db.$table deleted")))
      case other => respond(ex, 400, resultJson(Api.Err(s"unknown cmd: $other")))
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
      val raw = readBody(ex)
      if (isForm(ex, raw)) { handleClusterForm(ex, formParams(ex, raw)); return }
      val body = mapper.readTree(raw)
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

  /** UI form dialect for /cluster: the page's field is `pw`
    * (index.go:368), the JSON dialect uses `password` — accept both.
    */
  private def handleClusterForm(ex: HttpExchange, p: Map[String, String]): Unit =
    p.getOrElse("cmd", "") match {
      case "list" => respondText(ex, listRows(state.listClusters.map(clusterObj), p))
      case "add" =>
        state.addCluster(StateStore.Cluster(p("name"), p("host"),
          p.get("port").flatMap(_.toIntOption).getOrElse(3306),
          p.getOrElse("user", ""), p.getOrElse("pw", p.getOrElse("password", ""))))
        respond(ex, 200, resultJson(Api.Ok(s"cluster ${p("name")} added")))
      case "del" =>
        state.delCluster(p("name"))
        respond(ex, 200, resultJson(Api.Ok(s"cluster ${p("name")} deleted")))
      case other => respond(ex, 400, resultJson(Api.Err(s"unknown cmd: $other")))
    }

  private def handleConfig(ex: HttpExchange): Unit =
    (ex.getRequestMethod, Option(queryParam(ex, "cmd"))) match {
      case ("GET", Some("get")) =>
        // UI editor contract: plain editable `key: value` text
        respondText(ex, liveConfig.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k: $v" }.mkString("\n"))
      case ("GET", _) =>
        val n = mapper.createObjectNode()
        liveConfig.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
        respond(ex, 200, mapper.writeValueAsString(n))
      case ("POST", Some("set")) =>
        val parsed = readBody(ex).linesIterator
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { l =>
            val i = l.indexOf(':')
            if (i < 0) throw new IllegalArgumentException(s"bad config line: $l")
            l.substring(0, i).trim -> l.substring(i + 1).trim
          }.toMap
        liveConfig = parsed
        respond(ex, 200, resultJson(Api.Ok(s"${parsed.size} settings saved")))
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

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  /** The UI posts `application/x-www-form-urlencoded`; programmatic clients
    * post JSON. A `cmd` query param with a non-JSON body is also the form
    * dialect (the reference's `?cmd=add` + serialized form).
    */
  private def isForm(ex: HttpExchange, raw: String): Boolean = {
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    ct.startsWith("application/x-www-form-urlencoded") ||
      (!raw.trim.startsWith("{") && queryParam(ex, "cmd") != null)
  }

  /** Body form fields merged with query params; query wins (that's where
    * the UI puts `cmd` on add/del).
    */
  private def formParams(ex: HttpExchange, raw: String): Map[String, String] = {
    def parse(s: String): Map[String, String] =
      s.split("&").toSeq.filter(_.nonEmpty).map(_.split("=", 2)).collect {
        case Array(k, v) =>
          java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) ->
            java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
        case Array(k) => java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) -> ""
      }.toMap
    parse(raw) ++ parse(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
  }

  /** The reference's list-command contract (table_handler.go:140-193):
    * case-insensitive substring `filter` across the row's fields, then
    * `offset`/`limit` pagination (limit 0 → unbounded), one JSON object per
    * line. In-memory because the registry IS in-memory here — the registry
    * holds O(registered tables), not data-plane volume.
    */
  private def listRows(objs: Seq[com.fasterxml.jackson.databind.node.ObjectNode],
                       p: Map[String, String]): String = {
    val filter = p.getOrElse("filter", "").toLowerCase
    val offset = p.get("offset").flatMap(_.toLongOption).getOrElse(0L).max(0L)
    val lim = p.get("limit").flatMap(_.toLongOption).filter(_ > 0).getOrElse(Long.MaxValue)
    val kept = objs.filter { n =>
      filter.isEmpty || {
        val it = n.properties().iterator()
        var hit = false
        while (it.hasNext && !hit)
          hit = it.next().getValue.asText("").toLowerCase.contains(filter)
        hit
      }
    }
    val from = math.min(offset, kept.size.toLong).toInt
    val until = math.min(offset + math.min(lim, Int.MaxValue.toLong), kept.size.toLong).toInt
    val pageRows = kept.slice(from, until)
    if (pageRows.isEmpty) "" else pageRows.map(mapper.writeValueAsString).mkString("", "\n", "\n")
  }

  private def tableObj(r: StateStore.Registration): com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("key", r.key); n.put("service", r.service); n.put("cluster", r.cluster)
    n.put("db", r.db); n.put("table", r.table); n.put("input", r.input)
    n.put("output", r.output); n.put("outputFormat", r.outputFormat)
    n.put("version", r.version); n.put("state", r.state)
    n
  }

  private def clusterObj(c: StateStore.Cluster): com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("name", c.name); n.put("host", c.host); n.put("port", c.port)
    n.put("user", c.user) // password never echoed
    n
  }

  private def schemaObj(v: StateStore.SchemaVersion): com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("name", s"${v.db}.${v.table}"); n.put("type", "struct")
    n.put("body", v.schemaJson)
    n
  }

  private def queryParam(ex: HttpExchange, name: String): String =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&"))
      .map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name =>
        java.net.URLDecoder.decode(v, StandardCharsets.UTF_8) }
      .orNull

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def respondText(ex: HttpExchange, body: String): Unit =
    respond(ex, 200, body, "text/plain; charset=utf-8")

  private def respondHtml(ex: HttpExchange, body: String): Unit =
    respond(ex, 200, body, "text/html; charset=utf-8")
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
