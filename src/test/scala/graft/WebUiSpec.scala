package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.server.{Api, HttpApi, WebUi}
import graft.state.StateStore

/** The operator HTML UI (§2.7) and its wire dialect — the counterpart of the
  * reference's `server/index.go`: the page itself at `/`, plus the
  * form-encoded commands its JavaScript issues (`cmd=list` NDJSON with
  * filter/offset/limit and the limit+1 next-page probe, `?cmd=add`/`?cmd=del`
  * with serialized form bodies, and the `GET /config?cmd=get` /
  * `POST /config?cmd=set` editor round trip).
  */
class WebUiSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def postForm(port: Int, path: String, fields: (String, String)*): HttpResponse[String] = {
    val body = fields.map { case (k, v) =>
      URLEncoder.encode(k, UTF_8) + "=" + URLEncoder.encode(v, UTF_8)
    }.mkString("&")
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/x-www-form-urlencoded").build(),
      HttpResponse.BodyHandlers.ofString())
  }

  private def withServer(f: Int => Unit): Unit = {
    val state = new StateStore(Files.createTempDirectory("graft-webui").toString)
    val http = new HttpApi(new Api(state), state)
    val port = http.start()
    try f(port) finally http.stop()
  }

  private def ndRows(r: HttpResponse[String]): Seq[String] =
    r.body().split("\n").toSeq.filter(_.nonEmpty)

  test("root serves the self-contained HTML page") {
    withServer { port =>
      val r = get(port, "/")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      // the four operator tabs and no external resources (egress-less envs)
      for (tab <- Seq("Tables", "Clusters", "Schemas", "Settings"))
        assert(r.body().contains(tab), tab)
      assert(!r.body().contains("https://"), "page must be self-contained")
      assert(r.body() == WebUi.page)
      // non-routed paths under the fallback context 404 rather than echo the page
      assert(get(port, "/nonsense").statusCode() == 404)
    }
  }

  test("form dialect: table add, NDJSON list with filter, del by row fields") {
    withServer { port =>
      for (i <- 1 to 3) {
        val add = postForm(port, "/table?cmd=add",
          "service" -> "svc", "cluster" -> s"cl$i", "db" -> "db1", "table" -> s"t$i",
          "input" -> "mysql", "output" -> "kafka", "outputFormat" -> "json",
          "version" -> "0", "params" -> "")
        assert(add.statusCode() == 200, add.body())
      }
      // list: one JSON object per line (index.go:505-517 parses line-wise)
      val all = ndRows(postForm(port, "/table", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "26"))
      assert(all.size == 3)
      assert(all.forall(_.startsWith("{")))
      // substring filter across fields, case-insensitive
      val filtered = ndRows(postForm(port, "/table", "cmd" -> "list",
        "filter" -> "CL2", "offset" -> "0", "limit" -> "26"))
      assert(filtered.size == 1 && filtered.head.contains("\"cl2\""))
      // del posts the listed row's own fields back (index.go:618-622)
      val del = postForm(port, "/table?cmd=del",
        "service" -> "svc", "cluster" -> "cl2", "db" -> "db1", "table" -> "t2",
        "output" -> "kafka", "version" -> "0")
      assert(del.statusCode() == 200, del.body())
      assert(ndRows(postForm(port, "/table", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "26")).size == 2)
      // deleting a non-registered row reports the error the dialog displays
      assert(postForm(port, "/table?cmd=del",
        "service" -> "svc", "cluster" -> "cl2", "db" -> "db1", "table" -> "t2",
        "output" -> "kafka", "version" -> "0").statusCode() == 404)
    }
  }

  test("pagination follows the limit+1 probe contract") {
    withServer { port =>
      for (i <- 1 to 7)
        postForm(port, "/cluster?cmd=add", "name" -> f"c$i%02d", "host" -> "h",
          "port" -> "3306", "user" -> "u", "pw" -> "")
      // page size 3: the UI asks for 4; a 4th row means "Next" enabled
      val p0 = ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "4"))
      assert(p0.size == 4)
      val p2 = ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "", "offset" -> "6", "limit" -> "4"))
      assert(p2.size == 1, "last page holds only the 7th row")
      // limit omitted / 0 → unbounded (table_handler.go:157-161)
      assert(ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "0")).size == 7)
      // past-the-end offset → empty response, the UI steps back a page
      assert(ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "", "offset" -> "40", "limit" -> "4")).isEmpty)
    }
  }

  test("cluster and schema form lifecycles") {
    withServer { port =>
      // cluster: pw field (page) lands as the stored password, never echoed
      assert(postForm(port, "/cluster?cmd=add", "name" -> "prod", "host" -> "db.internal",
        "port" -> "3306", "user" -> "tapper", "pw" -> "secret").statusCode() == 200)
      val crow = ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "prod", "offset" -> "0", "limit" -> "0")).head
      assert(crow.contains("\"db.internal\"") && !crow.contains("secret"))
      assert(postForm(port, "/cluster?cmd=del", "name" -> "prod").statusCode() == 200)
      assert(ndRows(postForm(port, "/cluster", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "0")).isEmpty)

      // schema: name is db.table, body a Spark StructType JSON
      val st = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
      assert(postForm(port, "/schema?cmd=add", "name" -> "db1.t1", "type" -> "struct",
        "body" -> st.json).statusCode() == 200)
      val srow = ndRows(postForm(port, "/schema", "cmd" -> "list",
        "filter" -> "", "offset" -> "0", "limit" -> "0")).head
      assert(srow.contains("\"db1.t1\"") && srow.contains("struct"))
      // the registered schema is live for the engine, not just the listing
      assert(get(port, "/schema?db=db1&table=t1").statusCode() == 200)
      assert(postForm(port, "/schema?cmd=del", "name" -> "db1.t1").statusCode() == 200)
      assert(get(port, "/schema?db=db1&table=t1").statusCode() == 404)
    }
  }

  test("config editor round trip: cmd=get text, cmd=set parse, JSON GET reflects") {
    withServer { port =>
      val txt = get(port, "/config?cmd=get")
      assert(txt.statusCode() == 200)
      assert(txt.body().contains("max_batch_size: 4096"))
      // save an edited config; blank lines and comments tolerated
      val edited = txt.body().replace("max_batch_size: 4096", "max_batch_size: 8192") +
        "\n# tuned\n\nnew_knob: on"
      val set = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/config?cmd=set"))
        .POST(HttpRequest.BodyPublishers.ofString(edited)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(set.statusCode() == 200, set.body())
      assert(get(port, "/config?cmd=get").body().contains("max_batch_size: 8192"))
      // programmatic JSON GET sees the same live values
      val js = get(port, "/config").body()
      assert(js.contains("\"max_batch_size\":\"8192\"") && js.contains("\"new_knob\":\"on\""))
    }
  }

  test("JSON dialect still served on the same endpoints") {
    withServer { port =>
      val add = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/table"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"cmd":"add","service":"s","cluster":"c","db":"d","table":"t",
            |"input":"mysql","output":"kafka","outputFormat":"json"}""".stripMargin))
        .header("Content-Type", "application/json").build(),
        HttpResponse.BodyHandlers.ofString())
      assert(add.statusCode() == 200, add.body())
      val listed = get(port, "/table")
      assert(listed.statusCode() == 200 && listed.body().startsWith("["))
    }
  }
}
