package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.server.{Api, HttpApi}
import graft.state.StateStore

/** End-to-end REST surface (§2.7): the reference's /health /table /schema
  * /cluster endpoints (server/server.go:37-43) over a live HTTP listener.
  */
class HttpApiSpec extends SparkSuite {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())

  private def withServer(f: Int => Unit): Unit = {
    val state = new StateStore(Files.createTempDirectory("graft-http").toString)
    val http = new HttpApi(new Api(state), state)
    val port = http.start()
    try f(port) finally http.stop()
  }

  test("health endpoint answers") {
    withServer { port =>
      val r = get(port, "/health")
      assert(r.statusCode() == 200 && r.body().contains("OK"))
    }
  }

  test("table add/list/del lifecycle over HTTP") {
    withServer { port =>
      val add = post(port, "/table",
        """{"cmd":"add","service":"svc","cluster":"cl1","db":"db1","table":"t1",
          |"input":"mysql","output":"kafka","outputFormat":"json",
          |"params":{"NoDeleteOnUpdate":"true"}}""".stripMargin)
      assert(add.statusCode() == 200, add.body())

      val bad = post(port, "/table",
        """{"cmd":"add","service":"s","cluster":"c","db":"d","table":"t",
          |"input":"mysql","output":"kafka","outputFormat":"nonsense"}""".stripMargin)
      assert(bad.statusCode() == 400)

      val list = get(port, "/table?service=svc")
      assert(list.statusCode() == 200)
      assert(list.body().contains("\"db\":\"db1\"") && list.body().contains("json"))

      val del = post(port, "/table", """{"cmd":"del","key":"svc/cl1/db1/t1/kafka/v0"}""")
      assert(del.statusCode() == 200, del.body())
      assert(!get(port, "/table").body().contains("db1"))
      val delAgain = post(port, "/table", """{"cmd":"del","key":"svc/cl1/db1/t1/kafka/v0"}""")
      assert(delAgain.statusCode() == 404)
    }
  }

  test("schema register + fetch round-trips a StructType") {
    withServer { port =>
      val schema = StructType(Seq(
        StructField("f1", LongType, nullable = false),
        StructField("f2", StringType)))
      val reg = post(port, "/schema",
        s"""{"db":"db1","table":"t1","gtid":"uuid:1-5","schema":${schema.json}}""")
      assert(reg.statusCode() == 200, reg.body())
      val got = get(port, "/schema?db=db1&table=t1")
      assert(got.statusCode() == 200)
      assert(DataType.fromJson(got.body()) == schema)
      assert(get(port, "/schema?db=db1&table=nope").statusCode() == 404)
    }
  }

  test("cluster position save + fetch") {
    withServer { port =>
      assert(get(port, "/cluster?cluster=cl1").statusCode() == 404)
      val save = post(port, "/cluster", """{"cluster":"cl1","seqno":42,"gtid":"uuid:1-9"}""")
      assert(save.statusCode() == 200)
      val got = get(port, "/cluster?cluster=cl1")
      assert(got.statusCode() == 200)
      assert(got.body().contains("\"seqno\":42") && got.body().contains("uuid:1-9"))
    }
  }

  test("cluster add/list/del; password never echoed") {
    withServer { port =>
      val add = post(port, "/cluster",
        """{"cmd":"add","name":"cl1","host":"db1.internal","port":3306,
          |"user":"tapper","password":"hunter2"}""".stripMargin)
      assert(add.statusCode() == 200)
      val list = get(port, "/cluster")
      assert(list.statusCode() == 200)
      assert(list.body().contains("db1.internal") && !list.body().contains("hunter2"))
      assert(post(port, "/cluster", """{"cmd":"del","name":"cl1"}""").statusCode() == 200)
      assert(get(port, "/cluster").body() == "[]")
    }
  }

  test("schema change applies an ALTER to the current version") {
    withServer { port =>
      val v1 = StructType(Seq(
        StructField("f1", LongType, nullable = false,
          new MetadataBuilder().putString("mysqlType", "bigint")
            .putLong("ordinal", 1).putBoolean("isPrimaryKey", true).build()),
        StructField("f3", IntegerType, nullable = true,
          new MetadataBuilder().putString("mysqlType", "int")
            .putLong("ordinal", 2).putBoolean("isPrimaryKey", false).build())))
      assert(post(port, "/schema",
        s"""{"db":"db1","table":"t1","gtid":"u:1","schema":${v1.json}}""").statusCode() == 200)
      val change = post(port, "/schema",
        """{"cmd":"change","db":"db1","table":"t1","gtid":"u:2","alter":"ADD f9 varchar(32)"}""")
      assert(change.statusCode() == 200, change.body())
      val got = get(port, "/schema?db=db1&table=t1")
      assert(DataType.fromJson(got.body()).asInstanceOf[StructType]
        .fieldNames.toSeq == Seq("f1", "f3", "f9"))
      // a PK drop is refused, version unchanged
      val bad = post(port, "/schema",
        """{"cmd":"change","db":"db1","table":"t1","gtid":"u:3","alter":"DROP f1"}""")
      assert(bad.statusCode() == 400)
    }
  }

  test("malformed JSON and unknown commands answer 400, server stays up") {
    withServer { port =>
      assert(post(port, "/table", "{not json").statusCode() == 400)
      assert(post(port, "/table", """{"cmd":"nonsense"}""").statusCode() == 400)
      assert(post(port, "/cluster", """{"cmd":"??"}""").statusCode() == 400)
      // still serving after the bad requests
      assert(get(port, "/health").statusCode() == 200)
    }
  }

  test("config endpoint surfaces throughput knobs") {
    withServer { port =>
      val r = get(port, "/config")
      assert(r.statusCode() == 200)
      assert(r.body().contains("\"max_batch_size\":\"4096\""))
    }
  }
}
