package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.server.Api
import graft.state.StateStore

class ApiSpec extends SparkSuite {

  private def newApi() = new Api(new StateStore(
    Files.createTempDirectory("graft-api").toString))

  test("table add/list/del lifecycle with format validation") {
    val api = newApi()
    assert(api.tableAdd("svc", "cl1", "db1", "t1", "mysql", "kafka", "json").ok)
    assert(!api.tableAdd("svc", "cl1", "db1", "t2", "mysql", "kafka", "protobuf").ok)
    assert(api.tableList().map(_.table) == Seq("t1"))
    assert(api.tableList(Some("other")).isEmpty)
    val key = api.tableList().head.key
    assert(api.tableDel(key).ok)
    assert(!api.tableDel(key).ok)
    assert(api.tableList().isEmpty)
  }

  test("schema register + cluster pos + health") {
    val api = newApi()
    assert(api.schemaRegister("db1", "t1", "uuid:1-10",
      StructType(Seq(StructField("f1", LongType)))).ok)
    assert(api.clusterPos("cl1").isEmpty)
    assert(api.health.ok)
  }
}
