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

  test("cluster passwords: secret refs resolve at use time, state dir owner-only") {
    val dir = Files.createTempDirectory("graft-secret")
    val store = new StateStore(dir.toString)

    // env: ref — a missing variable fails loudly (same contract as a
    // missing file: ref), never a silent empty password
    intercept[IllegalStateException] {
      StateStore.resolveSecret("env:GRAFT_NO_SUCH_VAR")
    }
    sys.env.headOption.foreach { case (k, v) =>
      assert(StateStore.resolveSecret("env:" + k) == v)
    }
    // file: ref — resolves to trimmed file contents
    val secretFile = Files.createTempFile("graft-pw", ".txt")
    Files.write(secretFile, "s3cr3t\n".getBytes("UTF-8"))
    assert(StateStore.resolveSecret("file:" + secretFile) == "s3cr3t")
    // literal passthrough (test fixtures)
    assert(StateStore.resolveSecret("plain") == "plain")

    // what's persisted is the REF, not the credential
    store.addCluster(StateStore.Cluster("c1", "h", 3306, "u", "file:" + secretFile))
    val onDisk = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, "clusters.jsonl")), "UTF-8")
    assert(!onDisk.contains("s3cr3t"))
    assert(store.listClusters.head.resolvedPassword == "s3cr3t")

    // dir + files are owner-only on POSIX filesystems
    import scala.jdk.CollectionConverters._
    val dirPerms = Files.getPosixFilePermissions(dir).asScala.map(_.toString)
    assert(!dirPerms.exists(p => p.startsWith("GROUP") || p.startsWith("OTHERS")), dirPerms)
    val filePerms = Files.getPosixFilePermissions(
      java.nio.file.Paths.get(dir.toString, "clusters.jsonl")).asScala.map(_.toString)
    assert(!filePerms.exists(p => p.startsWith("GROUP") || p.startsWith("OTHERS")), filePerms)
  }
}
