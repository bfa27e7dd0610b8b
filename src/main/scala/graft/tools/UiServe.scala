package graft.tools

import java.nio.file.Files

import graft.server.{Api, HttpApi}
import graft.state.StateStore

/** Dev scaffold: run the control-plane HTTP server (REST + the [[graft.server.WebUi]]
  * page at `/`) on a fixed port for manual/browser inspection.
  * `sbt "runMain graft.tools.UiServe 8910"` — Ctrl-C to stop.
  */
object UiServe {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8910)
    val state = new StateStore(Files.createTempDirectory("graft-ui-serve").toString)
    val api = new Api(state)
    // seed a few rows so the page has something to show
    api.tableAdd("svc", "cl1", "db1", "orders", "mysql", "kafka", "json")
    api.tableAdd("svc", "cl1", "db1", "lineitem", "mysql", "file", "avro")
    state.addCluster(StateStore.Cluster("cl1", "127.0.0.1", 3306, "tapper", ""))
    val http = new HttpApi(api, state)
    val bound = http.start(port)
    println(s"[ui-serve] http://127.0.0.1:$bound/")
    Thread.currentThread.join()
  }
}
