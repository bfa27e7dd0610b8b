package graft.tools

/** Plan-shape audit over the whole catalog: prints, per query, the
  * red-flag operator counts a 100 TB reviewer greps for — cartesian
  * products, broadcast nested-loop joins, sort-based aggregates, and
  * exchanges that carry a wide text payload column. Textual heuristics
  * over the analyzed physical plan; findings are leads, not verdicts.
  * Dev scaffolding.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val skip = Set[String]() // streaming rows plan lazily below too
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        try {
          val df = fn(s, sf)
          val p = df.queryExecution.executedPlan.toString
          val cart = p.linesIterator.count(_.contains("CartesianProduct"))
          val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
          val sortAgg = p.linesIterator.count(_.contains("SortAggregate"))
          // an Exchange line listing a text-ish payload column: the
          // shuffle would carry document bodies
          val textEx = p.linesIterator.count(l =>
            l.contains("Exchange") &&
              ("(?<![A-Za-z])(text|payload)#".r.findFirstIn(l).isDefined))
          val flags = Seq(
            if (cart > 0) s"cartesian=$cart" else "",
            if (bnlj > 0) s"bnlj=$bnlj" else "",
            if (sortAgg > 0) s"sortAgg=$sortAgg" else "",
            if (textEx > 0) s"textExchange=$textEx" else "").filter(_.nonEmpty)
          if (flags.nonEmpty) println(f"FLAG $name%-24s ${flags.mkString(" ")}")
        } catch {
          case e: Throwable =>
            println(f"SKIP $name%-24s (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)})")
        }
      }
    }
    println("audit done")
    s.stop()
  }
}
