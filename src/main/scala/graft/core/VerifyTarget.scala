package graft.core

/** The data dir currently under oracle verification.
  *
  * The dynamic-oracle stashes (PcaModels, ContrastiveIvfOracle,
  * BpeOracle) are keyed by data dir because the models they bake into
  * DuckDB SQL are corpus-derived; a long-lived session that runs the
  * same query over two dirs holds two stashes. `oracleEntries` must
  * dump the one for the dir the gate is actually replaying — picking
  * "whichever ends with sf0.01, else an arbitrary first" replays the
  * wrong corpus's literals whenever the gate targets another dir.
  * [[graft.Verify]] sets this before dumping `oracle_sql.json`; the
  * stashes resolve through [[pick]] and fall back to the old heuristic
  * only when no target is set (spec/dev contexts).
  */
object VerifyTarget {
  private val ref = new java.util.concurrent.atomic.AtomicReference[Option[String]](None)

  private def norm(d: String): String = d.replaceAll("/+$", "")

  def set(dir: String): Unit = { ref.set(Some(norm(dir))); () }

  /** Resolve a by-dir stash: the verification target's entry when set
    * and present, else the sf0.01 entry, else an arbitrary entry.
    */
  def pick[M](byDir: scala.collection.Map[String, M]): Option[M] = {
    val target = ref.get().flatMap(t => byDir.collectFirst {
      case (d, m) if norm(d) == t => m
    })
    target
      .orElse(byDir.collectFirst { case (d, m) if norm(d).endsWith("sf0.01") => m })
      .orElse(byDir.values.headOption)
  }
}
