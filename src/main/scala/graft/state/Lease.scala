package graft.state

import java.sql.{Connection, DriverManager, Timestamp}

/** SQL-backed task leases — the reference's multi-worker coordination
  * (`state/lock.go:31-169` GetTableTask / RefreshTableLock): a worker
  * claims the first task whose lease is absent or EXPIRED, stamps
  * (worker_id, locked_at), heartbeats while working, and a crashed
  * worker's task becomes claimable after the timeout.
  *
  * The single-driver deployment does not need this (work distribution is
  * Spark's scheduler — [[StateStore]] doc); it exists for the
  * multi-driver/HA shape, where several schedulers share one state
  * database. Portability note: the reference takes the row lock with
  * `SELECT ... FOR UPDATE SKIP LOCKED` (MySQL 8, degrading to plain
  * FOR UPDATE below). This implementation claims via an ATOMIC
  * conditional UPDATE instead — `UPDATE ... WHERE task_id=? AND (free or
  * expired)` claims iff the row is still claimable, the update count is
  * the success signal, and no vendor locking syntax is needed — the same
  * no-double-claim guarantee on any SQL engine (Derby in specs, MySQL in
  * production). Candidates are scanned in task_id order; a lost race on
  * one candidate falls through to the next, which is what SKIP LOCKED
  * buys on MySQL.
  *
  * `refresh` returns false when the caller no longer holds the lease
  * (stolen after expiry) — the reference's RefreshTableLock contract; the
  * worker must then abandon the task. (The reference's
  * `IF(locked_at=NOW(), NOW()+1, ...)` nudge exists because MySQL reports
  * 0 affected rows for a no-change update; JDBC drivers here report
  * MATCHED rows, so the nudge is unnecessary.)
  */
object Lease {

  def ensureTable(url: String): Unit = withConn(url) { c =>
    // Engines disagree on identifier-case folding (Derby folds up, MySQL on
    // Linux keeps table names case-sensitive), so probe both spellings and
    // additionally tolerate an already-exists race on CREATE.
    def exists(name: String): Boolean = {
      val tables = c.getMetaData.getTables(null, null, name, null)
      try tables.next() finally tables.close()
    }
    if (!exists("GRAFT_LEASES") && !exists("graft_leases")) {
      val st = c.createStatement()
      try st.executeUpdate(
        """CREATE TABLE graft_leases (
          |  task_id VARCHAR(256) NOT NULL PRIMARY KEY,
          |  worker_id VARCHAR(128),
          |  locked_at TIMESTAMP)""".stripMargin)
      catch {
        // raced/secondary ensureTable: the table is there, which is all we want
        case e: java.sql.SQLException if exists("GRAFT_LEASES") || exists("graft_leases") => ()
      } finally st.close()
    }
  }

  /** Idempotently register a task as claimable. */
  def register(url: String, taskId: String): Unit = withConn(url) { c =>
    val check = c.prepareStatement("SELECT 1 FROM graft_leases WHERE task_id = ?")
    check.setString(1, taskId)
    val rs = check.executeQuery()
    val exists = rs.next()
    rs.close(); check.close()
    if (!exists) {
      val ins = c.prepareStatement(
        "INSERT INTO graft_leases (task_id, worker_id, locked_at) VALUES (?, NULL, NULL)")
      ins.setString(1, taskId)
      try ins.executeUpdate() catch {
        case e: java.sql.SQLIntegrityConstraintViolationException => () // raced insert: fine
      } finally ins.close()
    }
  }

  /** Claim the first available task (no lease, or lease older than
    * `timeoutSec`). Returns the claimed task id, or None when every task
    * is validly held.
    */
  def acquire(url: String, workerId: String, timeoutSec: Long): Option[String] =
    withConn(url) { c =>
      val list = c.prepareStatement(
        """SELECT task_id FROM graft_leases
          |WHERE worker_id IS NULL OR locked_at IS NULL
          |   OR locked_at <= {fn TIMESTAMPADD(SQL_TSI_SECOND, ?, CURRENT_TIMESTAMP)}
          |ORDER BY task_id""".stripMargin)
      list.setLong(1, -timeoutSec)
      val rs = list.executeQuery()
      val candidates = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toVector
      rs.close(); list.close()
      // atomic compare-and-claim per candidate; a lost race falls through
      candidates.iterator
        .flatMap(id => if (acquireOne(url, id, workerId, timeoutSec)) Some(id) else None)
        .nextOption()
    }

  /** Heartbeat: extend the lease iff still held by `workerId`. False
    * means the lease was lost (expired and stolen) — abandon the task.
    */
  def refresh(url: String, taskId: String, workerId: String): Boolean =
    withConn(url) { c =>
      val up = c.prepareStatement(
        "UPDATE graft_leases SET locked_at = CURRENT_TIMESTAMP WHERE task_id = ? AND worker_id = ?")
      up.setString(1, taskId)
      up.setString(2, workerId)
      try up.executeUpdate() == 1 finally up.close()
    }

  /** Release a held lease (no-op when not the holder). */
  def release(url: String, taskId: String, workerId: String): Unit =
    withConn(url) { c =>
      val up = c.prepareStatement(
        "UPDATE graft_leases SET worker_id = NULL, locked_at = NULL WHERE task_id = ? AND worker_id = ?")
      up.setString(1, taskId)
      up.setString(2, workerId)
      try up.executeUpdate() finally up.close()
    }

  /** The reference's ticket-sharded shared lock (`lock/lock.go:93-136`
    * TryLockShared: `GET_LOCK(name#i)` over i < n — at most n concurrent
    * holders cluster-wide, the cross-process form of the in-process
    * [[graft.stream.ClusterLimiter]]): ticket i is the lease row
    * `name#i`, claimed with the same atomic conditional UPDATE. Returns
    * the held ticket id for `refresh`/`release`.
    */
  def tryLockShared(url: String, name: String, n: Int, workerId: String,
                    timeoutSec: Long): Option[String] = {
    (0 until n).foreach(i => register(url, s"$name#$i"))
    (0 until n).iterator.flatMap { i =>
      val ticket = s"$name#$i"
      val claim = acquireOne(url, ticket, workerId, timeoutSec)
      if (claim) Some(ticket) else None
    }.nextOption()
  }

  /** Claim one SPECIFIC task iff free/expired (atomic). The expiry
    * boundary is INCLUSIVE — a lease exactly `timeoutSec` old IS
    * expired. With `<` a zero-timeout steal racing a heartbeat into the
    * same timestamp quantum was non-deterministic (connection pooling
    * made consecutive ops fast enough to land in one quantum and
    * LeaseSpec flaked); `<=` makes "timeout 0 ⇒ always stealable" hold
    * by construction, and for real timeouts the exact-boundary tick was
    * an arbitrary coin either way.
    */
  def acquireOne(url: String, taskId: String, workerId: String,
                 timeoutSec: Long): Boolean = withConn(url) { c =>
    val claim = c.prepareStatement(
      """UPDATE graft_leases SET worker_id = ?, locked_at = CURRENT_TIMESTAMP
        |WHERE task_id = ? AND (worker_id IS NULL OR locked_at IS NULL
        |   OR locked_at <= {fn TIMESTAMPADD(SQL_TSI_SECOND, ?, CURRENT_TIMESTAMP)})""".stripMargin)
    claim.setString(1, workerId)
    claim.setString(2, taskId)
    claim.setLong(3, -timeoutSec)
    try claim.executeUpdate() == 1 finally claim.close()
  }

  /** Current holder, for assertions/ops. */
  def holder(url: String, taskId: String): Option[(String, Timestamp)] =
    withConn(url) { c =>
      val q = c.prepareStatement(
        "SELECT worker_id, locked_at FROM graft_leases WHERE task_id = ? AND worker_id IS NOT NULL")
      q.setString(1, taskId)
      val rs = q.executeQuery()
      val out = if (rs.next()) Some((rs.getString(1), rs.getTimestamp(2))) else None
      rs.close(); q.close()
      out
    }

  // Tiny per-URL connection pool: every lease operation was paying a
  // fresh DriverManager.getConnection (Derby embedded ~ms, a remote
  // store a full TCP+auth round trip) — heartbeat-heavy workers
  // multiply that. Borrow-or-dial, return on success, DISCARD on error
  // (a connection that just threw may be poisoned; the next borrower
  // dials fresh). Cap per URL bounds idle sockets; validation on borrow
  // drops connections a server closed while pooled.
  private val pools = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[Connection]]()
  private val MaxPooledPerUrl = 8

  private def withConn[A](url: String)(f: Connection => A): A = {
    val pool = pools.computeIfAbsent(url,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Connection]())
    var c: Connection = null
    var borrowed = pool.poll()
    while (borrowed != null && c == null) {
      val ok = try !borrowed.isClosed && borrowed.isValid(1)
               catch { case _: Throwable => false }
      if (ok) c = borrowed
      else {
        try borrowed.close() catch { case _: Throwable => () }
        borrowed = pool.poll()
      }
    }
    if (c == null) c = DriverManager.getConnection(url)
    var failed = false
    try { c.setAutoCommit(true); f(c) }
    catch { case e: Throwable => failed = true; throw e }
    finally {
      if (failed || pool.size >= MaxPooledPerUrl) {
        try c.close() catch { case _: Throwable => () }
      } else pool.offer(c)
    }
  }
}
