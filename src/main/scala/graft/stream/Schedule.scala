package graft.stream

/** Periodic snapshot scheduling (O8).
  *
  * Reference semantics (/root/reference/state/state.go:75-82, :301-401):
  * a per-table `Schedule.Interval`; `TimeForSnapshot` fires when
  * `now - snapshotted_at >= interval`, aligned to interval boundaries so
  * every worker computes the same due time; `need_snapshot` forces one.
  * The driver-side coordinator polls this between micro-batches and
  * re-runs the snapshot job into a fresh timestamped topic
  * (core.Topics.snapshotTopic).
  */
object Schedule {

  final case class SnapshotSchedule(intervalMs: Long, needSnapshot: Boolean = false)

  /** Is a snapshot due? Interval-aligned like the reference, so restarts
    * and multiple evaluators agree on the boundary.
    */
  def timeForSnapshot(s: SnapshotSchedule, snapshottedAtMs: Long, nowMs: Long): Boolean =
    s.needSnapshot ||
      (s.intervalMs > 0 && alignedDue(s.intervalMs, snapshottedAtMs) <= nowMs)

  /** The next interval boundary strictly after the last snapshot. */
  def alignedDue(intervalMs: Long, snapshottedAtMs: Long): Long =
    ((snapshottedAtMs / intervalMs) + 1) * intervalMs
}
