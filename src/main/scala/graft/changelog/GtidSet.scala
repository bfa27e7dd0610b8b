package graft.changelog

/** MySQL GTID set — the changelog reader's durable position.
  *
  * Reference semantics:
  *  - `incGTID` (/root/reference/changelog/mysql.go:718-752): the common
  *    case extends the last interval of the server's UUID by one when the
  *    incoming GNO is exactly the next value; a non-sequential GNO is added
  *    as a fresh interval and the set re-normalized.
  *  - `SortedGTIDString` (/root/reference/util/util.go:200-217): the saved
  *    string form lists UUIDs in sorted order so positions compare stably.
  *
  * Intervals here are INCLUSIVE `[start, end]` pairs, rendered in MySQL's
  * text form `uuid:1-5:7,uuid2:3`. The set is immutable — `add` returns a
  * new set — so offsets can be shared across Structured Streaming planning
  * threads without locking.
  */
final case class GtidSet(sets: Map[String, Vector[(Long, Long)]]) {

  /** Record one executed transaction. Sequential GNOs extend the last
    * interval (the hot path, like incGTID's `l.Stop++`); out-of-order GNOs
    * insert a new interval and merge neighbours.
    */
  def add(uuid: String, gno: Long): GtidSet = {
    val ivs = sets.getOrElse(uuid, Vector.empty)
    val updated =
      if (ivs.nonEmpty && ivs.last._2 + 1 == gno) ivs.init :+ ((ivs.last._1, gno))
      else if (contains(uuid, gno)) ivs
      else GtidSet.normalize(ivs :+ ((gno, gno)))
    GtidSet(sets.updated(uuid, updated))
  }

  def contains(uuid: String, gno: Long): Boolean =
    sets.get(uuid).exists(_.exists { case (s, e) => gno >= s && gno <= e })

  /** True iff every transaction in this set is also in `other`.
    *
    * Interval-level check: both sides keep intervals normalized (sorted,
    * merged — see [[GtidSet.normalize]]), so `[s,e]` is covered iff the
    * single interval of `other` whose start is the greatest one `<= s`
    * reaches at least `e`. Binary search per interval makes this
    * O(intervals log intervals), independent of transaction counts.
    */
  def subsetOf(other: GtidSet): Boolean =
    sets.forall { case (uuid, ivs) =>
      val oivs = other.sets.getOrElse(uuid, Vector.empty)
      ivs.forall { case (s, e) =>
        var lo = 0; var hi = oivs.length - 1; var idx = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (oivs(mid)._1 <= s) { idx = mid; lo = mid + 1 } else hi = mid - 1
        }
        idx >= 0 && oivs(idx)._2 >= e
      }
    }

  def isEmpty: Boolean = sets.valuesIterator.forall(_.isEmpty)

  /** Number of transactions in the set. */
  def txnCount: Long =
    sets.valuesIterator.flatten.map { case (s, e) => e - s + 1 }.sum

  /** Sorted MySQL text form (util/util.go:200-217). */
  def serialize: String =
    sets.toSeq.filter(_._2.nonEmpty).sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (s, e) => if (s == e) s.toString else s"$s-$e" }.mkString(":")
    }.mkString(",")

  override def toString: String = serialize
}

object GtidSet {
  val empty: GtidSet = GtidSet(Map.empty)

  /** Merge overlapping/adjacent intervals, keep sorted. */
  private[changelog] def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ivs.sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
      acc.lastOption match {
        case Some((s, e)) if iv._1 <= e + 1 => acc.init :+ ((s, math.max(e, iv._2)))
        case _ => acc :+ iv
      }
    }
  }

  /** Parse the MySQL text form; tolerates single-GNO (`uuid:5`) and range
    * (`uuid:1-5`) interval spellings and empty input.
    */
  def parse(s: String): GtidSet =
    if (s == null || s.trim.isEmpty) empty
    else GtidSet(s.trim.split(",").filter(_.nonEmpty).map { part =>
      val pieces = part.trim.split(":")
      val uuid = pieces.head
      val ivs = pieces.tail.toVector.map { iv =>
        iv.split("-") match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _ => throw new IllegalArgumentException(s"bad GTID interval: $iv")
        }
      }
      uuid -> normalize(ivs)
    }.toMap)
}
