package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.changelog.GtidSet
import graft.encode.MsgPackCodec
import graft.pipes.{Framing, LoopbackPipe}

/** Seeded-fuzz checks for the pure kernels: any sequence of GTID adds
  * equals the brute-force set; msgpack and framing round-trip arbitrary
  * values; the FNV partitioner is total and stable. Fixed seeds keep the
  * runs deterministic.
  */
class PropertySpec extends AnyFunSuite {

  test("GtidSet: random add sequences == brute-force membership sets") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val adds = Vector.fill(60)((s"u${rnd.nextInt(3) + 1}", rnd.nextLong(40) + 1))
      val set = adds.foldLeft(GtidSet.empty) { case (acc, (u, g)) => acc.add(u, g) }
      val brute = adds.toSet
      for (u <- Seq("u1", "u2", "u3"); g <- 1L to 41L)
        assert(set.contains(u, g) == brute.contains((u, g)), s"($u,$g)")
      assert(set.txnCount == brute.size)
      assert(GtidSet.parse(set.serialize) == set)
    }
  }

  test("GtidSet: interval subsetOf == brute-force subset over random pairs") {
    val rnd = new Random(17)
    def randSet(): (GtidSet, Set[(String, Long)]) = {
      val adds = Vector.fill(rnd.nextInt(50) + 1)((s"u${rnd.nextInt(3) + 1}", rnd.nextLong(30) + 1))
      (adds.foldLeft(GtidSet.empty) { case (acc, (u, g)) => acc.add(u, g) }, adds.toSet)
    }
    for (_ <- 1 to 200) {
      val (a, aBrute) = randSet()
      val (b, bBrute) = randSet()
      assert(a.subsetOf(b) == aBrute.subsetOf(bBrute), s"$a subsetOf $b")
      assert(a.subsetOf(a) && b.subsetOf(b))
      assert(GtidSet.empty.subsetOf(a))
    }
    // wide-interval sets stay cheap: coverage is interval-level, not per-GNO
    val wide = GtidSet.parse("u1:1-100000000000")
    assert(GtidSet.parse("u1:5-99999999999").subsetOf(wide))
    assert(!GtidSet.parse("u1:5-100000000001").subsetOf(wide))
  }

  test("msgpack: random CF events round-trip") {
    val rnd = new Random(7)
    def randValue(): Any = rnd.nextInt(5) match {
      case 0 => rnd.nextLong()
      case 1 => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      case 2 => rnd.nextBoolean()
      case 3 => rnd.nextDouble() * 1e12 - 5e11
      case 4 => null
    }
    for (_ <- 1 to 100) {
      val seq = rnd.nextLong(Long.MaxValue)
      val ts = rnd.nextLong(1L << 40)
      val fs = Vector.fill(5)((s"f${rnd.nextInt(100)}", randValue()))
      val bytes = MsgPackCodec.encodeEvent("insert", Seq(1L), seq, ts, Some(fs))
      val (decoded, n) = MsgPackCodec.decode(bytes)
      assert(n == bytes.length)
      val m = decoded.asInstanceOf[Map[Any, Any]]
      assert(m("SeqNo") == seq && m("Timestamp") == ts)
      val back = m("Fields").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[Any, Any]])
        .map(f => f("Name") -> f("Value"))
      fs.zip(back).foreach { case ((n0, v0), (n1, v1)) =>
        assert(n1 == n0)
        assert(v1 == v0, s"$n0: $v0 vs $v1")
      }
    }
  }

  test("framing: random byte records round-trip in order") {
    val rnd = new Random(13)
    for (_ <- 1 to 30) {
      val recs = Vector.fill(rnd.nextInt(20)) {
        val b = new Array[Byte](rnd.nextInt(300))
        rnd.nextBytes(b)
        b
      }
      val out = new java.io.ByteArrayOutputStream()
      recs.foreach(Framing.writeFrame(out, _))
      val back = Framing.readFrames(new java.io.ByteArrayInputStream(out.toByteArray)).toList
      assert(back.length == recs.length)
      recs.zip(back).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    }
  }

  test("fnv partitioner: total, stable, in range for any key") {
    val rnd = new Random(99)
    for (_ <- 1 to 500) {
      val key = rnd.alphanumeric.take(rnd.nextInt(30)).mkString +
        (if (rnd.nextBoolean()) "é∆" else "")
      val n = rnd.nextInt(64) + 1
      val p = LoopbackPipe.partitionFor(key, n)
      assert(p >= 0 && p < n)
      assert(LoopbackPipe.partitionFor(key, n) == p)
    }
  }

  test("mysql multi-packet framing: random payload sizes round-trip exactly") {
    val rnd = new Random(20260813)
    val max = 0xffffff
    // bias toward the boundary cases the framing rule is about
    val sizes = Seq(0, 1, max - 1, max, max + 1, 2 * max, 2 * max + 17) ++
      Seq.fill(12)(rnd.nextInt(3 * max))
    sizes.foreach { n =>
      val payload = new Array[Byte](n)
      rnd.nextBytes(payload)
      val out = new java.io.ByteArrayOutputStream()
      graft.changelog.MysqlRepl.writePacket(out, 0, payload)
      val framed = out.toByteArray
      // every frame < max says "last"; every max-sized frame continues
      val expectFrames = n / max + 1
      assert(framed.length == n + 4 * expectFrames, s"n=$n")
      val (_, back) = graft.changelog.MysqlRepl.readPacket(
        new java.io.ByteArrayInputStream(framed))
      assert(java.util.Arrays.equals(back, payload), s"n=$n corrupted")
    }
  }

  test("rate advice: budget never negative, window average capped, below-target never throttled") {
    val rnd = new Random(7)
    for (_ <- 1 to 50) {
      val target = rnd.nextInt(1000) + 1
      val window = rnd.nextInt(8) + 1
      val r = new graft.stream.RateAdvice(target.toLong, window)
      var budget = r.admit(0)
      for (_ <- 1 to 200) {
        assert(budget >= 0)
        // an admitter that respects its budget keeps the WINDOW total
        // (and with it the windowed average) at or under target rate
        val take = if (budget == 0) 0L else rnd.nextLong(budget + 1)
        budget = r.admit(take)
        assert(r.windowSum <= target.toLong * window,
          s"window ${r.windowSum} exceeds ${target.toLong * window}")
      }
      // a stream consuming below target is never throttled to zero
      val calm = new graft.stream.RateAdvice(target.toLong, window)
      var ok = true
      for (_ <- 1 to 50) ok &= calm.admit(math.max(0, target - 1).toLong) > 0
      assert(ok, "below-target stream must always get a positive budget")
    }
  }

  test("KMV mergeability: union of per-partition bottom-k == bottom-k of the union") {
    // the property that makes q_kmv_distinct's WindowGroupLimit-Partial
    // plan CORRECT, not just fast: a task-local bottom-k loses nothing
    val rnd = new Random(7)
    val k = 16
    def bottomK(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)
    for (_ <- 1 to 200) {
      val all = Vector.fill(rnd.nextInt(300) + 1)(rnd.nextLong(1L << 40))
      val parts = all.grouped(rnd.nextInt(40) + 1).toSeq
      val merged = bottomK(parts.flatMap(bottomK))
      assert(merged == bottomK(all))
      // and the estimator both engines compute off it
      val est =
        if (merged.length < k) merged.length.toLong
        else (BigInt(k - 1) * BigInt(2).pow(60) / BigInt(merged.last)).toLong
      assert(est >= 0)
    }
  }

  test("vacuumVersions: random layouts keep exactly the newest k, idempotently") {
    val rnd = new Random(23)
    for (trial <- 1 to 25) {
      val base = java.nio.file.Files.createTempDirectory(s"graft-vacprop$trial")
      val versions = (0 until rnd.nextInt(7) + 1).toVector
      versions.foreach { v =>
        val d = base.resolve(s"v$v")
        java.nio.file.Files.createDirectories(d)
        for (f <- 0 until rnd.nextInt(3) + 1)
          java.nio.file.Files.writeString(d.resolve(s"part-$f.parquet"), s"$v/$f")
      }
      // a non-version directory must never be touched
      val stray = base.resolve("not-a-version")
      java.nio.file.Files.createDirectories(stray)
      java.nio.file.Files.writeString(stray.resolve("keep.txt"), "x")
      val keep = rnd.nextInt(versions.length + 2) + 1
      val (nv, nf, _) = QueriesLayout.vacuumVersions(base.toString, keep)
      assert(nv == math.max(0, versions.length - keep))
      val survivors = versions.drop(math.max(0, versions.length - keep))
      versions.foreach { v =>
        val exists = java.nio.file.Files.exists(base.resolve(s"v$v"))
        assert(exists == survivors.contains(v), s"v$v keep=$keep")
      }
      survivors.foreach { v =>
        for (f <- java.nio.file.Files.list(base.resolve(s"v$v")).toArray)
          assert(java.nio.file.Files.readString(
            f.asInstanceOf[java.nio.file.Path]).startsWith(s"$v/"))
      }
      assert(java.nio.file.Files.exists(stray.resolve("keep.txt")))
      assert(QueriesLayout.vacuumVersions(base.toString, keep) == ((0, 0, 0L)))
      assert(nf >= nv) // every expired version held at least one file
      graft.core.Tmp.deleteRecursively(base)
    }
  }
}
