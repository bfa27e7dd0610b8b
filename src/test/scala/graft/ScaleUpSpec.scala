package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleUp

/** Contract of the r16 salted-substitution fixture rule (SCALE.md r16,
  * FIXTURES.md): the scaled-fixture dup density stays constant across
  * decades ONLY if the substitution is content-keyed (shared token runs
  * between near-dup docs substitute identically under one salt) while
  * replicas land far from their originals and from each other. These
  * pins guard the generator — the generated chain itself is pinned by
  * FIXTURES.md hashes.
  */
class ScaleUpSpec extends SparkSuite {
  import spark.implicits._

  private def salted(texts: Seq[String], salt: Long): Seq[String] =
    texts.toDF("text")
      .select(ScaleUp.saltedText(col("text"), lit(salt)).as("t"))
      .as[String].collect().toSeq

  private def shingles(s: String, k: Int = 8): Set[String] =
    (0 to math.max(0, s.length - k)).map(i => s.substring(i, i + k)).toSet

  private def jaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingles(a), shingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private val vocab = Seq("data", "column", "order", "join", "scan",
    "sort", "value", "table", "vector", "spark", "row", "small", "the",
    "big", "fast", "slow", "merge", "filter", "group", "line")
  private def doc(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" ")
  }

  test("content-keyed: one token maps identically everywhere under a salt") {
    val d = doc(1, 60)
    val Seq(out) = salted(Seq(d), salt = 3L)
    val pairs = d.split(" ").zip(out.split(" ").dropRight(1)) // drop tag
    val mapping = pairs.groupBy(_._1).map { case (t, ps) =>
      t -> ps.map(_._2).distinct
    }
    for ((t, images) <- mapping)
      assert(images.length == 1, s"token '$t' mapped to ${images.toSeq}")
  }

  test("determinism + rep-identity shape: same input, same salt, same output") {
    val d = Seq(doc(2, 50), doc(3, 12))
    assert(salted(d, 7L) == salted(d, 7L))
    assert(salted(d, 7L) != salted(d, 8L), "different salts must differ")
  }

  test("substitution rate is ~0.4 and every output ends with the tag token") {
    val d = doc(4, 2000)
    val Seq(out) = salted(Seq(d), salt = 5L)
    val inToks = d.split(" ")
    val outToks = out.split(" ")
    assert(outToks.last == "g5")
    val changed = inToks.zip(outToks.dropRight(1)).count { case (a, b) => a != b }
    val rate = changed.toDouble / inToks.length
    assert(rate > 0.15 && rate < 0.65, s"substitution rate $rate")
  }

  test("near-dup pair keeps its Jaccard under one salt; replica leaves its original") {
    // two docs sharing a long token run = a planted near-dup pair
    val shared = doc(10, 45)
    val a = shared + " " + doc(11, 8)
    val b = shared + " " + doc(12, 8)
    val j0 = jaccard(a, b)
    assert(j0 > 0.5, s"fixture setup: planted pair must verify, j=$j0")
    for (salt <- Seq(1L, 6L, 13L)) {
      val Seq(as, bs) = salted(Seq(a, b), salt)
      val j1 = jaccard(as, bs)
      assert(math.abs(j1 - j0) < 0.2,
        s"salt $salt: pair Jaccard moved $j0 -> $j1 (density not preserved)")
      assert(jaccard(a, as) < 0.5,
        s"salt $salt: replica still verifies against its original")
    }
    // two different salts of the same doc never verify against each other
    val Seq(a1) = salted(Seq(a), 2L)
    val Seq(a2) = salted(Seq(a), 9L)
    assert(jaccard(a1, a2) < 0.5, "sibling replicas must not verify")
  }
}
