package graft

import org.apache.spark.sql.functions._

/** Full-parity contract for the WordPiece-style greedy encoder: an
  * independent driver-side reimplementation (vocab selection, longest
  * match, greedy walk, doc reassembly) must agree exactly, plus the
  * structural invariants greedy subword encoding guarantees.
  */
class WordpieceSpec extends SparkSuite {

  test("greedy wordpiece equals an independent driver-side recompute") {
    val got = QueriesTraining.wordpiece(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_wp"), r.getAs[String]("wp"))).toMap

    val docRows = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docWords = docRows.map { case (id, t) =>
      (id, t.split(" ", -1).filter(_.nonEmpty).toSeq)
    }
    val wc = docWords.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap

    // vocab: top-256 frequency-weighted substrings (len 2..6) + all chars
    val subCounts = new scala.collection.mutable.HashMap[String, Long]()
    wc.foreach { case (w, n) =>
      for (p <- 0 until w.length; l <- 2 to 6 if p + l <= w.length)
        subCounts.updateWith(w.substring(p, p + l))(c => Some(c.getOrElse(0L) + n))
    }
    val top = subCounts.toSeq.sortBy { case (piece, cnt) => (-cnt, piece) }
      .take(256).map(_._1).toSet
    val vocab = top ++ wc.keys.flatMap(_.toSeq.map(_.toString))

    def encode(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var p = 0
      while (p < w.length) {
        val l = (math.min(6, w.length - p) to 1 by -1)
          .find(l => vocab.contains(w.substring(p, p + l))).get
        out += w.substring(p, p + l); p += l
      }
      out.toSeq
    }

    docWords.foreach { case (id, ws) =>
      val pieces = ws.map(encode)
      val expect = (pieces.map(_.size.toLong).sum, pieces.map(_.mkString(" ")).mkString(" "))
      assert(got(id) == expect, s"doc $id")
    }
    assert(got.keySet == docWords.map(_._1).toSet)
  }

  test("optimal segmentation: n_opt <= n_greedy everywhere; DP parity with driver recompute") {
    val rows = QueriesTraining.optimalSegment(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_opt") <= r.getAs[Long]("n_greedy"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("saved") ==
        r.getAs[Long]("n_greedy") - r.getAs[Long]("n_opt"))
    }
  }

  test("optimal beats greedy on a corpus built to strand the greedy cursor") {
    // Vocabulary engineering: 253 high-frequency filler pairs occupy the
    // top of the 256-piece budget; the count-11 tier {ab, bc, bcd, cd}
    // then fills the last 3 slots LEXICOGRAPHICALLY — ab, bc, bcd make
    // it, cd does not. On "abcd", greedy takes ab then strands cd into
    // singles (ab|c|d = 3); the DP finds a|bcd = 2.
    import spark.implicits._
    val fillers = (for (a <- 'e' to 'z'; b <- 'e' to 'z') yield s"$a$b").take(253)
    val fillerText = fillers.flatMap(w => Seq.fill(50)(w)).mkString(" ")
    val boostText = (Seq.fill(10)("ab") ++ Seq.fill(10)("bcd")).mkString(" ")
    val corpus = Seq(
      (1L, fillerText),
      (2L, boostText),
      (3L, "abcd")).toDF("doc_id", "text")
    val got = QueriesTraining.optimalSegmentOf(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d3 = got(3L)
    assert(d3.getAs[Long]("n_greedy") == 3L, "greedy must strand: ab|c|d")
    assert(d3.getAs[Long]("n_opt") == 2L, "DP must find a|bcd")
    assert(d3.getAs[Long]("saved") == 1L)
    // sanity: the boost doc segments identically under both (ab and bcd
    // are whole vocab pieces)
    assert(got(2L).getAs[Long]("saved") == 0L)
    assert(got(2L).getAs[Long]("n_opt") == 20L)
  }

  test("wordpiece invariants: reconstructable, never shorter than word count") {
    val rows = QueriesTraining.wordpiece(spark, sf0001)
      .join(graft.core.Tables.documents(spark, sf0001), "doc_id")
      .select(col("doc_id"), col("n_wp"), col("wp"), col("text")).collect()
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val nWords = text.split(" ", -1).count(_.nonEmpty)
      assert(r.getAs[String]("wp").replace(" ", "") == text.replace(" ", ""),
        s"doc ${r.getLong(0)}: piece concat must reconstruct the text")
      assert(r.getAs[Long]("n_wp") >= nWords)
    }
  }
}
