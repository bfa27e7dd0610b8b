package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Pca, Similarity}
import graft.core.Tables

/** PCA over the embeddings: the float half of the pipeline whose integer
  * half (the moment sums) is oracle-gated as q_embed_covariance. Pins
  * the linear-algebra contracts a dimensionality-reduction stage needs:
  * the Jacobi eigensolve actually diagonalizes the covariance, the
  * returned basis is orthonormal and variance-ordered, training is
  * deterministic (canonical sign), and the distributed quantized-QDot
  * projection agrees with a driver-side exact matmul.
  */
class PcaSpec extends SparkSuite {

  private lazy val embDf = Tables.embeddings(spark, sf0001)
  private lazy val model = Pca.train(embDf, col("embedding"), d = 64)

  test("eigen: residual, orthonormality, variance ordering, determinism") {
    val d = 64
    // rebuild covariance from the same exact moments the model used
    val m = Pca.moments(embDf, col("embedding"), d)
    val tri = d * (d + 1) / 2
    val n = m(tri + d)
    val cov = Array.ofDim[Double](d, d)
    var p = 0
    for (i <- 0 until d; j <- i until d) {
      val c = (m(p).toDouble - m(tri + i).toDouble * m(tri + j).toDouble / n) / (n - 1) / 1e6
      cov(i)(j) = c; cov(j)(i) = c; p += 1
    }
    // eigen-equation residual per component: ||Cov v - lambda v|| small
    model.components.zip(model.eigenvalues).foreach { case (v, lambda) =>
      val rv = (0 until d).map(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum - lambda * v(i))
      val res = math.sqrt(rv.map(x => x * x).sum)
      assert(res < 1e-8, s"eigen residual $res for lambda=$lambda")
    }
    // orthonormal basis
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until d).map(i => model.components(a)(i) * model.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"<v$a,v$b> = $dot")
    }
    // descending variance; total variance equals the covariance trace
    assert(model.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-8 * math.max(1.0, trace))
    // canonical sign makes train() reproducible
    val again = Pca.train(embDf, col("embedding"), d = 64)
    model.components.zip(again.components).foreach { case (a, b) =>
      assert(a.sameElements(b), "training must be deterministic")
    }
  }

  test("distributed quantized projection equals the driver matmul, exactly") {
    val k = 4
    val projected = Pca.project(embDf, col("embedding"), model, k)
      .select(col("vec_id") +: (0 until k).map(c => col(s"pc$c")): _*)
      .collect()
    // driver twin: same quantized centering, same quantized components —
    // long arithmetic on both sides, so equality is EXACT
    val mq = model.mean.map(x => math.round(x * 1000))
    val vq = model.components.take(k).map(_.map(x => math.round(x * 1e6)))
    val rows = embDf.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("q")).toMap
    projected.foreach { r =>
      val q = rows(r.getLong(0))
      (0 until k).foreach { c =>
        val expect = (0 until 64).map(i => (q(i) - mq(i)) * vq(c)(i)).sum
        assert(r.getLong(1 + c) == expect,
          s"vec ${r.getLong(0)} pc$c: got ${r.getLong(1 + c)}, want $expect")
      }
    }
  }

  test("top components explain more variance than bottom ones on the data") {
    val k = 4
    val projected = Pca.project(embDf, col("embedding"), model, 64)
    // sample variance of each projected coordinate, computed in Spark
    val aggs = (0 until 64).map(c => variance(col(s"pc$c")).as(s"v$c"))
    val v = projected.agg(aggs.head, aggs.tail: _*).head()
    val vars = (0 until 64).map(v.getDouble)
    assert(vars.take(k).sum > vars.takeRight(k).sum,
      "projection onto top-k must carry more variance than bottom-k")
  }
}
