package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Ivf, Similarity}
import graft.core.Tables

class IvfSpec extends SparkSuite {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 5)

  private lazy val queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray

  private def bruteTop(k: Int): Seq[Long] = {
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.quantize(col("embedding")).as("qv"))
    Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"), qv, k)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
  }

  test("cells partition the corpus; assignment is deterministic") {
    val assigned = Ivf.assign(emb, "vec_id", "embedding", model)
    assert(assigned.count() == emb.count())
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.length > 1 && cells.length <= 8)
    val again = Ivf.assign(emb, "vec_id", "embedding", model)
    assert(assigned.select("vec_id", "cell").exceptAll(again.select("vec_id", "cell")).isEmpty)
  }

  test("model serialization round-trips bit-exact and probes identically") {
    val restored = Ivf.Model.parse(model.serialize)
    assert(restored.centroids.length == model.centroids.length)
    model.centroids.zip(restored.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b)) // bit-exact doubles
    }
    assert(restored.serialize == model.serialize)
    val viaModel = Ivf.probe(emb, "vec_id", "embedding", model, queryVec, 3, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val viaRestored = Ivf.probe(emb, "vec_id", "embedding", restored, queryVec, 3, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(viaModel == viaRestored)
  }

  private lazy val indexPath: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_spec"
    Ivf.materialize(emb, "vec_id", "embedding", model, p)
    p
  }

  test("materialized full-probe equals brute force (the oracle contract)") {
    val exact = bruteTop(10)
    val full = Ivf.probeMaterialized(spark, indexPath, "vec_id", "embedding",
      model, queryVec, nprobe = 8, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == exact)
  }

  test("materialized probe prunes to nprobe cell partitions") {
    val nprobe = 3
    val df = Ivf.probeMaterialized(spark, indexPath, "vec_id", "embedding",
      model, queryVec, nprobe, k = 10)
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    // `cell` is a partition column: the isin filter must prune at planning
    // time, so the scan touches at most nprobe of the 8 cell directories
    val partsRead = scan.map(_.metrics("numPartitions").value).sum
    assert(partsRead > 0 && partsRead <= nprobe,
      s"expected <= $nprobe pruned partitions, scan read $partsRead")
  }

  test("full-probe IVF equals brute force; partial probe recalls most") {
    val exact = bruteTop(10)
    val full = Ivf.probe(emb, "vec_id", "embedding", model, queryVec, nprobe = 8, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full == exact) // probing every cell = exhaustive search

    val partial = Ivf.probe(emb, "vec_id", "embedding", model, queryVec, nprobe = 3, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = exact.count(partial.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low") // nprobe trades recall
  }

  test("incremental append: original files byte-immutable, append == rebuild") {
    val old = emb.filter(col("vec_id") % 4 =!= 0)
    val fresh = emb.filter(col("vec_id") % 4 === 0)
    val frozen = Ivf.train(old, "vec_id", "embedding", k = 8, iters = 5)
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_append_spec"
    Ivf.materialize(old, "vec_id", "embedding", frozen, p)
    def dataFiles: Map[String, (Long, Long)] = {
      val base = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(base).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
    }
    val v1 = dataFiles
    Ivf.assign(fresh, "vec_id", "embedding", frozen)
      .write.mode("append").partitionBy("cell").parquet(p)
    val v2 = dataFiles
    // every original index file survives the append byte-identical
    v1.foreach { case (path, meta) =>
      assert(v2.get(path).contains(meta), s"original index file changed: $path")
    }
    assert(v2.size > v1.size, "append must add new files")
    // appended layout == assigning the full corpus from scratch under the
    // same frozen model (cells never move when centroids are frozen)
    val appended = spark.read.parquet(p).select(col("vec_id"), col("cell"))
    val rebuild = Ivf.assign(emb, "vec_id", "embedding", frozen)
      .select(col("vec_id"), col("cell"))
    assert(appended.exceptAll(rebuild).isEmpty && rebuild.exceptAll(appended).isEmpty)
  }
}
