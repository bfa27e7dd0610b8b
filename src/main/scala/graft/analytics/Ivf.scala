package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside random-hyperplane LSH ([[Similarity]]).
  *
  * Faiss-style shape: train coarse centroids on a bounded SAMPLE
  * (driver-side Lloyd iterations — training data is capped, so this is
  * O(sample × k × iters) regardless of corpus size), then assign every
  * vector to its nearest centroid in a distributed narrow pass; a probe
  * scans only the `nprobe` cells nearest the query instead of the corpus.
  * At 100 TB: cells are the partition/bucketing key, assignment is scan
  * work, and recall/latency trades via nprobe.
  *
  * Deterministic by construction: sample = first N by id, init = first k
  * sampled vectors, fixed iteration count — no RNG.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def nearest(v: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < centroids.length) {
        val c = centroids(j)
        var d = 0.0
        var i = 0
        while (i < c.length) { val t = v(i) - c(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }

    def nearestCells(v: Array[Double], nprobe: Int): Seq[Int] =
      centroids.indices.sortBy { j =>
        val c = centroids(j)
        var d = 0.0
        var i = 0
        while (i < c.length) { val t = v(i) - c(i); d += t * t; i += 1 }
        d
      }.take(nprobe)

    /** Deterministic serialized form: centroid components as 64-bit IEEE
      * hex strings (bit-exact round-trip; the trained model is driver
      * state that must persist/restore without drift).
      */
    def serialize: String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("k", centroids.length)
      root.put("dims", if (centroids.isEmpty) 0 else centroids.head.length)
      val cs = root.putArray("centroids")
      centroids.foreach { c =>
        val row = cs.addArray()
        c.foreach(x => row.add(java.lang.Long.toHexString(
          java.lang.Double.doubleToRawLongBits(x))))
      }
      mapper.writeValueAsString(root)
    }
  }

  object Model {
    /** Parse [[Model.serialize]] output (bit-exact doubles via their
      * 64-bit hex form — decimal rendering would drift).
      */
    def parse(s: String): Model = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(s)
      val cs = root.get("centroids")
      Model(Array.tabulate(cs.size()) { j =>
        val row = cs.get(j)
        Array.tabulate(row.size()) { i =>
          java.lang.Double.longBitsToDouble(
            java.lang.Long.parseUnsignedLong(row.get(i).asText, 16))
        }
      })
    }
  }

  private def toDoubles(r: Row, idx: Int): Array[Double] =
    r.getSeq[Float](idx).map(_.toDouble).toArray

  /** Train coarse centroids on the first `sampleN` vectors (by id order). */
  def train(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 10, sampleN: Int = 10000): Model = {
    val sample = emb.orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect().map(toDoubles(_, 0))
    require(sample.length >= k, s"need >= $k sample vectors")
    val dims = sample.head.length
    var centroids = sample.take(k).map(_.clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      val m = Model(centroids)
      sample.foreach { v =>
        val c = m.nearest(v)
        counts(c) += 1
        var i = 0
        while (i < dims) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { j =>
        if (counts(j) == 0) centroids(j) // keep empty cells stable
        else { val s = sums(j); var i = 0; while (i < dims) { s(i) /= counts(j); i += 1 }; s }
      }
      it += 1
    }
    Model(centroids)
  }

  /** Distributed cell assignment: narrow mapPartitions, centroids shipped
    * in the task closure (k × dims doubles — kilobytes).
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val outSchema = StructType(emb.schema.fields :+ StructField("cell", IntegerType))
    val vecIdx = emb.schema.fieldIndex(vecCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    emb.mapPartitions { it =>
      it.map(r => Row.fromSeq(r.toSeq :+ model.nearest(toDoubles(r, vecIdx))))
    }(enc)
  }

  /** Query-side half of a cell-keyed batch kNN join: like [[assign]] but
    * emits each row's `nprobe` NEAREST cells (ordered) as `probe_cells`.
    * Exploding it against a [[materialize]]d index joined on `cell` is
    * the batch form of [[probeMaterialized]] — many queries, one pass,
    * no per-query job.
    */
  def assignProbes(emb: DataFrame, vecCol: String, model: Model,
                   nprobe: Int): DataFrame = {
    val outSchema = StructType(emb.schema.fields :+
      StructField("probe_cells", org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)))
    val vecIdx = emb.schema.fieldIndex(vecCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    emb.mapPartitions { it =>
      it.map(r => Row.fromSeq(r.toSeq :+ model.nearestCells(toDoubles(r, vecIdx), nprobe)))
    }(enc)
  }

  /** Ad-hoc probe: assigns the corpus inline, then brute-force
    * quantized-dot top-k restricted to the query's `nprobe` nearest cells.
    * Every probe pays a full corpus scan — debug/small-corpus only. The
    * production path is [[materialize]] once + [[probeMaterialized]] per
    * query, where partition pruning reads only the probed cells.
    */
  def probe(emb: DataFrame, idCol: String, vecCol: String, model: Model,
            query: Array[Double], nprobe: Int, k: Int): DataFrame = {
    val cells = model.nearestCells(query, nprobe)
    val assigned = assign(emb, idCol, vecCol, model)
      .filter(col("cell").isin(cells: _*))
    topKInCells(assigned, idCol, vecCol, query, k)
  }

  /** Materialize the cell assignment once, written partitioned by `cell`
    * — the IVF index build. At 100 TB this is the one full pass over the
    * corpus; afterwards every probe is partition-pruned to its `nprobe`
    * cells and never rescans the rest.
    */
  def materialize(emb: DataFrame, idCol: String, vecCol: String,
                  model: Model, path: String): Unit =
    assign(emb, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe against a [[materialize]]d index: `cell` is a partition column,
    * so the `isin` filter prunes at planning time — the scan touches only
    * the `nprobe` probed cell directories (IvfSpec asserts the pruned
    * partition count on the executed plan).
    */
  def probeMaterialized(spark: org.apache.spark.sql.SparkSession, path: String,
                        idCol: String, vecCol: String, model: Model,
                        query: Array[Double], nprobe: Int, k: Int): DataFrame = {
    val cells = model.nearestCells(query, nprobe)
    val assigned = spark.read.parquet(path).filter(col("cell").isin(cells: _*))
    topKInCells(assigned, idCol, vecCol, query, k)
  }

  private def topKInCells(assigned: DataFrame, idCol: String, vecCol: String,
                          query: Array[Double], k: Int): DataFrame = {
    val qQuant = query.map(x => math.round(x * 1000))
    val spark = assigned.sparkSession
    import spark.implicits._
    val qDf = Seq(Tuple1(qQuant)).toDF("qv")
    Similarity.bruteForceTopK(assigned, col(idCol), col(vecCol), qDf, k)
  }
}
