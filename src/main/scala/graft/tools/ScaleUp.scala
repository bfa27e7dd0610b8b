package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10x scale-up of the sf0.1 fixtures into a bench-only
  * directory (default /tmp/graft_sf1) — the "sf1 spot-bench" input for
  * catching SF-dependent cliffs (bucket-cap saturation, skew, driver
  * rounds) before a real scale-up. NOT a correctness fixture: oracles
  * keep running against the driver-generated sf dirs.
  *
  * Scaling rules, chosen to preserve each query family's per-item work
  * profile rather than degenerate it:
  *  - events/lineitem/orders: replicate 10x with key shifts (event_id,
  *    user_id, orderkey, custkey) — group COUNT grows 10x, per-group
  *    cardinality stays constant, which is how a real corpus grows.
  *  - documents: replica k rotates the token array by k and appends a
  *    replica token. CAVEAT (r15 measurement): rotation preserves the
  *    shingle SET almost exactly (only the seam changes), so for
  *    set-similarity operators the replicas ARE near-dups of each other
  *    and every ScaleUp application multiplies dup-CLUSTER sizes ~10x —
  *    candidate pairs/doc measured 0.055 (sf0.1) -> 4.5 (sf1) -> 15.6
  *    (sf100), i.e. the dedup rows on scaled fixtures stress a
  *    worst-case dup density that grows with the decade, not the
  *    constant density of a real corpus. Sequence-order operators
  *    (tokenizers, LMs, chunking) do see distinct replicas as intended.
  *    Treat scaled-fixture dedup numbers as upper-bound stress runs;
  *    SCALE.md (r15) records the ladder.
  *  - embeddings: replica k adds deterministic per-component noise of
  *    magnitude ~0.15 (xxhash64-seeded), same rationale in vector space.
  *
  * Key-shift scale (arg 2, default 1): the replica offsets are
  * `rep * base * shiftScale`. Applying ScaleUp TWICE with the same
  * offsets convolves the shifts (rep1+rep2 collides: sf1→sf10 left
  * doc_id at 5.26x multiplicity — 95k distinct ids over 500k rows —
  * which the sf10 profiles absorbed but a third application would
  * compound to ~36x). For the sf100 decade pass shiftScale=100 so the
  * new offsets clear every id the sf10 fixture already contains and
  * per-id multiplicity stays at the sf10 level instead of convolving.
  */
object ScaleUp {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val shiftScale = if (args.length > 2) args(2).toLong else 1L
    val outParts = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicas: DataFrame = spark.range(Copies).toDF("rep")
    def write(df: DataFrame, name: String): Unit = {
      df.coalesce(outParts).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"scaled $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dims copy through unchanged
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)

    val ev = graft.core.Tables.load(spark, src, "events")
    write(ev.crossJoin(replicas).select(
      (col("event_id") + col("rep") * lit(10000000000L * shiftScale)).as("event_id"),
      col("ts"),
      (col("user_id") + col("rep") * lit(100000000L * shiftScale)).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(li.crossJoin(replicas).select(
      (col("l_orderkey") + col("rep") * lit(100000000L * shiftScale)).as("l_orderkey"),
      col("l_partkey"), col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    write(ord.crossJoin(replicas).select(
      (col("o_orderkey") + col("rep") * lit(100000000L * shiftScale)).as("o_orderkey"),
      (col("o_custkey") + col("rep") * lit(100000000L * shiftScale)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val toks = split(col("text"), " ")
    val rot = pmod(col("rep"), size(toks))
    val rotated = concat(slice(toks, rot + 1, size(toks) - rot),
      slice(toks, lit(1), rot), array(concat(lit("r"), col("rep"))))
    write(docs.crossJoin(replicas).select(
      (col("doc_id") + col("rep") * lit(100000000L * shiftScale)).as("doc_id"),
      when(col("rep") === 0, col("text"))
        .otherwise(array_join(rotated, " ")).as("text"),
      col("lang"), col("source"),
      when(col("rep") === 0, col("n_chars"))
        .otherwise(length(array_join(rotated, " ")).cast("long")).as("n_chars")),
      "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val noisy = transform(col("embedding"), (x, i) =>
      when(col("rep") === 0, x).otherwise(
        x + ((pmod(xxhash64(col("vec_id"), i, col("rep")), lit(1000L))
          .cast("double") / 1000.0 - 0.5) * 0.3).cast("float")))
    write(emb.crossJoin(replicas).select(
      (col("vec_id") + col("rep") * lit(100000000L * shiftScale)).as("vec_id"),
      noisy.as("embedding"), col("label")), "embeddings")

    spark.stop()
  }
}
