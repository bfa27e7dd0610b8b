package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  - documents: replica k>0 applies SALTED TOKEN SUBSTITUTION — each
  *    token is replaced, with probability ~0.4 keyed on
  *    xxhash64(token, salt), by a short hash-derived token. The decision
  *    and the replacement depend on token CONTENT and the replica salt
  *    only (never doc_id or position), so two near-dup originals map to
  *    near-dup replicas with ~the same Jaccard (shared token runs
  *    substitute identically) — dup DENSITY stays constant across
  *    decades — while replica-vs-original and replica-vs-replica
  *    character-8-shingle Jaccard lands well under the 0.5 verify
  *    threshold ((1-p)^2 shingle survival for windows spanning ~2
  *    tokens; measured, see FIXTURES.md). This replaces the r12-r15
  *    ROTATION rule, whose replicas preserved the shingle SET and
  *    multiplied dup-cluster sizes ~10x per decade (pairs/doc 0.055 →
  *    4.5 → 15.6; r15 verdict task 3). A per-generation tag token is
  *    appended so short docs that draw zero substitutions still differ
  *    textually from their original.
  *  - embeddings: replica k adds deterministic per-component noise of
  *    magnitude ~0.15 (xxhash64-seeded), same rationale in vector space.
  *
  * Key-shift scale (arg 2): the replica offsets are
  * `rep * base * shiftScale`. Chained applications must use shiftScale
  * 1, 10, 100 (sf0.1→sf1→sf10→sf100) so the final id is the unique
  * base-10 digit decomposition orig + r1·b + r2·10b + r3·100b — no id
  * ever collides across replicas or decades (the r12-r15 chain used
  * 1, 1, 100 and left sf10 doc_id at 5.26x multiplicity, which merged
  * unrelated texts under one id in doc-keyed operators).
  *
  * Salt base (arg 4): replica salts are `saltBase + rep`. Each decade
  * hop must pass a DISTINCT base (0, 10, 20) — reusing a salt across
  * applications would make generation-2's rep-k replica of an original
  * doc reproduce generation-1's rep-k replica EXACTLY (same content-
  * keyed map), planting ~9 exact-dup collisions per original doc per
  * decade. rep 0 is always the identity, so earlier-generation docs
  * carry through unchanged.
  */
object ScaleUp {
  val Copies = 10

  /** Salted-substitution text for one replica: each whitespace token is
    * replaced with probability ~0.4 keyed on xxhash64(token, salt) by 6
    * hash-derived chars, and a per-generation tag token is appended.
    *
    * Content-keyed: the verdict and the replacement depend on (token,
    * salt) only — never doc_id or position — so shared token runs
    * between near-dup docs substitute identically (density-preserving),
    * while ~40% of each doc's tokens change vs its original (replica
    * shingle Jaccard lands well under the 0.5 verify threshold). The
    * replacement chars ALL come from the hash: a constant marker prefix
    * would make every substituted token share its first char, and
    * 8-char shingles spanning a token boundary would lose their
    * next-token context signal (measured: background cross-doc shingle
    * Jaccard RISES with p instead of falling; FIXTURES.md calibration
    * history). Exposed as a function so ScaleUpSpec can pin the
    * contract.
    */
  def saltedText(text: Column, salt: Column): Column = {
    val subbed = transform(split(text, " "), t =>
      when(pmod(xxhash64(t, salt), lit(100)) < lit(40),
        lower(substring(hex(xxhash64(t, salt, lit("sub"))), 1, 6)))
        .otherwise(t))
    array_join(concat(subbed, array(concat(lit("g"), salt))), " ")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val shiftScale = if (args.length > 2) args(2).toLong else 1L
    val outParts = if (args.length > 3) args(3).toInt else 8
    val saltBase = if (args.length > 4) args(4).toLong else 0L
    // GENERATION-TIME DENSITY GATE (r17 verdict task 2): candidate
    // density is the dedup pipeline's binding cost, and it is a property
    // of the FIXTURE — a regenerated decade whose candidates/doc drifts
    // above the pinned FIXTURES.md curve would quietly inflate every
    // scale claim made on it. Pass the decade's pinned bound as arg 6
    // (see the FIXTURES.md ladder) and the regeneration fails loud at
    // the source instead of poisoning downstream probes.
    val maxCandPerDoc: Option[Double] =
      if (args.length > 5) Some(args(5).toDouble) else None
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
    val salted = saltedText(col("text"), lit(saltBase) + col("rep"))
    write(docs.crossJoin(replicas).select(
      (col("doc_id") + col("rep") * lit(100000000L * shiftScale)).as("doc_id"),
      when(col("rep") === 0, col("text")).otherwise(salted).as("text"),
      col("lang"), col("source"),
      when(col("rep") === 0, col("n_chars"))
        .otherwise(length(salted).cast("long")).as("n_chars")),
      "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val noisy = transform(col("embedding"), (x, i) =>
      when(col("rep") === 0, x).otherwise(
        x + ((pmod(xxhash64(col("vec_id"), i, col("rep")), lit(1000L))
          .cast("double") / 1000.0 - 0.5) * 0.3).cast("float")))
    write(emb.crossJoin(replicas).select(
      (col("vec_id") + col("rep") * lit(100000000L * shiftScale)).as("vec_id"),
      noisy.as("embedding"), col("label")), "embeddings")

    val densityOk = maxCandPerDoc.forall { bound =>
      val (docsN, cand) = DensityProbe.candidateDensity(spark, dst)
      val candPerDoc = cand.toDouble / docsN
      println(f"density gate: $cand candidates / $docsN docs = $candPerDoc%.4f per doc (bound $bound%.4f)")
      DensityProbe.checkBound(dst, candPerDoc, bound)
    }

    spark.stop()
    if (!densityOk) sys.exit(1)
  }
}
