package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB): every variant reduces a document to a small
  * signature FIRST (narrow, codegen'd expressions), so the only shuffles are
  * on signature keys — never on raw text. Candidate generation is a
  * bucket-join on band keys (classic MinHash-LSH), which at 1000 executors
  * is a hash shuffle of (doc_id, band_key) pairs, orders of magnitude
  * smaller than the corpus.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * Map-side partial aggregation makes this a single small shuffle of
    * (hash, min_id, count) partials.
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** Character k-shingles as (doc_id, shingle) rows. `sequence`+`explode`
    * stays distributed; a doc of n chars yields n-k+1 rows.
    */
  def shingles(docs: DataFrame, idCol: String, text: Column, k: Int): DataFrame =
    docs.select(col(idCol), text.as("_t"),
        explode(sequence(lit(1), greatest(length(text) - (k - 1), lit(1)))).as("pos"))
      .select(col(idCol), expr(s"substring(_t, pos, $k)").as("shingle"))

  // -------------------------------------------------------------- minhash

  /** MinHash signatures: for each seed s, min over shingles of
    * md5(s || shingle). k independent hash functions via seed prefixing.
    * Output: (id, seed, minhash) — one shuffle, map-side combined.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, text: Column,
                        k: Int, numHashes: Int): DataFrame =
    shingles(docs, idCol, text, k)
      .select(col(idCol), col("shingle"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("seed"))
      .groupBy(col(idCol), col("seed").cast("int").as("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), col("shingle")))).as("minhash"))

  /** LSH banding: hash each document's per-band signature slice to a band
    * key; documents sharing a (band, band_key) bucket are near-dup
    * candidates. `rowsPerBand` consecutive seeds form a band.
    */
  def lshBandKeys(signatures: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
        x => x.getField("minhash")), "")).as("band_key"))

  /** Candidate-pair buckets: bucket population per band key. Pairs are
    * (a, b) within a bucket with a < b; at scale emit pairs only for
    * buckets below a size cap to bound skew.
    */
  def lshBuckets(bandKeys: DataFrame, idCol: String): DataFrame =
    bandKeys.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc"))

  def lshCandidatePairs(bandKeys: DataFrame, idCol: String, maxBucket: Int = 1000): DataFrame = {
    val a = bandKeys.select(col("band"), col("band_key"), col(idCol).as("doc_a"))
    val b = bandKeys.select(col("band"), col("band_key"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  // -------------------------------------------------------------- simhash

  /** SimHash (`bits`-bit, bits <= 16): per-token md5, bit b weighted +1 if
    * the high bit of hex nibble b is set else -1; signature bit = sign of
    * the summed weight. Hamming-close signatures => near-dups.
    */
  def simhash(docs: DataFrame, idCol: String, text: Column, bits: Int): DataFrame = {
    require(bits <= 16, "simhash uses one hex nibble per bit, md5 gives 32")
    val tok = docs.select(col(idCol), explode(split(text, " ")).as("w"))
      .withColumn("h", md5(col("w")))
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("bit"))
      .withColumn("wt",
        when(instr(lit("89abcdef"), substring(col("h"), col("bit") + 1, lit(1))) > 0, 1).otherwise(-1))
    tok.groupBy(col(idCol), col("bit"))
      .agg(sum(col("wt")).as("sw"))
      .groupBy(col(idCol))
      .agg(sum(when(col("sw") > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .as("simhash"))
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard over candidate pairs: |A∩B| / |A∪B| of distinct
    * shingle sets. Run AFTER LSH candidate generation — the join is on
    * (pair), not all-pairs. Jaccard returned in exact integer form
    * (inter, uni) plus the double ratio.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                   text: Column, k: Int): DataFrame = {
    val sh = shingles(docs, idCol, text, k).distinct()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val aSh = sh.select(col(idCol).as("_ja"), col("shingle").as("_sha"))
    val bSh = sh.select(col(idCol).as("_jb"), col("shingle").as("_shb"))
    val inter = pairs
      .join(aSh, col("doc_a") === col("_ja"))
      .join(bSh, col("doc_b") === col("_jb") && col("_sha") === col("_shb"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
  }
}
