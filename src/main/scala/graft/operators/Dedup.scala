package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every near-dup variant is (1) a narrow per-row signature
  * stage, (2) a shuffle keyed on a SMALL bucketing key (band hash / simhash
  * chunk / SRP bucket), (3) verification only WITHIN buckets. No full cross
  * join ever happens; the only quadratic work is per-bucket, bounded by
  * bucket size. This is the standard MinHash-LSH layout (Broder '97) mapped
  * onto groupBy-join.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups by a column (hash groupBy). */
  def exactDuplicateGroups(df: DataFrame, byCol: String, idCol: String): DataFrame =
    df.groupBy(col(byCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Keep one row (min id) per exact key — map-side-combinable aggregation. */
  def exactDedup(df: DataFrame, byCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(byCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------- shingles

  /** Character n-gram shingles (distinct), lowercased.
    * NOTE: `sequence(1, 0)` would produce a DESCENDING sequence, so counts
    * < 1 are guarded to an empty array.
    */
  def charShingles(text: Column, n: Int = 5): Column = {
    val t = lower(text)
    val count = length(t) - (n - 1)
    when(count < 1, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), count), i => t.substr(i, lit(n)))))
  }

  /** Word n-gram shingles (distinct). */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = graft.functions.TextAnalysis.tokens(text)
    val count = size(toks) - (n - 1)
    when(count < 1, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), count),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  // -------------------------------------------------------------- minhash

  /** MinHash signature: element k = min over shingles of xxhash64(k, s).
    * One narrow projection; `numHashes` codegen'd min-reductions per row.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { k =>
      coalesce(array_min(transform(shingles, s => xxhash64(lit(k), s))),
        lit(Long.MaxValue))
    }: _*)

  /** LSH band key for band `b` covering rows [b*r, (b+1)*r) of the
    * signature: hash of the band slice.
    */
  private def bandKey(sig: Column, band: Int, rowsPerBand: Int): Column =
    xxhash64(lit(band), to_json(struct(slice(sig, band * rowsPerBand + 1, rowsPerBand))))

  /** MinHash+LSH near-duplicate pairs.
    *
    * Plan shape: signatures (narrow) → explode bands (×numBands) → shuffle on
    * (band, bandKey) → per-bucket self-join → distinct candidate pairs →
    * verify exact Jaccard on shingles ≥ threshold.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, numBands: Int = 8, shingleSize: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val withSig = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", charShingles(col("text"), shingleSize))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))

    val banded = withSig.select(col("id"), col("shingles"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"), bandKey(col("sig"), b, rowsPerBand).as("key"))): _*))
        .as("bk"))

    val a = banded.select(col("bk").as("bk"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("bk").as("bk2"), col("id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b, a("bk") === b("bk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens: bit j of the result is set when the
    * sum over tokens of ±1 (per bit j of xxhash64(token)) is positive.
    * One aggregate over the token array carrying a 64-long count buffer; the
    * `finish` lambda folds the buffer to the signature exactly once.
    */
  def simhash(text: Column): Column = {
    val toks = graft.functions.TextAnalysis.tokens(lower(text))
    def bitsOf(t: Column): Column = {
      val h = xxhash64(t)
      array((0 until 64).map { j =>
        when(shiftright(h, j).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))
      }: _*)
    }
    aggregate(
      toks,
      typedLit(Seq.fill(64)(0L)),
      (acc, t) => zip_with(acc, bitsOf(t), (a, bit) => a + bit),
      counts => (0 until 64).map { j =>
        when(element_at(counts, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 16-bit chunks (any pair within
    * hamming distance ≤ 3 shares at least one of 4 chunks — pigeonhole), then
    * verify hamming ≤ maxDistance. Shuffle key = (chunkIdx, chunkValue).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("idx"),
          shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL).as("value"))): _*)).as("chunk"))
    val a = chunked.select(col("chunk").as("c"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk").as("c2"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, a("c") === b("c2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDistance)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs via SRP-LSH bucketing: rows
    * sharing an LSH bucket are compared exactly; cosine ≥ threshold kept.
    * For corpora where recall must be exact, call with numPlanes = 0 to get
    * the (quadratic) brute-force path — only sane for small/blocked inputs.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val keyed =
      if (numPlanes <= 0) base.withColumn("bucket", lit(0L))
      else base.withColumn("bucket",
        VectorOps.srpSignature(col("vec"), VectorOps.hyperplanes(numPlanes, dim)))
    val a = keyed.select(col("bucket").as("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = keyed.select(col("bucket").as("bucket2"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, a("bucket") === b("bucket2") && col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
