package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data deduplication operators over a `documents`
  * table (doc_id, text). Each is expressed Spark-first: shuffles only on
  * the candidate-generation keys (shingle / band / bucket), never all-pairs
  * except within buckets.
  */
object Dedup {

  /** Exact dedupe: one keeper (min doc_id) per identical text.
    * At 100 TB: group on xxhash64(text) first so the shuffle moves 8-byte
    * keys, verify text equality within hash groups.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Word-shingle set per document: positions via posexplode, n-grams via
    * window lead — pure built-ins, fully codegen'd.
    */
  def shingles(docs: DataFrame, n: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = (1 until n).foldLeft(
      docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("gram", col("w"))) { (df, i) =>
      df.withColumn("gram", concat_ws(" ", col("gram"), lead(col("w"), i).over(w)))
    }
    grams.filter(size(split(col("gram"), " ")) === n)
      .select(col("doc_id"), col("gram")).distinct()
  }

  /** Candidate pairs with n-gram Jaccard ≥ threshold, computed with an
    * integer-only test (3·common ≥ |A|+|B| ⟺ J ≥ 0.5 for the default) to
    * stay float-free. Shuffle = shingle join (inverted index), classic
    * "small candidate set" shape; hot shingles can be dropped by df
    * frequency cap for scale.
    *
    * The df cap itself is skew-proof: document frequency comes from a
    * map-side-combinable `groupBy(gram).count` (partial aggregation
    * collapses a mega-gram per input partition before the exchange — a
    * window over gram would put every occurrence of the hottest gram in
    * ONE partition first, recreating the exact straggler the cap guards
    * against), and the HOT grams — at most Σoccurrences/cap distinct
    * values, tiny by construction — broadcast into a left-anti, so the
    * full shingle set never shuffles just to learn its df.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 2, maxShingleFreq: Int = 1000): DataFrame = {
    val sh = shingles(docs, n)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val rare =
      if (maxShingleFreq == Int.MaxValue) sh // exact twin: nothing to cap
      else {
        val hot = sh.groupBy(col("gram")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleFreq).select(col("gram"))
        sh.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), "doc_b")
      .filter(col("common") * 3 >= col("size_a") + col("size_b")) // J ≥ 0.5
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"), col("size_b"))
  }

  /** MinHash signatures: k permutations via affine transforms of xxhash64.
    * Returns (doc_id, sig: array<bigint>). All built-ins — the per-doc min
    * over shingle hashes is a groupBy aggregate (map-side combinable).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 32, shingleN: Int = 2): DataFrame = {
    val sh = shingles(docs, shingleN)
    // permutation i = xxhash64("i:" + gram) — ANSI-safe (no wrapping
    // arithmetic), independent hash families by seed prefix; the
    // single-string form is reproducible by the plain-Scala oracle
    // implementation (graft.gen.RefImpl.minhashSig)
    val aggs = (0 until k).map(i =>
      min(xxhash64(concat(lit(s"$i:"), col("gram")))).as(s"m$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band, hash(band slice)). bands*rows = k. The join key is a single
    * 8-byte hash → minimal shuffle.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                      shingleN: Int = 2): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(docs, k, shingleN)
    val banded = sig.select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(concat_ws(",",
            (0 until rows).map(r => col("sig")(b * rows + r)): _*))): _*))
          .as(Seq("band", "bucket")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash (64-bit) per document: sign-sum of token-hash bits weighted by
    * term frequency; near-dups have small Hamming distance.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("w")))
    // per bit: sum(tf * (bit ? 1 : -1)); sign → bit of the simhash
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"b$b")
    }
    val sums = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("doc_id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance maxDist, using the
    * pigeonhole trick: split 64 bits into (maxDist+1) blocks; any pair
    * within maxDist agrees exactly on ≥1 block → block-join, verify.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val sh = simhash(docs)
    val keyed = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftright(col("simhash"), b * width)
          .bitwiseAND((1L << width) - 1)): _*)).as(Seq("block", "key")))
    val popcount = (x: Column) => bit_count(x)
    keyed.as("a").join(keyed.as("b"),
        col("a.block") === col("b.block") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        popcount(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min xxhash64 over
    * each w-token window, distinct mins = fingerprint set.
    */
  def fingerprints(docs: DataFrame, window: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("h", xxhash64(col("tok")))
      .withColumn("fp", min(col("h")).over(w))
      .select(col("doc_id"), col("fp")).distinct()
  }
}
