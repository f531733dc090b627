package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dedup / similarity / text-analysis operator checks over the driver
  * testdata (sf0.001) — semantic properties, not just row counts.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("exact dedupe groups identical texts") {
    import spark.implicits._
    val withDups = docs.select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 10000).as("doc_id"), $"text"))
    val groups = Dedup.exact(withDups)
    assert(groups.count() == docs.count()) // one group per distinct text
    assert(groups.agg(sum($"n_copies")).first().getLong(0) == 2 * docs.count())
    // keeper is always the smaller id
    assert(groups.filter($"keeper_id" >= 10000).count() == 0)
  }

  test("ngram jaccard finds planted near-dups and is symmetric-safe") {
    val pairs = Dedup.ngramJaccardPairs(docs, maxShingleFreq = Int.MaxValue).collect()
    assert(pairs.nonEmpty, "testdata has planted near-dups")
    // doc_a < doc_b invariant (no mirrored duplicates)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    // the jaccard condition actually holds
    assert(pairs.forall(r => r.getLong(2) * 3 >= r.getLong(3) + r.getLong(4)))
  }

  test("minhash LSH candidates cover the true jaccard pairs (recall)") {
    import spark.implicits._
    val truth = Dedup.ngramJaccardPairs(docs, maxShingleFreq = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cands = Dedup.minhashLshPairs(docs, k = 32, bands = 16)
      .as[(Long, Long)].collect().toSet
    val recall = truth.count(cands.contains).toDouble / math.max(truth.size, 1)
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    import spark.implicits._
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    // identical text → identical simhash
    val byText = docs.select($"doc_id", $"text").collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    byText.foreach { rows =>
      val hashes = rows.map(r => sh(r.getLong(0))).toSet
      assert(hashes.size == 1)
    }
    // true near-dup pairs have small hamming distance on average
    val truth = Dedup.ngramJaccardPairs(docs, maxShingleFreq = Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    if (truth.nonEmpty) {
      val dists = truth.map { case (a, b) =>
        java.lang.Long.bitCount(sh(a) ^ sh(b))
      }
      assert(dists.sum.toDouble / dists.length < 20,
        s"near-dups should be hamming-close, mean=${dists.sum.toDouble / dists.length}")
    }
  }

  test("IVF ANN recall vs brute force") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall (nProbe=4/8 cells)")
  }

  test("IVF k-means recall ≥0.8 on clustered vectors") {
    import spark.implicits._
    // 8 well-separated cluster centers, 40 members each with small
    // deterministic jitter — the shape IVF is FOR; seeded k-means must
    // recover the clusters well enough that nProbe=2 of 8 cells finds
    // ≥80% of true neighbors (first-N-ids "centroids" scored ~0.5 here)
    val dim = 16
    def center(c: Int): Array[Float] =
      Array.tabulate(dim)(d => if (d % 8 == c % 8) (if (c < 8) 1.0f else -1.0f) else 0.1f * ((c * 7 + d) % 5 - 2))
    val vecs = (0 until 320).map { i =>
      val c = i % 8
      val base = center(c)
      val jit = Array.tabulate(dim)(d => 0.05f * (((i * 31 + d * 13) % 11) - 5))
      (i.toLong, Array.tabulate(dim)(d => base(d) + jit(d)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 16)
    val exact = Similarity.bruteForceTopK(df, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(df, queries, 5, nCells = 8, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"k-means IVF recall@5 = $recall (nProbe=2/8 cells)")
  }

  test("quantized dot product is deterministic and matches plain dot sign") {
    import spark.implicits._
    val a = emb.filter($"vec_id" === 0).select($"embedding").first().getSeq[Float](0)
    val b = emb.filter($"vec_id" === 1).select($"embedding").first().getSeq[Float](0)
    val expected = a.zip(b).map { case (x, y) =>
      math.round(x.toDouble * 1000) * math.round(y.toDouble * 1000)
    }.sum
    val got = emb.filter($"vec_id" === 0).crossJoin(
        emb.filter($"vec_id" === 1).select($"embedding".as("b")))
      .select(Similarity.quantizedDot($"embedding", $"b").as("dot"))
      .first().getLong(0)
    assert(got == expected)
  }

  test("language ID separates english-ish from stopword-free docs") {
    val out = TextAnalysis.langId(docs)
    assert(out.filter(col("lang_guess") === "en").count() > 0)
    // guess is one of the known labels
    assert(out.filter(!col("lang_guess").isin("en", "de", "fr", "unknown")).count() == 0)
  }

  test("token counts: bpe-ish >= whitespace tokens") {
    val out = TextAnalysis.withTokenCounts(docs)
    assert(out.filter(col("bpe_ish_tokens") < col("ws_tokens")).count() == 0)
  }

  test("multimodal: format sniff + stubbed decode keeps schema and determinism") {
    import spark.implicits._
    val blobs = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
      (3L, "GIF89a".getBytes("UTF-8")),
      (4L, "plain text".getBytes("UTF-8"))
    ).toDF("id", "content")
    val meta = Multimodal.withMeta(blobs)
    val formats = meta.select("id", "format").as[(Long, String)].collect().toMap
    assert(formats == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "unknown"))
    val dec1 = Multimodal.decodeStub(spark, blobs).collect().map(_.toString).sorted
    val dec2 = Multimodal.decodeStub(spark, blobs).collect().map(_.toString).sorted
    assert(dec1.sameElements(dec2), "stub decode must be deterministic")
    assert(Multimodal.decodeStub(spark, blobs).schema.fieldNames.toSeq ==
      Seq("id", "format", "features"))
  }

  test("cosine near-dup banded LSH: recall ≥0.9 vs brute force, exact precision") {
    import spark.implicits._
    val embs = graft.gen.OracleData.embeddingsSeq
    // brute-force ground truth in plain Scala (160² pairs)
    val truth = (for {
      (a, va) <- embs; (b, vb) <- embs
      if a < b && graft.gen.RefImpl.cosine(va, vb) >= 0.95
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture has planted near-dups")
    val df = embs.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairs(df, minCos = 0.95, nBits = 16,
        dim = graft.gen.OracleData.embDim, nTables = 16)
      .as[(Long, Long)].collect().toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"banded LSH recall $recall over ${truth.size} true pairs")
    // precision is exact by construction: every emitted pair was verified
    assert(got.subsetOf(truth), "all returned pairs satisfy cos >= minCos")
  }

  test("banded LSH buckets stay narrow on a skewed fixture") {
    // 400 diverse vectors + one planted 24-member identical cluster: the
    // cluster shares buckets (it IS the answer — quadratic in cluster size
    // is the output size), but diverse vectors must not pile into any
    // single (table, signature) bucket — the round-3 weakness was 256
    // GLOBAL buckets, N²/256 verify pairs at scale
    val dim = 32
    def v(i: Int): Array[Float] = Array.tabulate(dim)(d =>
      (graft.gen.RefImpl.xxh64long(i.toLong * 97 + d) % 1000L) / 1000.0f)
    val diverse = (0 until 400).map(i => (i.toLong, v(i)))
    val nBits = 16
    val widths = for (t <- 0 until 8) yield {
      diverse.groupBy { case (_, vec) =>
        graft.gen.RefImpl.cosLshBucket(vec, nBits, t * nBits)
      }.values.map(_.size).max
    }
    assert(widths.max <= 32,
      s"max bucket width ${widths.max} of 400 diverse vectors (16-bit tables)")
  }

  test("image dims: PNG IHDR, GIF LSD, JPEG SOF behind variable segments") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.imageDims(png).contains(Multimodal.ImageDims(640, 480)))
    val gif = "GIF87a".getBytes("US-ASCII") ++
      Array[Byte](0x20, 0x01, 0xF0.toByte, 0x00) // 288 × 240 little-endian
    assert(Multimodal.imageDims(gif).contains(Multimodal.ImageDims(288, 240)))
    // JPEG: two APPn segments + a COM before a PROGRESSIVE SOF2
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(2 + 7) ++ Array.fill(7)(0x00.toByte) ++
      Array[Byte](0xFF.toByte, 0xE1.toByte) ++ be16(2 + 3) ++ Array.fill(3)(0x11.toByte) ++
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ be16(2 + 5) ++ Array.fill(5)(0x63.toByte) ++
      Array[Byte](0xFF.toByte, 0xC2.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(1080) ++ be16(1920)
    assert(Multimodal.imageDims(jpeg).contains(Multimodal.ImageDims(1920, 1080)))
    // 0xFF fill bytes before markers are legal padding (T.81 B.1.1.2);
    // SOF3 (lossless) carries dims like any SOFn
    val jpegFill = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xE0.toByte) ++
      be16(2 + 4) ++ Array.fill(4)(0x00.toByte) ++
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xC3.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(600) ++ be16(800)
    assert(Multimodal.imageDims(jpegFill).contains(Multimodal.ImageDims(800, 600)))
    // EOI terminates the walk — bytes after it are not segment data
    val jpegEoi = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xD9.toByte, // EOI immediately
      0xFF.toByte, 0xC0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(10) ++ be16(10)
    assert(Multimodal.imageDims(jpegEoi).isEmpty, "no SOF before EOI")
    // SOS terminates the walk — entropy-coded data is not parseable
    val jpegSos = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xDA.toByte) ++ be16(4) ++ Array.fill(40)(0x37.toByte)
    assert(Multimodal.imageDims(jpegSos).isEmpty, "no SOF before SOS")
    // corrupt / truncated → None, never throws
    assert(Multimodal.imageDims(png.take(20)).isEmpty, "truncated IHDR")
    assert(Multimodal.imageDims(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xC0.toByte, 0x00, 0x01)).isEmpty, "corrupt JPEG length")
    assert(Multimodal.imageDims("GIF89a".getBytes("US-ASCII")).isEmpty, "short GIF")
    assert(Multimodal.imageDims(null).isEmpty)
    assert(Multimodal.imageDims("plain text here".getBytes("UTF-8")).isEmpty)
  }

  test("fingerprints: shared windows between duplicated docs") {
    import spark.implicits._
    val two = docs.limit(1).select(lit(1L).as("doc_id"), $"text")
      .unionByName(docs.limit(1).select(lit(2L).as("doc_id"), $"text"))
    val fp = Dedup.fingerprints(two)
    val byDoc = fp.groupBy($"doc_id").agg(collect_set($"fp").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(byDoc(1L).toSet == byDoc(2L).toSet, "identical docs share all fingerprints")
  }
}
