package graft.warc

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** WARC sink: dedupe election semantics, spec-correct record structure on
  * parse-back (headers, digests, revisit lineage), size rotation, commit
  * counters. Reference behavior: `internal/pkg/archiver/warc.go:12-108`
  * (gowarc local dedupe + rotation; defaults `cmd/get.go:119-134`).
  */
class WarcSinkSpec extends AnyFunSuite {
  private lazy val spark = graft.engine.EngineSpec.spark

  private def ts(s: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + s))

  /** 6 URLs: a/b/c share one big payload (dedupe), d below threshold with
    * the same bytes as e (NOT deduped — size floor), f unique.
    */
  private def pagesDf = {
    import spark.implicits._
    val big = ("<html>" + "x" * 200 + "</html>").getBytes("UTF-8")
    val tiny = "<p>t</p>".getBytes("UTF-8")
    Seq(
      ("http://h1.example/a", ts(20), big),
      ("http://h1.example/b", ts(10), big), // earliest ts: elected canonical
      ("http://h2.example/c", ts(30), big),
      ("http://h2.example/d", ts(1), tiny),
      ("http://h2.example/e", ts(2), tiny),
      ("http://h3.example/f", ts(5), ("<html>unique</html>").getBytes("UTF-8")))
      .toDF("url", "warc_ts", "html")
  }

  // ---- tiny WARC reader (test-side): JDK GZIPInputStream reads the
  // concatenated members as one stream; records split on Content-Length ----
  final case class Rec(headers: Map[String, String], block: Array[Byte])

  private def readWarc(path: java.nio.file.Path): Seq[Rec] = {
    val gz = new GZIPInputStream(
      new ByteArrayInputStream(java.nio.file.Files.readAllBytes(path)))
    val bytes = gz.readAllBytes()
    val recs = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var i = 0
    def indexOfCrlfCrlf(from: Int): Int = {
      var j = from
      while (j + 3 < bytes.length &&
        !(bytes(j) == '\r' && bytes(j + 1) == '\n' &&
          bytes(j + 2) == '\r' && bytes(j + 3) == '\n')) j += 1
      j
    }
    while (i < bytes.length) {
      val hEnd = indexOfCrlfCrlf(i)
      val head = new String(bytes, i, hEnd - i, "UTF-8")
      val lines = head.split("\r\n")
      assert(lines(0) == "WARC/1.0", s"bad version line: ${lines(0)}")
      val hs = lines.drop(1).map { l =>
        val k = l.indexOf(": "); l.substring(0, k) -> l.substring(k + 2)
      }.toMap
      val len = hs("Content-Length").toInt
      val blockStart = hEnd + 4
      recs += Rec(hs, bytes.slice(blockStart, blockStart + len))
      i = blockStart + len + 4 // skip the record-boundary CRLF CRLF
    }
    recs.toSeq
  }

  test("dedupe election: size threshold, deterministic canonical, lineage") {
    val e = Warc.dedupeElection(pagesDf, sizeThreshold = 64)
      .select("url", "record_type", "refers_to").collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(e("http://h1.example/b") == ("response", None)) // earliest ts wins
    assert(e("http://h1.example/a") == ("revisit", Some("http://h1.example/b")))
    assert(e("http://h2.example/c") == ("revisit", Some("http://h1.example/b")))
    // identical tiny payloads below the floor: both stay responses
    assert(e("http://h2.example/d") == ("response", None))
    assert(e("http://h2.example/e") == ("response", None))
    assert(e("http://h3.example/f") == ("response", None))
  }

  test("written files parse back: warcinfo leads, digests and lineage verify") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toString
    val counters = Warc.write(pagesDf.repartition(1), dir, sizeThreshold = 64,
      options = Map("operator" -> "spec"))
    assert(counters("n_response") == 4L)
    assert(counters("n_revisit") == 2L)
    assert(counters("n_files") == 1L)
    assert(counters("payload_bytes_deduped") > 0L)

    val files = Warc.readManifest(dir) // counters only; list files on disk
    assert(files.nonEmpty)
    val warcs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val paths = scala.jdk.CollectionConverters.IteratorHasAsScala(warcs).asScala
      .filter(_.toString.endsWith(".warc.gz")).toSeq.sortBy(_.toString)
    assert(paths.size == 1)

    val recs = readWarc(paths.head)
    assert(recs.head.headers("WARC-Type") == "warcinfo")
    val info = new String(recs.head.block, "UTF-8")
    assert(info.contains("software: zenospark"))
    assert(info.contains("operator: spec"))

    val byType = recs.groupBy(_.headers("WARC-Type"))
    assert(byType("response").size == 4)
    assert(byType("revisit").size == 2)

    // every response: payload digest recomputes from the block's HTTP body
    byType("response").foreach { r =>
      val bodyStart = {
        val s = new String(r.block, "UTF-8")
        // HTTP headers are ASCII; payload may not be — find the separator
        var j = 0
        while (j + 3 < r.block.length &&
          !(r.block(j) == '\r' && r.block(j + 1) == '\n' &&
            r.block(j + 2) == '\r' && r.block(j + 3) == '\n')) j += 1
        assert(s.startsWith("HTTP/1.1 200 OK\r\n"))
        j + 4
      }
      val payload = r.block.drop(bodyStart)
      assert(r.headers("WARC-Payload-Digest") == s"sha1:${Warc.sha1Base32(payload)}")
      assert(r.headers("WARC-Block-Digest") == s"sha1:${Warc.sha1Base32(r.block)}")
      assert(r.headers("Content-Type") == "application/http;msgtype=response")
      assert(r.headers.contains("WARC-Record-ID"))
    }

    // every revisit: identical-payload-digest profile, refers to the
    // elected canonical, block is headers-only (no payload bytes)
    byType("revisit").foreach { r =>
      assert(r.headers("WARC-Profile") ==
        "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")
      assert(r.headers("WARC-Refers-To-Target-URI") == "http://h1.example/b")
      assert(r.headers.contains("WARC-Refers-To-Date"))
      assert(new String(r.block, "UTF-8").startsWith("HTTP/1.1 200 OK\r\n"))
      assert(!new String(r.block, "UTF-8").contains("xxxx")) // no payload in block
    }
    // the canonical response for the deduped payload is /b
    val dedupedDigest = byType("revisit").head.headers("WARC-Payload-Digest")
    val canon = byType("response")
      .filter(_.headers("WARC-Payload-Digest") == dedupedDigest)
    assert(canon.map(_.headers("WARC-Target-URI")) == Seq("http://h1.example/b"))
    graft.tools.FsUtil.deleteRecursively(dir)
  }

  test("rotation: small maxFileBytes splits the series; each file self-opens") {
    val dir = java.nio.file.Files.createTempDirectory("warcrot").toString
    Warc.write(pagesDf.repartition(1), dir, sizeThreshold = 64,
      options = Map("maxFileBytes" -> "200", "prefix" -> "SPEC"))
    val paths = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
        .filter(_.toString.endsWith(".warc.gz")).toSeq.sortBy(_.toString)
      finally l.close()
    }
    assert(paths.size > 1, s"expected rotation, got ${paths.size} file(s)")
    paths.foreach { p =>
      val recs = readWarc(p)
      assert(recs.head.headers("WARC-Type") == "warcinfo", p.toString)
      assert(recs.head.headers("WARC-Filename") == p.getFileName.toString)
    }
    val manifest = Warc.readManifest(dir)
    assert(manifest("n_files").toInt == paths.size)
    graft.tools.FsUtil.deleteRecursively(dir)
  }

  test("read path round-trips the sink: rows, payload bytes, lineage, ts") {
    val dir = java.nio.file.Files.createTempDirectory("warcrt").toString
    Warc.write(pagesDf.repartition(1), dir, sizeThreshold = 64)
    val back = spark.read.format("warc").load(dir)
    assert(back.count() == 6L)
    val rows = back.collect().map { r =>
      r.getAs[String]("url") -> ((r.getAs[String]("record_type"),
        Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq).getOrElse(Nil),
        Option(r.getAs[String]("refers_to")),
        r.getAs[java.sql.Timestamp]("warc_ts")))
    }.toMap
    val orig = pagesDf.collect().map(r =>
      r.getString(0) -> ((r.getAs[Array[Byte]]("html").toSeq, r.getTimestamp(1)))).toMap
    // responses carry the exact original payload bytes and second-precision ts
    Seq("http://h1.example/b", "http://h2.example/d", "http://h2.example/e",
      "http://h3.example/f").foreach { u =>
      val (t, p, ref, ts2) = rows(u)
      assert(t == "response" && ref.isEmpty, u)
      assert(p == orig(u)._1, s"payload bytes differ for $u")
      assert(ts2.getTime == orig(u)._2.getTime, u)
    }
    // revisits: no payload bytes, lineage to the elected canonical
    Seq("http://h1.example/a", "http://h2.example/c").foreach { u =>
      val (t, p, ref, _) = rows(u)
      assert(t == "revisit" && p.isEmpty && ref.contains("http://h1.example/b"), u)
    }
    // column pruning reaches the scan: a payload-free projection reads
    // a one-column schema (ReadSchema in the DSv2 scan node)
    val pruned = back.select("url").queryExecution.executedPlan.toString
    // the BatchScan's bracketed output list is the pruned schema: one
    // attribute, no payload column materialized
    assert(pruned.matches("(?s).*BatchScan warc\\[url#\\d+\\].*"), pruned)
    graft.tools.FsUtil.deleteRecursively(dir)
  }

  test("streaming sink: micro-batches land as epoch-stamped files, batch-readable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("warcstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warcckpt").toString
    val mem = MemoryStream[(String, Long, Array[Byte])]
    val q = mem.toDF().toDF("url", "secs", "payload")
      .select(col("url"),
        timestamp_seconds(col("secs")).as("warc_ts"),
        col("payload"),
        lit("response").as("record_type"),
        lit(null).cast("string").as("refers_to"),
        lit(null).cast("timestamp").as("refers_ts"))
      .writeStream.format("warc")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dir)
    mem.addData(("http://s.example/1", 1700000001L, "<html>one</html>".getBytes("UTF-8")))
    q.processAllAvailable()
    mem.addData(("http://s.example/2", 1700000002L, "<html>two</html>".getBytes("UTF-8")),
      ("http://s.example/3", 1700000003L, "<html>three</html>".getBytes("UTF-8")))
    q.processAllAvailable()
    q.stop()

    // the batch read path sees the union of all epochs
    val back = spark.read.format("warc").load(dir)
    assert(back.count() == 3L)
    assert(back.select("url").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("http://s.example/1", "http://s.example/2", "http://s.example/3"))
    // per-epoch manifests + epoch-stamped file names (replay idempotence
    // hinges on the deterministic epoch in the name)
    val names = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
        .map(_.getFileName.toString).toSeq.sorted
      finally l.close()
    }
    assert(names.exists(_.startsWith("_WARC_MANIFEST_e")), names.mkString(","))
    assert(names.filter(_.endsWith(".warc.gz")).forall(_.contains("-e")), names.mkString(","))
    graft.tools.FsUtil.deleteRecursively(dir)
    graft.tools.FsUtil.deleteRecursively(ckpt)
  }

  test("archiveCrawl: fetched claimed rows of the wave lineage reach the archive") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("warcstore").toString
    val out = java.nio.file.Files.createTempDirectory("warcout").toString
    // minimal store layout: two wave-log dirs with claimed rows across
    // dispositions, plus candidate rows that must be ignored
    Seq(
      ("claimed", "http://a.example/1", "FETCHED"),
      ("claimed", "http://a.example/2", "FAILED"),
      ("cand", "http://a.example/3", "PASS"))
      .toDF("row_type", "url_canon", "disposition")
      .write.parquet(s"$store/data/w00001-log")
    Seq(
      ("claimed", "http://a.example/3", "FETCHED"),
      ("claimed", "http://a.example/1", "FETCHED"), // refetch: distinct() folds it
      ("claimed", "http://a.example/4", "DISCARDED"))
      .toDF("row_type", "url_canon", "disposition")
      .write.parquet(s"$store/data/w00002-log")
    val pagesDir = s"$store/pages"
    Seq(
      ("http://a.example/1", ts(1), "<html>p1</html>".getBytes("UTF-8")),
      ("http://a.example/2", ts(2), "<html>p2</html>".getBytes("UTF-8")),
      ("http://a.example/3", ts(3), "<html>p3</html>".getBytes("UTF-8")),
      ("http://a.example/4", ts(4), "<html>p4</html>".getBytes("UTF-8")),
      ("http://a.example/5", ts(5), "<html>p5</html>".getBytes("UTF-8")))
      .toDF("url", "warc_ts", "html").write.parquet(pagesDir)

    val counters = Warc.archiveCrawl(spark, store, pagesDir, out)
    // only FETCHED claimed rows archive: urls 1 and 3 — not the FAILED,
    // not the DISCARDED, not the candidate row, not the uncrawled page
    assert(counters("n_response") == 2L)
    assert(counters("n_revisit") == 0L)
    val urls = spark.read.format("warc").load(out)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(urls == Seq("http://a.example/1", "http://a.example/3"))
    graft.tools.FsUtil.deleteRecursively(store)
    graft.tools.FsUtil.deleteRecursively(out)
  }

  test("election on the pages fixture matches exact payload grouping") {
    graft.gen.OracleData.ensure(spark)
    val pages = spark.read.parquet(s"${graft.gen.OracleData.Dir}/pages")
    // threshold 1: the fixture's duplicate payloads are tiny (an empty-body
    // group + four 19-byte groups), so the size floor keeps the empty
    // bodies as responses while the 19-byte groups dedupe — both branches
    // live on real data
    val e = Warc.dedupeElection(pages, sizeThreshold = 1)
    val total = pages.count()
    val nRevisit = e.filter(col("record_type") === "revisit").count()
    val nResponse = e.filter(col("record_type") === "response").count()
    assert(nRevisit + nResponse == total)
    assert(nRevisit > 0, "fixture should contain deduplicable payloads")
    val bigDupRows = pages.filter(octet_length(col("html")) >= 1)
      .groupBy(col("html")).count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).collect()(0).getLong(0)
    assert(nRevisit == bigDupRows)
    // empty payloads (below the floor) all stay responses
    assert(e.filter(octet_length(col("html")) === 0 &&
      col("record_type") === "revisit").count() == 0L)
    // every revisit's refers_to is a response row's url
    val refs = e.filter(col("record_type") === "revisit").select("refers_to")
    val joined = refs.join(
      e.filter(col("record_type") === "response").select(col("url").as("refers_to")),
      Seq("refers_to"), "left_anti").count()
    assert(joined == 0L)
  }
}
