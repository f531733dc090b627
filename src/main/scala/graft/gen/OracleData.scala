package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture tables for the driver's DuckDB-oracle correctness
  * gate. Written once under data/oracle (committed to the repo so the
  * oracle SQL can reference stable absolute paths); every value is a pure
  * function of the row index — regeneration is byte-stable.
  *
  * Tables:
  *   pages/fetch_meta/robots — the synthetic web corpus (Corpus.Spec fixed)
  *   frontier  — a mid-crawl frontier state (urls with hops/ts/kind spread)
  *   seen      — a seen-set over a deterministic subset, with kinds
  *   done_log  — a processed-URLs log across waves with dispositions
  */
object OracleData {
  val Dir = "/root/repo/data/oracle"
  val spec: Corpus.Spec = Corpus.Spec(nPages = 3000, nHosts = 24, seed = 42L)

  def ensure(spark: SparkSession): Unit = synchronized {
    val marker = java.nio.file.Paths.get(s"$Dir/_SUCCESS")
    if (java.nio.file.Files.exists(marker)) return
    write(spark)
    java.nio.file.Files.createFile(marker)
  }

  def write(spark: SparkSession): Unit = {
    import spark.implicits._
    Corpus.write(spark, Dir, spec)

    // frontier: one row per corpus page index (deterministic columns)
    val n = spec.nPages
    val frontier = spark.range(n).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      val url = Corpus.pageUrl(h, j)
      val host = Corpus.hostName(h)
      val kind = if (i % 5 == 0) "seed" else if (i % 5 == 1) "redirect" else "asset"
      val seed = Corpus.pageUrl(h, 0)
      graft.model.FrontierRow(
        id = url, url = url, url_canon = url, host = host,
        host_bucket = (h % 16), seed_id = seed, via = "",
        kind = kind, depth = (i % 3).toInt, hops = (i % 4).toInt,
        redirects = 0, css_jump = 0, ts = i % 7)
    }
    frontier.coalesce(1).write.mode("overwrite").parquet(s"$Dir/frontier")

    // seen: every 3rd url; kind alternates (exercises asset→seed promotion)
    val seen = spark.range(n).filter(_ % 3 == 0).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      val url = Corpus.pageUrl(h, j)
      (graft.canon.Canon.fnv64a(url), url, if (i % 6 == 0) "seed" else "asset")
    }.toDF("url_hash", "url_canon", "kind")
    seen.coalesce(1).write.mode("overwrite").parquet(s"$Dir/seen")

    // done_log: processed rows across 5 waves with dispositions
    val dispositions = Array("FETCHED", "FETCHED", "FETCHED", "FAILED", "SEEN", "REDIRECT")
    val done = spark.range(n).filter(_ % 2 == 0).map { i =>
      val (h, j) = Corpus.locate(i, spec)
      val url = Corpus.pageUrl(h, j)
      val host = Corpus.hostName(h)
      val seed = Corpus.pageUrl(h, 0)
      (url, host, seed, (i % 5).toInt + 1, dispositions((i % 6).toInt),
        (i % 7).toInt, (i % 4).toInt)
    }.toDF("url_canon", "host", "seed_id", "wave", "disposition", "n_outlinks", "hops")
    done.coalesce(1).write.mode("overwrite").parquet(s"$Dir/done_log")

    // seeds.txt: plain seed list with comments/blanks (S2 fixture)
    val seedLines = (Seq("# zenospark oracle seed list", "") ++
      (0 until 10).flatMap(h => Seq(Corpus.urlOf(h, 0), ""))) :+ "# end"
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$Dir/seeds.txt"),
      seedLines.mkString("\n").getBytes("UTF-8"))
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$Dir/$name")
}
