package graft.frontier

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Iceberg-style snapshot/manifest layer over Parquet (no Iceberg jar in
  * this environment — see SURVEY.md §7.0). Gives the crawl loop:
  *
  *  - atomic wave commits: a wave writes new parquet dirs, then commits a
  *    manifest vN+1.json via temp-file + atomic rename. An interrupted wave
  *    is invisible — mirroring the reference's claim-transaction +
  *    reset-on-shutdown semantics (internal/pkg/source/lq/lq.go:75-93).
  *  - resumability: reopen the store → latest committed snapshot.
  *  - lineage: each snapshot records wave number, per-table file lists and
  *    the wave's counters.
  *
  * Table layout per snapshot:
  *   frontier    — full rewrite per wave (FRESH rows only). At 10^10 scale
  *                 this maps to Iceberg merge-on-read deletes + appends per
  *                 host_bucket partition; the manifest API is the seam.
  *   seen        — append-only file list, compacted when it fragments.
  *   host_state  — tiny, full rewrite.
  *   counters    — append-only.
  */
final class FrontierStore(val workDir: String) {
  private val mapper = new ObjectMapper()
  private val snapDir = Paths.get(workDir, "snapshots")
  private val dataDir = Paths.get(workDir, "data")

  Files.createDirectories(snapDir)
  Files.createDirectories(dataDir)

  final case class Snapshot(
      version: Int,
      wave: Int,
      frontier: Seq[String],
      seen: Seq[String],
      hostState: Seq[String],
      counters: Seq[String],
      frontierRows: Long, // row count → auto-finish check without a Spark job
      bloom: Seq[String] = Nil, // Bloom shard table paths
      waveCounters: Map[String, Long] = Map.empty // this wave's counters (lineage)
  )

  def latest: Option[Snapshot] = {
    val versions = Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .toSeq
    if (versions.isEmpty) None
    else Some(read(versions.max))
  }

  private def read(version: Int): Snapshot = {
    val node = mapper.readTree(Files.readAllBytes(snapPath(version)))
    def arr(field: String): Seq[String] =
      node.get(field).elements().asScala.map(_.asText()).toSeq
    val waveCounters =
      if (node.has("wave_counters")) {
        val wc = node.get("wave_counters")
        wc.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      } else Map.empty[String, Long]
    Snapshot(version, node.get("wave").asInt(), arr("frontier"), arr("seen"),
      arr("host_state"), arr("counters"),
      if (node.has("frontier_rows")) node.get("frontier_rows").asLong() else -1L,
      if (node.has("bloom")) arr("bloom") else Nil,
      waveCounters)
  }

  /** All snapshots in version order (lineage walk). */
  def history: Seq[Snapshot] = {
    Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .toSeq.sorted.map(read)
  }

  private def snapPath(version: Int): Path =
    snapDir.resolve(f"v$version%05d.json")

  /** Atomically commit the next snapshot. */
  def commit(wave: Int, frontier: Seq[String], seen: Seq[String],
             hostState: Seq[String], counters: Seq[String],
             frontierRows: Long = -1L, bloom: Seq[String] = Nil,
             waveCounters: Map[String, Long] = Map.empty): Snapshot = {
    val version = latest.map(_.version + 1).getOrElse(0)
    val node: ObjectNode = mapper.createObjectNode()
    node.put("wave", wave)
    node.put("version", version)
    node.put("frontier_rows", frontierRows)
    def put(field: String, paths: Seq[String]): Unit = {
      val a = node.putArray(field)
      paths.foreach(a.add)
    }
    put("frontier", frontier)
    put("seen", seen)
    put("host_state", hostState)
    put("counters", counters)
    put("bloom", bloom)
    val wc = node.putObject("wave_counters")
    waveCounters.foreach { case (k, v) => wc.put(k, v) }
    val tmp = snapDir.resolve(f".v$version%05d.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    Files.move(tmp, snapPath(version), StandardCopyOption.ATOMIC_MOVE)
    Snapshot(version, wave, frontier, seen, hostState, counters, frontierRows,
      bloom, waveCounters)
  }

  /** Fresh parquet output dir for a table at a wave. */
  def newTableDir(wave: Int, table: String): String =
    dataDir.resolve(f"w$wave%05d-$table").toString

  def readTable(spark: SparkSession, paths: Seq[String], schemaDdl: String): DataFrame =
    if (paths.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    else spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .parquet(paths: _*)

  /** Drop data dirs not referenced by the latest snapshot (GC). */
  def vacuum(): Unit = latest.foreach { snap =>
    val live = (snap.frontier ++ snap.seen ++ snap.hostState ++ snap.counters ++ snap.bloom)
      .map(p => Paths.get(p).getFileName.toString).toSet
    Files.list(dataDir).iterator().asScala.toSeq.foreach { p =>
      if (!live.contains(p.getFileName.toString)) deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object FrontierStore {
  val frontierDdl: String =
    "id string, url string, url_canon string, host string, host_bucket int, " +
    "seed_id string, via string, kind string, depth int, hops int, " +
    "redirects int, css_jump int, ts bigint"
  val seenDdl: String = "url_hash bigint, kind string, host_bucket int"
  val hostStateDdl: String =
    "host string, refill_rate double, ideal_rate double, penalty_until bigint, failure_count int"
  val countersDdl: String =
    "wave int, claimed bigint, fetched bigint, failed bigint, deduped bigint, " +
    "excluded bigint, queued bigint, seeds_finished bigint"
}
