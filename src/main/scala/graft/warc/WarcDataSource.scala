package graft.warc

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("warc").save(dir)` — a DataSource V2 batch sink that
  * streams [[Warc.sinkSchema]] rows into rotated `*.warc.gz` files, one
  * gzip member per record (the standard WARC packaging: `zcat`, warcio and
  * gowarc all read it), each file opened by a warcinfo record.
  *
  * Reference behavior covered (`internal/pkg/archiver/warc.go:12-108`):
  * prefix + size-based rotation (`warc-size`), warcinfo software/operator
  * fields, revisit records for dedupe hits (the dedupe DECISION itself is
  * the [[Warc.dedupeElection]] plan transform — see there for why that
  * beats gowarc's in-process digest cache at cluster scale).
  *
  * Scale shape: embarrassingly parallel — each input partition writes its
  * own rotated file series (names carry the partition id, so no two tasks
  * ever contend on a file), commit aggregates per-task counters into a
  * manifest; abort deletes the aborted task's files. No driver-side data
  * movement: only counters and file names reach the driver.
  *
  * Options: `prefix` (default "ZENO"), `maxFileBytes` (rotation, default
  * 1 GiB), `software`, `operator`, `stamp` (filename timestamp field,
  * deterministic in tests).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  // consulted only on the READ path (the write path passes the incoming
  // DataFrame's schema through supportsExternalMetadata)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcRead.readSchema
  // take the incoming DataFrame's schema as-is; the writer resolves
  // ordinals by name, so column order and nullability are free
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new WarcTable(schema, Option(properties.get("path")))
}

object WarcDataSource {
  val ManifestName = "_WARC_MANIFEST.json"
}

private[warc] class WarcTable(tableSchema: StructType, path: Option[String])
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = "warc"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WarcWriteBuilder(info)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val dir = Option(options.get("path")).orElse(path).getOrElse(
      throw new IllegalArgumentException("warc read requires a load(dir) path"))
    new WarcScanBuilder(WarcRead.listWarcFiles(dir))
  }
}

private[warc] class WarcWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WarcBatchWrite(info.options(), info.schema(), doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new WarcStreamingWrite(info.options(), info.schema())
  }
}

/** Streaming twin of the batch sink (`writeStream.format("warc")`): the
  * reference archives continuously as responses arrive; here each
  * micro-batch's partitions stream into epoch-stamped rotated files
  * (`prefix-stamp-e<epoch>-part-seq.warc.gz`). Epoch replay after a
  * failure rewrites the same deterministic names, so a duplicated commit
  * converges on the same bytes instead of duplicating records. Per-epoch
  * counters land in `_WARC_MANIFEST_e<epoch>.json`.
  */
private[warc] class WarcStreamingWrite(options: CaseInsensitiveStringMap,
                                       schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("warc streaming sink requires a path"))

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val base = WarcWriterFactory(dir, schema.fieldNames.zipWithIndex.toMap,
      Option(options.get("prefix")).getOrElse(Warc.DefaultPrefix),
      Option(options.get("maxFileBytes")).map(_.toLong).getOrElse(Warc.DefaultMaxFileBytes),
      Option(options.get("software")).getOrElse("zenospark/0.5"),
      Option(options.get("operator")),
      Option(options.get("stamp")).getOrElse("00000000000000"))
    new WarcStreamingWriterFactory(base)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: WarcCommit => m }
    val files = ms.flatMap(_.files).sorted
    val json = s"""{"epoch":$epochId,"n_response":${ms.map(_.nResponse).sum},""" +
      s""""n_revisit":${ms.map(_.nRevisit).sum},"n_files":${files.length},""" +
      s""""bytes_written":${ms.map(_.bytesWritten).sum},""" +
      s""""payload_bytes_deduped":${ms.map(_.payloadBytesDeduped).sum},""" +
      files.map("\"" + _ + "\"").mkString(""""files":[""", ",", "]}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"_WARC_MANIFEST_e$epochId.json"),
      json.getBytes("UTF-8"))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: WarcCommit => m }.flatMap(_.files).foreach { f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, f))
    }
}

private[warc] class WarcStreamingWriterFactory(base: WarcWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(base.copy(stamp = f"${base.stamp}-e$epochId%05d"), partitionId, taskId)
}

/** Per-task result: file names written + counters (summed at commit). */
private[warc] case class WarcCommit(files: Seq[String], nResponse: Long,
                                    nRevisit: Long, bytesWritten: Long,
                                    payloadBytesDeduped: Long)
  extends WriterCommitMessage

private[warc] class WarcBatchWrite(options: CaseInsensitiveStringMap,
                                   schema: StructType, truncate: Boolean)
    extends BatchWrite {
  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("warc sink requires a save(dir) path"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    if (truncate) {
      val listing = java.nio.file.Files.list(p)
      try listing.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        n.endsWith(".warc.gz") || n == WarcDataSource.ManifestName
      }.toList.foreach(java.nio.file.Files.delete)
      finally listing.close()
    }
    WarcWriterFactory(dir, schema.fieldNames.zipWithIndex.toMap,
      Option(options.get("prefix")).getOrElse(Warc.DefaultPrefix),
      Option(options.get("maxFileBytes")).map(_.toLong).getOrElse(Warc.DefaultMaxFileBytes),
      Option(options.get("software")).getOrElse("zenospark/0.5"),
      Option(options.get("operator")),
      Option(options.get("stamp")).getOrElse("00000000000000"))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: WarcCommit => m }
    val files = ms.flatMap(_.files).sorted
    val json = new StringBuilder("{")
    json.append(s""""n_response":${ms.map(_.nResponse).sum},""")
    json.append(s""""n_revisit":${ms.map(_.nRevisit).sum},""")
    json.append(s""""n_files":${files.length},""")
    json.append(s""""bytes_written":${ms.map(_.bytesWritten).sum},""")
    json.append(s""""payload_bytes_deduped":${ms.map(_.payloadBytesDeduped).sum},""")
    json.append(files.map("\"" + _ + "\"").mkString(""""files":[""", ",", "]}"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, WarcDataSource.ManifestName),
      json.toString.getBytes("UTF-8"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: WarcCommit => m }.flatMap(_.files).foreach { f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, f))
    }
}

private[warc] case class WarcWriterFactory(dir: String, ord: Map[String, Int],
                                           prefix: String, maxFileBytes: Long,
                                           software: String, operator: Option[String],
                                           stamp: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(this, partitionId, taskId)
}

/** Streams rows into the current file; rotates when the file passes
  * `maxFileBytes` (checked between records, like gowarc's rotator — a
  * record never splits across files).
  *
  * Task-attempt safety: bytes stream into attempt-unique `*.t<taskId>.tmp`
  * names and are renamed to the deterministic final names only in
  * commit() — a retried or speculative attempt of the same partition can
  * never clobber (or, via abort(), delete) the committed attempt's
  * output, readers never see a half-written file (the `.warc.gz` listing
  * filter skips tmp names), and streaming epoch replay still converges on
  * the same final names.
  */
private[warc] class WarcDataWriter(f: WarcWriterFactory, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val files = scala.collection.mutable.ArrayBuffer.empty[String]
  private var out: java.io.FileOutputStream = null
  private var fileBytes = 0L
  private var seq = 0
  private var nResponse = 0L
  private var nRevisit = 0L
  private var bytesWritten = 0L
  private var dedupedBytes = 0L

  private val iUrl = f.ord("url")
  private val iTs = f.ord("warc_ts")
  private val iPayload = f.ord("payload")
  private val iType = f.ord("record_type")
  private val iRefTo = f.ord("refers_to")
  private val iRefTs = f.ord("refers_ts")

  // ONE deflater + scratch buffer for the whole task, reset per gzip
  // member: a GZIPOutputStream per record allocated a fresh 64 KiB buffer
  // and a native zlib Deflater each time and (with finish() but no
  // close()) never released the native state until GC — unbounded native
  // memory over a task writing millions of records. reset() restores the
  // exact fresh-deflater state, so member bytes are identical.
  private val deflater = new java.util.zip.Deflater(
    java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  private val crc = new java.util.zip.CRC32
  private val dbuf = new Array[Byte](64 * 1024)
  // the static member header GZIPOutputStream wrote: magic, CM=deflate,
  // no flags, MTIME 0, XFL 0, OS 0
  private val gzHeader = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)

  private def writeMember(record: Array[Byte]): Unit = {
    out.write(gzHeader)
    deflater.reset()
    deflater.setInput(record)
    deflater.finish()
    while (!deflater.finished()) {
      val n = deflater.deflate(dbuf)
      if (n > 0) out.write(dbuf, 0, n)
    }
    crc.reset()
    crc.update(record)
    val v = crc.getValue
    val sz = record.length
    out.write(Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte,
      (sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
      ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
    out.flush()
  }

  private def tmpOf(name: String): String = s"$name.t$taskId.tmp"

  private def rotate(micros: Long): Unit = {
    if (out != null) { out.close(); out = null }
    val name = f"${f.prefix}-${f.stamp}-$partitionId%05d-$seq%05d.warc.gz"
    seq += 1
    files += name
    val path = java.nio.file.Paths.get(f.dir, tmpOf(name))
    out = new java.io.FileOutputStream(path.toFile)
    fileBytes = 0L
    writeMember(Warc.warcinfoRecord(name, micros, f.software, f.operator))
    fileBytes = path.toFile.length()
  }

  override def write(row: InternalRow): Unit = {
    val url = row.getUTF8String(iUrl).toString
    val micros = row.getLong(iTs)
    val payload = if (row.isNullAt(iPayload)) Array.emptyByteArray else row.getBinary(iPayload)
    val isRevisit = row.getUTF8String(iType).toString == "revisit"
    val rec =
      if (isRevisit) {
        val refTo = if (row.isNullAt(iRefTo)) url else row.getUTF8String(iRefTo).toString
        val refTs = if (row.isNullAt(iRefTs)) micros else row.getLong(iRefTs)
        nRevisit += 1
        dedupedBytes += payload.length
        Warc.revisitRecord(url, micros, payload, refTo, refTs)
      } else {
        nResponse += 1
        Warc.responseRecord(url, micros, payload)
      }
    if (out == null || fileBytes >= f.maxFileBytes) rotate(micros)
    writeMember(rec)
    fileBytes += rec.length // pre-compression size: rotation bound, not accounting
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) { out.close(); out = null }
    // publish: atomically move each attempt-unique tmp onto its final
    // deterministic name (REPLACE so a re-committed streaming epoch
    // converges on the latest bytes, as before)
    files.foreach { n =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.dir, tmpOf(n)), java.nio.file.Paths.get(f.dir, n),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    deflater.end()
    bytesWritten = files.map(n =>
      java.nio.file.Paths.get(f.dir, n).toFile.length()).sum
    WarcCommit(files.toSeq, nResponse, nRevisit, bytesWritten, dedupedBytes)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    deflater.end()
    // only this attempt's tmp files — never a committed attempt's output
    files.foreach(n =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f.dir, tmpOf(n))))
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
