package graft.warc

import java.io.{BufferedInputStream, EOFException, FileInputStream, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Batch read path for `spark.read.format("warc").load(dir)`: scans the
  * rotated `*.warc.gz` series back into rows — the analytics direction of
  * the S10 sink (what archive tooling does with the reference's output:
  * WARC in, page table out).
  *
  * Scale shape: one input partition per WARC file (a gzip member stream
  * is not block-splittable without an external index, and the sink
  * already rotates at `maxFileBytes`, so file = split is the honest
  * parallelism unit — the same contract Common Crawl segment processing
  * uses). Each reader STREAMS records off the decompressor — one record
  * in memory at a time — and prunes columns at parse time
  * ([[SupportsPushDownRequiredColumns]]): a `select(url)` never
  * materializes payload bytes into rows.
  */
object WarcRead {

  /** warcinfo records are file metadata, not pages — readers surface
    * response + revisit rows.
    */
  val readSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("record_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("payload_digest", StringType, nullable = true),
    StructField("refers_to", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_file", StringType, nullable = false)))

  def listWarcFiles(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) {
      if (dir.endsWith(".warc.gz")) return Seq(dir)
      return Seq.empty
    }
    val l = java.nio.file.Files.list(p)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
      .map(_.toString).filter(_.endsWith(".warc.gz")).toSeq.sorted
    finally l.close()
  }
}

private[warc] class WarcScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcRead.readSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new WarcScan(paths, required)
}

private[warc] class WarcScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"warc files=${paths.length}"
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => WarcInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    WarcReaderFactory(required)
}

private[warc] case class WarcInputPartition(path: String) extends InputPartition

private[warc] case class WarcReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].path, required)
}

/** Streaming record reader over one `*.warc.gz` file: JDK GZIPInputStream
  * concatenates the per-record gzip members, so records are parsed
  * sequentially — header lines to CRLF CRLF, `Content-Length` block, 4
  * boundary bytes — without ever buffering more than one record.
  */
private[warc] class WarcPartitionReader(path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val in: InputStream = new GZIPInputStream(
    new BufferedInputStream(new FileInputStream(path), 1 << 16), 1 << 16)
  private val fileName = java.nio.file.Paths.get(path).getFileName.toString
  private val ords = required.fieldNames
  private var row: InternalRow = null
  private val needPayload = ords.contains("payload")

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    while (c != -1 && c != '\r') { sb.append(c.toChar); c = in.read() }
    if (c == '\r' && in.read() != '\n')
      throw new java.io.IOException(s"bare CR in WARC header ($path)")
    if (c == -1 && sb.length == 0) null else sb.toString
  }

  private def readFully(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException(s"truncated WARC record ($path)")
      off += r
    }
    b
  }

  private def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val r = in.skip(left)
      if (r <= 0) { if (in.read() < 0) throw new EOFException(path); left -= 1 }
      else left -= r
    }
  }

  override def next(): Boolean = {
    while (true) {
      val version = readLine()
      if (version == null) return false
      if (version.nonEmpty) { // tolerate stray blank lines between records
        if (!version.startsWith("WARC/"))
          throw new java.io.IOException(s"bad WARC version line '$version' ($path)")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var line = readLine()
        while (line != null && line.nonEmpty) {
          val k = line.indexOf(": ")
          if (k > 0) headers(line.substring(0, k)) = line.substring(k + 2)
          line = readLine()
        }
        // Long, not Int: external/gowarc archives may carry >= 2 GiB
        // blocks (rotation is checked between records) — a toInt would
        // overflow negative and corrupt the scan
        val len = headers.getOrElse("Content-Length", "0").toLong
        val warcType = headers.getOrElse("WARC-Type", "")
        val isPage = warcType == "response" || warcType == "revisit"
        val block: Array[Byte] =
          if (isPage && needPayload) {
            if (len > Int.MaxValue - 16)
              throw new java.io.IOException(
                s"WARC record too large to materialize ($len bytes, $path)")
            readFully(len.toInt)
          } else { skipFully(len); null }
        skipFully(4L) // record boundary CRLF CRLF
        if (isPage) {
          row = buildRow(headers, warcType, block)
          return true
        } // else: warcinfo/metadata record — keep scanning
      }
    }
    false
  }

  private def buildRow(headers: collection.Map[String, String], warcType: String,
                       block: Array[Byte]): InternalRow = {
    // payload = HTTP body: after the first CRLF CRLF of the block (the
    // sink synthesizes the envelope; any msgtype=response block has one).
    // Revisit blocks are headers-only, so their payload reads as empty.
    def payload: Array[Byte] = {
      if (block == null) return Array.emptyByteArray
      var j = 0
      while (j + 3 < block.length &&
        !(block(j) == '\r' && block(j + 1) == '\n' &&
          block(j + 2) == '\r' && block(j + 3) == '\n')) j += 1
      if (j + 3 < block.length) java.util.Arrays.copyOfRange(block, j + 4, block.length)
      else Array.emptyByteArray
    }
    val out = new GenericInternalRow(ords.length)
    var i = 0
    while (i < ords.length) {
      out(i) = ords(i) match {
        case "url" => headers.get("WARC-Target-URI").map(UTF8String.fromString).orNull
        case "warc_ts" => headers.get("WARC-Date").map { d =>
          val inst = java.time.Instant.parse(d)
          java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
        }.orNull
        case "record_type" => UTF8String.fromString(warcType)
        case "payload" => if (warcType == "response") payload else null
        case "payload_digest" =>
          headers.get("WARC-Payload-Digest").map(UTF8String.fromString).orNull
        case "refers_to" =>
          headers.get("WARC-Refers-To-Target-URI").map(UTF8String.fromString).orNull
        case "record_id" =>
          headers.get("WARC-Record-ID").map(UTF8String.fromString).orNull
        case "warc_file" => UTF8String.fromString(fileName)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      i += 1
    }
    out
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
