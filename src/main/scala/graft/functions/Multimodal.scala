package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The actual codec work (decode, resize,
  * frame-sample) is STUBBED behind `decodeStub` — the image/audio
  * libraries are not in this container — but the Spark-side contract is
  * real and tested: schema, per-partition batching (the shape a Pandas-UDF
  * / `mapInPandas` equivalent needs), deterministic outputs, and
  * partition-count preservation.
  */
object Multimodal {

  /** Typed metadata sniffed from magic bytes — the real part. Width and
    * height are header-only image dimensions ([[imageDims]]); null for
    * non-images and corrupt/truncated headers.
    */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("magic_hex", StringType),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) "unknown"
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') "mp3"
    else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') "mp4"
    else "unknown"
  }

  final case class ImageDims(width: Int, height: Int)

  /** Pure-JVM image dimensions — no codec jars needed, header-only reads:
    * PNG IHDR (big-endian u32 pair after the 8-byte signature + chunk
    * header), GIF logical screen descriptor (little-endian u16 pair at
    * offset 6), JPEG SOF0/1/2 frame header found by walking the marker
    * segments (APPn/COM/DQT/... skipped via their big-endian length
    * fields, so dimensions are recovered regardless of metadata segment
    * layout). Returns None for non-images, truncated headers, or corrupt
    * segment chains — never throws.
    */
  def imageDims(b: Array[Byte]): Option[ImageDims] = {
    if (b == null) return None
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    sniffFormat(b) match {
      case "png" =>
        // 8-byte signature, 4-byte chunk length, "IHDR", width, height
        if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
          Some(ImageDims(be32(16).toInt, be32(20).toInt))
        else None
      case "gif" =>
        if (b.length >= 10) Some(ImageDims(le16(6), le16(8))) else None
      case "jpeg" =>
        // walk marker segments from offset 2 until a start-of-frame.
        // Consecutive 0xFF bytes before a marker are legal fill/padding
        // (ITU T.81 §B.1.1.2); EOI and SOS terminate the walk — a frame
        // header never follows entropy-coded data or end-of-image.
        var i = 2
        while (i + 1 < b.length && u8(i) == 0xff) {
          var mi = i + 1
          while (mi < b.length && u8(mi) == 0xff) mi += 1 // skip fill bytes
          if (mi >= b.length) return None
          val marker = u8(mi)
          if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS
          if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
            i = mi + 1 // TEM / RSTn / SOI: standalone, no length field
          } else {
            if (mi + 2 >= b.length) return None
            val len = be16(mi + 1)
            if (len < 2) return None // corrupt length
            // SOFn (0xC0-0xCF except DHT 0xC4 / JPG 0xC8 / DAC 0xCC):
            // FF Cn LL LL P HH HH WW WW — covers baseline, progressive,
            // lossless, differential, and arithmetic-coded variants
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof)
              return if (mi + 7 < b.length)
                Some(ImageDims(be16(mi + 6), be16(mi + 4))) else None
            i = mi + 1 + len
          }
        }
        None
      case _ => None
    }
  }

  /** Attach typed metadata to a binary column — built-in exprs where
    * possible (length, hex prefix), format sniff + header-only image
    * dimensions via tiny scalar UDFs.
    */
  def withMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val sniff = udf((b: Array[Byte]) => sniffFormat(b))
    val dims = udf((b: Array[Byte]) => imageDims(b))
    df.withColumn("format", sniff(col(binCol)))
      .withColumn("n_bytes", length(col(binCol)))
      .withColumn("magic_hex", hex(substring(col(binCol), 1, 4)))
      .withColumn("__dims", dims(col(binCol)))
      .withColumn("width", col("__dims.width"))
      .withColumn("height", col("__dims.height"))
      .drop("__dims")
  }

  /** STUB decode: a deterministic fake "feature vector" per blob (first 8
    * bytes hashed into 4 floats). Replace with a real codec in production;
    * the batch shape (mapPartitions over Iterator[Row], schema-stable
    * output) is exactly what a Pandas-UDF port needs.
    */
  def decodeStub(spark: SparkSession, df: DataFrame, binCol: String = "content",
                 idCol: String = "id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("format", StringType),
      StructField("features", ArrayType(FloatType))))
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // batch shape: accumulate a bounded batch, "decode" it, emit — the
      // same contract as mapInPandas(batch_iter)
      rows.grouped(64).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val id = r.getLong(idIdx)
          val fmt = sniffFormat(bytes)
          val h = graft.canon.Canon.fnv64a(
            if (bytes == null) "" else bytes.take(8).map("%02x".format(_)).mkString)
          val feats = Array.tabulate(4)(i =>
            (((h >>> (i * 16)) & 0xffffL).toFloat) / 65535.0f)
          Row(id, fmt, feats.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
