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

  /** Typed metadata sniffed from magic bytes — the real part. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("magic_hex", StringType)))

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

  /** Attach typed metadata to a binary column — built-in exprs where
    * possible (length, hex prefix), format sniff via a tiny scalar UDF.
    */
  def withMeta(df: DataFrame, binCol: String = "content"): DataFrame = {
    val sniff = udf((b: Array[Byte]) => sniffFormat(b))
    df.withColumn("format", sniff(col(binCol)))
      .withColumn("n_bytes", length(col(binCol)))
      .withColumn("magic_hex", hex(substring(col(binCol), 1, 4)))
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
