package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI surface for the S10 WARC sink: runs the payload-digest dedupe
  * election over the oracle `pages` fixture (or any parquet of
  * input-hint shape), streams it through the `format("warc")` DataSource
  * V2 sink, and prints the commit-manifest counters plus the file list —
  * what an archiving run's output directory looks like.
  *
  * Usage: runMain graft.tools.WarcDemo <outDir> [pagesParquet] [sizeThreshold] [maxFileBytes]
  */
object WarcDemo {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println(
        "usage: WarcDemo <outDir> [pagesParquet] [sizeThreshold] [maxFileBytes]")
      sys.exit(2)
    }
    val outDir = args(0)
    val threshold = if (args.length > 2) args(2).toInt else 1
    val maxBytes = if (args.length > 3) args(3).toLong else graft.warc.Warc.DefaultMaxFileBytes
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("zenospark-warc-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages =
      if (args.length > 1) spark.read.parquet(args(1))
      else {
        graft.gen.OracleData.ensure(spark)
        spark.read.parquet(s"${graft.gen.OracleData.Dir}/pages")
      }
    val counters = graft.warc.Warc.write(pages, outDir,
      sizeThreshold = threshold,
      options = Map("maxFileBytes" -> maxBytes.toString, "operator" -> "warc-demo"))
    counters.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k=$v") }
    val files = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(outDir))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
        .map(_.getFileName.toString).filter(_.endsWith(".warc.gz")).toSeq.sorted
      finally l.close()
    }
    files.foreach(f => println(s"file=$f"))
    // read the archive back through the source side of the format — the
    // counts must reproduce the sink's commit counters
    val back = spark.read.format("warc").load(outDir)
      .groupBy("record_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"readback_response=${back.getOrElse("response", 0L)}")
    println(s"readback_revisit=${back.getOrElse("revisit", 0L)}")
    // streaming leg: re-archive the first pages as a file-source stream
    // through writeStream.format("warc") — the continuous-archiving shape
    val streamIn = s"$outDir-streamin"
    val streamOut = s"$outDir-stream"
    graft.tools.FsUtil.deleteRecursively(streamIn)
    graft.tools.FsUtil.deleteRecursively(streamOut)
    import org.apache.spark.sql.functions._
    pages.limit(500).coalesce(1).write.mode("overwrite").parquet(streamIn)
    val q = spark.readStream.schema(pages.schema).parquet(streamIn)
      .select(col("url"), col("warc_ts"), col("html").as("payload"),
        lit("response").as("record_type"),
        lit(null).cast("string").as("refers_to"),
        lit(null).cast("timestamp").as("refers_ts"))
      .writeStream.format("warc")
      .option("checkpointLocation", s"$streamOut-ckpt")
      .outputMode("append")
      .start(streamOut)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.format("warc").load(streamOut).count()
    println(s"streamed_records=$streamed")
    spark.stop()
  }
}
