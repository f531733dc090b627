package graft.frontier

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench: cost of flagMaybeSeen per candidate row. The join-UDF path
  * extracts the shard's filter bytes from the joined row on EVERY probe
  * (UnsafeRow.getBinary copies ~120 KB per call at the default shard
  * sizing) — this measures whether that copy is material and compares the
  * candidate fix (per-partition amortized probe).
  *
  * Lives in `graft.frontier` (not tools) because flagMaybeSeen is
  * private[frontier]: it assumes a single shard per bucket and must not be
  * reachable from engine code.
  *
  * Usage: runMain graft.frontier.BloomProbeBench [nRows] [buckets] [expected]
  */
object BloomProbeBench {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 2500000L
    val buckets = if (args.length > 1) args(1).toInt else 64
    val expected = if (args.length > 2) args(2).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // seed hashes: half will be inserted into the shards ("seen")
    val rows = spark.range(nRows)
      .select(pmod(col("id"), lit(buckets)).cast("int").as("host_bucket"),
        xxhash64(col("id")).as("url_hash"))
      .persist()
    val seenRows = rows.filter(col("url_hash") % 2 === 0)
    val shards = BloomShards.build(spark, seenRows, expected, 0.01).persist()
    println(s"shard bytes each: " +
      shards.select(length(col("bloom"))).head().getInt(0))
    rows.count(); shards.count() // materialize

    val ref = Some(BloomShards.Ref("bench", shards))
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n flagged)")
      }
    }
    time("join-udf") {
      BloomShards.flagMaybeSeen(rows, ref)
        .filter(col("maybe_seen")).count()
    }
    time("cogroup") {
      BloomShards.maybeSeenKeys(rows, ref).count()
    }
    spark.stop()
  }
}
