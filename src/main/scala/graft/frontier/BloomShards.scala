package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Partitioned Bloom-filter seen-set: ONE filter shard per hash-partitioned
  * host bucket (the north-star shape). The shard table is
  * (host_bucket, bloom: binary) — at 10^10 URLs across B buckets each shard
  * holds |seen|/B keys, so shards stay broadcastable and are rebuilt/merged
  * incrementally per wave, never globally.
  *
  * The Bloom is a PRE-filter: a negative proves "never seen" and skips the
  * exact seen-set join entirely; positives (including false positives at
  * ~fpp) fall through to the exact hash anti-join — required anyway because
  * the asset→seed promotion rule (seencheck.go:110-115) needs the stored
  * kind, which a Bloom cannot carry.
  */
object BloomShards {

  val ShardDdl = "host_bucket int, bloom binary"

  /** Build shards from (host_bucket, url_hash) rows via mapGroups — each
    * group builds one sketch executor-side; only the ~1 MB filter bytes
    * move to the shard table.
    */
  def build(spark: SparkSession, hashes: DataFrame,
            expectedPerShard: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import spark.implicits._
    hashes.select(col("host_bucket").cast("int"), col("url_hash").cast("long"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (bucket, rows) =>
        val bf = BloomFilter.create(expectedPerShard, fpp)
        rows.foreach { case (_, h) => bf.putLong(h) }
        (bucket, serialize(bf))
      }
      .toDF("host_bucket", "bloom")
  }

  /** Merge existing shards with a wave's new hashes (incremental update —
    * the old filter bytes are OR-compatible via mergeInPlace).
    */
  def merge(spark: SparkSession, shards: DataFrame, newHashes: DataFrame,
            expectedPerShard: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import spark.implicits._
    val old = shards.select(col("host_bucket").cast("int"), col("bloom"))
      .as[(Int, Array[Byte])].map { case (b, bytes) => (b, bytes, 0L) }
    val fresh = newHashes.select(col("host_bucket").cast("int"), col("url_hash").cast("long"))
      .as[(Int, Long)].map { case (b, h) => (b, null.asInstanceOf[Array[Byte]], h) }
    old.union(fresh)
      .groupByKey(_._1)
      .mapGroups { (bucket, rows) =>
        var bf: BloomFilter = null
        val pending = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.foreach {
          case (_, bytes, _) if bytes != null =>
            val f = deserialize(bytes)
            if (bf == null) bf = f else bf.mergeInPlace(f)
          case (_, _, h) => if (bf == null) pending += h else bf.putLong(h)
        }
        if (bf == null) bf = BloomFilter.create(expectedPerShard, fpp)
        pending.foreach(bf.putLong)
        (bucket, serialize(bf))
      }
      .toDF("host_bucket", "bloom")
  }

  /** Handle to a committed shard table: the cache key (snapshot paths) +
    * the shard DataFrame. Nothing collects to the driver — the filter
    * bytes move executor-to-executor through the co-partitioned join in
    * [[flagMaybeSeen]].
    */
  final case class Ref(key: String, shards: DataFrame)

  /** Pre-filter candidate rows against the shards WITHOUT a driver collect
    * or closure shipping: a plain equi-join on host_bucket (shards and
    * candidates share the key — broadcast at sandbox sizing, a
    * co-partitioned shuffle of the *candidates only* at 10^10 sizing; the
    * ~1 MB filter bytes travel the data plane, not the task binary), then
    * a per-row membership probe that deserializes each shard once per
    * executor via the keyed cache.
    *
    * Adds column `maybe_seen`: false PROVES never-seen (the caller skips
    * the exact seen lookup for those rows); true falls through to the
    * exact join — required anyway because the asset→seed promotion rule
    * (seencheck.go:110-115) needs the stored kind.
    *
    * NOTE: prefer [[maybeSeenKeys]] in the wave hot path — the per-row UDF
    * here extracts the joined shard's filter bytes on EVERY probe
    * (UnsafeRow.getBinary copies ~120 KB/row at default shard sizing;
    * measured 14 s per 2.5M probes at 8 cores, graft.tools.BloomProbeBench).
    */
  def flagMaybeSeen(rows: DataFrame, bloom: Option[Ref]): DataFrame = bloom match {
    case None => rows.withColumn("maybe_seen", lit(true))
    case Some(Ref(key, shards)) =>
      val probe = udf((bucket: Int, hash: Long, bytes: Array[Byte]) =>
        bytes != null && cachedFilter(key, bucket, bytes).mightContainLong(hash))
      rows
        .join(shards.select(col("host_bucket").cast("int").as("host_bucket"),
          col("bloom").as("__bloom_bytes")), Seq("host_bucket"), "left")
        .withColumn("maybe_seen",
          coalesce(probe(col("host_bucket"), col("url_hash"), col("__bloom_bytes")),
            lit(false)))
        .drop("__bloom_bytes")
  }

  /** The maybe-seen subset of `keys` (columns url_hash, host_bucket) as a
    * one-column url_hash DataFrame — the exact-lookup key set.
    *
    * Co-partitioned cogroup on host_bucket: the narrow 12-byte keys
    * shuffle (parallel, wave-sized at any scale) and each bucket's filter
    * bytes are deserialized ONCE per group, not copied per row — the probe
    * itself is a pure in-memory bloom test. A bucket with no shard has
    * never seen anything → contributes no keys; with no shards at all
    * every key falls through to the exact lookup.
    */
  def maybeSeenKeys(keys: DataFrame, bloom: Option[Ref]): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    bloom match {
      case None => keys.select(col("url_hash"))
      case Some(Ref(key, shards)) =>
        val ks = keys.select(col("host_bucket").cast("int"), col("url_hash").cast("long"))
          .as[(Int, Long)].groupByKey(_._1)
        val ss = shards.select(col("host_bucket").cast("int"), col("bloom"))
          .as[(Int, Array[Byte])].groupByKey(_._1)
        ks.cogroup(ss) { (bucket, kIt, sIt) =>
          val bf = if (sIt.hasNext) Some(cachedFilter(key, bucket, sIt.next()._2)) else None
          bf match {
            case None => Iterator.empty // no shard ⇒ bucket has never seen anything
            case Some(f) => kIt.collect { case (_, h) if f.mightContainLong(h) => h }
          }
        }.toDF("url_hash")
    }
  }

  private val filterCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), BloomFilter]
  private def cachedFilter(key: String, bucket: Int, bytes: Array[Byte]): BloomFilter = {
    if (filterCache.size > 4096) filterCache.clear() // old snapshots' entries
    filterCache.getOrElseUpdate((key, bucket), deserialize(bytes))
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
