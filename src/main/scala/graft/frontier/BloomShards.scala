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

  /** Closure-friendly lookup over all shards: ships the compact bytes,
    * deserializes once per task via the transient lazy (and once per
    * executor via the keyed cache).
    */
  final case class Lookup(key: String, shards: Map[Int, Array[Byte]]) extends Serializable {
    @transient private lazy val filters: Map[Int, BloomFilter] =
      Lookup.cache.getOrElseUpdate(key,
        shards.map { case (k, v) => k -> deserialize(v) })
    def maybeSeen(bucket: Int, hash: Long): Boolean =
      filters.get(bucket).exists(_.mightContainLong(hash))
  }
  object Lookup {
    private val cache =
      scala.collection.concurrent.TrieMap.empty[String, Map[Int, BloomFilter]]
  }

  /** Collect a shard table into a Lookup (shards are ≤ buckets × ~100 KB at
    * the configured sizing — broadcast-safe; at 10^10 scale shrink fpp
    * budget or co-partition-join the shard table instead of collecting).
    */
  def collectLookup(shards: DataFrame, key: String): Lookup = {
    val m = shards.collect().map { r =>
      r.getAs[Int]("host_bucket") -> r.getAs[Array[Byte]]("bloom")
    }.toMap
    Lookup(key, m)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
