package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-node throughput anchors against the two BASELINE.md rows
  * that are engine-comparable (the rest measure ffmpeg/GPU/disk, not
  * the data engine):
  *
  *   - content-hash snapshot: the reference hashed 5.92 TB at
  *     ~175 MB/s single-threaded, DISK-bound (BASELINE "xxh128
  *     content snapshot"). This bench measures the ENGINE side of
  *     that pipeline — xxhash64 over in-memory binary content at
  *     local[N] — to show the hash stage is never the bottleneck at
  *     any disk/network speed.
  *   - STREAMINFO decode: the reference's duration backfill replaced
  *     a ~250 ms/file mutagen parse with a 42-byte header read
  *     (BASELINE "Duration backfill"). This bench measures
  *     files/second through the repo's native STREAMINFO bit-slicer
  *     (BinaryMeta.flacStreamInfo).
  *
  * Method: generate deterministic per-row-distinct payloads, persist
  * and materialize OUTSIDE the timed region, then time one action
  * over the hash/parse projection, repeated `reps` times; report the
  * max throughput (min time) like Bench's min-of-N.
  *
  * Run: sbt "runMain graft.ThroughputBench [rows] [reps]"
  * Emits one JSON line.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2048)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- content hashing: `rows` × 1 MiB distinct binary payloads ---
    val mib = 1 << 20
    val payload = spark.range(rows).repartition(cpus.toInt)
      .select(col("id"),
        // 32 hex chars repeated 32768x = 1 MiB, distinct per row so
        // nothing constant-folds
        repeat(md5(col("id").cast("string")), mib / 32).cast("binary")
          .as("content"))
      // MEMORY_AND_DISK, not MEMORY_ONLY: when `rows` MiB exceeds the
      // storage pool, MEMORY_ONLY silently RECOMPUTES evicted
      // partitions inside the timed loop — the measured rate becomes
      // md5+repeat payload synthesis, not the hash under test
      .persist(StorageLevel.MEMORY_AND_DISK)
    payload.count() // materialize outside the timed region
    val hashSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      payload.agg(sum(xxhash64(col("content")).cast("decimal(38,0)"))).head()
      (System.nanoTime() - t0) / 1e9
    }.min
    val hashMBps = rows.toDouble * mib / mib / hashSecs // payload is rows MiB
    payload.unpersist(blocking = true)

    // --- STREAMINFO decode: `rows*1000` synthetic 42-byte prefixes ---
    val n = rows * 1000L
    // a valid fLaC + STREAMINFO header with per-row-varying sample
    // counts (so the parse never short-circuits on a constant)
    val prefix = spark.range(n).repartition(cpus.toInt)
      .select(col("id"), concat(lit("fLaC".getBytes),
        lit(Array[Byte](0, 0, 0, 34)),
        lit(Array.fill[Byte](10)(0)),
        // 8 bytes: sample rate 44100 (20 bits), ch/bps, 36-bit count
        lit(Array[Byte](0x0A, 0xC4.toByte, 0x42)),
        unhex(lpad(hex(col("id")), 10, "0")),
        lit(Array.fill[Byte](16)(0))).as("prefix"))
      .persist(StorageLevel.MEMORY_ONLY)
    prefix.count()
    val parseSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.domain.BinaryMeta.withFlacInfo(prefix, "prefix")
        .agg(sum(col("totalSamples").cast("decimal(38,0)"))).head()
      (System.nanoTime() - t0) / 1e9
    }.min
    val parsePerSec = n / parseSecs

    println(s"""{"metric":"throughput","hash_MBps":${hashMBps.round},""" +
      s""""hash_payload_MiB":$rows,"streaminfo_per_sec":${parsePerSec.round},""" +
      s""""streaminfo_files":$n,"cpus":$cpus,"reps":$reps,""" +
      s""""baseline_hash_MBps":175,"baseline_parse":"250 ms/file mutagen"}""")
    spark.stop()
  }
}
