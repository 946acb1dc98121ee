package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary-format metadata extraction + identity (SURVEY S5, S18,
  * X25): content hashing for snapshot deltas, FLAC STREAMINFO header
  * decode, and deterministic id minting.
  */
object BinaryMeta {

  /** S5: content-hash snapshot over a binaryFile listing — the
    * cross-release delta identity (unextracted_snapshot.py:47-70).
    * xxhash64 replaces xxh128 (same role: content equality key; the
    * reference itself treats the hash as opaque). At 100 TB this
    * streams: binaryFile rows are read per-partition and the hash is
    * computed in one pass without retaining content.
    */
  def contentSnapshot(binaryFiles: DataFrame): DataFrame =
    binaryFiles.select(col("path"), col("length").as("sizeBytes"),
      xxhash64(col("content")).as("contentHash"))

  /** Delta between two snapshots keyed by hash: added/removed/moved
    * (Docs/STEPS.md:146 cross-release identity). */
  def snapshotDelta(old: DataFrame, nu: DataFrame): DataFrame = {
    val o = old.select(col("contentHash"), col("path").as("old_path"))
    val n = nu.select(col("contentHash"), col("path").as("new_path"))
    o.join(n, Seq("contentHash"), "full_outer")
      .withColumn("change",
        when(col("old_path").isNull, "added")
          .when(col("new_path").isNull, "removed")
          .when(col("old_path") =!= col("new_path"), "moved")
          .otherwise("unchanged"))
  }

  /** S18: FLAC STREAMINFO decode from the first 42 bytes — duration
    * without a full parse (backfill_file_metadata.py:40-72; the
    * 42-byte read replaced a ~250 ms/file mutagen parse).
    * Layout: "fLaC" magic, 4-byte block header, then STREAMINFO whose
    * bytes 10..17 pack 20-bit sample rate, 3-bit channels, 5-bit
    * bits-per-sample, 36-bit total samples.
    */
  val flacStreamInfo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (prefix: Array[Byte]) =>
      if (prefix == null || prefix.length < 42 ||
          !(prefix(0) == 'f' && prefix(1) == 'L' && prefix(2) == 'a' &&
            prefix(3) == 'C') || (prefix(4) & 0x7F) != 0) {
        None
      } else {
        def u(i: Int): Long = prefix(i) & 0xFFL
        val si = 8 // STREAMINFO payload offset (4 magic + 4 block header)
        val sampleRate = (u(si + 10) << 12) | (u(si + 11) << 4) | (u(si + 12) >> 4)
        val channels = ((u(si + 12) >> 1) & 0x7) + 1
        val bps = (((u(si + 12) & 0x1) << 4) | (u(si + 13) >> 4)) + 1
        val totalSamples = ((u(si + 13) & 0xF) << 32) | (u(si + 14) << 24) |
          (u(si + 15) << 16) | (u(si + 16) << 8) | u(si + 17)
        if (sampleRate == 0) None
        else Some((sampleRate, channels.toInt, bps.toInt, totalSamples,
          totalSamples.toDouble / sampleRate))
      }
    }

  /** Decode STREAMINFO over a binary prefix column → struct
    * (sampleRate, channels, bitsPerSample, totalSamples, durationSec). */
  def withFlacInfo(df: DataFrame, prefixCol: String): DataFrame =
    df.withColumn("flac", flacStreamInfo(col(prefixCol)))
      .selectExpr("*", "flac._1 as sampleRate", "flac._2 as channels",
        "flac._3 as bitsPerSample", "flac._4 as totalSamples",
        "flac._5 as durationSec")
      .drop("flac")

  /** X25: deterministic UUIDv5-style id from a business key — the
    * test-mode identity discipline (SURVEY §7: reference output is
    * uuid7/non-reproducible; tests demand keyed ids). Production
    * callers can substitute uuid7. */
  def mintId(businessKey: Column): Column = {
    val h1 = lpad(hex(abs(xxhash64(concat(lit("graft:1:"), businessKey)))), 16, "0")
    val h2 = lpad(hex(abs(xxhash64(concat(lit("graft:2:"), businessKey)))), 16, "0")
    lower(concat_ws("-",
      substring(h1, 1, 8), substring(h1, 9, 4), concat(lit("5"), substring(h1, 14, 3)),
      substring(h2, 1, 4), substring(h2, 5, 12)))
  }
}
