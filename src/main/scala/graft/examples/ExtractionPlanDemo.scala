package graft.examples

import graft.domain.{ArchivePlan, BinaryMeta}
import graft.operators.Resume
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Library usage sample for the extraction-planning surface:
  * archive layout classification → collision detection/resolution →
  * refuse-to-build audit → content-snapshot delta → id minting.
  * Run: sbt "runMain graft.examples.ExtractionPlanDemo"
  */
object ExtractionPlanDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val archives = Seq(
      ("r1/[IOSYS] best.7z", Seq("01 track.flac", "02 track.flac"), Seq[String]()),
      ("r1/[Alice] discog.7z", Seq("2011 [C80] A/01.flac", "[AB-01] B/01.flac"), Seq[String]()),
      ("r2/[Alice] junk.7z", Seq("Stuff/a.flac", "More/b.flac"), Seq[String]()))
      .toDF("archivePath", "files", "dirs")
    println("== layouts")
    ArchivePlan.classifyLayout(archives)
      .select("archivePath", "layout", "needs_manual_review").show(truncate = false)

    val claims = Seq(
      ("alice", "albumA", "r1/a.7z", 0), ("alice", "albumA", "r2/a.7z", 1))
      .toDF("circle", "album", "archivePath", "rootPriority")
    println("== collisions + suggestion")
    ArchivePlan.collisions(claims.drop("rootPriority")).show(truncate = false)
    ArchivePlan.suggestResolutions(claims).show(truncate = false)

    val res = Seq(("alice", "albumA", "r1/a.7z")).toDF("circle", "album", "keepArchive")
    val (planned, orphans) = ArchivePlan.applyResolutions(claims.drop("rootPriority"), res)
    Resume.assertEmpty(orphans, "orphaned keeps")  // refuse-to-build audit
    println(s"== planned after resolution: ${planned.count()} claims")

    val old = Seq((11L, "x.flac"), (22L, "y.flac")).toDF("contentHash", "path")
    val nu = Seq((11L, "x.flac"), (22L, "moved/y.flac"), (33L, "z.flac"))
      .toDF("contentHash", "path")
    println("== snapshot delta")
    BinaryMeta.snapshotDelta(old, nu).show(truncate = false)

    println("== minted ids")
    planned.withColumn("albumId",
      BinaryMeta.mintId(concat_ws("/", col("circle"), col("album"))))
      .show(truncate = false)
    spark.stop()
  }
}
