package graft

import org.scalatest.funsuite.AnyFunSuite

/** The input-derived shuffle-partition rule (round 15 optimization):
  * ~2 MB per partition in the overhead-bound small regime, capped by
  * max(cores, bytes / 256 MB) so cluster-scale inputs land in the
  * guide's 100 MB – 1 GB partition band — nothing is a local[32]
  * constant. */
class SessionTuningSpec extends AnyFunSuite {
  private def parts(bytes: Long, cpus: Int): Int = {
    // mirror of the rule, driven through the public entry by a temp dir
    val dir = java.nio.file.Files.createTempDirectory("st").toFile
    val f = new java.io.File(dir, "x.parquet")
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.setLength(bytes); raf.close()
    try SessionTuning.shufflePartitions(dir.getPath, cpus)
    finally { f.delete(); dir.delete() }
  }

  test("small inputs get ~2 MB partitions, never 0") {
    assert(parts(0L, 32) === 1)
    assert(parts(1L << 20, 32) === 1) // 1 MB -> 1
    assert(parts(15700000L, 32) === 8) // the sf0.1 bench shape -> 8
    assert(parts(63L << 20, 32) === 32) // 63 MB -> capped at cores
  }

  test("large inputs land in the 256 MB band, above the core count") {
    val gb100 = 100L << 30
    val p = parts(gb100, 32)
    assert(p === 400) // 100 GB / 256 MB
    assert(p > 32)
  }

  test("the core count only caps the small regime") {
    // 64 MB at 8 cores: 2 MB rule says 32, cap max(8, 1) = 8
    assert(parts(64L << 20, 8) === 8)
  }
}
