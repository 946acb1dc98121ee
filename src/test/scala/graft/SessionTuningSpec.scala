package graft

import org.scalatest.funsuite.AnyFunSuite

/** The input-derived shuffle-partition rule (round 15 optimization,
  * round 16 ADVICE fixes): ~2 MB per partition in the overhead-bound
  * small regime, capped by max(cores, bytes * 4 / 256 MB) so
  * cluster-scale inputs land in the guide's 100 MB – 1 GB band of
  * SHUFFLE bytes (the ×4 parquet→row-format expansion factor) —
  * nothing is a local[32] constant. A dir with no readable bytes
  * falls back to the core count, never to 1. */
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
    assert(parts(1L << 20, 32) === 1) // 1 MB -> 1
    assert(parts(15700000L, 32) === 8) // the sf0.1 bench shape -> 8
    assert(parts(63L << 20, 32) === 32) // 63 MB -> capped at cores
  }

  test("zero-byte or missing dirs fall back to the core count, not 1") {
    // ADVICE r15 medium: a runner pointed at a nonexistent path must
    // not degrade to fully serial shuffles
    assert(parts(0L, 32) === 32)
    assert(SessionTuning.shufflePartitions("/no/such/dir/graft", 16) === 16)
  }

  test("large inputs land in the 256 MB shuffle band, above the core count") {
    val gb100 = 100L << 30
    val p = parts(gb100, 32)
    // 100 GB of parquet ≈ 400 GB of shuffle → 1600 partitions of
    // ~64 MB parquet / ~256 MB shuffle each (ADVICE r15 low: the cap
    // sizes shuffle partitions, and parquet compresses ~4x)
    assert(p === 1600)
    assert(p > 32)
  }

  test("the core count only caps the small regime") {
    // 64 MB at 8 cores: 2 MB rule says 32, cap max(8, 1) = 8
    assert(parts(64L << 20, 8) === 8)
  }
}
