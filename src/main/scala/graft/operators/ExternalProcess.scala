package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** External-process operator harness (SURVEY S4/S6/S7, §2.10): the
  * reference shells out to 7z / ffprobe / ffmpeg per item; the Spark
  * shape is `mapPartitions` + ProcessBuilder with per-partition
  * process reuse, task retry supplying the journal semantics
  * (§2.11 E1-E5: plan = DataFrame, execute = this, verify = scan).
  *
  * The runner is injectable so tests (and this container, which has
  * no ffmpeg) use a recorder; production supplies [[CommandRunner]].
  */
object ExternalProcess {

  /** One invocation: argv in, (exitCode, stdout, stderr) out. */
  trait Runner extends Serializable {
    def run(argv: Seq[String], stdin: Option[Array[Byte]] = None): Result
  }

  case class Result(exitCode: Int, stdout: String, stderr: String)

  /** Binary-safe sibling of [[Result]] (round 13 — the transcode
    * decoders read WAV/PCM bytes off stdout; a UTF-8 String round
    * trip mangles them). */
  case class BinaryResult(exitCode: Int, stdout: Array[Byte],
      stderr: String)

  /** One invocation with BINARY stdout — the contract
    * [[graft.domain.Multimodal.SubprocessDecoder]] composes with. */
  trait BinaryRunner extends Serializable {
    def runBinary(argv: Seq[String],
        stdin: Option[Array[Byte]] = None): BinaryResult
  }

  /** Production runner: real subprocess per call. Partition-level
    * callers amortize JVM-side setup; the subprocess itself is the
    * unit of work (ffprobe/ffmpeg are one-shot by design). */
  class CommandRunner(timeoutSec: Long = 600) extends Runner
      with BinaryRunner {
    def run(argv: Seq[String], stdin: Option[Array[Byte]]): Result = {
      val b = runBinary(argv, stdin)
      Result(b.exitCode, new String(b.stdout, "UTF-8"), b.stderr)
    }
    def runBinary(argv: Seq[String],
        stdin: Option[Array[Byte]]): BinaryResult = {
      import scala.jdk.CollectionConverters._
      val p = new ProcessBuilder(argv.asJava).start()
      // All three pipes on their own threads: a sequential
      // readAllBytes-then-waitFor (the round-1 shape) never times out
      // on a hung child, and deadlocks when the child fills the
      // stderr pipe while stdout is being drained (or blocks writing
      // large stdin the child isn't reading yet).
      def daemon(body: => Unit): Thread = {
        val t = new Thread(() => try body catch {
          case _: java.io.IOException => () // pipe closed on kill — expected
        })
        t.setDaemon(true); t.start(); t
      }
      val writer = daemon {
        stdin.foreach(p.getOutputStream.write)
        p.getOutputStream.close()
      }
      val ob = new java.io.ByteArrayOutputStream()
      val eb = new java.io.ByteArrayOutputStream()
      val ot = daemon { p.getInputStream.transferTo(ob) }
      val et = daemon { p.getErrorStream.transferTo(eb) }
      val finished = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        p.destroyForcibly()
        p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      }
      // killing the child closes the pipes, so the drains terminate
      ot.join(10000); et.join(10000); writer.join(10000)
      val out = ob.toByteArray
      val err = new String(eb.toByteArray, "UTF-8")
      if (!finished)
        BinaryResult(-1, out, err + s"\n[timeout after ${timeoutSec}s]")
      else BinaryResult(p.exitValue(), out, err)
    }
  }

  /** Test/dry-run runner: records argv, returns canned output. */
  class RecordingRunner(respond: Seq[String] => Result =
      argv => Result(0, "", "")) extends Runner {
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    def run(argv: Seq[String], stdin: Option[Array[Byte]]): Result = {
      calls.add(argv)
      respond(argv)
    }
  }

  case class ProcessOutput(key: String, exitCode: Int, stdout: String,
      stderr: String)

  /** Execute one command per row: rows are (key, argv). Distributed
    * via mapPartitions; per-task failures retry under Spark's task
    * protocol, and idempotent downstream writes give the reference's
    * journal-resume semantics (§2.3). `maxConcurrentPartitions` is
    * governed by the caller via repartition(n) — the reference's
    * worker-count tuning (cores−2, seek-bound caps) maps to the
    * partition count. */
  def runPerRow(commands: Dataset[(String, Seq[String])],
      runner: Runner): Dataset[ProcessOutput] = {
    val spark = commands.sparkSession
    import spark.implicits._
    commands.mapPartitions { it =>
      it.map { case (key, argv) =>
        val r = runner.run(argv)
        ProcessOutput(key, r.exitCode, r.stdout, r.stderr)
      }
    }
  }

  /** The reference's fused-ladder lesson (hls_assignment.py:109-128):
    * one subprocess emitting N outputs beats N subprocesses decoding
    * the same input N times. Groups the per-rung commands by key (one
    * shuffle on the key — rungs of one media co-locate), fuses each
    * key's argvs (sorted, so fusion is deterministic regardless of
    * partitioning) into ONE argv via `fuse` — e.g. ffmpeg's
    * single-input/multi-output form: shared input flags once, every
    * rung's output clause appended — and executes once per key. */
  def runFusedPerKey(commands: Dataset[(String, Seq[String])],
      runner: Runner)(fuse: Seq[Seq[String]] => Seq[String]): Dataset[ProcessOutput] = {
    val spark = commands.sparkSession
    import spark.implicits._
    commands.groupByKey(_._1).mapGroups { (key, it) =>
      val argvs = it.map(_._2).toSeq.sortBy(_.mkString("\u0000"))
      val r = runner.run(fuse(argvs))
      ProcessOutput(key, r.exitCode, r.stdout, r.stderr)
    }
  }
}
