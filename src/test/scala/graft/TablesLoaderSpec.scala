package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}

/** Guards the `Tables.events` loader against parquet-timestamp
  * inference drift across Spark engine versions (SURVEY §2; VERDICT r6
  * item 2). The events table has shipped as parquet TIMESTAMP(NANOS)
  * (Spark ≤4.0 + nanosAsLong → LongType; Spark 4.1+ → TIMESTAMP_NTZ
  * with native ns→µs truncation) and as TIMESTAMP(MICROS, ntz). The
  * loader must land every shape on the same micro-truncated
  * TimestampType column, and must fail LOUDLY — not mis-type — on a
  * shape it has never seen.
  *
  * Ground truth is read with parquet-mr's example reader (raw int64 +
  * the footer's TimeUnit annotation), fully independent of Spark's
  * timestamp inference path.
  */
class TablesLoaderSpec extends SparkSpec {

  /** (event_id, ts) rows; ts deliberately not µs-aligned so ns→µs
    * truncation is actually exercised (…549123 ns → …549 µs), and
    * PRE-EPOCH rows so floor-vs-truncate division divergence is too
    * (-1500 ns must floor to -2 µs, as the native 4.1+ read and
    * DuckDB do — `div` truncation toward zero would give -1). */
  private val nanosRows: Seq[(Long, Long)] = Seq(
    1L -> 1704067798778549123L,
    2L -> 1704067200000000000L,
    3L -> 1704067200000000999L,
    4L -> 1735689599999999501L,
    5L -> -1500L,
    6L -> -1000000001L)

  private def eventsMessageType(unit: TimeUnit): MessageType =
    Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, unit))
      .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

  /** Write an events-shaped parquet with `ts` in the given unit into a
    * fresh dir laid out the way Tables expects (`$dir/events.parquet`);
    * returns the dir. */
  private def writeEventsParquet(unit: TimeUnit, tsValues: Seq[(Long, Long)]): String = {
    val dir = Files.createTempDirectory("graft-loader").toString
    val msg = eventsMessageType(unit)
    val factory = new SimpleGroupFactory(msg)
    val writer = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withType(msg).build()
    try tsValues.foreach { case (id, ts) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", ts)
      g.add("user_id", id % 7)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
    dir
  }

  private def loadedMicros(dir: String): Map[Long, Long] = {
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType,
      "loader must normalize ts to session-TZ TimestampType")
    ev.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("TIMESTAMP(NANOS) parquet loads micro-truncated under whatever the engine infers") {
    val dir = writeEventsParquet(TimeUnit.NANOS, nanosRows)
    val expect = nanosRows.map { case (id, ns) => id -> Math.floorDiv(ns, 1000L) }.toMap
    assert(loadedMicros(dir) === expect)
  }

  test("TIMESTAMP(MICROS) parquet loads value-identical") {
    val micros = nanosRows.map { case (id, ns) => (id, Math.floorDiv(ns, 1000L)) }
    val dir = writeEventsParquet(TimeUnit.MICROS, micros)
    assert(loadedMicros(dir) === micros.toMap)
  }

  test("committed testdata-shaped fixture matches parquet-mr raw ground truth") {
    // Source-tree path first (test working dir is the repo root; the
    // classpath copy may live inside a jar under some sbt run modes,
    // where File(uri) can't reach it).
    val file = new java.io.File("src/test/resources/events_ts_fixture/events.parquet")
    assert(file.isFile, "committed fixture missing from test resources")
    val hPath = new Path(file.getAbsolutePath)

    // Unit from the footer, values from the example reader — no Spark.
    val conf = spark.sparkContext.hadoopConfiguration
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    val tsField =
      try footer.getFooter.getFileMetaData.getSchema.getType(Seq("ts"): _*).asPrimitiveType()
      finally footer.close()
    val unit = tsField.getLogicalTypeAnnotation
      .asInstanceOf[TimestampLogicalTypeAnnotation].getUnit
    val toMicros: Long => Long = unit match {
      case TimeUnit.NANOS  => v => Math.floorDiv(v, 1000L)
      case TimeUnit.MICROS => v => v
      case TimeUnit.MILLIS => v => Math.multiplyExact(v, 1000L)
    }
    val reader = ParquetReader.builder(new GroupReadSupport(), hPath).build()
    val truth = Iterator.continually(reader.read()).takeWhile(_ != null)
      .map(g => g.getLong("event_id", 0) -> toMicros(g.getLong("ts", 0)))
      .toMap
    reader.close()
    assert(truth.nonEmpty)

    assert(loadedMicros(file.getParent) === truth)
  }

  test("eventsNormalizeTs: nanos-Long branch truncates; NTZ branch casts; Timestamp passes through") {
    import spark.implicits._
    val ns = 1704067798778549123L

    val fromLong = Tables.eventsNormalizeTs(Seq((1L, ns)).toDF("event_id", "ts"))
    assert(fromLong.schema("ts").dataType === TimestampType)
    assert(fromLong.select(unix_micros(col("ts"))).head().getLong(0) === ns / 1000L)

    val ntz = Seq((1L, ns / 1000L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    val fromNtz = Tables.eventsNormalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType === TimestampType)
    // Session TZ is pinned UTC, so the NTZ cast is bit-identical to the long path.
    assert(fromNtz.select(unix_micros(col("ts"))).head().getLong(0) === ns / 1000L)

    val ts = Seq((1L, ns / 1000L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    assert(Tables.eventsNormalizeTs(ts).select(unix_micros(col("ts"))).head().getLong(0) === ns / 1000L)
  }

  test("eventsNormalizeTs fails loudly on an unrecognized ts type") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    assert(bad.schema("ts").dataType === StringType)
    val e = intercept[IllegalStateException](Tables.eventsNormalizeTs(bad))
    assert(e.getMessage.contains("unexpected type"))
  }
}
