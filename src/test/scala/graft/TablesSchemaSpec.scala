package graft

import org.apache.spark.sql.types._

/** Pins the loaded shape of every driver-generated table so testdata
  * regeneration with a different writer fails HERE, loudly and
  * legibly, instead of deep inside a query plan (the round-6 lesson:
  * the events table's parquet timestamp encoding changed under an
  * engine upgrade and took nine gate queries down with analysis
  * errors far from the cause — see TablesLoaderSpec for that family's
  * value-level pin).
  *
  * Columns are pinned by NAME + TYPE CATEGORY, not exact width:
  * int32→int64 or date→timestamp drift is absorbed identically by
  * Spark and the DuckDB oracle (both read the same parquet), so exact
  * pins would false-alarm on benign regeneration. A rename, a dropped
  * column, or a string→binary / float→struct change is destructive
  * and must fail.
  */
class TablesSchemaSpec extends SparkSpec {

  private sealed trait Cat { def ok(dt: DataType): Boolean }
  private case object Integral extends Cat {
    def ok(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Fractional extends Cat {
    def ok(dt: DataType): Boolean = dt match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Str extends Cat {
    def ok(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  }
  private case object Temporal extends Cat {
    def ok(dt: DataType): Boolean = dt match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
  }
  private case object NumVec extends Cat {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(_: FloatType | _: DoubleType, _) => true
      case _ => false
    }
  }

  private val expected: Seq[(String, Seq[(String, Cat)])] = Seq(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Str,
      "n_regionkey" -> Integral),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Str,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Str),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Str,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Str,
      "p_brand" -> Str, "p_type" -> Str, "p_size" -> Integral,
      "p_retailprice" -> Fractional),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> Temporal, "o_orderpriority" -> Str),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str,
      "l_shipdate" -> Temporal),
    "events" -> Seq("event_id" -> Integral, "ts" -> Temporal,
      "user_id" -> Integral, "event_type" -> Str, "value" -> Fractional,
      "props" -> Str),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
      "lang" -> Str, "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> NumVec,
      "label" -> Integral))

  private lazy val tables = Tables(spark, "/root/testdata/sf0.001")
  private def load(name: String) = name match {
    case "region" => tables.region
    case "nation" => tables.nation
    case "customer" => tables.customer
    case "supplier" => tables.supplier
    case "part" => tables.part
    case "orders" => tables.orders
    case "lineitem" => tables.lineitem
    case "events" => tables.events
    case "documents" => tables.documents
    case "embeddings" => tables.embeddings
  }

  expected.foreach { case (table, cols) =>
    test(s"$table: loaded column names and type categories are pinned") {
      val schema = load(table).schema
      assert(schema.fields.map(_.name).toSeq === cols.map(_._1),
        s"\nTESTDATA DRIFT in $table: column set/order changed — update " +
          "TablesSchemaSpec consciously if the regeneration is intended, " +
          "and re-run the full gate")
      cols.foreach { case (name, cat) =>
        val dt = schema(name).dataType
        assert(cat.ok(dt),
          s"\nTESTDATA DRIFT in $table.$name: type $dt no longer fits " +
            s"category $cat — queries and the DuckDB oracle may now " +
            "disagree; fix the loader or update this pin consciously")
      }
    }
  }

  test("events.ts is normalized to exactly TimestampType regardless of encoding") {
    assert(load("events").schema("ts").dataType === TimestampType)
  }
}
