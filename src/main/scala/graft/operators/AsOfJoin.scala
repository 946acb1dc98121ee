package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each probe row, the latest build row at or
  * before its timestamp, per key" (backward; forward = earliest at or
  * after). The temporal-join staple Spark lacks natively.
  *
  * Spark-first formulation: NOT a join at all. Both sides are tagged
  * and unioned, hash-partitioned by key, sorted once by (ts, side),
  * and the build payload is carried forward with
  * `last(struct, ignoreNulls)` over an unbounded-preceding row frame —
  * the match struct travels atomically, so a null field inside a
  * build row is never back-filled from an older row. ONE shuffle, ONE
  * sort, zero join operators; the naive alternative
  * (probe ⋈ build on key + ts inequality, then rank) shuffles the
  * |probe|×|build-per-key| expansion. This is the same
  * merge-on-sorted-runs shape DuckDB's native ASOF JOIN executes,
  * expressed in Spark's window algebra — it scales exactly like any
  * keyed window (AQE skew splitting applies; a hot key means a hot
  * entity's full history on one task, same as sessionization).
  *
  * Ties: a build row AT the probe timestamp matches (`>=` semantics,
  * DuckDB-compatible); among equal (key, ts) build rows the survivor
  * is the LAST row in the traversal order — the MAX payload struct in
  * backward mode and the MIN in forward mode (the traversal flips
  * with the direction). Callers wanting a direction-independent
  * survivor dedupe the build side first (q38 does, by max event id).
  *
  * Nulls: build rows with a null timestamp never match, and probe
  * rows with a null timestamp get a null match — DuckDB ASOF
  * semantics (without the explicit guards, Spark's NULLS FIRST/LAST
  * ordering would carry a null-ts build row into every early probe
  * backward, and hand a null-ts probe the whole build history
  * forward). Null EQUI-KEYS never match either: an ASOF join's `ON
  * p.k = b.k` is NULL for NULL = NULL, so a null-key probe gets a
  * null match — but `Window.partitionBy` groups null keys into one
  * partition and would happily enrich them from null-key builds;
  * null-key build rows are filtered out so the window formulation
  * keeps join semantics (null-key probes still survive, unmatched).
  */
object AsOfJoin {

  /** Backward (default) or forward as-of join.
    *
    * @param probe      left side; every row survives (left-outer)
    * @param build      right side supplying the matched payload
    * @param keys       equi-join key columns (same names both sides)
    * @param probeTs    probe timestamp column
    * @param buildTs    build timestamp column
    * @param buildCols  build payload columns to attach (must not
    *                   collide with probe column names)
    * @param tolerance  optional max |probe ts − build ts| as a Column
    *                   interval (e.g. `expr("INTERVAL 1 HOUR")`);
    *                   stale matches null out
    * @param forward    false = latest build ≤ probe ts;
    *                   true = earliest build ≥ probe ts
    */
  def asOf(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String, buildCols: Seq[String],
      tolerance: Option[Column] = None, forward: Boolean = false): DataFrame = {
    require(buildCols.nonEmpty, "buildCols must name at least one payload column")
    val probeOut = probe.columns.toSeq
    val k = keys.map(col)
    val bStruct = struct((col(buildTs).as("__bts") +:
      buildCols.map(c => col(c).as(c))): _*)
    val buildTagged = build
      .filter((col(buildTs).isNotNull +: keys.map(col(_).isNotNull))
        .reduce(_ && _))
      .select((k :+ col(buildTs).as("__ts") :+
      lit(0).as("__side") :+ bStruct.as("__b")) ++
      probeOut.filterNot(keys.contains).map(c =>
        lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeTagged = probe.select((k :+ col(probeTs).as("__ts") :+
      lit(1).as("__side") :+
      lit(null).cast(buildTagged.schema("__b").dataType).as("__b")) ++
      probeOut.filterNot(keys.contains).map(col): _*)
    val ord =
      if (forward) Seq(col("__ts").desc, col("__side").asc, col("__b").desc)
      else Seq(col("__ts").asc, col("__side").asc, col("__b").asc)
    val w = Window.partitionBy(k: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = probeTagged.unionByName(buildTagged)
      .withColumn("__match", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // __ts.isNotNull: a null-ts probe must not inherit a match from
    // wherever NULLS FIRST/LAST happened to park it in the traversal
    val inTol = tolerance match {
      case Some(tol) if forward =>
        col("__ts").isNotNull && col("__match").isNotNull &&
          col("__match.__bts") <= col("__ts") + tol
      case Some(tol) =>
        col("__ts").isNotNull && col("__match").isNotNull &&
          col("__match.__bts") >= col("__ts") - tol
      case None => col("__ts").isNotNull && col("__match").isNotNull
    }
    val matched = when(inTol, col("__match"))
    carried.select(probeOut.map(col) ++
      (matched.getField("__bts").as(s"${buildTs}_matched") +:
        buildCols.map(c => matched.getField(c).as(c))): _*)
  }
}
