package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

/** STANDING banded interval index — the stored-layout form of
  * [[RangeJoin.pointInInterval]], the same day-2 pattern as the dedup
  * ingestion index (DedupOps.writeIngestIndex) and the lexical postings
  * (TextOps.writePostingsIndex): when the interval set is the big, slowly
  * changing side (validity windows, embargo calendars, session history) and
  * probes arrive in small batches, re-banding and re-shuffling the interval
  * corpus per probe batch is the dominant waste. The index persists the
  * band EXPLOSION once — one row per (interval × covered band), bucketed on
  * the band id — so every later probe joins against it bucket-aligned:
  * only the probe side shuffles, the index side enters its join straight
  * off the bucketed scan (plan-asserted in OperatorsSpec).
  *
  * Band width and key family are recorded as table properties at write
  * time; probes read them back, so a probe can never band on a different
  * scale than the index was built with (the conf-drift class of bug the
  * r13 width pin hit). Day-2 appends ride Sinks.appendBucketed — cost ∝
  * the appended intervals, the standing-index economics that make this
  * maintainable at 100 TB.
  *
  * Semantics are exactly [[RangeJoin.pointInInterval]] (closed bounds,
  * empty intervals dropped at write, a point visits its single band so no
  * pair duplicates) — spec-proven equal on the same inputs.
  */
object IntervalIndex {

  private val WidthProp = "graft.bandWidth"
  private val FamilyProp = "graft.keyFamily"

  /** Build (overwrite) the standing index from an interval frame. All of
    * `intervals`' columns are carried as payload; `loCol`/`hiCol` may be
    * integral, DATE or TIMESTAMP/NTZ (one family — TimeKeys). `bandWidth`
    * is in the family's Long units (native / days / µs). */
  def write(spark: SparkSession, intervals: DataFrame, loCol: String,
      hiCol: String, table: String, bandWidth: Long,
      numBuckets: Int = 16): Unit = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val fam = TimeKeys.familyOf(intervals.schema(loCol).dataType)
    graft.sources.Sinks.writeBucketed(
      explodeBands(intervals, loCol, hiCol, bandWidth), table, "__band", numBuckets)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('$WidthProp' = '$bandWidth', '$FamilyProp' = '$fam')")
  }

  /** Day-2 append: new intervals enter the standing index under ITS OWN
    * recorded width and bucket spec — cost ∝ the appended batch. */
  def appendIntervals(spark: SparkSession, intervals: DataFrame,
      loCol: String, hiCol: String, table: String): Unit = {
    val (w, fam) = meta(spark, table)
    require(TimeKeys.familyOf(intervals.schema(loCol).dataType) == fam,
      s"append key family differs from the index's (table $table)")
    graft.sources.Sinks.appendBucketed(spark,
      explodeBands(intervals, loCol, hiCol, w), table)
  }

  /** Probe: every (point, interval) containment pair, point side from
    * `points`, interval side from the standing index — only the probe
    * side shuffles. Output carries the point columns then the interval
    * payload columns (band/bookkeeping dropped). */
  def probePoints(spark: SparkSession, table: String, points: DataFrame,
      pointKey: String): DataFrame = {
    val (w, fam) = meta(spark, table)
    val pdt = points.schema(pointKey).dataType
    require(TimeKeys.familyOf(pdt) == fam,
      s"probe key family (${pdt}) differs from the index's (table $table)")
    require(!points.columns.exists(_.startsWith("__")),
      "probe columns must not start with __ (index bookkeeping prefix)")
    val p = points
      .withColumn("__pl", TimeKeys.toLong(col(pointKey), pdt))
      .withColumn("__band", RangeJoin.bandOf(col("__pl"), w))
    p.join(spark.table(table), Seq("__band"))
      .filter(col("__pl") >= col("__lo_l") && col("__pl") <= col("__hi_l"))
      .drop("__band", "__pl", "__lo_l", "__hi_l")
  }

  /** One row per (interval × covered band): the stored layout. The Long
    * key images are persisted next to the payload so probes of either
    * timestamp flavor compare on the exact integer scale the bands were
    * built from. */
  private def explodeBands(intervals: DataFrame, loCol: String,
      hiCol: String, bandWidth: Long): DataFrame = {
    TimeKeys.requireSameFamily("IntervalIndex", intervals, Seq(loCol, hiCol))
    require(!intervals.columns.exists(_.startsWith("__")),
      "interval columns must not start with __ (index bookkeeping prefix)")
    val lo = TimeKeys.toLong(col(loCol), intervals.schema(loCol).dataType)
    val hi = TimeKeys.toLong(col(hiCol), intervals.schema(hiCol).dataType)
    intervals.filter(col(hiCol) >= col(loCol))
      .withColumn("__lo_l", lo)
      .withColumn("__hi_l", hi)
      .withColumn("__band", explode(sequence(
        RangeJoin.bandOf(col("__lo_l"), bandWidth),
        RangeJoin.bandOf(col("__hi_l"), bandWidth))))
  }

  private def meta(spark: SparkSession, table: String): (Long, Int) = {
    val props = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).properties
    val w = props.getOrElse(WidthProp, throw new IllegalArgumentException(
      s"table $table lacks $WidthProp — not an IntervalIndex table")).toLong
    val fam = props.getOrElse(FamilyProp, throw new IllegalArgumentException(
      s"table $table lacks $FamilyProp — not an IntervalIndex table")).toInt
    (w, fam)
  }
}
