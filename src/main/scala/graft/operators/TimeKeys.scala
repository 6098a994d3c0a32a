package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.plans.{MicrosAsTimestamp, TimestampMicros}

/** Native temporal keys for the DataFrame-layer interval operators — the
  * Column-level twin of BandedIntervalJoinRule's `family`/`longUnits`
  * (plans/BandedIntervalJoin.scala), so `AsofJoin`, `IntervalSweep` and
  * `RangeJoin` accept DATE / TIMESTAMP / TIMESTAMP_NTZ keys directly, the
  * way the SQL surface already does, instead of demanding a manual
  * `unix_timestamp` pre-conversion.
  *
  * Each key type maps to a MONOTONIC, EXACT Long image on one scale family
  * (integral → native units, DATE → days, TIMESTAMP/NTZ → epoch µs); band
  * arithmetic and sweep boundaries run on the image; residual predicates
  * compare the ORIGINAL typed values; outputs that surface bounds convert
  * back losslessly ([[TimestampMicros]]/[[MicrosAsTimestamp]] are physical
  * reinterprets, so both timestamp types round-trip bit-exactly with no
  * session-zone shift). Widths/tolerances are Longs in the family's units:
  * days for DATE keys, MICROSECONDS for timestamp keys, the key's own
  * units for integrals.
  */
private[operators] object TimeKeys {

  /** Band-scale family id: all keys of one operator call must share a
    * family (0 = native integral, 1 = days, 2 = epoch µs) — mixing, say, a
    * DATE point with TIMESTAMP bounds would band on incompatible scales. */
  def familyOf(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType => 0
    case DateType => 1
    case TimestampType | TimestampNTZType => 2
    case other =>
      throw new IllegalArgumentException(
        s"unsupported interval key type $other: integral, DATE, TIMESTAMP " +
          "or TIMESTAMP_NTZ required (scale other types to Long up front)")
  }

  def requireSameFamily(op: String, df: DataFrame, cols: Seq[String]): Unit = {
    val fams = cols.map(c => familyOf(df.schema(c).dataType)).distinct
    require(fams.size == 1,
      s"$op keys ${cols.mkString(", ")} mix scale families " +
        "(integral vs DATE vs TIMESTAMP) — convert to one family first")
  }

  /** Monotonic exact Long image of a key column (the rule's `longUnits`). */
  def toLong(c: Column, dt: DataType): Column = dt match {
    case DateType => call_function("unix_date", c).cast(LongType)
    case TimestampType | TimestampNTZType =>
      ColumnBridge.column(TimestampMicros(ColumnBridge.expression(c)))
    case _ => c.cast(LongType)
  }

  def toLong(df: DataFrame, name: String): Column =
    toLong(col(name), df.schema(name).dataType)

  /** Lossless inverse of [[toLong]], for outputs that surface bounds
    * (merged islands, clipped fragments) in the caller's own key type. */
  def fromLong(c: Column, dt: DataType): Column = dt match {
    case DateType => call_function("date_from_unix_date", c.cast(IntegerType))
    case TimestampType | TimestampNTZType =>
      ColumnBridge.column(MicrosAsTimestamp(ColumnBridge.expression(c), dt))
    case LongType => c
    case other => c.cast(other)
  }
}
