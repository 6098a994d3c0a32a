package graft.engine

import java.math.{BigDecimal => JBigDecimal}
import java.sql.{Date, Timestamp}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Materialized query result: the facade's public result type, mirroring the
  * reference's `DirectDataTable(schema, data)` + Java map-list bridge
  * (reference `DirectDataTable.scala:25-52`). Kept deliberately thin — inside
  * the engine everything stays a DataFrame; a DataTable only exists after an
  * explicit collect at the API boundary.
  */
case class DataTable(schema: StructType, rows: Seq[Row]) {

  def rowCount: Int = rows.size

  /** Java-friendly view: List<Map<columnName, value>>. */
  def toJavaMaps: java.util.List[java.util.Map[String, Any]] =
    rows.map { r =>
      val m = new java.util.LinkedHashMap[String, Any]()
      schema.fields.zipWithIndex.foreach { case (f, i) => m.put(f.name, r.get(i)) }
      m: java.util.Map[String, Any]
    }.asJava
}

object DataTable {

  /** Lenient Java map-list ingest: each map is a row, values coerced to the
    * declared field type, absent keys become null. Coercion semantics ported
    * from the reference's converter (reference `JavaTypeConverter.scala:
    * 144-201`): strings parse to numerics/boolean, epoch millis (long or
    * numeric string) become date/timestamp, anything stringifies to string.
    */
  def fromJavaMapList(schema: StructType,
      data: java.util.List[java.util.Map[String, Object]]): DataTable = {
    val rows = data.asScala.map { m =>
      Row.fromSeq(schema.fields.toSeq.map { f =>
        coerce(if (m.containsKey(f.name)) m.get(f.name) else null, f.dataType)
      })
    }.toSeq
    DataTable(schema, rows)
  }

  private[graft] def coerce(v: Object, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => v.toString
      case IntegerType => v match {
        case n: Number => n.intValue()
        case s => s.toString.trim.toInt
      }
      case LongType => v match {
        case n: Number => n.longValue()
        case s => s.toString.trim.toLong
      }
      case ShortType => v match {
        case n: Number => n.shortValue()
        case s => s.toString.trim.toShort
      }
      case ByteType => v match {
        case n: Number => n.byteValue()
        case s => s.toString.trim.toByte
      }
      case DoubleType => v match {
        case n: Number => n.doubleValue()
        case s => s.toString.trim.toDouble
      }
      case FloatType => v match {
        case n: Number => n.floatValue()
        case s => s.toString.trim.toFloat
      }
      case BooleanType => v match {
        case b: java.lang.Boolean => b.booleanValue()
        case n: Number => n.longValue() != 0L
        case s => s.toString.trim.toBoolean
      }
      case d: DecimalType => v match {
        case b: JBigDecimal => b
        case n: Number => new JBigDecimal(n.toString)
        case s => new JBigDecimal(s.toString.trim)
      }
      case TimestampType => v match {
        case t: Timestamp => t
        case d: java.util.Date => new Timestamp(d.getTime)
        case n: Number => new Timestamp(n.longValue())
        case s =>
          val str = s.toString.trim
          // epoch branch must be a strict integer — "2020-01-01" contains
          // only digits and dashes but is NOT an epoch
          if (str.matches("-?\\d+")) new Timestamp(str.toLong)
          else Timestamp.valueOf(str)
      }
      case DateType => v match {
        case d: Date => d
        case d: java.util.Date => new Date(d.getTime)
        case n: Number => new Date(n.longValue())
        case s =>
          val str = s.toString.trim
          if (str.matches("-?\\d+")) new Date(str.toLong)
          else Date.valueOf(str)
      }
      case BinaryType => v match {
        case b: Array[Byte] => b
        case s => s.toString.getBytes("UTF-8")
      }
      // interval ingest (reference had no branch here either — superset):
      // accepts a CalendarInterval or any "1 months 2 days 3 hours" /
      // "INTERVAL '...'" string via Catalyst's own parser, so ingested
      // intervals behave exactly like SQL-literal ones downstream
      case CalendarIntervalType => v match {
        case c: org.apache.spark.unsafe.types.CalendarInterval => c
        case s =>
          val parsed = org.apache.spark.sql.catalyst.util.IntervalUtils
            .stringToInterval(
              org.apache.spark.unsafe.types.UTF8String.fromString(s.toString))
          if (parsed == null) throw new IllegalArgumentException(
            s"cannot parse '$s' as a calendar interval")
          parsed
      }
      // Nested types, coerced RECURSIVELY so a Java List<Map<String,Object>>
      // tree ingests in one call. The reference's ingest was scalar-only
      // (reference JavaTypeConverter.scala:183-201) — this is a declared
      // superset, matching its RESULT-side nested handling
      // (GenerateSafeProjection.scala:44-146). External row format: arrays
      // as Seq, maps as Map, structs as Row — exactly what
      // createDataFrame(rows, schema) expects back.
      case ArrayType(et, _) => v match {
        case l: java.util.List[_] =>
          l.asScala.map(e => coerce(e.asInstanceOf[Object], et)).toSeq
        case a: Array[_] =>
          a.toSeq.map(e => coerce(e.asInstanceOf[Object], et))
        case s: Seq[_] =>
          s.map(e => coerce(e.asInstanceOf[Object], et))
        case other =>
          throw new IllegalArgumentException(
            s"cannot coerce ${other.getClass.getName} to array<$et>")
      }
      case MapType(kt, vt, _) => v match {
        case m: java.util.Map[_, _] =>
          m.asScala.map { case (k, mv) =>
            coerce(k.asInstanceOf[Object], kt) ->
              coerce(mv.asInstanceOf[Object], vt)
          }.toMap
        case m: scala.collection.Map[_, _] =>
          m.map { case (k, mv) =>
            coerce(k.asInstanceOf[Object], kt) ->
              coerce(mv.asInstanceOf[Object], vt)
          }.toMap
        case other =>
          throw new IllegalArgumentException(
            s"cannot coerce ${other.getClass.getName} to map<$kt,$vt>")
      }
      case st: StructType => v match {
        case m: java.util.Map[_, _] =>
          val mm = m.asInstanceOf[java.util.Map[String, Object]]
          Row.fromSeq(st.fields.toSeq.map(f =>
            coerce(if (mm.containsKey(f.name)) mm.get(f.name) else null,
              f.dataType)))
        case r: Row =>
          Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
            coerce(if (i < r.length) r.get(i).asInstanceOf[Object] else null,
              f.dataType)
          })
        case other =>
          throw new IllegalArgumentException(
            s"cannot coerce ${other.getClass.getName} to $st")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported ingest type $other for value $v")
    }
  }
}
