package graft.hive

import org.apache.hadoop.hive.ql.exec.UDF
import org.apache.hadoop.io.{IntWritable, Text}

/** A user-supplied Hive simple UDF, the class shape the reference registers
  * through `CREATE [TEMPORARY] FUNCTION name AS '<class>'` (reference
  * `DirectSessionCatalog.makeFunctionExpression:62-112`, test StrLen in
  * `DirectExecSuite.scala:159-178`): string -> length, int -> doubled —
  * overload resolution across both is part of what the catalog must do. */
class GraftStrLen extends UDF {
  def evaluate(s: Text): IntWritable =
    if (s == null) null else new IntWritable(s.toString.length)
  def evaluate(i: IntWritable): IntWritable =
    if (i == null) null else new IntWritable(i.get * 2)
}
