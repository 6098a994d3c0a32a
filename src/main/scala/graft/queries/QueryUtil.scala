package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

private[queries] object QueryUtil {

  /** Word n-grams of a token array as space-joined strings; empty array when
    * fewer than n tokens. Single definition shared by the shingle pipeline
    * (n=3) and the bigram table function (n=2) so the mirrored DuckDB
    * oracles can't drift against two hand-maintained copies. */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
}
