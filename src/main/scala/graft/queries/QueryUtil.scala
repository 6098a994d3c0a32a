package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

private[queries] object QueryUtil {

  /** Word n-grams of a token array as space-joined strings; empty array when
    * fewer than n tokens. Single definition shared by the shingle pipeline
    * (n=3) and the bigram table function (n=2) so the mirrored DuckDB
    * oracles can't drift against two hand-maintained copies. */
  /** Whitespace token count of a text column — single definition for
    * t46/t47/t51 (Spark side); the DuckDB mirror is [[oracleTokenCount]]. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** DuckDB fragment mirroring [[tokenCount]] (INTEGER-width cast is left to
    * the call site). */
  val oracleTokenCount: String = """len(string_split_regex(trim(text), '\s+'))"""

  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
}
