package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the operators the DuckDB oracle can't express
  * (custom-hash LSH / SimHash / langid): verify completeness and recall
  * against brute force on sf0.001. The oracle-checkable queries are covered
  * by the driver gate (tools/check.py locally). */
class PipelineOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("d54_simhash banding is complete: matches brute-force hamming<=6 pairs") {
    graft.functions.GraftFunctions.register(spark)
    val sigs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr("graft_simhash(split(trim(text), '\\\\s+'))").as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ida, idb)).toSet
    val got = SparkEntry.queries("d54_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"banding missed ${brute.diff(got).size}, extra ${got.diff(brute).size}")
  }

  test("s57_ann_lsh achieves nontrivial recall vs exact s56 top-5") {
    val exact = SparkEntry.queries("s56_ann_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("s57_ann_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall@5 $recall too low")
    // sanity: approx returns <= 5 per query, ids from corpus side only
    assert(approx.forall { case (q, n) => q < 10 && n >= 10 })
  }

  test("t48_lang_id emits only known codes, deterministically") {
    val a = SparkEntry.queries("t48_lang_id")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = SparkEntry.queries("t48_lang_id")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
    val codes = a.map(_._2).toSet
    assert(codes.subsetOf(Set("en", "de", "fr", "es", "zh", "und")))
  }

  test("q13_hll approx distinct is within 10% of exact") {
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = SparkEntry.queries("q13_hll")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$flag: approx $a vs exact $e")
    }
  }

  test("t49_fingerprint is deterministic and groups known near-dup docs") {
    val a = SparkEntry.queries("t49_fingerprint")(spark, dir)
      .collect().map(_.toString)
    val b = SparkEntry.queries("t49_fingerprint")(spark, dir)
      .collect().map(_.toString)
    assert(a.sameElements(b))
    // docs sharing a fingerprint exist (the corpus has planted near-dups,
    // and min-rolling-hash collides on heavily shared content)
    val grouped = SparkEntry.queries("t49_fingerprint")(spark, dir)
      .filter(col("n_docs") > 1).count()
    assert(grouped > 0, "expected at least one multi-doc fingerprint group")
  }

  test("split semantics pin: trailing empties kept (t51 segment counting)") {
    import spark.implicits._
    // DuckDB string_split_regex('Hi. Bye.','[.!?]') = ['Hi',' Bye','']
    // (verified against DuckDB 1.0); Spark must agree for the t51 oracle to
    // hold on any future corpus that contains sentence punctuation.
    val got = Seq("Hi. Bye.", "a..b", "none").toDF("text")
      .select(split(col("text"), "[.!?]").as("segs"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("Hi", " Bye", ""))
    assert(got(1) == Seq("a", "", "b"))
    assert(got(2) == Seq("none"))
  }

  test("m61_frame_sample emits bounded deterministic frames") {
    val rows = SparkEntry.queries("m61_frame_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
    val again = SparkEntry.queries("m61_frame_sample")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
