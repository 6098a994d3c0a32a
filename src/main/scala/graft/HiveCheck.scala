package graft

/** Forked-JVM proof of the Hive function-class surface (reference
  * `DirectSessionCatalog.makeFunctionExpression:62-112`): the catalog
  * implementation is a SharedState-static conf, so the hive catalog only
  * activates in a JVM whose FIRST session enables it — a shared-JVM test run
  * can't guarantee that, hence this standalone main (launched by
  * HiveSurfaceSpec in its own JVM; also runnable directly via
  * `sbt "runMain graft.HiveCheck"` from an empty scratch dir).
  *
  * Covers every function-class kind the reference accepts:
  *  - simple Hive UDF (user class, overloaded evaluate)       [temporary]
  *  - GenericUDAFResolver2 aggregate (GenericUDAFSum)         [temporary]
  *  - old-style UDAF subclass (UDAFPercentile)                [temporary]
  *  - GenericUDTF generator (GenericUDTFExplode, LATERAL VIEW)[temporary]
  *  - permanent function (`CREATE FUNCTION`) resolved from a NEW session
  *    (reference testHiveUdf2: metastore-backed, cross-session)
  *
  * Exits 0 and prints HIVECHECK OK on success; nonzero with the failure
  * otherwise.
  */
object HiveCheck {
  def main(args: Array[String]): Unit = {
    try {
      val g = graft.engine.GraftSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withHiveSupport()
        .getOrCreate()
      val s = g.spark
      require(s.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive",
        "hive catalog did not activate (not the first session in this JVM?)")

      // --- temporary simple UDF, user class, both overloads ---------------
      s.sql("CREATE TEMPORARY FUNCTION hive_strlen AS 'graft.hive.GraftStrLen'")
      val r1 = g.sql("SELECT hive_strlen('hello') AS a, hive_strlen(100) AS b").rows.head
      require(r1.getInt(0) == 5 && r1.getInt(1) == 200, s"simple UDF: $r1")

      // --- Hive UDAF surfaces: resolver2 + old-style ----------------------
      s.sql("CREATE TEMPORARY FUNCTION hive_sum AS " +
        "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFSum'")
      s.sql("CREATE TEMPORARY FUNCTION hive_pct AS " +
        "'org.apache.hadoop.hive.ql.udf.UDAFPercentile'")
      val r2 = g.sql(
        """SELECT k, hive_sum(v) AS s, hive_pct(v, 0.5) AS p
          |FROM VALUES ('a', 1L), ('a', 2L), ('a', 3L), ('b', 10L) t(k, v)
          |GROUP BY k ORDER BY k""".stripMargin).rows
      require(r2.length == 2, s"UDAF rows: ${r2.length}")
      require(r2.head.getLong(1) == 6L && r2.head.getDouble(2) == 2.0,
        s"UDAF group a: ${r2.head}")
      require(r2(1).getLong(1) == 10L && r2(1).getDouble(2) == 10.0,
        s"UDAF group b: ${r2(1)}")

      // --- Hive GenericUDTF through LATERAL VIEW --------------------------
      s.sql("CREATE TEMPORARY FUNCTION hive_explode AS " +
        "'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode'")
      val r3 = g.sql(
        """SELECT id, x FROM VALUES (1), (2) t(id)
          |LATERAL VIEW hive_explode(array(id, id * 10)) e AS x
          |ORDER BY id, x""".stripMargin).rows
      require(r3.map(r => (r.getInt(0), r.getInt(1))) ==
        Seq((1, 1), (1, 10), (2, 2), (2, 20)), s"UDTF: $r3")

      // --- permanent function, resolved from a fresh session --------------
      s.sql("CREATE FUNCTION IF NOT EXISTS perm_strlen AS 'graft.hive.GraftStrLen'")
      val g2 = g.newSession()
      val r4 = g2.sql("SELECT perm_strlen('hyf_test') AS a, perm_strlen(100) AS b").rows.head
      require(r4.getInt(0) == 8 && r4.getInt(1) == 200,
        s"permanent function from new session: $r4")
      // and it is genuinely permanent, not a temp leaked into the child:
      require(s.catalog.functionExists("perm_strlen"), "perm_strlen not in catalog")

      println("HIVECHECK OK")
      s.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        println("HIVECHECK FAILED: " + e)
        sys.exit(1)
    }
  }
}
