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

  // Completeness is parameterized over both banding schemes: the bound
  // hamming <= 8 - choose is tight, so each scheme is proven at its own
  // ceiling. choose=2 is d54's production scheme; choose=3 is the 100 TB
  // step-up (56 tables x 24-bit buckets) named in SCALE.md.
  for ((choose, maxHamming) <- Seq((2, 6), (3, 5)))
    test(s"simhash $choose-block banding is complete: matches brute-force hamming<=$maxHamming pairs") {
      graft.functions.GraftFunctions.register(spark)
      val sigs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), expr("graft_simhash(split(trim(text), '\\\\s+'))").as("sh"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (ida, sa) <- sigs; (idb, sb) <- sigs
        if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (ida, idb)).toSet
      val got = queries.DedupOps.simhashPairs(spark, dir, choose, maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"banding missed ${brute.diff(got).size}, extra ${got.diff(brute).size}")
    }

  test("t55/t57 vocab rank: no unpartitioned window over per-token rows, and the " +
      "two-pass bucketed rank equals the brute-force global ordering") {
    import org.apache.spark.sql.execution.window.WindowExec
    // plan gate: every unpartitioned WindowExec must run over the bucket
    // SUMMARY (no `token` attribute in its input), never the vocab itself —
    // the single-task-sort hazard the two-pass scheme exists to remove
    for (name <- Seq("t55", "t57")) {
      val wins = SparkEntry.queries(name)(spark, dir)
        .queryExecution.sparkPlan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$name: expected window nodes in the plan")
      for (w <- wins if w.partitionSpec.isEmpty)
        assert(!w.child.output.exists(_.name == "token"),
          s"$name: unpartitioned window over per-token rows " +
            s"(input: ${w.child.output.map(_.name).mkString(",")})")
    }
    // value gate: (rnk, cum_n) == the brute-force sort over the collected vocab
    val got = SparkEntry.queries("t55")(spark, dir)
      .select(col("token"), col("n"), col("rnk"), col("cum_n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val sorted = got.sortBy { case (t, n, _, _) => (-n, t) }
    var cum = 0L
    sorted.zipWithIndex.foreach { case ((t, n, rnk, cumN), i) =>
      cum += n
      assert(rnk == i + 1, s"$t: rnk $rnk != ${i + 1}")
      assert(cumN == cum, s"$t: cum_n $cumN != $cum")
    }
  }

  test("t56 redaction: the PII pattern set scrubs constructed emails/phones/IPs completely") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact me at alice.smith+spam@example-mail.co and bob@x.io today"),
      (2L, "call 415-555-0173 or 415.555.0173 x99"),
      (3L, "server at 10.0.255.3 fell back to 192.168.1.77"),
      (4L, "no pii here just words"),
      (5L, "mix: eve@corp.net from 8.8.8.8 dialed 650 555 1212"))
      .toDF("doc_id", "text")
    val out = queries.TextOps.redact(rows, queries.TextOps.PiiPatterns, "[PII]")
      .orderBy(col("doc_id")).collect()
    assert(out.map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 0, 5L -> 3))
    // nothing PII-shaped survives: re-scan the FULL cleaned text (the
    // public output carries head+md5; the scrub column itself is asserted)
    val clean = rows.select(col("doc_id"),
      queries.TextOps.redactedText(queries.TextOps.PiiPatterns, "[PII]").as("c"))
    for (p <- queries.TextOps.PiiPatterns) {
      val leaked = clean
        .filter(size(regexp_extract_all(col("c"), lit(p), lit(0))) > 0).count()
      assert(leaked == 0, s"pattern $p still matches after redaction")
    }
    // the no-PII row is byte-identical to its input
    assert(clean.filter(col("doc_id") === 4L).head().getString(1) ==
      "no pii here just words")
  }

  test("d66 epoch upsampling: scan-local generator plan, exact differential vs the rule") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.IntegerType
    val w = lit(1.0) +
      (expr("substr(source, 4)").cast(IntegerType) % 4) * lit(0.5)
    val full = queries.DedupOps.upsampleMixture(
      Tables.load(spark, dir, "documents"), w)
    // the generic operator keeps EVERY input column (it is the dataset
    // writer); text must survive replication
    assert(full.columns.contains("text") && full.columns.contains("epoch"))
    val df = full.select(col("doc_id"), col("source"), col("n_copies"), col("epoch"))
    // the 100 TB claim: replication adds NO data movement — no exchange
    // anywhere below the sink (the contract query's orderBy is presentation)
    val ex = df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    assert(ex.isEmpty, s"upsampling introduced a shuffle:\n${df.queryExecution.executedPlan}")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    val expected = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).flatMap { case (id, src) =>
        val wv = 1.0 + (src.drop(3).toInt % 4) * 0.5
        val n = wv.toInt + (if (id % 1000 < (wv - wv.toInt) * 1000) 1 else 0)
        (1 to n).map(e => (id, src, n, e))
      }.toSet
    assert(got == expected)
  }

  test("s64 diverse sample: broadcast anchors, agg-based argmax, WindowGroupLimit cap, full cluster coverage") {
    val df = SparkEntry.queries("s64")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // anchors broadcast (k rows), never shuffled corpus-side
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"anchor join is not broadcast:\n$plan")
    // per-cluster cap runs map-side
    assert(plan.contains("WindowGroupLimit"), s"cap not rewritten:\n$plan")
    // the argmax is ONE aggregate over vec_id — the only WindowExec in the
    // plan is the cap's row_number (an assignment-by-rank would add a second
    // one, shuffling all k*n sims). String-counted because AQE hides the
    // subtree from collect(); "Window [" never matches "WindowGroupLimit [".
    val wins = "Window \\[".r.findAllIn(plan).size
    assert(wins == 1, s"expected only the cap window, got $wins:\n$plan")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // every anchor's cluster is represented and capped at m
    val byCid = rows.groupBy(_._1)
    assert(byCid.keySet == (0L until 8L).toSet, s"missing clusters: ${byCid.keySet}")
    byCid.foreach { case (cid, rs) =>
      assert(rs.length <= 10, s"cluster $cid kept ${rs.length}")
      assert(rs.forall(_._2 >= 8), "anchors must not sample themselves")
    }
  }

  test("d67 global shuffle is partitioning-invariant (identical bytes from any input layout)") {
    // the operator's reason to exist: training order must be reproducible
    // across reruns AND cluster layouts — md5 keys + total (skey, doc_id)
    // order make output independent of how the input arrives
    val base = SparkEntry.queries("d67")(spark, dir).collect().map(_.toString)
    val reparted = queries.DedupOps.globalShuffle(
        Tables.load(spark, dir, "documents").repartition(13))
      .orderBy(col("shard"), col("rn"))
      .collect().map(_.toString)
    assert(base.nonEmpty && base.sameElements(reparted),
      "shuffle order changed with input partitioning")
  }

  test("s65 quantization: every dequantized value is within one coding step of the original") {
    // the quantizer's implicit guarantee, stated and gated: with
    // q = floor((v-lo)/(hi-lo)*256) clamped to [0,255], the bucket
    // midpoint reconstruction lo + (q+0.5)*(hi-lo)/256 sits within
    // (hi-lo)/256 of v (loose 2x bound — immune to IEEE rounding dust)
    val rows = SparkEntry.queries("s65")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val emb = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val lo = Array.fill(65)(Double.MaxValue); val hi = Array.fill(65)(Double.MinValue)
    emb.values.foreach(v => v.zipWithIndex.foreach { case (x, i) =>
      lo(i + 1) = math.min(lo(i + 1), x.toDouble); hi(i + 1) = math.max(hi(i + 1), x.toDouble) })
    rows.foreach { case (id, dim, q) =>
      val (l, h) = (lo(dim), hi(dim)); val v = emb(id)(dim - 1).toDouble
      if (h > l) {
        val dequant = l + (q + 0.5) * (h - l) / 256
        assert(math.abs(dequant - v) <= (h - l) / 256,
          s"vec $id dim $dim: q=$q dequant=$dequant v=$v range=[$l,$h]")
      } else assert(q == 0)
    }
  }

  test("d61 source cap runs as WindowGroupLimit (map-side per-source top-K, no corpus sort)") {
    val df = SparkEntry.queries("d61")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=K filter was not rewritten to WindowGroupLimit:\n$plan")
    // cap semantics: nothing beyond K, per-source counts bounded, stable ids
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.forall(_._3 <= 10))
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 10, s"$src kept ${rs.length}")
      // kept docs are exactly the K smallest doc_ids of that source
      assert(rs.map(_._1).sorted.zip(rs.sortBy(_._3).map(_._1)).forall(p => p._1 == p._2))
    }
  }

  test("simhash banding rejects a hamming threshold beyond the scheme's completeness bound") {
    intercept[IllegalArgumentException] {
      queries.DedupOps.simhashPairs(spark, dir, choose = 2, maxHamming = 7)
    }
  }

  // Decontamination is proven at the oracle width (3, the d60 contract
  // query) AND the production width (13 — near-unique shingles, the
  // hot-shingle-skew-free regime the operator ships at scale).
  for (width <- Seq(3, 13))
    test(s"d60 decontamination (width $width) matches brute-force train/eval shingle overlap") {
      // brute force: per-doc distinct word-n-gram sets on the driver, then
      // exact overlap of each train doc against every eval doc
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0),
          r.getString(1).trim.split("\\s+").toSeq.sliding(width)
            .filter(_.size == width).map(_.mkString(" ")).toSet))
      val eval = docs.filter(_._1 % 97 == 0)
      val brute = (for {
        (tid, tsh) <- docs if tid % 97 != 0
        hits = eval.filter { case (_, esh) => tsh.exists(esh.contains) }
        if hits.nonEmpty
      } yield (tid, hits.length.toLong, hits.map(_._1).min)).toSet
      val got = queries.DedupOps.decontaminate(spark, dir, width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute,
        s"missed ${brute.diff(got).size}, extra ${got.diff(brute).size}")
      if (width == 3) {
        // the contract entry IS the width-3 form
        val viaEntry = SparkEntry.queries("d60")(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(viaEntry == got)
      }
      // a width-13 overlap only comes from genuinely shared long spans, so
      // it must be a subset of the width-3 flags (sanity of the width knob)
      if (width == 13) {
        val w3 = queries.DedupOps.decontaminate(spark, dir, 3)
          .collect().map(_.getLong(0)).toSet
        assert(got.map(_._1).subsetOf(w3), "13-gram flags outside the 3-gram set")
      }
    }

  test("d72 bloom decontamination: result ≡ d60, zero false negatives, FPR within 2× analytic bound") {
    val mBits = 1L << 18
    val k = 5
    // exactness: the bloom path must be row-identical to the join path
    val viaJoin = queries.DedupOps.decontaminate(spark, dir, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBloom = queries.DedupOps.decontaminateBloom(spark, dir, 3, mBits, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBloom == viaJoin,
      s"bloom path diverged: missed ${viaJoin.diff(viaBloom).size}, extra ${viaBloom.diff(viaJoin).size}")

    // prefilter-level guarantees, measured on the actual shingle stream
    val sh = queries.DedupOps.hashedDocs(spark, dir, 3)
      .select(col("doc_id"), explode(col("hs")).as("sh"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select(col("sh"))
    val evSet = ev.collect().map(_.getLong(0)).toSet
    val words = queries.DedupOps.bloomBuild(ev, mBits, k)
    val tr = sh.filter(col("doc_id") % 97 =!= 0)
      .withColumn("pass", queries.DedupOps.bloomProbe(words, mBits, k))
      .withColumn("passBc", queries.DedupOps.bloomProbeBc(spark, words, mBits, k))
      .select(col("sh"), col("pass"), col("passBc"))
      .collect().map { r =>
        // the broadcast-expression probe must agree with the plan-literal
        // SQL probe on every row (same positions, same bits)
        assert(r.getBoolean(1) == r.getBoolean(2),
          s"literal vs broadcast probe disagree on sh=${r.getLong(0)}")
        (r.getLong(0), r.getBoolean(1))
      }
    val falseNeg = tr.filter { case (h, pass) => evSet.contains(h) && !pass }
    assert(falseNeg.isEmpty, s"bloom dropped ${falseNeg.length} true member shingles")
    val nonMembers = tr.filter { case (h, _) => !evSet.contains(h) }
    val fpr = nonMembers.count(_._2).toDouble / math.max(nonMembers.length, 1)
    val theory = math.pow(1 - math.exp(-k.toDouble * evSet.size / mBits), k)
    assert(fpr <= math.max(2 * theory, 1e-3),
      f"measured FPR $fpr%.6f exceeds 2× the (m=$mBits, k=$k, n=${evSet.size}) bound $theory%.6f")
  }

  // Recall floors are production bars set from measurement, not smoke
  // floors: graft.tools.RecallProbe sweeps (tables x bits) and (C x nprobe)
  // against exact s56 on this corpus (table in SCALE.md); the shipped
  // operating points measure 0.90 (LSH 16x4) and 0.84 (IVF 16/8), both
  // deterministic, so >= 0.8 is a real regression gate.
  test("s57_ann_lsh achieves recall@5 >= 0.8 vs exact s56 top-5") {
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("s57")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall@5 $recall below the tuned bar")
    // sanity: approx returns <= 5 per query, ids from corpus side only
    assert(approx.forall { case (q, n) => q < 10 && n >= 10 })
  }

  test("s72 cluster report: full partition of the corpus, objective beats one-centroid baseline") {
    import graft.queries.SimilarityOps
    graft.functions.GraftFunctions.register(spark)
    val corpus = Tables.load(spark, dir, "embeddings").filter(col("vec_id") >= 10)
    val n = corpus.count()
    val report = SparkEntry.queries("s72")(spark, dir).collect()
    // a partition: every corpus vector in exactly one cluster, purity sane
    assert(report.map(_.getLong(1)).sum == n, "cluster sizes must sum to corpus size")
    assert(report.length <= 10)
    assert(report.forall { r => val p = r.getDouble(4); p > 0.0 && p <= 1.0 })
    // clustering mechanics: mean best-cell cosine must beat the mean cosine
    // to the single global centroid (k-means captures structure a 1-cluster
    // trivial solution cannot) — the external labels are unstructured on
    // this corpus, so THIS is the value gate
    val cents = SimilarityOps.trainCentroids(spark, dir, c = 10, iters = 5)
    val meanBest = corpus.crossJoin(org.apache.spark.sql.functions.broadcast(cents))
      .select(col("vec_id"), expr("graft_cosine(embedding, cv)").as("sim"))
      .groupBy(col("vec_id")).agg(max(col("sim")).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)
    val global = corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim")).agg(avg(col("v")).as("m"))
      .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(expr("transform(dm, x -> cast(x.m as float))").as("gv"))
    val meanGlobal = corpus.crossJoin(global)
      .select(expr("graft_cosine(embedding, gv)").as("sim"))
      .agg(avg(col("sim"))).head().getDouble(0)
    assert(meanBest > meanGlobal,
      s"k-means objective $meanBest not better than single-centroid $meanGlobal")
  }

  test("s73 MMR: picks from the shortlist, keeps the top hit, and is more diverse than plain top-5") {
    graft.functions.GraftFunctions.register(spark)
    val exactTop5 = SparkEntry.queries("s56")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val mmr = SparkEntry.queries("s73")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(mmr.groupBy(_._1).forall(_._2.length == 5))
    // rank-1 must be the exact argmax (MMR's first pick ignores diversity)
    val top1 = exactTop5.filter(_._3 == 1).map(t => (t._1, t._2)).toSet
    assert(mmr.filter(_._3 == 1).map(t => (t._1, t._2)).toSet == top1)
    // mean pairwise cosine among MMR picks must not exceed plain top-5's
    val vecs = Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      graft.functions.Kernels.cosineFloat(a, b)
    def meanPairSim(picks: Array[(Long, Long, Int)]): Double = {
      val byQ = picks.groupBy(_._1).values.toSeq
      val sims = byQ.flatMap { g =>
        val ids = g.map(_._2)
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield cos(vecs(ids(i)), vecs(ids(j)))
      }
      sims.sum / sims.size
    }
    val dMmr = meanPairSim(mmr); val dTop = meanPairSim(exactTop5)
    assert(dMmr <= dTop + 1e-12,
      s"MMR picks ($dMmr) should be no less diverse than plain top-5 ($dTop)")
    // determinism
    val again = SparkEntry.queries("s73")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(mmr.sameElements(again))
  }

  test("s60_ann_ivf achieves recall@5 >= 0.8 vs exact s56 top-5") {
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("s60")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@5 $recall below the tuned bar")
    assert(approx.forall { case (q, n) => q < 10 && n >= 10 })
    // determinism: quantizer seeds and iterations are fixed
    val again = SparkEntry.queries("s60")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == again)
  }

  test("s68_ann_ivf_q8 (int8 asymmetric rerank) achieves recall@5 >= 0.8 vs exact s56 top-5") {
    // Measured (RecallProbe grid, r7): the int8 rerank's recall@5 equals
    // the float path's AT EVERY probed operating point (c in {8,16},
    // nprobe in {4,6,8}) — quantization at 256 levels/dim costs zero
    // recall@5 on this corpus. The gate guards the shipped point (0.84,
    // same as s60) at the same 0.8 floor.
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("s68")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized-IVF recall@5 $recall below the tuned bar")
    assert(approx.forall { case (q, n) => q < 10 && n >= 10 })
    // determinism: grid stats, codes, and the rerank are all deterministic
    val again = SparkEntry.queries("s68")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == again)
  }

  test("s70_ann_two_stage: recall@5 >= s68's at the same operating point, both >= 0.8") {
    // same candidate cells as s68; exact float scores decide the final
    // top-5, so the two-stage form can only match or beat the
    // all-quantized ranking — asserted directly, not assumed
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q8 = SparkEntry.queries("s68")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = SparkEntry.queries("s70")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rQ8 = exact.intersect(q8).size.toDouble / exact.size
    val rTwo = exact.intersect(two).size.toDouble / exact.size
    info(f"recall@5: s68=$rQ8%.2f two-stage=$rTwo%.2f")
    assert(rTwo >= rQ8, f"exact rerank lost recall: $rTwo%.2f < $rQ8%.2f")
    assert(rTwo >= 0.8, s"two-stage recall@5 $rTwo below the floor")
    assert(two.forall { case (q, n) => q < 10 && n >= 10 })
    val again = SparkEntry.queries("s70")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(two == again)
  }

  test("s84_ann_ivfpq: recall@5 >= 0.85 (r14 headroom point), bounded by same-nprobe IVF") {
    // the exact-rerank IVF at s84's OWN nprobe exact-reranks EVERY
    // candidate in the probed cells; s84 reranks only the PQ top-PqRefine
    // of the same pool — so s84's recall cannot exceed it (set inclusion,
    // asserted), and the gap IS the ADC shortlist's miss rate. r14 moved
    // the operating point 8/50 → PqNprobe=12/PqRefine=100 (measured grid in
    // SimilarityOps): recall@5 0.80 → 0.92, so the 0.80 family gate now has
    // real margin and this spec floors at 0.85 (still 0.07 below measured).
    import graft.queries.SimilarityOps
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.annIvf(spark, dir, SimilarityOps.IvfCells,
        SimilarityOps.PqNprobe, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = SparkEntry.queries("s84")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rIvf = exact.intersect(ivf).size.toDouble / exact.size
    val rPq = exact.intersect(ivfpq).size.toDouble / exact.size
    info(f"recall@5: ivf@PqNprobe=$rIvf%.2f ivf-pq=$rPq%.2f")
    assert(rPq >= 0.85, s"IVF-PQ recall@5 $rPq below the r14 headroom floor")
    assert(exact.intersect(ivfpq).subsetOf(exact.intersect(ivf)),
      "IVF-PQ recovered an exact neighbor outside its own candidate pool — " +
        "cell routing diverged from the same-nprobe IVF")
    assert(ivfpq.forall { case (q, n) => q < 10 && n >= 10 })
    // determinism: both trainings are hash-seeded, fixed-iteration
    val again = SparkEntry.queries("s84")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq == again)
  }

  test("s71_ann_truncated (32-dim prefix + exact rerank) achieves recall@5 >= 0.85 vs exact s56") {
    // measured grid on this corpus (non-MRL embeddings): dims 8/16/32 ×
    // R 25/50/100 → 0.18/0.34/0.54, 0.40/0.54/0.70, 0.64/0.74/0.94.
    // Shipped point (32, 100) = 0.94, deterministic — 0.85 is a real
    // regression floor.
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = SparkEntry.queries("s71")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(t).size.toDouble / exact.size
    assert(recall >= 0.85, s"truncated-dim recall@5 $recall below the measured floor")
    assert(t.forall { case (q, n) => q < 10 && n >= 10 })
    val again = SparkEntry.queries("s71")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t == again)
  }

  test("s69_ann_pq (PQ shortlist + exact refine) achieves recall@5 >= 0.8 vs exact s56") {
    // Measured grid (r8, this corpus): raw PQ top-5 (no refine) is 0.28 at
    // m=8/k=64 — weakly-clustered embeddings reconstruct poorly — but the
    // R-shortlist + exact-rerank form reaches 0.68/0.90/0.96 at
    // R=25/50/100. Shipped point m=8, k=64, R=50 → 0.90, gated at 0.8.
    import graft.queries.SimilarityOps
    val exact = SparkEntry.queries("s56")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("s69")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@5 $recall below the tuned bar")
    assert(approx.forall { case (q, n) => q < 10 && n >= 10 })
    // determinism: hash-ordered init, fixed-point means, bounded-agg argmin
    val again = SparkEntry.queries("s69")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == again)
    // the compression claim is literal: m bytes per corpus vector, and the
    // codebook is one flat m*k*ds row
    val codes = SimilarityOps.corpusPq(spark, dir,
      SimilarityOps.PqM, SimilarityOps.PqK, 3).collect()
    assert(codes.nonEmpty)
    assert(codes.forall(_.getAs[Array[Byte]]("code").length == SimilarityOps.PqM))
    val cb = SimilarityOps.trainPqCodebook(spark, dir,
      SimilarityOps.PqM, SimilarityOps.PqK, 3).collect()
    assert(cb.length == 1)
    assert(cb.head.getSeq[Double](0).length == 64 * SimilarityOps.PqK)
  }

  test("t48_lang_id emits only known codes, deterministically") {
    val a = SparkEntry.queries("t48")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = SparkEntry.queries("t48")(spark, dir)
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
    val approx = SparkEntry.queries("q13")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$flag: approx $a vs exact $e")
    }
  }

  test("q68 quantile sketch: every quantile is within the GK rank guarantee") {
    // approx_percentile is a Greenwald-Khanna sketch: with accuracy B the
    // returned value's RANK is within n/B of the target rank (the guarantee
    // that makes partial sketches mergeable without a global sort). Gate:
    // for each lang × column × p, the returned value's rank interval
    // [#{x < v}+1, #{x <= v}] must intersect target p·n ± (n/B + 1).
    val q68 = SparkEntry.queries("q68")(spark, dir)
    // mergeable partial/final shape: executors keep per-task sketches and
    // merge them — the property that removes the global sort at 100 TB
    assert(q68.queryExecution.sparkPlan.toString.contains("partial_percentile_approx"))
    val rows = q68.collect()
    assert(rows.nonEmpty)
    val data = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars").cast("long").as("len"),
        graft.queries.QueryUtil.tokenCount(col("text")).cast("long").as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val ps = Seq(0.5, 0.9, 0.99)
    // scalar columns: (p50,p90,p99)_chars at 1..3, (p50,p90,p99)_tok at 4..6
    for (r <- rows; (base, pick) <- Seq(1 -> ((t: (String, Long, Long)) => t._2),
        4 -> ((t: (String, Long, Long)) => t._3))) {
      val lang = r.getString(0)
      val sorted = data(lang).map(pick).sorted
      val n = sorted.length
      val err = n / 10000.0 + 1
      val got = (0 until 3).map(i => r.getLong(base + i))
      for ((p, v) <- ps.zip(got)) {
        val lo = sorted.count(_ < v) + 1
        val hi = sorted.count(_ <= v)
        val target = p * n
        assert(lo - err <= target && target <= hi + err,
          s"$lang col$base p=$p: value $v rank [$lo,$hi] vs target $target ± $err")
      }
    }
  }

  test("t49_fingerprint is deterministic and groups known near-dup docs") {
    val a = SparkEntry.queries("t49")(spark, dir)
      .collect().map(_.toString)
    val b = SparkEntry.queries("t49")(spark, dir)
      .collect().map(_.toString)
    assert(a.sameElements(b))
    // docs sharing a fingerprint exist (the corpus has planted near-dups,
    // and min-rolling-hash collides on heavily shared content)
    val grouped = SparkEntry.queries("t49")(spark, dir)
      .filter(col("n_docs") > 1).count()
    assert(grouped > 0, "expected at least one multi-doc fingerprint group")
    // preconditions of the DuckDB fingerprint oracle (TextOps.fingerprintOracle):
    // ASCII text (per-char ord == UTF-8 bytes) and no doc shorter than k=16
    val bad = Tables.load(spark, dir, "documents")
      .filter(length(col("text")) < 16 || col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(bad == 0, s"$bad docs violate the fingerprint-oracle preconditions")
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
    val rows = SparkEntry.queries("m61")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
    val again = SparkEntry.queries("m61")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("connected components collapses a >6-hop chain (depth-capped recursion would split it)") {
    import spark.implicits._
    // chain 0-1-2-...-19: diameter 19, far beyond the oracle CTE's depth-6
    // cap; one isolated node 100 keeps its own label
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = ((0L to 19L) :+ 100L).toDF("id")
    val comp = graft.operators.ConnectedComponents.labels(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 19L).forall(comp(_) == 0L), s"chain split: $comp")
    assert(comp(100L) == 100L)
  }

  test("connected components: empty edge set and self-loops are identity") {
    import spark.implicits._
    val nodes = (0L to 9L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val a = graft.operators.ConnectedComponents.labels(nodes, noEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 9L).forall(i => a(i) == i))
    val selfLoops = Seq((3L, 3L), (5L, 5L)).toDF("src", "dst")
    val b = graft.operators.ConnectedComponents.labels(nodes, selfLoops)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 9L).forall(i => b(i) == i))
  }

  test("connected components matches union-find on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // reference: driver-side union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val got = graft.operators.ConnectedComponents.labels(
        (0L until n.toLong).toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  // With broadcast thresholds disabled, the declarative similarity-join
  // plans must execute entirely via shuffle joins (the 100 TB regime,
  // where every side is too big to broadcast) and still produce the
  // oracle-identical pairs. Covers both the symmetric (d52) and
  // asymmetric (d62) prefix joins.
  for (q <- Seq("d52", "d62"))
    test(s"$q candidate+verify path runs without any broadcast of the docs table") {
      val conf = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val df = SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoopJoin"),
          s"broadcast join present under disabled thresholds:\n$plan")
        val shuffled = df.collect().map(_.getLong(0)).toSeq
        assert(shuffled.nonEmpty)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

  test("d52 prefix+size+positional filtering equals brute-force all-pairs Jaccard") {
    // the SSJoin filters (prefix, size, positional) must be lossless: every
    // pair with J >= t survives all three. Brute force: all doc pairs,
    // exact Jaccard on distinct word-3-gram shingle sets.
    graft.functions.GraftFunctions.register(spark)
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), expr(
        "sort_array(transform(array_distinct(" +
          "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3))) ELSE array() END), " +
          "x -> xxhash64(x)))").as("hs"))
      .filter(size(col("hs")) > 0)
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        (expr("graft_intersect_size(a.hs, b.hs)").cast("double") /
          (size(col("a.hs")) + size(col("b.hs")) -
            expr("graft_intersect_size(a.hs, b.hs)"))).as("jac"))
      .filter(col("jac") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("d52")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"filters lost ${brute.diff(got).size} true pairs, added ${got.diff(brute).size}")
  }

  test("d52 hot-shingle salt split is lossless on a boilerplate group") {
    // a hot group: 60 near-identical docs (one distinct tail token each)
    // whose prefixes are made entirely of df=60 shingles — the shape that
    // defeats rarity ranking — mixed into the real corpus. With the salt
    // bucket forced tiny (8), the hot shingles split into ceil(60/8)=8
    // buckets; the pair set must be IDENTICAL to the unsalted join's
    // (every pair meets exactly once, and c — the shared-prefix count the
    // positional filter reads — is preserved).
    graft.functions.GraftFunctions.register(spark)
    val hot = spark.range(60).select(
      (lit(900000000L) + col("id")).as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon zeta rev"), col("id")).as("text"),
      lit("en").as("lang"), lit("hot").as("source"), lit(50).as("n_chars"))
    val corpus = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").union(hot)
    val tmp = java.nio.file.Files.createTempDirectory("graft_skew_spec").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def pairs(): Set[(Long, Long)] =
      graft.queries.DedupOps.jaccardPairs(spark, tmp, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saved = graft.queries.QueryUtil.hotPrefixBucket
    try {
      // the persistKeyed prefix cache sits BELOW the salt columns (shared by
      // both runs), so flipping the knob between calls A/Bs only the join
      graft.queries.QueryUtil.hotPrefixBucket = Int.MaxValue
      val unsalted = pairs()
      graft.queries.QueryUtil.hotPrefixBucket = 8
      val salted = pairs()
      assert(salted == unsalted,
        s"salt lost ${unsalted.diff(salted).size}, added ${salted.diff(unsalted).size}")
      // the hot group's pairs are actually present (the test has teeth)
      assert(salted.count { case (a, b) => a >= 900000000L && b >= 900000000L } == 60 * 59 / 2)
    } finally graft.queries.QueryUtil.hotPrefixBucket = saved
  }

  test("d59 shard packing: consecutive shards, disjoint contiguous id ranges, conserved totals") {
    val shards = SparkEntry.queries("d59")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val base = Tables.load(spark, dir, "documents")
      .select(col("lang"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("lang").agg(count(lit(1)).as("docs"), sum("n").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    shards.groupBy(_._1).foreach { case (lang, ss) =>
      val sorted = ss.sortBy(_._2)
      // shard ids are 0..max with no gaps
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"$lang shard gaps")
      // doc ranges are disjoint and ordered: packing never splits or reorders
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$lang ranges overlap")
        case _ =>
      }
      // every doc and token lands in exactly one shard
      assert(sorted.map(_._3).sum == base(lang)._1, s"$lang doc count")
      assert(sorted.map(_._4).sum == base(lang)._2, s"$lang token total")
      // streaming-packer bound: a shard CLOSES only once its cumulative
      // tokens reach the budget, so every non-final shard holds >= one
      // budget-crossing; equivalently each non-final shard's tokens plus
      // the overshoot carried in from its predecessor is >= 2000. The
      // simple per-shard check: cumulative tokens at each non-final shard
      // boundary >= (shard_id + 1) * budget.
      var cum = 0L
      sorted.dropRight(1).foreach { sh =>
        cum += sh._4
        assert(cum >= (sh._2 + 1) * 2000, s"$lang shard ${sh._2} closed early")
      }
    }
  }

  test("d59 two-pass distributed prefix sum == single-window shard packing") {
    // The production (bucketed two-pass) packer must be bit-identical to the
    // textbook single-window form it replaces; W=128 means this corpus spans
    // multiple buckets per lang, so offset composition is actually exercised.
    val twoPass = queries.DedupOps.shardPack(spark, dir, twoPass = true).collect().toSeq
    val single = queries.DedupOps.shardPack(spark, dir, twoPass = false).collect().toSeq
    assert(twoPass == single)
  }

  test("d70 sequence packing: two-pass == single-window; fragments tile docs and fill sequences") {
    val L = 512L
    val rows = queries.DedupOps.seqPack(spark, dir, L, twoPass = true).collect()
    val single = queries.DedupOps.seqPack(spark, dir, L, twoPass = false).collect()
    assert(rows.toSeq == single.toSeq, "two-pass packing diverged from single-window")
    case class Frag(seq: Long, doc: Long, seqOff: Long, docOff: Long, len: Long)
    val frags = rows.map(r => Frag(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(frags.nonEmpty)
    assert(frags.forall(f => f.len > 0 && f.seqOff >= 0 && f.seqOff + f.len <= L))
    // every sequence except the last is filled to exactly L tokens with
    // contiguous non-overlapping fragments
    val lastSeq = frags.map(_.seq).max
    frags.groupBy(_.seq).foreach { case (s, fs) =>
      val sorted = fs.sortBy(_.seqOff)
      assert(sorted.head.seqOff == 0, s"sequence $s does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.seqOff + a.len == b.seqOff, s"gap/overlap in sequence $s")
        case _ =>
      }
      if (s != lastSeq)
        assert(sorted.map(_.len).sum == L, s"sequence $s not filled to $L")
    }
    // fragments tile each doc: contiguous doc_offs from 0, lengths summing
    // to the doc's token count, spanning CONSECUTIVE sequences
    val nTok = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), queries.QueryUtil.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    frags.groupBy(_.doc).foreach { case (d, fs) =>
      val sorted = fs.sortBy(_.docOff)
      assert(sorted.head.docOff == 0, s"doc $d does not start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.docOff + a.len == b.docOff, s"doc $d fragments not contiguous")
          assert(a.seq + 1 == b.seq, s"doc $d fragments not in consecutive sequences")
        case _ =>
      }
      assert(sorted.map(_.len).sum == nTok(d), s"doc $d fragments do not sum to its tokens")
    }
  }

  test("t58 BPE merges match a brute-force reference on constructed corpora") {
    import spark.implicits._
    // reference implementation: sequential leftmost-greedy merges
    def refBpe(ws: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
      var segs = ws.keys.map(w => w -> w.map(_.toString).toList).toMap
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      for (it <- 1 to k) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        for ((w, f) <- ws; Seq(a, b) <- segs(w).sliding(2) if segs(w).size >= 2)
          pc((a, b)) = pc.getOrElse((a, b), 0L) + f
        if (pc.nonEmpty) {
          val ((l, r), cnt) = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
          out += ((it, l, r, cnt))
          segs = segs.map { case (w, s) =>
            val o = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < s.size) {
              if (i + 1 < s.size && s(i) == l && s(i + 1) == r) { o += l + r; i += 2 }
              else { o += s(i); i += 1 }
            }
            w -> o.toList
          }
        }
      }
      out.toSeq
    }
    // run-of-identical-chars case (l = r merges are the classic off-by-one
    // trap), tie-break case (equal counts resolved by (l, r)), plus words
    // that shrink to single symbols
    val corpora = Seq(
      Map("aaaa" -> 3L, "aaa" -> 2L, "aa" -> 5L, "a" -> 7L),
      Map("banana" -> 4L, "bandana" -> 2L, "ana" -> 1L),
      Map("ab" -> 3L, "cd" -> 3L, "abcd" -> 1L),
      Map("the" -> 10L, "them" -> 5L, "theme" -> 2L, "he" -> 8L))
    for (ws <- corpora; k <- Seq(1, 3, 5)) {
      val words = ws.toSeq.toDF("word", "freq")
      val got = queries.TextOps.bpeMergesFrom(spark, words, k)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == refBpe(ws, k), s"BPE diverged on $ws at k=$k")
    }
  }

  test("t53 distinctive terms: top-3 by (tf desc, df asc, term) vs brute force") {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = toks.groupBy(identity).map { case ((d, t), xs) => (d, t, xs.length.toLong) }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val brute = tf.groupBy(_._1).flatMap { case (d, terms) =>
      terms.toSeq.sortBy { case (_, t, f) => (-f, df(t), t) }.take(3)
        .zipWithIndex.map { case ((_, t, f), i) => (d, t, f, df(t), i + 1) }
    }.toSet
    val got = SparkEntry.queries("t53")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(got == brute,
      s"missing ${brute.diff(got).size}, extra ${got.diff(brute).size}")
  }

  test("d62 containment prefix+size+positional filtering equals brute-force all ordered pairs") {
    // the asymmetric filters must be lossless: every ordered pair with
    // C(A,B) = |A∩B|/|A| >= t survives. Brute force on driver-side shingle
    // hash sets (same hashing as the operator).
    graft.functions.GraftFunctions.register(spark)
    val sets = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), expr(
        "array_distinct(CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), " +
          "i -> xxhash64(concat_ws(' ', slice(toks, i, 3)))) ELSE array() END)").as("hs"))
      .filter(size(col("hs")) > 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    val t = 0.8
    val brute = (for {
      (ida, sa) <- sets; (idb, sb) <- sets
      if ida != idb
      c = sa.intersect(sb).size
      if c.toDouble / sa.size >= t
    } yield (ida, idb)).toSet
    val got = queries.DedupOps.containmentPairs(spark, dir, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"filters lost ${brute.diff(got).size} true pairs, added ${got.diff(brute).size}")
    assert(brute.nonEmpty, "corpus has no containment pairs — spec is vacuous")
  }

  test("s58 tiled exact join equals brute-force all-pairs cosine") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val brute = a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"), expr("graft_cosine(va, vb)").as("sim"))
      .filter(col("sim") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tiled = SparkEntry.queries("s58")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(tiled == brute,
      s"missing ${brute.diff(tiled)}, extra ${tiled.diff(brute)}")
  }

  test("s74 PCA top-2: small eigen residuals, Rayleigh-dominant, orthonormal, deterministic") {
    val out = SparkEntry.queries("s74")(spark, dir).collect()
    val d = 64
    assert(out.length == d)
    val rows = out.sortBy(_.getInt(0))
    val v = rows.map(_.getDouble(2))
    val v2 = rows.map(_.getDouble(3))
    val lambda = rows.head.getDouble(4)
    val lambda2 = rows.head.getDouble(5)
    val ef = rows.head.getDouble(6)
    val ef2 = rows.head.getDouble(7)
    // brute-force centered gram from the collected corpus (double math —
    // the 1e-6 fixed-point quantization sits far inside the tolerances)
    val vecs = Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    val n = vecs.length
    val mu = Array.tabulate(d)(i => vecs.map(_(i).toDouble).sum / n)
    val g = Array.tabulate(d, d)((i, j) =>
      vecs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum)
    def mult(u: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * u(j)).sum)
    // eigenpair residual ||Gv - λv|| / λ
    val gv = mult(v)
    val res = math.sqrt(v.indices.map(i => {
      val e = gv(i) - lambda * v(i); e * e
    }).sum) / lambda
    assert(res < 1e-3, s"eigen residual $res")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9, "v1 not unit")
    // Rayleigh dominance: no fixed probe direction beats the returned λ
    for (k <- 0 until 10) {
      val raw = Array.tabulate(d)(i => math.sin(i + 1.0 + k))
      val nn = math.sqrt(raw.map(x => x * x).sum)
      val u = raw.map(_ / nn)
      val gu = mult(u)
      val r = u.indices.map(i => u(i) * gu(i)).sum
      assert(r <= lambda * (1 + 1e-6), s"probe $k Rayleigh $r beats lambda $lambda")
    }
    assert(ef > 0.0 && ef <= 1.0, s"explained fraction $ef out of range")
    // second component: orthogonal to v1, unit, its own small residual,
    // and strictly subordinate (λ2 ≤ λ1, fractions ordered)
    val dot12 = v.indices.map(i => v(i) * v2(i)).sum
    assert(math.abs(dot12) < 1e-6, s"v1·v2 = $dot12 not orthogonal")
    assert(math.abs(math.sqrt(v2.map(x => x * x).sum) - 1.0) < 1e-9, "v2 not unit")
    val gv2 = mult(v2)
    val res2 = math.sqrt(v2.indices.map(i => {
      val e = gv2(i) - lambda2 * v2(i); e * e
    }).sum) / lambda2
    assert(res2 < 1e-3, s"second eigen residual $res2")
    assert(lambda2 <= lambda * (1 + 1e-9) && ef2 <= ef && ef2 > 0.0,
      s"eigen order violated: $lambda2 vs $lambda")
    // sign canonicalized + fixed iteration count => bit-stable reruns
    val again = SparkEntry.queries("s74")(spark, dir).collect()
      .sortBy(_.getInt(0)).map(_.toString)
    assert(again.sameElements(rows.map(_.toString)), "PCA output not deterministic")
  }

  test("d86 prefix dupes equal brute-force prefix matching on a randomized planted corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // vocab small enough that anchors collide across unrelated docs (the
    // hard case for the anchor join: candidates that must FAIL the verify)
    def tok() = s"w${rnd.nextInt(6)}"
    val docs: Seq[(Long, IndexedSeq[String])] = {
      val base = (1L to 30L).map(id => id -> IndexedSeq.fill(8 + rnd.nextInt(20))(tok()))
      // plant true prefix pairs: doc 100+i is a strict prefix of doc i
      val planted = base.take(8).map { case (id, ts) =>
        (100 + id) -> ts.take(8 + rnd.nextInt(math.max(1, ts.length - 8)))
      }
      base ++ planted
    }
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = queries.DedupOps.prefixDupes(df, anchorW = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia != ib && ta.length < tb.length && tb.take(ta.length) == ta
    } yield (ia, ib)).toSet
    assert(got == exp, s"got ${got.size} pairs, expected ${exp.size}:\n" +
      s"missing ${exp.diff(got).take(5)}\nextra ${got.diff(exp).take(5)}")
    assert(exp.nonEmpty, "planted corpus produced no prefix pairs — test is vacuous")
    // sub-anchor docs: the anchor clamps to the corpus min length, so a
    // 3-token doc that prefixes a 10-token doc is still found at anchorW=8
    val tiny = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c"),
      (3L, "z z q")).toDF("doc_id", "text")
    val tinyGot = queries.DedupOps.prefixDupes(tiny, anchorW = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tinyGot == Set((2L, 1L)),
      s"sub-anchor prefix pair missed/spurious: $tinyGot")
  }

  test("d83 longest shared span equals brute-force token-level substring matching (planted spans)") {
    import spark.implicits._
    val W = 8
    // doc-unique noise vocab guarantees only the PLANTED spans cross docs
    def noise(id: Long, n: Int) = (0 until n).map(i => s"n${id}_$i")
    val span12 = (0 until 12).map(i => s"S$i")
    val span8 = (0 until W).map(i => s"T$i")
    val docs: Seq[(Long, Seq[String])] = Seq(
      1L -> (noise(1, 20) ++ span12 ++ noise(1, 15)),
      2L -> (noise(2, 5) ++ span12 ++ noise(2, 30) ++ span8),
      3L -> (span8 ++ noise(3, 25)),
      4L -> noise(4, 40), // shares nothing
      5L -> (noise(5, 10) ++ span12.take(W - 1) ++ noise(5, 10)), // sub-threshold
      6L -> (span8 ++ noise(6, 12) ++ span8) // repeated span => 2 alignments
    )
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = queries.DedupOps.longestSharedSpans(df, W).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // brute force: for every alignment offset, maximal equal-token runs
    def spansFor(a: IndexedSeq[String], b: IndexedSeq[String]): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      for (d <- -(b.length - 1) to (a.length - 1)) {
        var run = 0
        val lo = math.max(0, d); val hi = math.min(a.length, b.length + d)
        var i = lo
        while (i < hi) {
          if (a(i) == b(i - d)) run += 1
          else { if (run >= W) out += run; run = 0 }
          i += 1
        }
        if (run >= W) out += run
      }
      out.result()
    }
    val exp = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      sp = spansFor(docs(i)._2.toIndexedSeq, docs(j)._2.toIndexedSeq)
      if sp.nonEmpty
    } yield ((docs(i)._1, docs(j)._1), (sp.max.toLong, sp.size.toLong))).toMap
    assert(got == exp, s"got $got\nexp $exp")
    // the planted structure, spelled out: exact span lengths, sub-threshold
    // overlap absent, repeated span counted once per alignment
    assert(got((1L, 2L)) == ((12L, 1L)))
    assert(got((2L, 3L)) == ((8L, 1L)))
    assert(got((3L, 6L)) == ((8L, 2L)))
    assert(!got.contains((1L, 5L)) && !got.contains((2L, 5L)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("d93 negative mining: ring pairing matches an independent reference; no self/duplicate draws") {
    // independent reference: the hash permutation recomputed in plain JVM
    // code (MessageDigest, no Spark) — proves the banded two-pass global
    // rank AND the modular ring arithmetic in one equality
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull).select("doc_id")
      .collect().map(_.getLong(0))
    val perm = ids.sortBy(id => (md5hex(s"neg:$id"), id))
    val n = perm.length
    val pos = perm.zipWithIndex.toMap
    val expected = (for {
      a <- perm; j <- 1 to 2
    } yield (a, j, perm(((pos(a) + j * (n / 3)) % n).toInt))).toSet
    val out = SparkEntry.queries("d93")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every emitted pair is a ring pair (the near-dup exclusion only
    // REMOVES rows), nearly all ring pairs survive, and the basics hold
    assert(out.nonEmpty && out.toSet.subsetOf(expected),
      s"rows outside the ring pairing: ${out.toSet.diff(expected).take(3)}")
    assert(out.size >= 2 * n - math.max(2, n / 10),
      s"too many exclusions: ${2 * n - out.size} of ${2 * n}")
    assert(out.forall { case (a, _, b) => a != b }, "self-pair emitted")
    out.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length,
        s"anchor $a drew the same negative twice")
    }
    // determinism (no RNG anywhere in the draw)
    val again = SparkEntry.queries("d93")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("d94 SCD2 fold: one key shuffle, and the versions equal a JVM changelog fold") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the 100 TB claim: lag + row_number + lead all ride ONE hash exchange
    // on user_id (the trailing orderBy's range exchange is presentation)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // traversable plan
    try {
      val df = SparkEntry.queries("d94")(spark, dir)
      val hashEx = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashEx.size == 1,
        s"expected one key shuffle, got ${hashEx.size}:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = SparkEntry.queries("d94")(spark, dir)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    // JVM reference: per-user (ts, event_id)-ordered fold keeping change points
    val expected = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (uid, evs) =>
        val ordered = evs.sortBy(e => (e._4, e._2))
        val changes = ordered.foldLeft(Vector.empty[(String, Long)]) {
          case (acc, (_, _, st, t)) =>
            if (acc.isEmpty || acc.last._1 != st) acc :+ ((st, t)) else acc
        }
        changes.zipWithIndex.map { case ((st, from), i) =>
          val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
          (uid, i + 1, st, from, to, to.isEmpty)
        }
      }
    assert(got.toSeq == expected,
      s"first diff: ${got.toSeq.zip(expected).find(p => p._1 != p._2)}")
    // SCD2 invariants: consecutive states differ, exactly one open version
    got.groupBy(_._1).foreach { case (uid, vs) =>
      val seq = vs.sortBy(_._2)
      assert(seq.map(_._2).toSeq == (1 to seq.length), s"user $uid versions not contiguous")
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, s"user $uid: consecutive versions share state ${a._3}")
          assert(a._5.contains(b._4), s"user $uid: valid_to != next valid_from")
        case _ =>
      }
      assert(seq.count(_._6) == 1, s"user $uid: open-version count != 1")
    }
  }

  test("d95 quantile partials: __all__ merge equals the direct corpus-wide computation") {
    val rows = SparkEntry.queries("d95")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val all = rows.find(_._1 == "__all__").get
    // direct reference: bucket the raw corpus in one pass, no partials
    val chars = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull).select(col("n_chars")).collect()
      .map(_.getLong(0) / 64)
    val n = chars.length.toLong
    def q(p: Long): Long = {
      val counts = chars.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      counts.collectFirst { case (b, c) if { cum += c; cum * 100 >= p * n } => b * 64 }.get
    }
    assert(all == (("__all__", n, q(50), q(90), q(99))),
      s"merged row $all != direct (${q(50)}, ${q(90)}, ${q(99)}) over $n docs")
    // partials really merge: per-source n_docs sums to the corpus row's
    assert(rows.filter(_._1 != "__all__").map(_._2).sum == n)
  }

  test("d96 PPS sample: multiplicities sum to exactly m and match the single-line reference") {
    val got = SparkEntry.queries("d96")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sum == 50L, s"selection points lost: ${got.map(_._3).sum} != 50")
    // JVM reference: the same ceil arithmetic over the single global
    // cumulative-weight line (what the banded two-pass must reproduce)
    val base = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("n_chars") + lit(1L)).as("w"),
        md5(concat(lit("pps:"), col("doc_id").cast("string")).cast("binary")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(e => (e._3, e._1))
    val wtot = base.map(_._2).sum
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
    var cum = 0L
    val expected = base.flatMap { case (id, w, _) =>
      val k = ceilDiv((cum + w) * 50, wtot) - ceilDiv(cum * 50, wtot)
      cum += w
      if (k > 0) Some((id, w, k)) else None
    }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq,
      s"first diff: ${got.toSeq.zip(expected.toSeq).find(p => p._1 != p._2)}")
  }
}
