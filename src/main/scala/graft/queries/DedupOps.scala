package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication operators for LLM-data pipelines: exact (hash group-by),
  * exact-Jaccard similarity join (inverted shingle index), MinHash+LSH
  * (signature → banded bucket join → exact verify), SimHash (banded hamming
  * buckets). All pair generation goes through shuffle-on-key joins — never a
  * driver-side collect — so each scales by adding executors. The quadratic
  * all-pairs fallbacks are deliberately absent; candidate pairs only ever come
  * from co-occurrence in an (inverted-index or LSH) bucket.
  */
object DedupOps {

  /** (doc_id, text) → (doc_id, sorted distinct 64-bit word-n-gram shingle
    * hashes) on an ARBITRARY frame: distinct word n-grams (empty when < n
    * tokens — mirrored exactly by the DuckDB oracles' list comprehension),
    * xxhash64'd and sorted. ONE definition shared by the corpus path
    * ([[hashedDocs]]) and streaming micro-batches
    * (StreamingOps.ingestDedupStream probes the stored index with each
    * batch), so the stream and batch shingle rules cannot drift. n=3 is the
    * dedup default; decontamination also runs wider widths. */
  private[graft] def hashedFrame(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        array_distinct(QueryUtil.wordNgrams(col("toks"), n)).as("shingles"))
      .select(col("doc_id"),
        sort_array(expr("transform(shingles, x -> xxhash64(x))")).as("hs"))

  /** Exact-Jaccard pairs via a prefix-filtered inverted-index join (the
    * SSJoin/PPJoin prefix principle): order every doc's shingles by global
    * rarity, keep only the first n - ceil(t*n) + 1 as index entries — any
    * pair with J >= t must share an entry within BOTH prefixes (if the
    * globally-smallest common shingle sat outside either prefix, the overlap
    * would be < ceil(t*n) <= |A∩B|, a contradiction) — then verify exact
    * Jaccard on the candidates only. Exact (no false negatives), so it is
    * oracle-checked; rarest-first ordering keeps hot shingles out of the
    * index, which is what kills the quadratic blowup on skewed vocabularies
    * (24.7s -> ~3s at sf0.1, and the same property is what makes this
    * survive at 100 TB). The doc-frequency table is broadcast here; with a
    * web-scale vocabulary it would stay a shuffle join. */
  private def persistKeyed(s: SparkSession, key: String, mk: => DataFrame): DataFrame =
    QueryUtil.persistKeyed(s, key, mk) // shared session-weak memo (QueryUtil)

  /** doc_id + sorted distinct shingle hashes, persisted (read multiple times
    * by index building and candidate verification). All width-3 callers
    * (d52/d53/d60) share one persisted table. */
  private[graft] def hashedDocs(s: SparkSession, dir: String, n: Int = 3): DataFrame =
    persistKeyed(s, s"docs:$n:$dir",
      hashedFrame(Tables.load(s, dir, "documents"), n))

  /** Exact-Jaccard verify of candidate (ida, idb) pairs: two co-partitioned
    * joins — candidates to the per-doc shingle table on `ida`, then on `idb`
    * — and count intersections with the codegen'd sorted-merge kernel. No
    * `broadcast()` hint: at 100 TB the docs side IS the corpus, and forcing
    * it onto the build side is a guaranteed executor OOM. Declarative joins
    * let AQE broadcast when (and only when) a side is actually small.
    * Unordered — callers that need a sorted result add their own orderBy.
    * `left`/`right` are the (doc_id, hs) frames the pair sides resolve
    * against — identical for self-join dedup (d52/d53/d65 in-memory), the
    * batch frame vs the stored shingle table for index probes — so the
    * formula and threshold semantics cannot drift between paths. */
  private def verifyJaccard(cand: DataFrame, left: DataFrame, right: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(left.select(col("doc_id").as("ida"), col("hs").as("hsa")), "ida")
      .join(right.select(col("doc_id").as("idb"), col("hs").as("hsb")), "idb")
      .select(col("ida"), col("idb"),
        (expr("graft_intersect_size(hsa, hsb)").cast(DoubleType) /
          (size(col("hsa")) + size(col("hsb")) - expr("graft_intersect_size(hsa, hsb)"))).as("jac"))
      .filter(col("jac") >= threshold)

  /** Rarity-ranked prefix entries at `threshold`: for each doc, the first
    * n - ceil(t*n) + 1 shingle hashes under the global (df, sh) rarity
    * order, carrying (n, rk) for the size/positional filters. Shared by the
    * symmetric Jaccard join (d52: prefix x prefix) and the asymmetric
    * containment join (d62: prefix x full) — the prefix-overlap lemma backs
    * both (if A's prefix misses the other set entirely, the overlap cannot
    * reach ceil(t*|A|)). Persisted: both join sides / both operators read
    * it, and without this the shingle->freq->window subtree recomputes. */
  private def rankedPrefix(s: SparkSession, dir: String, threshold: Double): DataFrame =
    persistKeyed(s, s"prefix:$dir:$threshold", {
      import org.apache.spark.sql.expressions.Window
      val sh = hashedDocs(s, dir).select(col("doc_id"), explode(col("hs")).as("sh"))
      val freq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
      // no broadcast hint: freq is vocabulary-sized (web-scale = huge); it is
      // produced by a groupBy on `sh`, so the join on `sh` reuses that shuffle
      // partitioning, and AQE still broadcasts when it measures it small
      sh.join(freq, "sh")
        .withColumn("rk", row_number().over(wDoc))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
        // df rides along for the hot-shingle salt split in the candidate
        // join (buckets = ceil(df / hotPrefixBucket))
        .select(col("doc_id"), col("sh"), col("n"), col("rk"), col("df"))
    })

  private[graft] def jaccardPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    GraftFunctions.register(s)
    val docs = hashedDocs(s, dir)
    val prefix = rankedPrefix(s, dir, threshold)
    // Two classic SSJoin/PPJoin refinements on top of the prefix filter,
    // both conservative (epsilon slack can only over-include), so
    // exactness is preserved:
    //
    // 1. SIZE filter (in the join condition): J >= t forces
    //    min(na,nb) >= t*max(na,nb).
    //
    // 2. POSITIONAL filter (on the grouped matches): every doc's shingle
    //    list is ranked by the SAME global (df, sh) total order, so any
    //    common shingle smaller than a shared prefix entry s must sit
    //    before s in BOTH prefixes — i.e. every common element below the
    //    deepest shared prefix entry is itself a shared prefix entry.
    //    Hence |A∩B| <= (c-1) + min(na-max_i+1, nb-max_j+1), where c is
    //    the shared-prefix-entry count and (max_i, max_j) the deepest
    //    shared entry's ranks (consistent order => both maxima come from
    //    the same shingle). J >= t needs |A∩B| >= t(na+nb)/(1+t); pairs
    //    whose bound can't reach that never enter the verify join. The
    //    grouped aggregation replaces the plain distinct() at the same
    //    shuffle shape.
    //
    // Measured at 100x sf0.1 (500k docs, t=0.4, 256 shuffle partitions):
    // 44.5M distinct candidate pairs after the size filter -> 19.7M after
    // the positional filter (56% pruned); verify stage 88s -> 58s; output
    // pairs identical (25,600). Lossless-vs-brute-force asserted by
    // PipelineOpsSpec "prefix+size+positional".
    // HOT-SHINGLE SALT SPLIT. Rarity ranking keeps hot shingles out of
    // prefixes only when docs are genuinely distinct; a boilerplate group of
    // G near-identical docs has prefixes made ENTIRELY of df≈G shingles, and
    // the self-join below then builds G²/2 rows under a handful of keys —
    // single-task cartesians that AQE's skew split never touches (its
    // trigger is input partition BYTES; G=10⁴ is ~KBs of input, ~10⁸ rows of
    // output). Split each shingle's key space into ceil(df/hotPrefixBucket)
    // salt buckets: the a-side takes one deterministic bucket per doc, the
    // b-side replicates across that shingle's buckets, so every (a,b) pair
    // still meets exactly once (c, the shared-prefix count, is preserved —
    // the positional filter depends on it) while a hot key's output spreads
    // over df/bucket reducers. df ≤ bucket ⇒ 1 bucket ⇒ identical join.
    // Replication cost is b-side prefix rows × (buckets − 1): zero for
    // normal corpora, ~df/bucket× for the hot group only. Measured + A/B'd
    // vs unsalted in SCALE.md §skew (ScaleProbe d52_skew probes).
    val nbuck = greatest(lit(1L), ceil(col("df").cast(DoubleType) /
      QueryUtil.hotPrefixBucket.toDouble))
    val pa = prefix
      .withColumn("salt", pmod(xxhash64(col("doc_id")), nbuck).cast("int"))
    val pb = prefix
      .withColumn("salt", explode(sequence(lit(0), (nbuck - 1).cast("int"))))
    val cand = pa.as("a").join(pb.as("b"),
        col("a.sh") === col("b.sh") && col("a.salt") === col("b.salt") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")).cast(DoubleType) >=
            lit(threshold) * greatest(col("a.n"), col("b.n")) - lit(1e-6))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      // n is constant per doc, so max() == the value while staying
      // order-independent by construction (first() would also work today but
      // only via that constancy). NOTE: rk and n are computed over the FULL
      // shingle list BEFORE the prefix filter, under one strict global
      // (df, sh) order — the (c-1)+min(n-rk+1) positional bound is only
      // valid under exactly those two conditions; don't move their
      // computation past the filter in a refactor.
      .agg(count(lit(1)).as("c"),
        max(col("a.rk")).as("mi"), max(col("b.rk")).as("mj"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .filter((col("c") - 1 +
          least(col("na") - col("mi") + 1, col("nb") - col("mj") + 1))
            .cast(DoubleType) >=
        lit(threshold) / (1.0 + threshold) * (col("na") + col("nb")) - lit(1e-6))
      .select(col("ida"), col("idb"))
    verifyJaccard(cand, docs, docs, threshold)
  }

  /** Asymmetric CONTAINMENT join: ordered pairs (ida, idb) with
    * C(A,B) = |A∩B| / |A| >= t — the "document quoted/subsumed inside
    * another" detector (a near-dup family member Jaccard misses: a short
    * doc fully embedded in a long one has high containment but low J).
    * Exact, via the asymmetric prefix principle: if the first
    * |A| - ceil(t|A|) + 1 rarest shingles of A (rankedPrefix) all miss B,
    * then |A∩B| < ceil(t|A|) — so candidates come from prefix(A) x ALL
    * entries of B, never all pairs. Two conservative refinements mirror
    * d52's: a size filter (|B| >= t|A|, since |A∩B| <= |B|) in the join
    * condition, and a positional filter on the grouped matches — matched
    * A-ranks are all <= mi (their max) and every A-element of rank <= mi
    * in B is necessarily matched (rank <= mi <= prefix length), so
    * |A∩B| <= c + (|A| - mi); pairs whose bound can't reach t|A| skip the
    * verify join. Both proven lossless vs brute force in the spec. */
  private[graft] def containmentPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    GraftFunctions.register(s)
    val docs = hashedDocs(s, dir)
    val prefix = rankedPrefix(s, dir, threshold)
    val entries = docs.select(col("doc_id"),
      size(col("hs")).as("n"), explode(col("hs")).as("sh"))
    val cand = prefix.as("a").join(entries.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n").cast(DoubleType) >= lit(threshold) * col("a.n") - lit(1e-6))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("c"), max(col("a.rk")).as("mi"), max(col("a.n")).as("na"))
      .filter((col("c") + col("na") - col("mi")).cast(DoubleType) >=
        lit(threshold) * col("na") - lit(1e-6))
      .select(col("ida"), col("idb"))
    cand
      .join(docs.select(col("doc_id").as("ida"), col("hs").as("hsa")), "ida")
      .join(docs.select(col("doc_id").as("idb"), col("hs").as("hsb")), "idb")
      .select(col("ida"), col("idb"),
        (expr("graft_intersect_size(hsa, hsb)").cast(DoubleType) /
          size(col("hsa"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  private def oracleJaccard(threshold: Double): String =
    oracleJaccardCore(threshold) + "\nORDER BY ida, idb"

  /** Unordered pair query, composable as a CTE body (d51). */
  private[graft] def oracleJaccardCore(threshold: Double): String =
    s"""WITH sh AS (
       | SELECT doc_id, unnest(list_distinct(
       |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
       | FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS s FROM documents)
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |common AS (
       | SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
       | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       | GROUP BY 1, 2)
       |SELECT ida, idb, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
       |FROM common
       | JOIN sizes sa ON sa.doc_id = ida
       | JOIN sizes sb ON sb.doc_id = idb
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold""".stripMargin

  /** Shard packing (d59): stream each language's docs (in stable doc_id
    * order) into contiguous training shards of ~2000 tokens. A doc's shard
    * is floor(exclusive-prefix-sum / budget): the standard streaming packer
    * that admits the overflowing doc into the current shard and starts the
    * next one after it (no doc is split, every shard except the last
    * overshoots by < one doc). Pure integer arithmetic => bit-exact oracle.
    *
    * twoPass = false is the textbook single-window form: one prefix-sum
    * window PARTITIONed BY lang. With ~5 languages that serializes the whole
    * corpus onto ~5 tasks no matter how many executors exist, and a dominant
    * language concentrates most of 100 TB on ONE — correct, but a genuine
    * scale-killer. Kept only as the equivalence-spec baseline.
    *
    * twoPass = true is the production form — a distributed prefix sum:
    *  1. bucket docs by (lang, doc_id div W): monotone in doc_id, so
    *     bucket-major order IS doc_id order; bucket count grows with the
    *     corpus, so parallelism ∝ data, not ∝ #languages;
    *  2. local exclusive prefix sums per (lang, bucket) — each bucket is an
    *     independent task;
    *  3. per-bucket token totals (one row per bucket — a tiny aggregate),
    *     exclusive-prefix-summed per lang: the only remaining per-lang
    *     window runs over #buckets rows, not #docs;
    *  4. broadcast the offsets back: cum_before = bucket_offset + local_cum.
    * The audit output (per-shard doc/token counts) is a partial/final hash
    * aggregate either way.
    */
  /** Doc-level shard assignment (doc_id, lang, n_tok, shard) — the packing
    * decision shardPack summarizes and writeShards materializes. */
  private[graft] def shardAssign(s: SparkSession, dir: String, twoPass: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2000L
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        QueryUtil.tokenCount(col("text")).cast(LongType).as("n_tok"))
    val withCum =
      if (!twoPass) {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        toks.withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      } else {
        // W sized so a bucket's rows fit one task comfortably; small here so
        // sf0.01 already exercises multi-bucket composition (prod: ~1e6).
        val W = 128L
        val bucketed = toks.withColumn("bkt", expr(s"doc_id div $W"))
        val wLocal = Window.partitionBy(col("lang"), col("bkt"))
          .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
        val local = bucketed
          .withColumn("local_cum", coalesce(sum(col("n_tok")).over(wLocal), lit(0L)))
        val wOff = Window.partitionBy(col("lang")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = bucketed.groupBy(col("lang"), col("bkt"))
          .agg(sum(col("n_tok")).as("bkt_tok"))
          .withColumn("offset", coalesce(sum(col("bkt_tok")).over(wOff), lit(0L)))
          .select(col("lang").as("o_lang"), col("bkt").as("o_bkt"), col("offset"))
        local.join(broadcast(offsets),
            col("lang") === col("o_lang") && col("bkt") === col("o_bkt"))
          .withColumn("cum_before", col("local_cum") + col("offset"))
      }
    withCum
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("shard"))
  }

  /** Global EXCLUSIVE prefix sum of `n_tok` in doc_id order — the d59
    * two-pass scheme without the per-lang partition: bucket-local windows
    * (each bucket's rows sort in one task) plus a broadcast bucket-offset
    * table. The offsets table is corpus/W rows; at a scale where IT
    * outgrows one task the same construction recurses (buckets of
    * buckets). Single-pass variant kept for the equivalence spec. */
  private def cumBefore(toks: DataFrame, twoPass: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (!twoPass) {
      val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
      toks.withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
    } else {
      val W = 128L
      val bucketed = toks.withColumn("bkt", expr(s"doc_id div $W"))
      val wLocal = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = bucketed
        .withColumn("local_cum", coalesce(sum(col("n_tok")).over(wLocal), lit(0L)))
      val wOff = Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bucketed.groupBy(col("bkt"))
        .agg(sum(col("n_tok")).as("bkt_tok"))
        .withColumn("offset", coalesce(sum(col("bkt_tok")).over(wOff), lit(0L)))
        .select(col("bkt").as("o_bkt"), col("offset"))
      local.join(broadcast(offsets), col("bkt") === col("o_bkt"))
        .withColumn("cum_before", col("local_cum") + col("offset"))
    }
  }

  /** Context-window SEQUENCE packing (d70) — the training-data final mile
    * after d59's shard packing: concatenate the corpus token stream in
    * doc_id order and chop it into fixed-`L` training sequences, emitting
    * the boundary bookkeeping a training loader replays: doc fragment
    * [doc_off, doc_off+len) of `doc_id` fills [seq_off, seq_off+len) of
    * sequence `seq_id`. Docs spanning a boundary SPLIT across consecutive
    * sequences (the standard packed-sequence regime: zero padding except
    * the final sequence). Everything after the global prefix sum is
    * scan-local arithmetic — the fragment rows are pure closed-form
    * functions of (cum_before, n_tok), so the operator costs one two-pass
    * prefix sum + one generator explode regardless of L. */
  private[graft] def seqPack(s: SparkSession, dir: String, L: Long,
      twoPass: Boolean): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), QueryUtil.tokenCount(col("text")).cast(LongType).as("n_tok"))
    seqPackFrame(toks, L, twoPass).orderBy(col("seq_id"), col("seq_off"))
  }

  /** The d70 packing rule over an ARBITRARY (doc_id, n_tok) cost frame —
    * one definition for the text-token path (d70) and the multimodal
    * token+patch path (m65), so the two packers cannot drift. Unordered;
    * callers order. */
  private[graft] def seqPackFrame(toks: DataFrame, L: Long,
      twoPass: Boolean): DataFrame = {
    val g0 = greatest(col("cum_before"), col("seq_id") * L)
    cumBefore(toks.filter(col("n_tok") > 0), twoPass)
      .select(col("doc_id"), col("n_tok"), col("cum_before"),
        explode(expr(s"sequence(cum_before div $L, (cum_before + n_tok - 1) div $L)"))
          .as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        (g0 - col("seq_id") * L).as("seq_off"),
        (g0 - col("cum_before")).as("doc_off"),
        (least(col("cum_before") + col("n_tok"), (col("seq_id") + 1) * L) - g0).as("len"))
  }

  private[graft] def shardPack(s: SparkSession, dir: String, twoPass: Boolean): DataFrame =
    shardAssign(s, dir, twoPass)
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"))

  /** Materialize the packed corpus — the end-of-pipeline EXPORT: every doc
    * joined to its shard assignment and written hive-partitioned by
    * (lang, shard), so one training shard = one partition directory that a
    * reader (or the training loader) prunes to directly. The join is a
    * co-partitioned equi-join on doc_id; the sink repartitions by the
    * partition columns so each shard directory is written by one task
    * (Sinks.writePartitioned). OperatorsSpec asserts directory layout ==
    * d59's shard summary and single-shard partition-pruned reads. */
  def writeShards(s: SparkSession, dir: String, out: String,
      twoPass: Boolean = true): Unit =
    graft.sources.Sinks.writePartitioned(
      Tables.load(s, dir, "documents").drop("lang")
        .join(shardAssign(s, dir, twoPass).select(
          col("doc_id"), col("lang"), col("shard")), "doc_id"),
      out, Seq("lang", "shard"))

  /** 32-bit interleave of two dimensions' low 16 bits — the z-value d68
    * audits and [[writeZOrdered]] sorts by. ONE definition so the audit and
    * the layout cannot drift. Scan-local codegen bit arithmetic. */
  private[graft] def zValue(a0: Column, b0: Column): Column = {
    val a = a0.bitwiseAND(lit(65535L))
    val b = b0.bitwiseAND(lit(65535L))
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Materialize the z-ordered layout d68 AUDITS — the production write:
    * range-partition the frame on the interleaved z-value of
    * (`n_chars`, `doc_id`) into `nFiles` contiguous z-ranges, sort within
    * each, and write one file per range. Because a contiguous z-range
    * bounds BOTH underlying dimensions, every file's parquet footer
    * min/max is a tight box on both columns — a range predicate on EITHER
    * column then skips most files/row-groups on stats alone (measured in
    * OperatorsSpec against a doc_id-sorted layout of the same file count:
    * the id-sorted layout skips nothing on n_chars). Cost = one range
    * exchange (the same shuffle any total sort pays) + the write; the
    * z-value itself is scan-local codegen arithmetic. */
  def writeZOrdered(s: SparkSession, dir: String, out: String, nFiles: Int): Unit =
    Tables.load(s, dir, "documents")
      .withColumn("z", zValue(col("n_chars").cast(LongType), col("doc_id")))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)

  /** Cross-document repeated n-gram (window) detection — the word-level
    * form of exact-substring dedup (train-set boilerplate removal: headers,
    * footers, license blocks, templated paragraphs that exact/near doc-level
    * dedup misses because the REST of the doc differs). Every W-word window
    * is keyed by md5 over the space-joined words (engine-portable, so the
    * DuckDB oracle checks it end-to-end, unlike the engine-specific rolling
    * kernel of t49); a window whose key occurs in ≥2 DISTINCT docs is
    * boilerplate. Per-doc report: window count, repeated-window count, and
    * the repeated fraction — the score a cleaning pass thresholds on.
    *
    * Scale shape: the window explode is scan-local (rows ∝ corpus tokens ×1,
    * the same blow-up every shingle operator here carries); the key count is
    * ONE partial/final hash agg — map-side combine absorbs within-partition
    * repeats of hot boilerplate keys, which is exactly where the skew lives,
    * so the reduce side sees one partial per (key, partition), not one row
    * per occurrence; the count join back is co-partitioned with the agg
    * output (both exchange on wkey); the per-doc agg shuffles doc-sized
    * rows. Nothing is broadcast, nothing is corpus² — linear end to end. */
  private[graft] def repeatedNgrams(s: SparkSession, dir: String, w: Int): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= w)
    val wins = toks.select(col("doc_id"), explode(expr(
      s"transform(sequence(1, size(t) - ${w - 1}), " +
        s"i -> md5(cast(concat_ws(' ', slice(t, i, $w)) as binary)))")).as("wkey"))
    // r16 note: a (wkey, doc_id, c) pre-fold before the count-join was
    // tried and MEASURED SLOWER at sf0.1 (1.91 -> 2.31 s): 8-gram windows
    // are near-unique within a doc, so the extra hash aggregate reduced
    // nothing — reverted (guide §1: measure).
    // "occurs in >= 2 DISTINCT docs" is decided by min(doc_id) ≠
    // max(doc_id) — a pure partial/final min/max agg — instead of
    // countDistinct, whose Expand rewrite doubled the shuffle and forced
    // the sort-based agg fallback (2.4 GB spill at the ×100 probe; the
    // min/max form spills zero and runs 2.3× faster, SCALE.md r8 table).
    // The count join back stays co-partitioned with the agg on wkey.
    val cnt = wins.groupBy(col("wkey"))
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("rep"))
    // SHUFFLE_HASH, not SMJ: the probe side is the full window stream and
    // sort-merge would sort it (the remaining ×100 spill); the build side
    // is one boolean per DISTINCT key — per-partition it stays hash-table
    // sized at any corpus (keys/partitions, with partitions ∝ data), so
    // hashing the small side and streaming the big one never sorts.
    wins.join(cnt.hint("shuffle_hash"), "wkey")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_win"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("n_rep"))
      .select(col("doc_id"), col("n_win"), col("n_rep"),
        (col("n_rep").cast(DoubleType) / col("n_win").cast(DoubleType)).as("rep_frac"))
      .orderBy(col("doc_id"))
  }

  /** d81's boilerplate strip-and-rebuild over an ARBITRARY tokenized frame
    * (doc_id, t: array<string>) — ONE definition shared by the d81
    * contract query and the d82 pipeline stage, so the cleaning rule
    * cannot drift. Every token covered by a 3-gram occurring in
    * >= greatest(5, 0.3% of docs) of the INPUT frame is cut (the
    * corpus-proportional threshold — a fixed df cutoff degenerates under
    * growth, measured in r8) and the text is rebuilt from survivors via
    * the graft_strip_spans boolean-mask kernel (O(tokens) per doc).
    * Returns (doc_id, n_tok, n_removed, kept, cleaned); the gram table
    * and the per-doc result are memo-persisted under `cacheKey` — the
    * result BEFORE any sort, because orderBy's range-sampling job
    * otherwise re-executes the whole subtree (measured 4.4 s vs 1.4 s). */
  private[graft] def boilerplateStripFrame(s: SparkSession, cacheKey: String,
      t: DataFrame): DataFrame = {
    GraftFunctions.register(s)
    // persisted: the df-count branch AND the position-probe branch both
    // read the positional gram table — without the memo the wordNgrams
    // subtree computes twice per run
    val grams = persistKeyed(s, s"$cacheKey:grams", t.select(col("doc_id"),
      posexplode(QueryUtil.wordNgrams(col("t"), 3)).as(Seq("p", "g"))))
    // integer threshold, identical arithmetic in the oracle: both engines
    // compute greatest(5, ceil(n_docs*3/1000)) from the same exact count
    val thr = t.agg(greatest(lit(5L), ceil(count(lit(1)) * 3 / 1000.0)).as("thr"))
    val hot = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("dfc"))
      .join(broadcast(thr)).filter(col("dfc") >= col("thr")).select(col("g"))
    val flagged = grams.join(hot, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("p")).as("fp"))
    persistKeyed(s, s"$cacheKey:out", t.join(flagged, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        "graft_strip_spans(t, coalesce(fp, cast(array() as array<int>)), 3)"))
      .select(col("doc_id"), size(col("t")).as("n_tok"),
        (size(col("t")) - size(col("kept"))).as("n_removed"),
        col("kept"), concat_ws(" ", col("kept")).as("cleaned")))
  }

  /** d63's per-(source, quality-keep, split) partial aggregates — ONE
    * shared stage for the one-shot report (d63), the delta refresh (d84)
    * and the stored-state spec, so the three cannot drift. The aggregate
    * is algebraic: (n_docs, n_tokens) merge by addition, which is what
    * makes the report incrementally maintainable. */
  private[graft] def reportPartials(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        QueryUtil.qualityKeep(col("text")).as("keep"),
        QueryUtil.splitAssign(col("doc_id")).as("split"),
        QueryUtil.tokenCount(col("text")).cast(LongType).as("n_tok"))
      .groupBy(col("source"), col("keep"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Refreshed data card = stored report state ⊕ a new batch's partials —
    * a pure additive merge, no corpus rescan; ≡ full recompute (d84's
    * driver oracle + the chained-delta spec). State rows are
    * group-cardinality-sized, so this costs O(batch) at any corpus. */
  private[graft] def reportDelta(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(reportPartials(batch))
      .groupBy(col("source"), col("keep"), col("split"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Variable-length exact-substring match per doc pair (the suffix-array
    * capability of Lee et al.'s dedup, re-expressed Spark-first): for every
    * pair sharing a token span of >= `W` tokens, the LONGEST shared span
    * length and the number of maximal shared spans — without a suffix
    * array and without any iterative extend loop.
    *
    * Key identity: a shared span of length L >= W contains exactly
    * L − W + 1 aligned anchor W-grams, all with the SAME alignment offset
    * pa − pb. So: explode positional W-grams, equi-join on the gram string
    * (exact — no hash collisions), and inside each (pair, offset) group
    * find maximal runs of consecutive pa via gaps-and-islands
    * (pa − row_number() is constant within a run); longest span =
    * max run + W − 1. One gram-keyed shuffle join + one window + two
    * aggregates — every stage partition-parallel.
    *
    * Scale: gram-join fan-out concentrates on hot anchors exactly like
    * d52's hot shingles (same salting remedy); at corpus scale you run
    * d81's boilerplate strip FIRST so template 8-grams don't anchor-join
    * the world (capping anchor df would bound the join but shortens
    * reported runs — kept exact here). */
  private[graft] def longestSharedSpans(docs: DataFrame, W: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"),
        posexplode(QueryUtil.wordNgrams(col("t"), W)).as(Seq("p", "g")))
    val m = g.select(col("doc_id").as("ida"), col("p").as("pa"), col("g"))
      .join(g.select(col("doc_id").as("idb"), col("p").as("pb"), col("g")), Seq("g"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), col("pa"), col("pb"))
    // r16 (guide §2.4: avoid the sort): per (pair, offset) the aligned
    // anchor positions are UNIQUE (each gram row pairs once) and bounded
    // by the shorter doc's length, so maximal runs come from one
    // hash-aggregated sorted array + a scan-local walk instead of a
    // window over the sorted match stream (drops the big SortExec and the
    // extra island-keyed aggregation; the run/maximal-run identity is
    // unchanged: runs of consecutive pa, max + W−1, count of runs).
    m.withColumn("d", col("pa") - col("pb"))
      .groupBy(col("ida"), col("idb"), col("d"))
      .agg(sort_array(collect_list(col("pa"))).as("ps"))
      .withColumn("rw", expr(
        """aggregate(
           |  ps,
           |  named_struct('prev', -2, 'cur', 0L, 'mx', 0L, 'n', 0L),
           |  (st, x) -> CASE WHEN x = st.prev + 1
           |    THEN named_struct('prev', x, 'cur', st.cur + 1L,
           |      'mx', greatest(st.mx, st.cur + 1L), 'n', st.n)
           |    ELSE named_struct('prev', x, 'cur', 1L,
           |      'mx', greatest(st.mx, 1L), 'n', st.n + 1L) END)""".stripMargin))
      .groupBy(col("ida"), col("idb"))
      .agg((max(col("rw.mx")) + lit(W - 1)).as("longest_tok"),
        sum(col("rw.n")).as("n_spans"))
      .orderBy(col("ida"), col("idb"))
  }

  /** Prefix-truncation pairs of an arbitrary (doc_id, text) frame: every
    * (short, long) pair where short's ENTIRE token stream is a strict
    * prefix of long's. Candidates via a first-W-token anchor equi-join,
    * then EXACT verification against the long doc's first n_short tokens.
    * Completeness requires W ≤ the shortest doc's token count (a shorter
    * doc's anchor is its whole stream, which cannot equal a long doc's
    * W-token anchor) — so W = min(anchorW, corpus min length), computed
    * as a 1-row guard scalar. A smaller W only widens the candidate set;
    * the verify keeps the output identical. See the d86 map entry for the
    * full scale story. */
  private[graft] def prefixDupes(docs: DataFrame, anchorW: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val minRow = toks.agg(min(size(col("t")))).first()
    val w = math.max(1, math.min(anchorW,
      if (minRow.isNullAt(0)) anchorW else minRow.getInt(0)))
    val d = toks
      .withColumn("n", size(col("t")))
      .withColumn("anchor", concat_ws(" ", slice(col("t"), 1, w)))
    val a = d.select(col("doc_id").as("short_id"), col("t").as("ta"),
      col("n").as("n_short"), col("anchor"))
    val b = d.select(col("doc_id").as("long_id"), col("t").as("tb"),
      col("n").as("n_long"), col("anchor"))
    a.join(b, "anchor")
      .filter(col("n_short") < col("n_long") &&
        concat_ws(" ", slice(col("tb"), lit(1), col("n_short"))) ===
          concat_ws(" ", col("ta")))
      .select(col("short_id"), col("long_id"), col("n_short"), col("n_long"))
      .orderBy(col("short_id"), col("long_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Word-level exact-substring (boilerplate) detection over 8-gram
    // windows; full DuckDB oracle (md5 window keys are engine-portable).
    "d71_repeated_ngrams" -> ((s, dir) => repeatedNgrams(s, dir, 8)),

    // Exact dedup: one-row corpus summary (total vs content-distinct rows).
    "d50_dedup_exact" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(md5(col("text"))).as("n_unique"))
    }),

    // Prefix-truncation dedup: docs whose ENTIRE token stream is a prefix
    // of a strictly longer doc — the crawler-truncation / re-crawl artifact
    // the near-dup family systematically misses (Jaccard(prefix, full)
    // falls below any usable threshold once the long doc is 2×+ longer).
    // Candidates via a first-W-token anchor equi-join, W = min(8, corpus
    // min doc length) so sub-8-token docs cannot be silently missed (this
    // corpus' min is 10, so W = 8; at web scale the anchor carries d52's
    // hot-anchor salt), then EXACT verification: the long doc's first
    // n_short tokens equal the short doc's stream, compared tokenizer-
    // normalized so raw-whitespace differences can't fake a mismatch.
    // Candidate count is Σ_anchor shorts×longs — corpus-linear on natural
    // text where 8-token openings are near-unique.
    "d86_prefix_dupes" -> ((s, dir) =>
      prefixDupes(Tables.load(s, dir, "documents"), anchorW = 8)),

    // Corpus snapshot diff — the dataset-versioning audit between two
    // releases: FULL OUTER join on doc_id over content hashes classifies
    // every doc as added / removed / changed / unchanged, rolled up with a
    // sample id per class. The day-2 snapshot here is derived
    // deterministically from the same table (drop %97, edit %11, add %13
    // under offset ids) so the operator is self-contained and exactly
    // oracle-able; on real data v2 is just the second table. Scale: one
    // doc_id-keyed full-outer hash join on md5 digests (no text shuffled),
    // then a 4-group agg — the join is the only corpus-sized exchange.
    "d89_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.select(col("doc_id"), md5(col("text")).as("h1"))
      val v2 = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h2"))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            md5(concat(lit("new "), col("text"))).as("h2")))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("sample_id"))
        .orderBy(col("status"))
    }),

    // Mergeable DISTINCT-count sketch partials — the incremental-distinct
    // pattern d84 applies to algebraic counts, extended to the one
    // aggregate that is NOT algebraic: store one sketch per source, and
    // any later rollup (whole-corpus distinct, day-2 merge with a new
    // batch's sketch) is a merge of stored partials — no rescan of
    // history. At 100 TB this is the difference between "count distinct =
    // full corpus pass" and "read k sketch rows". The partial here is the
    // TRANSPARENT HLL++ register form (HllMirror.registersDf — one
    // (source, idx, max-rho) row per non-zero register of the p=9 sketch
    // over a 60-bit md5-derived doc key): mergeable by max per idx
    // (associative, order- and duplicate-blind), engine-portable (no
    // binary blob — DuckDB can both rebuild AND merge the same rows), and
    // therefore EXACTLY oracle-able end-to-end, unlike an opaque
    // hll_sketch_agg blob. Output: per-source estimate next to the exact
    // count, plus the union-of-partials "__all__" row whose registers are
    // the per-source max-merge — the stored-partials rollup itself is what
    // the oracle hash-checks. Spec adds: merge-estimate ≡ direct
    // whole-corpus estimate (exact equality — max is associative), and the
    // hll_sketch_agg/hll_union_agg engine surface stays capability-tested.
    "d88_hll_partials" -> ((s, dir) => {
      val p = 9 // the approx_count_distinct default (q13's mirrored regime)
      val docs = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
      // 60-bit doc key from md5 — the cross-engine hash idiom (d74/t61),
      // wide enough that corpus-scale collisions are ~n²/2^61
      val keyed = docs.select(col("source").as("g"),
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")
          .as("v"))
      val partials = HllMirror.registersDf(keyed, Seq("g"), p)
      val merged = partials.groupBy(col("idx")).agg(max(col("mr")).as("mr"))
        .select(lit("__all__").as("g"), col("idx"), col("mr"))
      val ests = HllMirror.estimateDf(partials.unionByName(merged), p)
      // r16 note: a shared (source, text) distinct feeding both count
      // branches was tried and A/B-measured marginally SLOWER at sf0.1
      // (ABProbe min 200 vs 222 ms on this branch) — the partial-distinct
      // countDistinct aggregates dedupe map-side just as well without the
      // second text re-shuffle. Kept as-is (guide §1: measure first).
      val exact = docs.groupBy(col("source").as("g"))
        .agg(countDistinct(col("text")).as("n_exact"))
        .unionByName(docs.agg(countDistinct(col("text")).as("n_exact"))
          .select(lit("__all__").as("g"), col("n_exact")))
      ests.join(exact, "g")
        .select(col("g").as("source"), col("est"), col("n_exact"))
        .orderBy(col("source"))
    }),

    // EXACT-count stratified sampling — "exactly n docs per language",
    // the dataset-assembly op next to d55's fractional split and d74's
    // fractional hash sample: deterministic md5-rank within each stratum,
    // top-n by rank. No RNG, no reservoir, reproducible across
    // runs/clusters/partitionings. Scale: the rank-<=n filter rewrites to
    // WindowGroupLimit (plan-gated like t68), so each map task forwards at
    // most n rows per stratum to the shuffle — state ∝ strata·n, never
    // corpus-sized; the salt prefix decorrelates this sample from every
    // other hash-keyed decision (d74's rule).
    "d87_stratified_sample" -> ((s, dir) => {
      val n = 20
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("d87:"), col("doc_id").cast(StringType))),
          col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n)
        .orderBy(col("lang"), col("rk"))
    }),

    // The actual dedup decision: keep-list after near-dup removal. Rule:
    // drop a doc iff ANY smaller doc_id is near-identical (J >= 0.8) — one
    // deterministic anti-join, no iteration. Note this is deliberately NOT
    // transitive greedy selection: on a chain A~B~C (A!~C) it drops both B
    // and C, trading a little over-dropping for a single-pass shuffle plan
    // (transitive keep-first needs connected components / iterative passes).
    "d51_dedup_keep" -> ((s, dir) => {
      val docs = hashedDocs(s, dir).select(col("doc_id")) // already persisted
      val dropped = jaccardPairs(s, dir, 0.8).select(col("idb").as("doc_id"))
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),

    // Deterministic stratified train/val split — the dataset-assembly step
    // after dedup: stable id-based assignment (no RNG, reproducible across
    // runs/clusters), per-language counts as the audit output.
    "d55_train_split" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          QueryUtil.splitAssign(col("doc_id")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("split"))
    }),

    // Component-wise dedup: true distributed connected components
    // (min-label propagation + pointer jumping, O(log diameter) shuffle
    // rounds — graft.operators.ConnectedComponents) over the symmetrized
    // near-dup edge set; representative = min doc_id in the component. The
    // DuckDB oracle is a depth-6 recursive CTE, which agrees because this
    // corpus' components are tiny; unlike the recursion, the operator is
    // depth-unbounded (a >6-hop duplicate chain still collapses to ONE
    // representative — proven in PipelineOpsSpec on a 20-node chain).
    "d56_dedup_components" -> ((s, dir) => {
      ccLabels(s, dir).select(col("id").as("doc_id"), col("comp").as("rep"))
        .orderBy(col("doc_id"))
    }),

    // Cluster-canonical mapping — the dedup LINEAGE artifact a production
    // pipeline ships next to its keep-list: every doc mapped to the
    // canonical member of its near-dup cluster, canonical = highest quality
    // (token count; ties to the lower doc_id). d56 labels the clusters,
    // d73 picks pairwise winners; this is the transitive version — ONE
    // representative per whole cluster, chosen globally, so downstream
    // training configs and attribution reports reference a stable id.
    // Cost on top of the shared component labels: one id-keyed join to the
    // per-doc quality table + one per-component argmax aggregate (struct
    // max — partial/final, no window) + one map-back join, all
    // component-key-partitioned.
    "d77_canonical_map" -> ((s, dir) => {
      val labels = ccLabels(s, dir) // (id, comp), memoized with d56
      val q = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tok"))
      val best = labels.join(q, col("id") === col("doc_id"))
        .groupBy(col("comp"))
        .agg(max(struct(col("n_tok"), (-col("doc_id")).as("negid"))).as("b"))
        .select(col("comp"), (-col("b.negid")).as("canonical"),
          col("b.n_tok").as("canon_ntok"))
      labels.join(best, "comp")
        .select(col("id").as("doc_id"), col("comp").as("rep"),
          col("canonical"), col("canon_ntok"))
        .orderBy(col("doc_id"))
    }),

    // Duplicate-cluster size spectrum — the dedup audit that tells you
    // WHAT KIND of duplication a corpus carries: many tiny clusters
    // (mirror pairs) vs a few giant ones (template farms) drive opposite
    // remedies (pairwise keep-one vs boilerplate stripping). Rows:
    // (cluster size, number of clusters, docs covered) over the J>=0.8
    // near-dup components INCLUDING singletons — the spectrum sums to the
    // corpus, so it doubles as a coverage check. Scale shape: reuses the
    // memoized d56/d77 component labels (pointer-jumping CC, O(log
    // diameter) rounds); then ONE component-keyed count + ONE
    // spectrum-sized count — the frequency-of-frequencies pattern (t70)
    // on cluster ids.
    "d91_cluster_spectrum" -> ((s, dir) => {
      val sizes = ccLabels(s, dir)
        .groupBy(col("comp")).agg(count(lit(1)).as("csize"))
      sizes.groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("csize") * col("n_clusters"))
        .orderBy(col("csize"))
    }),

    // Centrality-canonical selection — d77 picks each cluster's canonical
    // by document QUALITY; this picks it by GRAPH CENTRALITY: the member
    // with the largest total similarity to the rest of its cluster (the
    // medoid of the J>=0.8 similarity graph — the "most representative
    // duplicate", the keep-rule dedup literature prefers when quality
    // signals are unreliable). Edge weights are floor(jac·1e9) BIGINTs
    // (the t60 quantize-before-sum rule: double partial-sum order varies
    // across shuffles; integer sums do not). Cost on top of the memoized
    // pairs + labels: one edge-keyed weighted-degree agg + one
    // per-component struct-argmax — report-sized output (one row per
    // multi-doc cluster), everything partial/final aggregated.
    "d92_central_rep" -> ((s, dir) => {
      val e = jaccardPairs(s, dir, 0.8)
        .select(col("ida"), col("idb"),
          floor(col("jac") * 1e9).cast(LongType).as("jq"))
      val deg = e.select(col("ida").as("id"), col("jq"))
        .unionAll(e.select(col("idb").as("id"), col("jq")))
        .groupBy(col("id"))
        .agg(sum(col("jq")).as("wdeg"))
      // inner join: every member of a >=2-doc component has >= 1 edge, so
      // nothing is lost; singleton clusters (trivially self-representative)
      // stay out of the report
      ccLabels(s, dir).join(deg, "id")
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("wdeg"), (-col("id")).as("negid"))).as("b"))
        .select(col("comp").as("cluster"), col("n_members"),
          (-col("b.negid")).as("central_id"), col("b.wdeg").as("central_wdeg_q"))
        .orderBy(col("cluster"))
    }),

    // Deterministic negative-pair mining — the contrastive-training
    // counterpart of the near-dup (positive-pair) miners: k pseudo-random
    // negatives per anchor, reproducible across runs/clusters (no RNG —
    // the d55/d87 salted-md5 discipline), with accidental near-dups
    // EXCLUDED by exact verify. The hash permutation is a global rank
    // built the sanctioned way (d59/d90's banded two-pass: 256 md5-prefix
    // bands, per-band row_number, 256-row offset window — never one
    // corpus-sized unpartitioned sort); negative j sits j·(n div (k+1))
    // positions along the hash ring (0 < s_j < n, pairwise distinct, so an
    // anchor never draws itself or the same negative twice). Candidates
    // are k·n pairs; each is verified by the exact shingle-intersection
    // kernel (linear, id-keyed joins — never a pair blowup), and pairs at
    // jaccard >= 0.8 are dropped: a "negative" that is secretly a near-dup
    // poisons the contrastive objective.
    "d93_negative_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      GraftFunctions.register(s)
      val k = 2
      val tagged = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), md5(concat(lit("neg:"),
          col("doc_id").cast(StringType)).cast(BinaryType)).as("h"))
        // band = first two hex chars: a PREFIX of the sort key, so
        // band-major + in-band (h, id) order IS the global (h, id) order
        .withColumn("band", expr("cast(conv(substring(h, 1, 2), 16, 10) as int)"))
      val local = tagged.withColumn("lr", row_number().over(
        Window.partitionBy(col("band")).orderBy(col("h"), col("doc_id"))) - 1)
      val offs = local.groupBy(col("band")).agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum(col("bn")).over(
          Window.orderBy(col("band"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("band"), col("off"))
      val ranked = local.join(broadcast(offs), "band")
        .select(col("doc_id"), (col("off") + col("lr")).as("r"))
      val n = ranked.groupBy().agg(count(lit(1)).as("n"))
      val cand = ranked.crossJoin(broadcast(n))
        .select(col("doc_id").as("anchor"),
          explode(sequence(lit(1), lit(k))).as("j"), col("r"), col("n"))
        .select(col("anchor"), col("j"),
          pmod(col("r") + col("j") * expr(s"n div ${k + 1}"), col("n")).as("tr"))
        .join(ranked.select(col("r").as("tr"), col("doc_id").as("neg_id")), "tr")
      val hs = hashedDocs(s, dir)
      cand
        .join(hs.select(col("doc_id").as("anchor"), col("hs").as("hsa")), "anchor")
        .join(hs.select(col("doc_id").as("neg_id"), col("hs").as("hsb")), "neg_id")
        .select(col("anchor"), col("j"), col("neg_id"),
          expr("graft_intersect_size(hsa, hsb)").as("c"),
          (size(col("hsa")) + size(col("hsb"))).as("ss"))
        .select(col("anchor"), col("j"), col("neg_id"),
          when(col("ss") - col("c") === 0, lit(0L))
            .otherwise(floor(col("c").cast(DoubleType) / (col("ss") - col("c")) * 1e9)
              .cast(LongType)).as("jq"))
        .filter(col("jq") < 800000000L)
        .orderBy(col("anchor"), col("j"))
    }),

    // Deterministic corpus rebalancing — the mixture-weighting step of
    // dataset assembly: downsample the majority language (en keeps 1 doc in
    // 4 by id residue, others keep all) with NO RNG, so the sample is
    // reproducible across runs/clusters and the decision is a scan-local
    // scalar predicate (zero shuffle beyond the audit aggregation).
    "d57_lang_rebalance" -> ((s, dir) => {
      val keep = col("lang") =!= "en" || col("doc_id") % 4 === 0
      Tables.load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_before"),
          count(when(keep, 1)).as("n_after"))
        .orderBy(col("lang"))
    }),

    // Source-mixture EPOCH UPSAMPLING — the other half of mixture control
    // (d57 downsamples dominant slices; this replicates under-represented
    // ones): every doc is emitted floor(w) times plus one more iff its
    // deterministic id residue falls under frac(w), so a source with
    // weight 2.5 contributes each doc 2 or 3 times and exactly ~2.5x in
    // aggregate — the epoch-expansion a data-mixing recipe ("2.5 epochs of
    // wiki, 1 of web") compiles to. RNG-free like d57: reproducible across
    // runs/partitionings/clusters. The contract weight derives from the
    // source suffix (1.0–2.5 in 0.5 steps — exact in binary, so the
    // floor/frac arithmetic is bit-identical in DuckDB).
    "d66_epoch_upsample" -> ((s, dir) => {
      // 2-arg substr: the FULL numeric suffix, exactly like the oracle's
      // substr(source, 4) and the spec's src.drop(3) — three mirrors of one
      // rule must stay identical
      val w = lit(1.0) +
        (expr("substr(source, 4)").cast(IntegerType) % 4) * lit(0.5)
      upsampleMixture(Tables.load(s, dir, "documents"), w)
        .select(col("doc_id"), col("source"), col("n_copies"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // Reproducible GLOBAL SHUFFLE + shard assignment — the training-order
    // step after packing: every epoch must visit docs in a pseudorandom
    // order that is byte-identical across reruns/partitionings (no RNG,
    // no zipWithIndex). Shuffle key = md5 of (seed : doc_id) — identical
    // string md5 in both engines; shard = first hex nibble (16 shards);
    // within-shard order = the key itself (doc_id tiebreak for absolute
    // determinism). Scale shape: the ONE shuffle is the shard exchange —
    // exactly the data movement a training-shuffle write must pay — and
    // the per-shard rank is WindowGroupLimit-free by design (full ranks
    // are the output); shard count becomes a parameter ∝ cluster in
    // production, the nibble is the 16-shard contract instance.
    "d67_global_shuffle" -> ((s, dir) =>
      globalShuffle(Tables.load(s, dir, "documents"))
        .orderBy(col("shard"), col("rn"))),

    // PIPELINE V2 — the r6 stages composed as ONE declarative DAG, the way
    // d58 composes the r4 stages: quality gate (t50's shared predicate) →
    // exact-content dedup (d50's rule: keep the smallest doc_id per
    // md5(text) — the rk=1 filter rewrites to WindowGroupLimit, map-side)
    // → decontamination drop (d60's width-3 rule; eval-class docs are
    // never flagged — they model the external benchmark) → epoch
    // upsampling (d66's weights, text preserved through replication) →
    // per-source audit with exact token totals. Catalyst fuses the scalar
    // gates into the scan; the added shuffles are exactly the semantic
    // ones (content key, shingle join, source agg) — composition costs
    // what its stages cost, which is the point of building every stage as
    // a DataFrame transform.
    "d69_pipeline_v2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val quality = Tables.load(s, dir, "documents")
        .filter(QueryUtil.qualityKeep(col("text")))
      val wDup = Window.partitionBy(col("ck")).orderBy(col("doc_id"))
      val deduped = quality
        .withColumn("ck", md5(col("text").cast("binary")))
        .withColumn("rk", row_number().over(wDup))
        .filter(col("rk") === 1).drop("ck", "rk")
      val flagged = decontaminate(s, dir, 3).select(col("doc_id"))
      val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
      val w = lit(1.0) +
        (expr("substr(source, 4)").cast(IntegerType) % 4) * lit(0.5)
      upsampleMixture(clean, w)
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_rows"),
          sum(QueryUtil.tokenCount(col("text"))).as("n_tokens"))
        .orderBy(col("source"))
    }),

    // Z-ORDER LAYOUT audit — the multi-dimensional data-skipping layout
    // lake tables use at 100 TB (OPTIMIZE ZORDER): interleave the bits of
    // two scan dimensions so that sorting by the single z-value keeps BOTH
    // dimensions locally bounded per file — a range predicate on either
    // column then prunes most files by their min/max footer stats. This
    // query makes the locality measurable: 16 contiguous z-range tiles
    // with each tile's bounding box on both dims (tight boxes = effective
    // skipping; a doc_id-sorted layout would give full-width n_chars boxes
    // in every tile). Scale shape: the z-value is scan-local integer bit
    // arithmetic (codegen), the tile rule is a broadcast 1-row min/max —
    // no global window/sort; the production write is then one range
    // sort by z, the same exchange d67 pays. Identical unrolled bit
    // formula in both engines.
    "d68_zorder_layout" -> ((s, dir) => {
      val docs0 = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .withColumn("z", zValue(col("n_chars").cast(LongType), col("doc_id")))
      val zstats = docs0.agg(min(col("z")).as("zmin"), max(col("z")).as("zmax"))
      docs0.crossJoin(broadcast(zstats))
        .withColumn("tile",
          expr("(z - zmin) * 16 div (zmax - zmin + 1)").cast(IntegerType))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("tile"))
    }),

    // The END-TO-END dataset assembly pipeline in ONE declarative DAG —
    // quality gate (t50's thresholds) → near-dup removal (d51's anti-join
    // over the exact J>=0.8 pair set) → language rebalancing (d57's
    // deterministic residue rule) → train/val split (d55's rule) → audit
    // counts. Catalyst fuses the scalar gates into the scan and the
    // anti-join is the only extra shuffle over d51 — the composition costs
    // what its most expensive stage costs, which is the point of building
    // each stage as a DataFrame transform.
    "d58_pipeline_e2e" -> ((s, dir) => {
      val quality = Tables.load(s, dir, "documents")
        .filter(QueryUtil.qualityKeep(col("text")))
        .select(col("doc_id"), col("lang"))
      val dropped = jaccardPairs(s, dir, 0.8).select(col("idb").as("doc_id"))
      quality.join(dropped, Seq("doc_id"), "left_anti")
        .filter(col("lang") =!= "en" || col("doc_id") % 4 === 0)
        .select(col("lang"),
          QueryUtil.splitAssign(col("doc_id")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("split"))
    }),

    // Shard packing — the last step of dataset assembly: stream each
    // language's docs (in stable doc_id order) into contiguous training
    // shards of ~2000 tokens. Production path is the two-pass distributed
    // prefix sum (no per-lang serialization); see shardPack below.
    "d59_shard_pack" -> ((s, dir) => shardPack(s, dir, twoPass = true)),

    // Context-window sequence packing — the final mile after d59: chop the
    // corpus token stream into fixed-512-token training sequences with
    // per-fragment boundary bookkeeping (seq_id, doc_id, seq_off, doc_off,
    // len). Pure prefix-sum arithmetic => exactly oracle-able; the two-pass
    // distributed form is the shipped path (single-pass equivalence
    // spec-proven alongside d59's).
    "d70_seq_pack" -> ((s, dir) => seqPack(s, dir, L = 512L, twoPass = true)),

    // Benchmark decontamination — the train/eval overlap check every
    // training-data pipeline runs before shipping a corpus; see
    // `decontaminate` for the plan and the shingle-width story. The oracle
    // runs the width-3 form (it shares d52/d53's shingle table); the
    // production-width 13-gram variant is brute-force-spec'd.
    "d60_decontaminate" -> ((s, dir) => decontaminate(s, dir, width = 3)),

    // Boilerplate REMOVAL with text reconstruction — d71 detects template
    // n-grams; this is the cleaning step that actually edits the corpus
    // (the C4/ccnet move): every token covered by a 3-gram occurring in
    // >= 0.3% of docs (min 5) is cut, and the document text is REBUILT
    // from the surviving tokens, with exact removal accounting. The
    // threshold scales with the corpus — a FIXED df cutoff reclassifies
    // everything as boilerplate under growth alone (measured here: df>=5
    // strips 8% at 500 docs but 99.8% at 5000, because near-dup groups
    // push ordinary grams over any fixed bar). Scale shape: one
    // gram-keyed distinct-doc-count agg, one semi-join back (reuses the
    // gram partitioning), one per-doc position collect (bounded by doc
    // length), and the span-cover + rebuild run in the graft_strip_spans
    // boolean-mask kernel, O(tokens + flagged·width) per doc — linear in
    // corpus tokens, no pairwise anything, no quadratic cover probe.
    "d81_boilerplate_strip" -> ((s, dir) =>
      boilerplateStripFrame(s, s"d81:$dir",
          Tables.load(s, dir, "documents")
            .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t")))
        .drop("kept")
        .orderBy(col("doc_id"))),

    // PIPELINE V3 — the r8 cleaning/scoring family composed as ONE
    // declarative DAG (the d69 discipline, next-generation stages): Gopher
    // gate (QueryUtil.gopherCols — t65's SHARED rule battery) → boilerplate
    // strip-and-rebuild (boilerplateStripFrame — d81's SHARED stage, df
    // threshold computed on the gated set) → decontamination score on the
    // CLEANED text vs the untouched eval benchmark (d76's rule; drop
    // contam_frac >= 0.2) → novelty floor among survivors (d79's
    // first-occurrence rule; keep novelty >= 0.3, shingle-less docs cannot
    // prove novelty and drop) → sqrt-temperature mixture weights (t60's
    // quantized-exact-normalizer discipline, budget = surviving token
    // total so epochs average 1) feeding d66's deterministic epoch
    // upsampling (upsampleMixture — SHARED). Output: one audit row per
    // source carrying every stage's cardinality; the oracle recomputes the
    // whole DAG, so drift in ANY stage breaks the hash. All fractions are
    // corpus-proportional (no fixed cutoffs to degenerate under growth).
    // Scale: scalar gates fuse into the scan; the shuffles are the
    // semantic ones (gram df, shingle probe, novelty min, source aggs) —
    // composition costs what its stages cost.
    "d82_pipeline_v3" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val src = train.select(col("doc_id"), col("source"))
      val gated = train.filter(QueryUtil.gopherKeep(col("text")))
      val stripped = boilerplateStripFrame(s, s"d82:$dir",
        gated.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t")))
      // distinct 3-gram shingles of the CLEANED stream, persisted: the
      // contamination probe, the novelty agg and the audit all read it
      val tsh = persistKeyed(s, s"d82sh:$dir", stripped
        .select(col("doc_id"), (col("n_tok") - col("n_removed")).as("n_clean"),
          array_distinct(QueryUtil.wordNgrams(col("kept"), 3)).as("shs")))
      val evalSh = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(array_distinct(QueryUtil.wordNgrams(
          split(trim(col("text")), "\\s+"), 3))).as("sh"))
        .distinct()
      val hits = tsh.select(col("doc_id"), explode(col("shs")).as("sh"))
        .join(evalSh, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      val decont = persistKeyed(s, s"d82dc:$dir", tsh
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_clean"), col("shs"),
          size(col("shs")).as("n_sh"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .filter(col("n_sh") === 0 ||
          col("n_hit").cast(DoubleType) / col("n_sh") < 0.2))
      val sh2 = decont.select(col("doc_id"), explode(col("shs")).as("sh"))
      val first = sh2.groupBy(col("sh")).agg(min(col("doc_id")).as("first_id"))
      val nov = sh2.join(first, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh2"),
          count(when(col("first_id") === col("doc_id"), 1)).as("n_new"))
        .filter(col("n_new").cast(DoubleType) / col("n_sh2") >= 0.3)
        .select(col("doc_id"))
      // persisted: the upsample AND the per-source weight agg both read the
      // survivor set, and its novelty semi-join (shingle explode + min-agg
      // + join) is the DAG's priciest tail — without the memo it runs twice
      val kept = persistKeyed(s, s"d82k:$dir", decont
        .join(nov, Seq("doc_id"), "left_semi")
        .join(src, "doc_id")
        .select(col("doc_id"), col("source"), col("n_clean")))
      val perSrc = kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_clean")).as("tok_src"))
        .withColumn("wq",
          floor(sqrt(col("tok_src").cast(DoubleType)) * 1000000.0d).cast(LongType))
      val tot = perSrc.agg(sum(col("wq")).as("wsum"), sum(col("tok_src")).as("tbudget"))
      val withW = perSrc.crossJoin(broadcast(tot))
        .withColumn("share", col("wq").cast(DoubleType) / col("wsum").cast(DoubleType))
        .withColumn("epochs", col("share") * col("tbudget").cast(DoubleType)
          / col("tok_src").cast(DoubleType))
      // Audit tail, r16 (guide §1.2: don't compute rows you throw away,
      // §2.4: fewer stages):
      //  - finalN sums mixtureCopies arithmetically — bit-identical to
      //    counting the exploded epoch rows (n_rows = Σ copies, n_tokens =
      //    Σ n_clean·copies; docs with 0 copies contribute 0 to both), so
      //    the epoch Generate + its re-agg disappear from the plan (the
      //    real row-stream writer, upsampleMixture, still runs in d66);
      //  - gatedN counts the CACHED strip output (tsh holds exactly one
      //    row per gated doc) joined to the 2-column src projection,
      //    instead of re-running the Gopher regex battery over the full
      //    train text a second time;
      //  - the five per-source audit legs (all ≤ source-count rows) union
      //    into ONE grouped aggregate instead of four chained left joins —
      //    every leg's sources ⊆ rawN's (gated ⊆ train, kept ⊆ decont ⊆
      //    gated), so max-of-one-non-null + coalesce ≡ the old left-join
      //    + coalesce row for row.
      val finalN = kept
        .join(broadcast(withW.select(col("source"), col("epochs"))), "source")
        .select(col("source"), col("n_clean"),
          mixtureCopies(col("epochs")).cast(LongType).as("n_copies"))
        .groupBy(col("source"))
        .agg(sum(col("n_copies")).as("n_rows"),
          sum(col("n_clean") * col("n_copies")).as("n_tokens"))
      val rawN = train.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
      val gatedN = tsh.select(col("doc_id")).join(src, "doc_id")
        .groupBy(col("source")).agg(count(lit(1)).as("n_gated"))
      val decontN = decont.join(src, "doc_id").groupBy(col("source"))
        .agg(count(lit(1)).as("n_decontam"))
      def leg(df: DataFrame, have: Map[String, Column]): DataFrame = {
        val shape = Seq("n_raw" -> LongType, "n_gated" -> LongType,
          "n_decontam" -> LongType, "n_kept" -> LongType,
          "epochs" -> DoubleType, "n_rows" -> LongType,
          "n_tokens" -> LongType)
        df.select(col("source") +: shape.map { case (n, t) =>
          have.getOrElse(n, lit(null).cast(t)).as(n) }: _*)
      }
      leg(rawN, Map("n_raw" -> col("n_raw")))
        .unionByName(leg(gatedN, Map("n_gated" -> col("n_gated"))))
        .unionByName(leg(decontN, Map("n_decontam" -> col("n_decontam"))))
        .unionByName(leg(withW, Map("n_kept" -> col("n_kept"),
          "epochs" -> col("epochs"))))
        .unionByName(leg(finalN, Map("n_rows" -> col("n_rows"),
          "n_tokens" -> col("n_tokens"))))
        .groupBy(col("source"))
        .agg(max(col("n_raw")).as("n_raw"), max(col("n_gated")).as("g"),
          max(col("n_decontam")).as("d"), max(col("n_kept")).as("k"),
          max(col("epochs")).as("e"), max(col("n_rows")).as("r"),
          max(col("n_tokens")).as("t"))
        .filter(col("n_raw").isNotNull) // group keys == rawN's sources, as before
        .select(col("source"), col("n_raw"),
          coalesce(col("g"), lit(0L)).as("n_gated"),
          coalesce(col("d"), lit(0L)).as("n_decontam"),
          coalesce(col("k"), lit(0L)).as("n_kept"),
          coalesce(col("e"), lit(0.0d)).as("epochs"),
          coalesce(col("r"), lit(0L)).as("n_rows"),
          coalesce(col("t"), lit(0L)).as("n_tokens"))
        .orderBy(col("source"))
    }),

    // LENGTH-BUCKETED batching audit — the OTHER padding strategy next to
    // d70's sequence packing: batch docs of similar length together
    // (bucket = next power of two of the token count) and measure the
    // padding each bucket pays, the number a training-efficiency pass
    // monitors (dense packing avoids padding but splits docs; length
    // bucketing keeps docs whole and pays pad_frac). The bucket is exact
    // INTEGER arithmetic — length(bin(n)) is floor(log2 n)+1, so
    // next-pow2 needs no libm log2 (whose 2^k boundary rounding differs
    // per engine). One scan + one bucket-keyed agg; everything exact but
    // the final fraction divide.
    "d85_length_buckets" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(QueryUtil.tokenCount(col("text")).cast(LongType).as("n"))
        .withColumn("bucket", expr(
          "CASE WHEN n = shiftleft(cast(1 as bigint), length(bin(n)) - 1) " +
            "THEN n ELSE shiftleft(cast(1 as bigint), length(bin(n))) END"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          sum(col("bucket") - col("n")).as("n_padding"))
        .withColumn("pad_frac", col("n_padding").cast(DoubleType) /
          (col("n_docs") * col("bucket")).cast(DoubleType))
        .orderBy(col("bucket"))
    }),

    // Variable-length exact-substring dedup (suffix-array capability, no
    // suffix array): longest shared token span >= 8 per doc pair via
    // anchor-gram join + aligned-run reconstruction — see
    // [[longestSharedSpans]] for the identity and the scale story. Exact
    // (string-keyed anchors, no hashing) and fully oracle-able; the
    // brute-force DP equivalence is additionally spec-proven on planted
    // spans.
    "d83_longest_span" -> ((s, dir) =>
      longestSharedSpans(Tables.load(s, dir, "documents"), W = 8)),

    // First-occurrence novelty scoring — the incremental-crawl value
    // metric: what fraction of a doc's distinct shingles appear in NO
    // smaller-id doc (id = arrival order here)? A recrawl of known content
    // scores ~0, genuinely new material ~1 — the number an acquisition
    // pipeline thresholds before paying to keep a page. One min-agg on the
    // shingle key (earliest occurrence) + a join that reuses the same
    // partitioning + one per-doc agg; fraction is an exact-int divide.
    "d79_novelty" -> ((s, dir) => {
      val sh = hashedDocs(s, dir, 3)
        .select(col("doc_id"), explode(col("hs")).as("sh"))
      val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_id"))
      sh.join(first, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          count(when(col("first_id") === col("doc_id"), 1)).as("n_new"))
        .select(col("doc_id"), col("n_sh"), col("n_new"),
          (col("n_new").cast(DoubleType) / col("n_sh")).as("novelty"))
        .orderBy(col("doc_id"))
    }),

    // Document stitch detection — crawls shear one logical page into
    // consecutive fragments; a fragment pair (a, b) is a stitch candidate
    // when a's trailing token bigram equals b's leading bigram. One
    // boundary-key equi-join (each doc contributes ONE head key and ONE
    // tail key — rows ∝ corpus, join fan-out only on genuinely shared
    // boundaries; a hot boundary phrase is the d52 hot-shingle story and
    // would take the same salt). Exact and oracle-checked.
    "d80_stitch" -> ((s, dir) => {
      val t2 = Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("s"))
        .filter(size(col("s")) >= 4)
      val b = t2.select(col("doc_id"),
        concat_ws(" ", slice(col("s"), 1, 2)).as("head"),
        concat_ws(" ", expr("slice(s, size(s) - 1, 2)")).as("tail"))
      b.select(col("doc_id").as("ida"), col("tail"))
        .join(b.select(col("doc_id").as("idb"), col("head")),
          col("tail") === col("head") && col("ida") =!= col("idb"))
        .select(col("ida"), col("idb"), col("tail").as("boundary"))
        .orderBy(col("ida"), col("idb"))
    }),

    // Cross-source duplication matrix — the provenance report over the
    // near-dup graph: how many J >= 0.8 pairs join each unordered pair of
    // sources (diagonal = within-source dups). This is the number a corpus
    // owner reads to find mirror sites / cross-crawl duplication before
    // deciding source weights. Cost on top of the shared d52 pair table:
    // two id-keyed joins to the (doc_id, source) projection + one
    // |sources|²-sized aggregate.
    "d78_source_overlap" -> ((s, dir) => {
      val src = Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
      jaccardPairs(s, dir, 0.8)
        .join(src.select(col("doc_id").as("ida"), col("source").as("sa")), "ida")
        .join(src.select(col("doc_id").as("idb"), col("source").as("sb")), "idb")
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Contamination SCORING — d60 answers "which train docs touch an eval
    // doc"; production gates instead threshold on HOW contaminated each doc
    // is (the n-gram-overlap fraction rule, e.g. GPT-3 appendix C / PaLM's
    // 70%-of-8-grams): fraction of a train doc's distinct shingles that
    // appear anywhere in the eval set. One distinct-project of the eval
    // shingles + one semi-join keyed on the shingle + one per-doc count agg,
    // left-joined back so uncontaminated docs report 0.0 — every step
    // key-partitioned, cost ∝ shingle volume, never corpus². The fraction is
    // one IEEE divide of exact ints, so the whole scoring oracle-checks.
    "d76_contam_score" -> ((s, dir) => {
      val docs = hashedDocs(s, dir, 3)
      // docs too short to shingle (< 3 tokens ⇒ hs = []) have no overlap
      // DEFINED — drop them like the oracle's unnest does, instead of
      // emitting an n_sh=0 row with a NULL fraction
      val tr = docs.filter(col("doc_id") % 97 =!= 0 && size(col("hs")) > 0)
      val ev = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(col("hs")).as("sh")).distinct()
      val hits = tr.select(col("doc_id"), explode(col("hs")).as("sh"))
        .join(ev, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      tr.select(col("doc_id"), size(col("hs")).as("n_sh"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) / col("n_sh"))
            .as("contam_frac"))
        .orderBy(col("doc_id"))
    }),

    // Bloom-prefiltered decontamination: same result set as d60 (the filter
    // only prunes; the eval join verifies), scan-local probe instead of a
    // corpus-wide shuffle join — see decontaminateBloom for the cost model.
    "d72_bloom_decontam" -> ((s, dir) => decontaminateBloom(s, dir, width = 3)),

    // Reproducible per-stratum hash sampling — downsample each language to
    // at most ~200 docs UNIFORMLY (not d61's first-K, which biases to
    // crawl order): u = md5('s42:'||doc_id) first 8 hex chars / 2^32 is a
    // deterministic uniform in [0,1), and a doc survives iff
    // u < min(1, 200/n_lang). RNG-free, partitioning-invariant, identical
    // on every rerun and engine (the d67 hash-randomness discipline), and
    // the expected kept count per stratum is the target cap with binomial
    // concentration. Scale shape: one per-lang count agg (broadcast-sized)
    // + a scan-local keep decision — the corpus never shuffles; at 100 TB
    // `lang` becomes any stratification key with a small-side count table.
    "d74_hash_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val u = conv(substring(md5(concat(lit("s42:"),
          col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType).cast(DoubleType) / 4294967296.0d
      docs.join(broadcast(n), "lang")
        .filter(u < least(lit(1.0d), lit(200.0d) / col("n_docs").cast(DoubleType)))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Quality-aware near-dup representative selection — d51's keep-list with
    // the decision a production pipeline actually wants: among near-dups
    // (J >= 0.8, the same exact pair machinery) keep the HIGHEST-QUALITY
    // member (token count here; ties break to the lower doc_id), not the
    // arbitrary min-id — a truncated scrape loses to its fuller copy instead
    // of winning on crawl order. Same single-pass non-transitive contract as
    // d51 (a doc beaten by ANY partner drops; no iteration): the loser of
    // each pair is computed per pair-row and anti-joined away. Cost = the
    // d52 pair join (shared persisted shingles) + two id-keyed joins to the
    // per-doc quality table + one anti-join — all key-partitioned, nothing
    // quadratic beyond the true pair set.
    "d73_quality_keep" -> ((s, dir) => {
      val q = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tok"))
      val losers = jaccardPairs(s, dir, 0.8)
        .join(q.select(col("doc_id").as("ida"), col("n_tok").as("qa")), "ida")
        .join(q.select(col("doc_id").as("idb"), col("n_tok").as("qb")), "idb")
        .select(when(col("qa") < col("qb"), col("ida"))
          .when(col("qb") < col("qa"), col("idb"))
          .otherwise(greatest(col("ida"), col("idb"))).as("doc_id"))
      q.join(losers, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),

    // Incremental decontamination — the delta form production pipelines
    // actually run: d60 recomputes the full train×eval join per eval set,
    // d64 probes the standing train inverted index with ONLY the new
    // benchmark's shingles (here the %89 residue class stands in for it).
    // The stored-index variant (writeTrainIndex: bucketed on sh, probe
    // exchange-free on the index side) is plan-asserted in OperatorsSpec
    // along with delta ≡ stored-probe equivalence.
    "d64_decontam_delta" -> ((s, dir) =>
      decontaminateDelta(trainIndex(s, dir), evalShingles(s, dir, 89, 1))),

    // Incremental ingestion dedup — the daily-batch form of d53: flag each
    // incoming doc (the %7 residue class stands in for today's batch) that
    // near-duplicates the STANDING corpus, with its earliest corpus match.
    // Candidates from band-bucket co-occurrence only (batch×corpus, never
    // corpus×corpus), verified exact; the stored-index variant
    // (writeIngestIndex/probeIngestIndex, corpus sides pre-bucketed so only
    // batch-sized data shuffles) is plan-asserted + equivalence-spec'd in
    // OperatorsSpec.
    "d65_ingest_dedup" -> ((s, dir) => ingestDedup(s, dir, 0.8)),

    // Exact near-dup pairs (inverted-index similarity join), J >= 0.4.
    "d52_jaccard_pairs" -> ((s, dir) =>
      jaccardPairs(s, dir, 0.4).orderBy(col("ida"), col("idb"))),

    // Asymmetric containment pairs (quote/subsumption detection), C >= 0.8.
    "d62_containment" -> ((s, dir) =>
      containmentPairs(s, dir, 0.8).orderBy(col("ida"), col("idb"))),

    // Corpus report — the "data card" numbers every shipped dataset
    // publishes: per (source, quality-keep, split) doc counts and token
    // totals. Composes the SHARED quality gate (QueryUtil.qualityKeep —
    // the same predicate t50/d58 use, so the card can't drift from the
    // pipeline) and d58's split rule; one partial/final aggregate over a
    // single scan — scan-bound at any corpus size.
    "d63_corpus_report" -> ((s, dir) =>
      reportPartials(Tables.load(s, dir, "documents"))
        .orderBy(col("source"), col("keep"), col("split"))),

    // INCREMENTAL corpus report — the data card refreshed by a new batch
    // WITHOUT rescanning the corpus: d63's aggregate is algebraic (counts
    // + token sums merge by addition), so its grouped rows ARE the
    // partial-agg state. Here the corpus plays base (doc_id % 10 != 0) and
    // batch (== 0) roles; the refreshed card = stored state ⊕ batch
    // partials, and the ORACLE is d63's full-recompute SQL over everything
    // — the driver hash-match IS the delta ≡ recompute proof. The
    // bucketed-storage round-trip and delta chaining are spec-proven
    // (OperatorsSpec). Scale: the state is group-cardinality-sized
    // (sources × 2 × splits), the batch scan is batch-sized — refresh cost
    // is independent of corpus size.
    "d84_report_delta" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      reportDelta(reportPartials(docs.filter(col("doc_id") % 10 =!= 0)),
          docs.filter(col("doc_id") % 10 === 0))
        .orderBy(col("source"), col("keep"), col("split"))
    }),

    // MinHash + LSH: 128-hash signature (custom expression), 32 bands x 4
    // rows -> candidates from band-bucket co-occurrence, then exact-Jaccard
    // verify at J >= 0.8. P(miss) = (1-J^4)^32 <= 6e-8 at the threshold, so
    // the exact oracle still applies; at scale only the candidates (not all
    // pairs) are verified.
    "d53_minhash_lsh" -> ((s, dir) => {
      GraftFunctions.register(s)
      val numHashes = 128; val bands = 32; val r = 4
      val docs = hashedDocs(s, dir)
      // bucket rows carry only (doc_id, band, bucket) — the shingle arrays
      // join in AFTER candidate distinct, so banding never duplicates them
      val buckets = persistKeyed(s, s"mh-buckets:$dir", docs
        .select(col("doc_id"), expr(s"graft_minhash(hs, $numHashes, 42)").as("sig"))
        .select(col("doc_id"),
          posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
            s"xxhash64(b, slice(sig, b * $r + 1, $r)))")).as(Seq("band", "bucket"))))
      // both self-join sides read it; avoids recomputing the signatures
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .distinct()
      verifyJaccard(cand, docs, docs, 0.8).orderBy(col("ida"), col("idb"))
    }),

    // SimHash near-dup: 64-bit signature over tokens, banded buckets,
    // verified hamming <= 6 (exact output — banding only generates
    // candidates; see simhashPairs for the combination-banding scheme and
    // why it scales). Signature is engine-specific => the ScalaTest spec
    // brute-force-verifies banding completeness on sf0.001 (both block-pair
    // and block-triple schemes); the DuckDB oracle mirrors signature + final
    // hamming filter only.
    "d54_simhash" -> ((s, dir) =>
      simhashPairs(s, dir, choose = 2, maxHamming = 6)
        .orderBy(col("ida"), col("idb"))),

    // Per-source document cap — the domain-capping step every web-scale
    // pipeline runs (no single domain may dominate the mixture): keep the
    // first K docs per source in stable doc_id order. The rank-window
    // filter is the shape Spark rewrites to WindowGroupLimit (plan-asserted
    // in the spec): each map task keeps only its partial top-K per source
    // BEFORE the shuffle, so the exchange carries O(sources × K) rows —
    // not the corpus — and no full per-source sort ever materializes. At
    // 100 TB `source` is the high-cardinality domain key; skew from a
    // giant domain is bounded by the same map-side limit.
    "d61_source_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .orderBy(col("doc_id"))
    }),

    // Token-budget-constrained corpus selection — the data-selection final
    // mile (DoReMi/DSIR-style "best docs under an N-token budget"): rank
    // every doc by quality DENSITY (here lexical diversity per token —
    // distinct-type count over length, all exact ints via the
    // graft_ndistinct kernel and an integer-quantized ratio qd =
    // types·1e6 DIV tokens), then greedily admit docs in (qd DESC, doc_id)
    // order while the running token total stays within the budget (25% of
    // corpus tokens — scale-proportional, never a fixed cutoff).
    //
    // Scale shape: the greedy cut needs a GLOBAL prefix sum over the
    // density ordering — the d59 two-pass bucketed pattern, not one
    // unpartitioned window: docs land in ~21 density BANDS (qd DIV 5e4,
    // order-aligned with qd by construction), local running sums window
    // per band, and band offsets compose on the 21-row band summary only.
    // The budget is a broadcast 1-row agg of the same base frame. The
    // oracle runs DuckDB's native single-window cumsum over the identical
    // ordering, so the hash-match IS the two-pass ≡ one-window proof.
    "d90_budget_select" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      GraftFunctions.register(s)
      // persisted: the tokenize+ndistinct base feeds all three consumers
      // (local cumsums, band summary, budget) — without the memo the
      // per-doc kernel work runs 3×; the frame is 4 narrow columns per doc
      val base = QueryUtil.persistKeyed(s, s"d90base:$dir",
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tok"),
            expr("graft_ndistinct(toks)").as("n_types"))
          .withColumn("qd", expr("CAST(n_types AS BIGINT) * 1000000 DIV n_tok"))
          .withColumn("band", expr("qd DIV 50000")))
      val wLoc = Window.partitionBy(col("band"))
        .orderBy(col("qd").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val local = base.withColumn("cum_local", sum(col("n_tok")).over(wLoc))
      val wOff = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = base.groupBy(col("band")).agg(sum(col("n_tok")).as("band_tok"))
        .withColumn("off", coalesce(sum(col("band_tok")).over(wOff), lit(0L)))
        .select(col("band").as("ob"), col("off"))
      val budget = base.agg(expr("sum(CAST(n_tok AS BIGINT)) DIV 4 AS budget"))
      local.join(offsets, col("band") === col("ob"))
        .withColumn("cum_tok", col("off") + col("cum_local"))
        .crossJoin(broadcast(budget))
        .filter(col("cum_tok") <= col("budget"))
        .select(col("doc_id"), col("n_tok"), col("qd"), col("cum_tok"))
        .orderBy(col("qd").desc, col("doc_id"))
    }),

    // SCD2 changelog fold — apply an event changelog to produce per-key
    // VERSION VALIDITY INTERVALS [valid_from, valid_to): the lakehouse CDC
    // primitive (dimension snapshots, feature-store point-in-time tables),
    // and the producer whose output feeds the interval family directly
    // (q113 as-of probes it; q104/q115 clip against it). A new version
    // opens only when the tracked attribute CHANGES (consecutive equal
    // states collapse — true SCD2, not event logging); the open version's
    // valid_to is NULL. Deterministic under duplicate timestamps via the
    // event_id tiebreak. Scale: ONE shuffle on user_id — the change-detect
    // lag, the version row_number, and the valid_to lead all ride the same
    // (user_id)/(t_us, event_id) window sort (plan-asserted single
    // exchange); timestamps surface as epoch-µs BIGINTs (the q117 parity
    // discipline).
    "d94_scd2_versions" -> ((s, dir) =>
      scd2Versions(s, dir).orderBy(col("user_id"), col("version"))),

    // Mergeable EXACT histogram partials → quantiles without a rescan —
    // d88's stored-partials pattern for the OTHER non-algebraic aggregate
    // class (percentiles): per-source fixed-width bucket counts are
    // sum-mergeable (associative, like d88's register max-merge), so any
    // later rollup — here the "__all__" corpus row — is an aggregation of
    // stored partials, never a history rescan. Quantiles are EXACT at
    // bucket granularity (smallest bucket whose cumulative count covers
    // the rank, picked by the integer predicate 100·cum >= P·n — no
    // float percentile, no GK merge-order dependence, fully oracle-able
    // where q68's GK sketch cannot be). Scale: one corpus scan into a
    // (source × bucket)-sized partial/final hash aggregate; the cumsum
    // windows run over bucket-count rows, never docs.
    "d95_quantile_partials" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bw = 64L // bucket width in chars
      val partials = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source").as("g"), expr(s"n_chars div $bw").as("bkt"))
        .groupBy(col("g"), col("bkt")).agg(count(lit(1)).as("cnt"))
      val merged = partials.groupBy(col("bkt"))
        .agg(sum(col("cnt")).as("cnt"))
        .select(lit("__all__").as("g"), col("bkt"), col("cnt"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("g"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      partials.unionByName(merged)
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .groupBy(col("g")).agg(
          max(col("n")).as("n_docs"),
          min(when(col("cum") * 100 >= col("n") * 50, col("bkt") * bw))
            .as("q50_chars"),
          min(when(col("cum") * 100 >= col("n") * 90, col("bkt") * bw))
            .as("q90_chars"),
          min(when(col("cum") * 100 >= col("n") * 99, col("bkt") * bw))
            .as("q99_chars"))
        .select(col("g").as("source"), col("n_docs"),
          col("q50_chars"), col("q90_chars"), col("q99_chars"))
        .orderBy(col("source"))
    }),

    // Deterministic SYSTEMATIC PPS sampling — sample m docs with
    // probability proportional to size (the training-mix assembly rule:
    // long docs carry more tokens, so sampling by doc count under-weights
    // them), with NO RNG: docs are laid along a cumulative-weight line in
    // salted-md5 order (a pseudo-random permutation, the d55/d87/d93
    // discipline) and m evenly-spaced selection points j·W/m pick the doc
    // whose weight interval [cum, cum+w) they land in — classic systematic
    // PPS, reproducible across runs/clusters/partitionings. Multiplicity
    // k_i = ceil((cum+w)·m/W) − ceil(cum·m/W) in exact BIGINTs (telescopes
    // to exactly m; a doc heavier than the W/m stride draws k > 1, the
    // correct PPS-with-replacement multiplicity). The global cumsum is the
    // sanctioned banded two-pass (256 md5-prefix bands, per-band local
    // window, 256-row offset window — never a corpus-sized unpartitioned
    // sort); the single-window DuckDB oracle proves the decomposition
    // exact. Headroom: needs W·m < 2^63 — at 100 TB of chars (~1e14) and
    // m ≤ 10^4 the product is ~1e18, inside BIGINT.
    "d96_pps_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = 50L
      val base = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), (col("n_chars") + lit(1L)).cast(LongType).as("w"),
          md5(concat(lit("pps:"), col("doc_id").cast(StringType))
            .cast(BinaryType)).as("h"))
        // band = first two hex chars: a PREFIX of the sort key, so
        // band-major + in-band (h, doc_id) order IS the global order
        .withColumn("band", expr("cast(conv(substring(h, 1, 2), 16, 10) as int)"))
      val wLocal = Window.partitionBy(col("band")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = base
        .withColumn("cum_local", coalesce(sum(col("w")).over(wLocal), lit(0L)))
      val wOff = Window.orderBy(col("band"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = base.groupBy(col("band")).agg(sum(col("w")).as("bw"))
        .withColumn("off", coalesce(sum(col("bw")).over(wOff), lit(0L)))
        .select(col("band").as("ob"), col("off"))
      val tot = base.agg(sum(col("w")).as("wtot"))
      local.join(broadcast(offs), col("band") === col("ob"))
        .withColumn("cum", col("off") + col("cum_local"))
        .crossJoin(broadcast(tot)) // bcast audit: 1-row total
        .withColumn("k",
          expr(s"((cum + w) * $m + wtot - 1) DIV wtot - (cum * $m + wtot - 1) DIV wtot"))
        .filter(col("k") > 0)
        .select(col("doc_id"), col("w"), col("k"))
        .orderBy(col("doc_id"))
    })
  )

  /** Benchmark decontamination, parameterized on shingle width: flag any
    * train document sharing at least one word-`width`-gram with the eval
    * set (here the deterministic 1-in-97 doc_id residue class stands in for
    * a held-out benchmark). One inverted-index equi-join on the persisted
    * 64-bit shingle hashes (8-byte join keys instead of ~30-byte strings,
    * measured 3.0s -> sub-s at sf0.1; hash-equality == string-equality
    * modulo 64-bit collisions, the contract d52/d53's oracles already rest
    * on), then a partial/final distinct-count per flagged doc — no
    * all-pairs work, no driver-side sets. Scale notes: the eval side is
    * tiny by construction (dedup'd per shingle, ~1% of the corpus here) so
    * AQE broadcasts it locally, while at 100 TB it stays a shuffle join
    * keyed on shingle. Production decontamination runs width ~13: 13-grams
    * are near-unique, which both sharpens the signal (incidental trigram
    * overlap doesn't flag) and kills hot-shingle join skew — the
    * near-uniform key distribution is itself the 100 TB win. width=3
    * shares d52/d53's persisted shingle table. */
  /** Connected-component labels over the J >= 0.8 near-dup graph (id, comp)
    * — memoized: the label fixed point is iterative (several eager jobs),
    * so d56/d77 and repeated bench passes share the converged result. */
  private def ccLabels(s: SparkSession, dir: String): DataFrame =
    persistKeyed(s, s"cc:$dir", {
      val edges = jaccardPairs(s, dir, 0.8)
        .select(col("ida").as("src"), col("idb").as("dst"))
      val nodes = Tables.load(s, dir, "documents").select(col("doc_id").as("id"))
      graft.operators.ConnectedComponents.labels(nodes, edges)
    })

  private[graft] def decontaminate(s: SparkSession, dir: String, width: Int): DataFrame = {
    val sh = hashedDocs(s, dir, width).select(col("doc_id"), explode(col("hs")).as("sh"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(col("sh"), col("doc_id").as("eid"))
    val tr = sh.filter(col("doc_id") % 97 =!= 0)
    tr.join(ev, "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("eid")).as("n_evals"), min(col("eid")).as("first_eval"))
      .orderBy(col("doc_id"))
  }

  /** MinHash band-bucket key of a text column — d53's signature
    * construction (word-3-gram shingles → xxhash64 → minhash → band hash)
    * collapsed to ONE band of `r` hashes, usable as a single-value dedup
    * key (the streaming near-dup variant, StreamingOps.dedupContentNear).
    * Shares wordNgrams and the shingle-hash rule with the batch pipeline so
    * the two cannot drift. Short texts (< 3 tokens ⇒ empty shingle set)
    * fall back to an exact content hash in a disjoint hash namespace —
    * without it every short doc would share the empty-signature key.
    * Requires GraftFunctions.register on the session. */
  private[graft] def minhashBandKey(text: Column, r: Int): Column = {
    val shingles = array_distinct(QueryUtil.wordNgrams(split(trim(text), "\\s+"), 3))
    when(size(shingles) > 0,
      xxhash64(lit(0), call_function("graft_minhash",
        transform(shingles, x => xxhash64(x)), lit(r), lit(42L))))
      .otherwise(xxhash64(lit(1), text))
  }

  /** Train-side inverted shingle index (doc_id, sh) — what a production
    * pipeline materializes ONCE ([[writeTrainIndex]]: bucketed on sh) and
    * probes per new eval set, instead of re-shingling and re-joining the
    * whole corpus every time a benchmark is added. Train membership is
    * d60's rule (the non-%97 residue class). */
  private[graft] def trainIndex(s: SparkSession, dir: String, width: Int = 3): DataFrame =
    hashedDocs(s, dir, width)
      .select(col("doc_id"), explode(col("hs")).as("sh"))
      .filter(col("doc_id") % 97 =!= 0)

  /** Eval-side shingles (eid, sh) of one doc_id residue class — the stand-in
    * for "a NEW benchmark's shingle set" in d64 and its spec. */
  private[graft] def evalShingles(s: SparkSession, dir: String,
      modulus: Int, residue: Int, width: Int = 3): DataFrame =
    hashedDocs(s, dir, width)
      .select(col("doc_id").as("eid"), explode(col("hs")).as("sh"))
      .filter(col("eid") % modulus === residue)

  /** Store the train inverted index bucketed + per-bucket-sorted on the
    * shingle hash. Every later delta probe then joins on `sh` with NO
    * exchange of the index side (plan-asserted in OperatorsSpec): at
    * 100 TB the index is the corpus-sized side of the join, and not
    * reshuffling it per new eval set is the whole win of the incremental
    * form — the probe's cost scales with the EVAL set, not the corpus. */
  def writeTrainIndex(s: SparkSession, dir: String, tableName: String,
      width: Int = 3, buckets: Int = 16): Unit =
    graft.sources.Sinks.writeBucketed(trainIndex(s, dir, width), tableName, "sh", buckets)

  /** Day-2 of the decontamination loop: append NEW train docs' shingles
    * (a (doc_id, hs) frame, exploded here to the index's (doc_id, sh)
    * schema) into the standing train index under its stored bucket spec.
    * Append cost ∝ the new docs; the corpus-sized index is never rebuilt.
    * Probe-after-append ≡ probe-against-rebuilt-index (OperatorsSpec). */
  def appendTrainIndex(s: SparkSession, tableName: String, newDocs: DataFrame): Unit =
    graft.sources.Sinks.appendBucketed(s,
      newDocs.select(col("doc_id"), explode(col("hs")).as("sh")), tableName)

  /** Incremental (delta) decontamination: flag train docs sharing a
    * `width`-gram with a NEW eval set, given the train index (the stored
    * bucketed table, or an in-memory frame) and the new eval shingles
    * (sh, eid). Same join + partial/final distinct-count shape as the full
    * d60 form — delta ≡ full recompute on the new set, spec-proven. The
    * self-pair guard (doc_id != eid) covers eval sets drawn from the same
    * corpus; external eval text has disjoint ids and the guard is a no-op. */
  def decontaminateDelta(index: DataFrame, newEval: DataFrame): DataFrame =
    index.join(newEval, "sh")
      .filter(col("doc_id") =!= col("eid"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("eid")).as("n_evals"), min(col("eid")).as("first_eval"))
      .orderBy(col("doc_id"))

  /** Fold a shingle-hash column into an m-bit / k-probe Bloom filter,
    * returned as the packed word array. The fold is distributed (explode the
    * k probe positions, partial/final `bit_or` per word — map-side combine
    * absorbs repeated hot shingles, the reduce side sees <= m/64 rows per
    * partition); the collect materializes the FILTER, whose size is chosen
    * from the EVAL set (m/8 bytes — 32 KiB here; ~16 MiB for a 10M-shingle
    * production eval set at 1% FPR), never the corpus. `mBits` must be a
    * multiple of 64. */
  private[graft] def bloomBuild(shingles: DataFrame, mBits: Long, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val words = shingles
      .select(explode(expr(
        s"transform(sequence(0, ${k - 1}), i -> pmod(xxhash64(i, sh), ${mBits}L))")).as("p"))
      .select((col("p") / 64).cast(IntegerType).as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64)).cast(IntegerType)).as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long]((mBits / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Scan-local Bloom membership test of a shingle-hash column `sh` against
    * a built filter: k codegen'd xxhash64 probes into a plan-constant word
    * array — no join, no shuffle, no broadcast exchange. Never false on a
    * member (no false negatives), true on a non-member with
    * P ≈ (1 - e^(-kn/m))^k. */
  private[graft] def bloomProbe(words: Array[Long], mBits: Long, k: Int): Column = {
    val bloom = typedlit(words.toSeq)
    forall(sequence(lit(0), lit(k - 1)), i => {
      val p = pmod(xxhash64(i, col("sh")), lit(mBits))
      (element_at(bloom, (p / 64).cast(IntegerType) + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), pmod(p, lit(64)).cast(IntegerType)))) =!= 0
    })
  }

  /** [[bloomProbe]] with the words in a Spark Broadcast instead of a plan
    * literal — same positions, same bits (spec-proven row-identical): the
    * torrent broadcast ships the filter once per EXECUTOR and the custom
    * codegen'd expression resolves it once per generated-class instance,
    * so a production-sized filter (10M eval shingles → ~16 MiB; a full
    * benchmark suite → 100s of MB) costs neither plan size nor per-task
    * serialization. Literal form stays preferable below ~1 MiB. */
  private[graft] def bloomProbeBc(s: SparkSession, words: Array[Long],
      mBits: Long, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BloomContains(
      ColumnBridge.expression(col("sh")), s.sparkContext.broadcast(words), mBits, k))
  }

  /** d72: Bloom-prefiltered decontamination — bit-identical output to d60
    * (the filter only PRUNES: survivors are verified by the real eval join,
    * and a Bloom filter admits every true member), with the cost model a
    * 100 TB pipeline actually wants. d60 shuffles every train shingle into
    * the eval equi-join; here the eval set is folded once into an m-bit
    * Bloom filter ([[bloomBuild]] — eval-sized, 32 KiB at this m) that
    * ships to executors as a plan constant and is probed scan-locally
    * ([[bloomProbe]]). Only true matches plus the (1-e^(-kn/m))^k
    * false-positive trickle ever reach the join and its shuffle, so the
    * corpus is scanned once and reshuffled (almost) never — the shuffled
    * volume drops from |corpus shingles| to ~|true hits| + FPR·|corpus|.
    * Exactness and the FPR budget are spec-gated (PipelineOpsSpec: result
    * ≡ d60; zero false negatives by direct check; measured FPR within 2×
    * the analytic bound); the DuckDB oracle is d60's — same result set. */
  private[graft] def decontaminateBloom(s: SparkSession, dir: String, width: Int = 3,
      mBits: Long = 1L << 18, k: Int = 5): DataFrame = {
    val sh = hashedDocs(s, dir, width).select(col("doc_id"), explode(col("hs")).as("sh"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(col("sh"), col("doc_id").as("eid"))
    val words = bloomBuild(ev.select(col("sh")), mBits, k)
    sh.filter(col("doc_id") % 97 =!= 0)
      // broadcast form: at the contract's m=2^18 the literal would also
      // do, but the one call site should exercise the path that scales
      .filter(bloomProbeBc(s, words, mBits, k))
      .join(ev, "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("eid")).as("n_evals"), min(col("eid")).as("first_eval"))
      .orderBy(col("doc_id"))
  }

  /** The d67 shuffle rule on an ARBITRARY frame with a `doc_id` key (the
    * contract query applies it to the documents table; the invariance spec
    * to a repartition(13) copy): md5(seed:doc_id) shuffle key, first hex
    * nibble as shard, within-shard rank under the total (skey, doc_id)
    * order. One definition, so the query and its partitioning-invariance
    * proof cannot drift. */
  private[graft] def globalShuffle(d: DataFrame, seed: String = "seed42"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws(":", lit(seed), col("doc_id")).cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    d.select(col("doc_id"), key.as("skey"))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', substr(skey, 1, 1))") - 1)
          .cast(IntegerType))
      .withColumn("rn", row_number().over(w))
      .select(col("shard"), col("rn"), col("doc_id"), col("skey"))
  }

  /** Epoch-upsample by a per-row weight column: each row is replicated
    * floor(w) times, plus once more iff `doc_id % mod < frac(w) * mod` —
    * the deterministic fractional-epoch rule (no RNG: resampling a corpus
    * must give byte-identical output on every run and partitioning). The
    * replication is a scan-local generator (`explode(sequence)`) — zero
    * shuffle, output rows ∝ Σw; at 100 TB this IS the epoch-expanded
    * dataset writer, and the expansion happens at write parallelism with
    * no data movement. */
  /** upsampleMixture's deterministic per-doc copy count — factored out so
    * audits that only need Σ copies (d82's n_rows/n_tokens tail) can sum
    * it arithmetically instead of exploding epoch rows (guide §1.2: don't
    * generate rows you immediately aggregate away). */
  def mixtureCopies(weight: Column, mod: Int = 1000): Column =
    (floor(weight) +
      when(pmod(col("doc_id"), lit(mod)) < (weight - floor(weight)) * mod, 1)
        .otherwise(0)).cast(IntegerType)

  def upsampleMixture(d: DataFrame, weight: Column, mod: Int = 1000): DataFrame = {
    val copies = mixtureCopies(weight, mod)
    // every input column survives (this IS the epoch-expanded dataset
    // writer — dropping `text` would make the output unwritable as a
    // corpus); callers wanting an audit projection select after. Requires
    // a `doc_id` key column for the deterministic fractional rule.
    d.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("n_copies"))))
  }

  /** MinHash band buckets (doc_id, bucket) over a (doc_id, hs) frame —
    * d53's 32×4 banding with the band id folded into the bucket hash, so
    * `bucket` ALONE is the join key (a cross-band collision needs a 64-bit
    * hash collision, and even then the exact verify discards it — extra
    * candidates can never change the output). Shared by the in-memory d65
    * form and the stored-index ingestion probe. */
  private def bandBuckets(docs: DataFrame): DataFrame = {
    val numHashes = 128; val bands = 32; val r = 4
    // shingle-less (<3-token) docs generate NO buckets: their minhash
    // signatures are all-sentinel and identical, so without this guard
    // every short doc would collide with every other in every band —
    // quadratic candidate blowup for pairs the verify then discards anyway
    // (0-shingle Jaccard is null). Excluding them is output-neutral and
    // keeps the candidate count proportional to real bucket co-occurrence.
    docs.filter(size(col("hs")) > 0)
      .select(col("doc_id"), expr(s"graft_minhash(hs, $numHashes, 42)").as("sig"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $r + 1, $r)))"))
        .as("bucket"))
  }

  /** The d65 ingestion split: incoming "today's batch" = the %7 residue
    * class, standing corpus = the rest. One definition for the query, the
    * stored-index spec, and the oracle mirror. */
  private[graft] val IngestMod = 7
  private[graft] val IngestResidue = 2

  /** Incremental INGESTION dedup — the daily shape of d53: a new batch of
    * documents arrives and each incoming doc must be checked for near-dups
    * (J ≥ t) AGAINST THE STANDING CORPUS without re-banding or re-joining
    * the corpus with itself. Candidates come from band-bucket co-occurrence
    * between the incoming batch's buckets and the corpus buckets (at scale:
    * the STORED bucket index — writeIngestIndex/probeIngestIndex — so probe
    * cost scales with the batch, not the corpus); verify is the exact
    * Jaccard kernel. Output per flagged incoming doc: its earliest corpus
    * match and the match count. Exact at the J ≥ 0.8 gate by the d53 miss
    * bound ((1-J^4)^32 ≤ 6e-8). */
  /** The incoming-batch (doc_id, hs) frame of the d65 scenario — also what
    * the stored-index spec feeds to probeIngestIndex. */
  private[graft] def ingestIncoming(s: SparkSession, dir: String): DataFrame =
    hashedDocs(s, dir).filter(col("doc_id") % IngestMod === IngestResidue)

  /** Shared d65 report tail: earliest corpus match + match count per
    * flagged incoming doc. One definition for the in-memory and
    * stored-index paths. */
  private def ingestReport(verified: DataFrame): DataFrame =
    verified
      .groupBy(col("ida"))
      .agg(min(col("idb")).as("dup_of"), count(lit(1)).as("n_matches"))
      .select(col("ida").as("doc_id"), col("dup_of"), col("n_matches"))
      .orderBy(col("doc_id"))

  /** The d94 SCD2 fold (unordered) — ONE definition shared by the d94
    * contract query and q124's point-in-time enrichment, so the dimension
    * producer and its consumer cannot drift. Output: (user_id, version,
    * state, valid_from_us, valid_to_us, is_current). */
  private[graft] def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), unix_micros(col("ts")).as("t_us"))
      .withColumn("prev", lag(col("state"), 1).over(wSeq))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("version", row_number().over(wSeq))
      .withColumn("valid_to_us", lead(col("t_us"), 1).over(wSeq))
      .select(col("user_id"), col("version"), col("state"),
        col("t_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  private[graft] def ingestDedup(s: SparkSession, dir: String, t: Double): DataFrame = {
    GraftFunctions.register(s)
    val docs = hashedDocs(s, dir)
    val corpus = docs.filter(col("doc_id") % IngestMod =!= IngestResidue)
    val incoming = ingestIncoming(s, dir)
    val cand = bandBuckets(incoming)
      .join(bandBuckets(corpus).select(col("doc_id").as("cid"), col("bucket")), "bucket")
      .select(col("doc_id").as("ida"), col("cid").as("idb")).distinct()
    ingestReport(verifyJaccard(cand, incoming, corpus, t))
  }

  /** Store the standing corpus's ingestion index: band buckets bucketed on
    * `bucket` (the probe join key) and the per-doc shingle arrays bucketed
    * on `doc_id` (the verify join key) — the two tables a production
    * pipeline maintains so that per-batch dedup never reshuffles the
    * corpus. Both probes are plan-asserted exchange-free on the stored
    * side in OperatorsSpec. */
  def writeIngestIndex(s: SparkSession, dir: String, bucketsTable: String,
      shinglesTable: String, numBuckets: Int = 16): Unit =
    writeIngestIndexFrom(s,
      hashedDocs(s, dir).filter(col("doc_id") % IngestMod =!= IngestResidue),
      bucketsTable, shinglesTable, numBuckets)

  /** [[writeIngestIndex]] over an explicit corpus (doc_id, hs) frame — the
    * production entry point (the %-residue split above is test scaffolding
    * for the contract query's scenario). */
  def writeIngestIndexFrom(s: SparkSession, corpus: DataFrame, bucketsTable: String,
      shinglesTable: String, numBuckets: Int = 16): Unit = {
    GraftFunctions.register(s)
    graft.sources.Sinks.writeBucketed(bandBuckets(corpus), bucketsTable, "bucket", numBuckets)
    graft.sources.Sinks.writeBucketed(corpus, shinglesTable, "doc_id", numBuckets)
  }

  /** Day-2 of the ingestion loop: fold an ACCEPTED batch (doc_id, hs) into
    * the standing index — its band buckets into the bucket table, its
    * shingle rows into the shingle table — under each table's own stored
    * bucket spec, so tomorrow's [[probeIngestIndex]] sees today's accepted
    * docs as corpus. Append cost ∝ the batch (band/shingle rows of the new
    * docs only); the standing corpus is never re-banded, re-shuffled, or
    * rewritten. Without this the indexes are write-once and day 2 needs a
    * full rebuild — the probe → accept → append cycle is the actual daily
    * loop a production pipeline runs. Probe-after-append ≡
    * probe-against-rebuilt-index is spec-proven in OperatorsSpec. */
  def appendIngestIndex(s: SparkSession, bucketsTable: String,
      shinglesTable: String, accepted: DataFrame): Unit = {
    GraftFunctions.register(s)
    graft.sources.Sinks.appendBucketed(s, bandBuckets(accepted), bucketsTable)
    graft.sources.Sinks.appendBucketed(s, accepted, shinglesTable)
  }

  /** Probe a stored ingestion index with a new batch (doc_id, hs): same
    * output as the in-memory d65 form (spec-proven), but the corpus-sized
    * sides arrive pre-bucketed — only batch-sized data shuffles. */
  def probeIngestIndex(s: SparkSession, bucketsTable: String,
      shinglesTable: String, incoming: DataFrame, t: Double): DataFrame = {
    GraftFunctions.register(s)
    val cand = bandBuckets(incoming)
      .join(s.table(bucketsTable).select(col("doc_id").as("cid"), col("bucket")), "bucket")
      .select(col("doc_id").as("ida"), col("cid").as("idb")).distinct()
    // verify joins the incoming side from the batch frame and the corpus
    // side from the stored shingle table (bucketed on doc_id) — the same
    // verifyJaccard kernel as the in-memory d65 path, so formula and
    // threshold cannot drift between them
    ingestReport(verifyJaccard(cand, incoming, s.table(shinglesTable), t))
  }

  /** In-memory probe of an explicit corpus (doc_id, hs) frame by an
    * incoming (doc_id, hs) frame — [[probeIngestIndex]] with both sides as
    * frames instead of stored tables (same band-candidate + verifyJaccard +
    * report pipeline, so the two cannot drift). This is the greedy-replay
    * oracle the streaming accept-loop spec checks the stored-index path
    * against. */
  private[graft] def probeIngestFrames(s: SparkSession, corpus: DataFrame,
      incoming: DataFrame, t: Double): DataFrame = {
    GraftFunctions.register(s)
    val cand = bandBuckets(incoming)
      .join(bandBuckets(corpus).select(col("doc_id").as("cid"), col("bucket")), "bucket")
      .select(col("doc_id").as("ida"), col("cid").as("idb")).distinct()
    ingestReport(verifyJaccard(cand, incoming, corpus, t))
  }

  /** SimHash candidate generation + exact hamming filter via Manku-style
    * combination banding: split the 64-bit signature into 8 byte-blocks and
    * key one table on every combination of `choose` blocks (C(8,choose)
    * tables, 8*choose-bit buckets). A pair at hamming h dirties at most h
    * blocks, leaving >= 8-h clean, so any pair with h <= 8-choose collides
    * in at least one table (pigeonhole) — banding is COMPLETE for
    * maxHamming <= 8-choose, and the bound is TIGHT (9-choose errors can
    * leave only choose-1 clean blocks, no clean key), which the require
    * enforces: the filter threshold and the scheme must move together.
    * `choose` trades table count for selectivity: choose=2 -> 28 tables x
    * 16-bit buckets (complete to hamming 6); choose=3 -> 56 tables x 24-bit
    * buckets (complete to hamming 5), 256x more selective per table — the
    * next step up when 16-bit bucket occupancy grows with the corpus
    * (single-block 8x8 banding saturating its 256-bucket space was a
    * MEASURED 97.5s O(n^2/256) blowup at the 100x corpus; SCALE.md).
    * The hamming filter runs BEFORE `.distinct()`: hamming is
    * pair-determined, so filtering first is output-identical and keeps
    * non-matching candidates out of the dedup shuffle. (Measured at 100x:
    * the reorder is PLAN-neutral — shuffle write bit-identical to the
    * filter-after form, because PushDownPredicates already pushed the
    * filter through the distinct, hamming being one of its grouping
    * columns. The source order now states the intent instead of relying on
    * the optimizer; surviving pairs still carry up to C(8,choose)-table
    * multiplicity — that duplication is the distinct's real job.) */
  private[graft] def simhashPairs(s: SparkSession, dir: String,
      choose: Int, maxHamming: Int): DataFrame = {
    require(choose >= 1 && choose < 8 && maxHamming <= 8 - choose,
      s"$choose-block keys are only complete for hamming <= ${8 - choose}, got $maxHamming")
    GraftFunctions.register(s)
    val sh = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr("graft_simhash(split(trim(text), '\\\\s+'))").as("sh"))
    // block value must be a pure bit extract (shiftrightunsigned + mask):
    // div/% on the signed long borrows from lower bits and misses pairs.
    val comboBuckets = (0 until 8).combinations(choose).map { blocks =>
      blocks.zipWithIndex.map { case (b, pos) =>
        val ext = s"shiftrightunsigned(sh, ${b * 8}) & 255L"
        if (pos == 0) s"($ext)" else s"shiftleft($ext, ${pos * 8})"
      }.mkString(" | ")
    }.mkString("array(", ", ", ")")
    val buckets = persistKeyed(s, s"sh-buckets:$choose:$dir",
      sh.select(col("doc_id"), col("sh"),
        posexplode(expr(comboBuckets)).as(Seq("band", "bucket")))) // both self-join sides
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** DuckDB mirror of Kernels.simHash64 + the d54 pair query. Valid because
    * the block-pair banding is pigeonhole-COMPLETE for hamming <= 6 — exactly
    * the output filter's threshold (spec-proven vs brute force; the bound is
    * TIGHT, so the filter and the banding scheme must move together, which
    * simhashPairs' require enforces) — so the result set is exactly "all
    * pairs with hamming(sig_a, sig_b) <= 6" — no approximation left to
    * mirror. FNV-1a runs as a list_reduce with HUGEINT mod-2^64
    * arithmetic (xor touches only the low 8 bits, so it stays in range; see
    * TextOps.fingerprintOracle for the technique); per-bit votes and the
    * final signature are plain aggregations; NOTE DuckDB's `^` is POWER
    * (2^b builds the bit masks) while xor is the xor() function. */
  private val simhashOracle: String = {
    val m64 = "18446744073709551616::HUGEINT"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |hashes AS (
       |  SELECT doc_id, list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(range(1, length(tok) + 1),
       |        (i) -> CAST(ord(tok[i]) AS HUGEINT))),
       |    (h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % $m64) AS h
       |  FROM toks),
       |bits AS (
       |  SELECT doc_id, b.b,
       |    sum(CASE WHEN (h // (2::HUGEINT ^ b.b)::HUGEINT) % 2 = 1
       |        THEN 1 ELSE -1 END) AS vote
       |  FROM hashes, (SELECT unnest(range(0, 64)) AS b) b
       |  GROUP BY doc_id, b.b),
       |sigs AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN vote > 0 THEN (2::HUGEINT ^ b)::HUGEINT
       |        ELSE 0::HUGEINT END) AS sig
       |  FROM bits GROUP BY doc_id),
       |signed AS (
       |  SELECT doc_id, CASE WHEN sig >= 9223372036854775808::HUGEINT
       |    THEN CAST(sig - $m64 AS BIGINT) ELSE CAST(sig AS BIGINT) END AS sig
       |  FROM sigs)
       |SELECT a.doc_id AS ida, b.doc_id AS idb,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM signed a JOIN signed b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 6
       |ORDER BY ida, idb""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "d54_simhash" -> simhashOracle,

    // Exact mirror of the transparent HLL++ register partials: the same
    // 60-bit md5 doc key (15 hex nibbles → BIGINT, the d74/t61 idiom) fed
    // through HllMirror's xxHash64 + register + bias-kNN estimator SQL —
    // per source AND for the "__all__" rollup (whose registers are the
    // max-merge of the per-source ones == the registers of the whole
    // corpus, so one estimateSql over all docs IS the rollup's estimate).
    "d88_hll_partials" -> {
      val v60 = (0 until 15).map(i =>
        s"(instr('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1)" +
          s" * ${1L << (4 * (14 - i))}").mkString(" + ")
      val per = HllMirror.estimateSql(
        s"SELECT source AS g, $v60 AS v FROM documents WHERE text IS NOT NULL",
        p = 9)
      val all = HllMirror.estimateSql(
        s"SELECT '__all__' AS g, $v60 AS v FROM documents WHERE text IS NOT NULL",
        p = 9)
      s"""WITH u AS ((
         |  $per
         |) UNION ALL (
         |  $all
         |)),
         |ex AS (
         |  SELECT source AS g, count(DISTINCT text) AS n_exact
         |  FROM documents WHERE text IS NOT NULL GROUP BY 1
         |  UNION ALL
         |  SELECT '__all__', count(DISTINCT text)
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT u.g AS source, u.est, ex.n_exact
         |FROM u JOIN ex USING (g)
         |ORDER BY source""".stripMargin
    },

    // Window keys are md5 over the space-joined words — bit-identical
    // across engines (Spark md5 over UTF-8 binary == DuckDB md5 over
    // VARCHAR). DuckDB list slice l[i:j] is 1-based inclusive-inclusive;
    // Spark slice(t, i, w) takes w elements from 1-based i — hence i:i+7
    // for w=8. rep_frac is one IEEE division of two exact integers.
    "d71_repeated_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id,
        |    unnest([md5(array_to_string(t[i:i+7], ' '))
        |            FOR i IN generate_series(1, len(t) - 7)]) AS wkey
        |  FROM toks WHERE len(t) >= 8
        |), cnt AS (
        |  SELECT wkey, count(DISTINCT doc_id) AS nd FROM wins GROUP BY 1
        |)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_win,
        |  CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
        |  CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS rep_frac
        |FROM wins w JOIN cnt c USING (wkey)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "d61_source_cap" ->
      """SELECT doc_id, source, rnk FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS INTEGER) AS rnk
        |  FROM documents)
        |WHERE rnk <= 10 ORDER BY doc_id""".stripMargin,

    // All-integer window/aggregate arithmetic; DuckDB sum() widths are cast
    // back to Spark's BIGINT.
    "d59_shard_pack" ->
      s"""WITH t AS (
         | SELECT doc_id, lang,
         |  CAST(${QueryUtil.oracleTokenCount} AS BIGINT) AS n_tok
         | FROM documents),
         |c AS (
         | SELECT doc_id, lang, n_tok,
         |  coalesce(CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         |    AS cum_before
         | FROM t)
         |SELECT lang, cum_before // 2000 AS shard, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         | min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,
    // Same prefix-sum core as d59 but GLOBAL (no lang partition) and with
    // the fragment explosion: one row per (doc, spanned sequence), fragment
    // bounds as greatest/least closed forms over the cumulative offset.
    "d70_seq_pack" ->
      s"""WITH t AS (
         | SELECT doc_id, CAST(${QueryUtil.oracleTokenCount} AS BIGINT) AS n_tok
         | FROM documents),
         |c AS (
         | SELECT doc_id, n_tok,
         |  coalesce(CAST(sum(n_tok) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
         | FROM t WHERE n_tok > 0),
         |f AS (
         | SELECT CAST(u.seq_id AS BIGINT) AS seq_id, doc_id, cb, n_tok
         | FROM c, UNNEST(generate_series(cb // 512, (cb + n_tok - 1) // 512))
         |   AS u(seq_id))
         |SELECT seq_id, doc_id,
         | greatest(cb, seq_id * 512) - seq_id * 512 AS seq_off,
         | greatest(cb, seq_id * 512) - cb AS doc_off,
         | least(cb + n_tok, (seq_id + 1) * 512) - greatest(cb, seq_id * 512) AS len
         |FROM f ORDER BY seq_id, seq_off""".stripMargin,
    "d58_pipeline_e2e" ->
      s"""WITH pairs AS (${oracleJaccardCore(0.8)}),
         |quality AS (
         |  SELECT doc_id, lang FROM documents
         |  WHERE ${QueryUtil.oracleQualityPredicate}),
         |kept AS (
         |  SELECT doc_id, lang FROM quality
         |  WHERE doc_id NOT IN (SELECT idb FROM pairs)
         |    AND (lang != 'en' OR doc_id % 4 = 0))
         |SELECT lang, ${QueryUtil.oracleSplitCase} AS split,
         |  count(*) AS n
         |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d57_lang_rebalance" ->
      """SELECT lang, count(*) AS n_before,
        | count(*) FILTER (WHERE lang != 'en' OR doc_id % 4 = 0) AS n_after
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Stage mirrors all shared with their standalone oracles: quality
    // predicate (t50/d58), QUALIFY-dedup (d50's min-id rule),
    // decontamination shingle join (d60), generate_series upsample (d66),
    // token count (t46/t47). sum/count widths cast back to Spark's BIGINT.
    "d69_pipeline_v2" ->
      s"""WITH q AS (
        | SELECT * FROM documents WHERE ${QueryUtil.oracleQualityPredicate}),
        |d AS (
        | SELECT * FROM q QUALIFY
        |  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS s
        |       FROM documents)),
        |flag AS (
        | SELECT DISTINCT t.doc_id FROM sh t JOIN sh e ON t.shingle = e.shingle
        | WHERE t.doc_id % 97 != 0 AND e.doc_id % 97 = 0),
        |clean AS (
        | SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
        |c AS (
        | SELECT doc_id, source, text,
        |  CAST(floor(w) + CASE WHEN doc_id % 1000 < (w - floor(w)) * 1000
        |    THEN 1 ELSE 0 END AS INTEGER) AS n_copies
        | FROM (SELECT doc_id, source, text,
        |   1.0 + (CAST(substr(source, 4) AS INTEGER) % 4) * 0.5 AS w
        |  FROM clean)),
        |e AS (
        | SELECT doc_id, source, text,
        |  unnest(generate_series(1, n_copies)) AS epoch
        | FROM c WHERE n_copies > 0)
        |SELECT source,
        | count(DISTINCT doc_id) AS n_docs,
        | count(*) AS n_rows,
        | CAST(sum(${QueryUtil.oracleTokenCount}) AS BIGINT) AS n_tokens
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same unrolled 16-term interleave; // is DuckDB integer division
    // (Spark `div`); tile < 16 by construction ((zmax-zmin)*16 <
    // (zmax-zmin+1)*16).
    "d68_zorder_layout" -> {
      val zExpr = (0 until 16).map { i =>
        s"((((n_chars & 65535) >> $i) & 1) << ${2 * i}) + " +
          s"((((doc_id & 65535) >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""WITH z AS (SELECT doc_id, n_chars, $zExpr AS z FROM documents),
        |st AS (SELECT min(z) AS zmin, max(z) AS zmax FROM z)
        |SELECT CAST(((z - zmin) * 16) // (zmax - zmin + 1) AS INTEGER) AS tile,
        | count(*) AS n,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM z, st GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // 'seed:id' || concatenation matches Spark's concat_ws string cast of
    // the BIGINT; md5 of equal bytes is equal hex; instr is 1-based in
    // both engines. row_number is total because (skey, doc_id) is unique.
    "d67_global_shuffle" ->
      """WITH k AS (
        | SELECT doc_id,
        |  md5('seed42:' || CAST(doc_id AS VARCHAR)) AS skey
        | FROM documents)
        |SELECT
        | CAST(instr('0123456789abcdef', substr(skey, 1, 1)) - 1 AS INTEGER)
        |   AS shard,
        | CAST(row_number() OVER (
        |   PARTITION BY instr('0123456789abcdef', substr(skey, 1, 1))
        |   ORDER BY skey, doc_id) AS INTEGER) AS rn,
        | doc_id, skey
        |FROM k ORDER BY shard, rn""".stripMargin,

    // 0.5-step weights are exact in binary, so floor/frac arithmetic is
    // bit-identical across engines; generate_series unnest narrowed to
    // Spark's INTEGER epoch.
    "d66_epoch_upsample" ->
      """WITH w AS (
        | SELECT doc_id, source,
        |  1.0 + (CAST(substr(source, 4) AS INTEGER) % 4) * 0.5 AS w
        | FROM documents),
        |c AS (
        | SELECT doc_id, source,
        |  CAST(floor(w) + CASE WHEN doc_id % 1000 < (w - floor(w)) * 1000
        |    THEN 1 ELSE 0 END AS INTEGER) AS n_copies
        | FROM w)
        |SELECT doc_id, source, n_copies,
        | CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS epoch
        |FROM c WHERE n_copies > 0 ORDER BY doc_id, epoch""".stripMargin,
    "d50_dedup_exact" ->
      "SELECT count(*) AS n_rows, count(DISTINCT md5(text)) AS n_unique FROM documents",
    "d89_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
        |v2 AS (
        | SELECT doc_id,
        |  md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h2
        | FROM documents WHERE doc_id % 97 <> 0
        | UNION ALL
        | SELECT doc_id + 10000000, md5('new ' || text)
        | FROM documents WHERE doc_id % 13 = 0)
        |SELECT CASE WHEN h1 IS NULL THEN 'added'
        |            WHEN h2 IS NULL THEN 'removed'
        |            WHEN h1 <> h2 THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        | count(*) AS n, min(doc_id) AS sample_id
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "d87_stratified_sample" ->
      """SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |   ORDER BY md5('d87:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    // the anchor width is computed the same way as the Spark side —
    // greatest(1, least(8, corpus min token count)) — so the oracle stays
    // complete on ANY corpus (a doc shorter than 8 tokens shrinks W for
    // both engines identically); with that clamp the anchor is IMPLIED by
    // the prefix condition, so this is the true prefix-pair spec, not
    // just an algorithm mirror
    "d86_prefix_dupes" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        | FROM documents),
        |wv AS (SELECT greatest(1, least(8, min(len(t)))) AS w FROM d),
        |n AS (SELECT doc_id, t, len(t) AS n,
        |        array_to_string(list_slice(t, 1, w), ' ') AS anchor
        |      FROM d, wv)
        |SELECT a.doc_id AS short_id, b.doc_id AS long_id,
        | CAST(a.n AS INTEGER) AS n_short, CAST(b.n AS INTEGER) AS n_long
        |FROM n a JOIN n b ON a.anchor = b.anchor AND a.n < b.n
        | AND array_to_string(b.t[1:CAST(a.n AS INTEGER)], ' ')
        |   = array_to_string(a.t, ' ')
        |ORDER BY short_id, long_id""".stripMargin,
    "d51_dedup_keep" ->
      s"""WITH pairs AS (${oracleJaccardCore(0.8)})
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT idb FROM pairs)
         |ORDER BY doc_id""".stripMargin,
    "d55_train_split" ->
      s"""SELECT lang, ${QueryUtil.oracleSplitCase} AS split,
        | count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // reach uses recursive UNION (set semantics): the closure saturates and
    // terminates on any graph — no depth bound, so arbitrarily long dup
    // chains close exactly like the Spark side's unbounded label propagation
    "d56_dedup_components" ->
      s"""WITH RECURSIVE pairs AS (${oracleJaccardCore(0.8)}),
         |edges AS (
         |  SELECT ida AS a, idb AS b FROM pairs
         |  UNION ALL SELECT idb, ida FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |rep AS (SELECT src, least(src, min(dst)) AS root FROM reach GROUP BY src)
         |SELECT d.doc_id, coalesce(r.root, d.doc_id) AS rep
         |FROM documents d LEFT JOIN rep r ON d.doc_id = r.src
         |ORDER BY d.doc_id""".stripMargin,
    "d52_jaccard_pairs" -> oracleJaccard(0.4),
    "d53_minhash_lsh" -> oracleJaccard(0.8),

    // d56's component CTE (recursive UNION — exact closure, no depth bound)
    // + per-component quality argmax (window form); ties on n_tok break to
    // the lower doc_id, same as the struct-max rule
    "d77_canonical_map" ->
      s"""WITH RECURSIVE pairs AS (${oracleJaccardCore(0.8)}),
         |edges AS (
         |  SELECT ida AS a, idb AS b FROM pairs
         |  UNION ALL SELECT idb, ida FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |repr AS (SELECT src, least(src, min(dst)) AS root FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, coalesce(r.root, d.doc_id) AS rep
         |        FROM documents d LEFT JOIN repr r ON d.doc_id = r.src),
         |q AS (SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok
         | FROM documents),
         |best AS (
         | SELECT rep, doc_id AS canonical, n_tok AS canon_ntok,
         |  row_number() OVER (PARTITION BY rep ORDER BY n_tok DESC, doc_id) AS rn
         | FROM lab JOIN q USING (doc_id))
         |SELECT l.doc_id, l.rep, b.canonical, b.canon_ntok
         |FROM lab l JOIN best b ON b.rep = l.rep AND b.rn = 1
         |ORDER BY l.doc_id""".stripMargin,

    "d91_cluster_spectrum" ->
      s"""WITH RECURSIVE pairs AS (${oracleJaccardCore(0.8)}),
         |edges AS (
         |  SELECT ida AS a, idb AS b FROM pairs
         |  UNION ALL SELECT idb, ida FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |repr AS (SELECT src, least(src, min(dst)) AS root FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, coalesce(r.root, d.doc_id) AS rep
         |        FROM documents d LEFT JOIN repr r ON d.doc_id = r.src),
         |cs AS (SELECT rep, count(*) AS csize FROM lab GROUP BY 1)
         |SELECT csize, count(*) AS n_clusters, csize * count(*) AS n_docs
         |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin,

    // d56's closure + per-node weighted degree (both pair orientations) +
    // per-cluster argmax, ties to the smaller doc_id — the struct-max rule
    "d92_central_rep" ->
      s"""WITH RECURSIVE pairs AS (${oracleJaccardCore(0.8)}),
         |edges AS (
         |  SELECT ida AS a, idb AS b FROM pairs
         |  UNION ALL SELECT idb, ida FROM pairs),
         |reach(src, dst) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |repr AS (SELECT src, least(src, min(dst)) AS root FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, coalesce(r.root, d.doc_id) AS rep
         |        FROM documents d LEFT JOIN repr r ON d.doc_id = r.src),
         |jq AS (SELECT ida, idb, CAST(floor(jac * 1e9) AS BIGINT) AS jq FROM pairs),
         |deg AS (
         |  SELECT id, CAST(sum(jq) AS BIGINT) AS wdeg FROM (
         |    SELECT ida AS id, jq FROM jq UNION ALL SELECT idb, jq FROM jq)
         |  GROUP BY id),
         |mem AS (SELECT l.rep AS cluster, l.doc_id AS id, g.wdeg
         |        FROM lab l JOIN deg g ON g.id = l.doc_id),
         |best AS (
         |  SELECT cluster, id, wdeg,
         |    row_number() OVER (PARTITION BY cluster ORDER BY wdeg DESC, id) AS rn,
         |    count(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM mem)
         |SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
         |  id AS central_id, wdeg AS central_wdeg_q
         |FROM best WHERE rn = 1 ORDER BY cluster""".stripMargin,

    // the hash permutation as ONE plain window (the decomposition the
    // engine's banded two-pass must equal), ring offsets j·(n div 3),
    // common-shingle count per candidate pair via the shared shingle CTE
    "d93_negative_pairs" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |rk AS (SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |  AS BIGINT) AS r FROM d),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rk),
        |cand AS (
        |  SELECT a.doc_id AS anchor, CAST(t.j AS INTEGER) AS j,
        |    (a.r + t.j * (nn.n // 3)) % nn.n AS tr
        |  FROM rk a, nn, (SELECT unnest(range(1, 3)) AS j) t),
        |prs AS (
        |  SELECT c.anchor, c.j, b.doc_id AS neg_id
        |  FROM cand c JOIN rk b ON b.r = c.tr),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |com AS (
        |  SELECT p.anchor, p.j, p.neg_id, count(sb.shingle) AS c
        |  FROM prs p
        |  LEFT JOIN sh sa ON sa.doc_id = p.anchor
        |  LEFT JOIN sh sb ON sb.doc_id = p.neg_id AND sb.shingle = sa.shingle
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT com.anchor, com.j, com.neg_id, com.c,
        |    coalesce(za.n, 0) + coalesce(zb.n, 0) AS ss
        |  FROM com
        |  LEFT JOIN sz za ON za.doc_id = com.anchor
        |  LEFT JOIN sz zb ON zb.doc_id = com.neg_id)
        |SELECT anchor, j, neg_id,
        |  CASE WHEN ss - c = 0 THEN 0
        |   ELSE CAST(floor(CAST(c AS DOUBLE) / (ss - c) * 1e9) AS BIGINT) END AS jq
        |FROM scored
        |WHERE (CASE WHEN ss - c = 0 THEN 0
        |   ELSE CAST(floor(CAST(c AS DOUBLE) / (ss - c) * 1e9) AS BIGINT) END)
        |  < 800000000
        |ORDER BY anchor, j""".stripMargin,

    "d63_corpus_report" ->
      s"""SELECT source, ${QueryUtil.oracleQualityPredicate} AS keep,
         |  ${QueryUtil.oracleSplitCase} AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(${QueryUtil.oracleTokenCount}) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // the delta ≡ recompute proof: the oracle is the FULL one-shot report
    // over all documents; Spark's side got there via stored-state merge
    "d84_report_delta" ->
      s"""SELECT source, ${QueryUtil.oracleQualityPredicate} AS keep,
         |  ${QueryUtil.oracleSplitCase} AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(${QueryUtil.oracleTokenCount}) AS BIGINT) AS n_tokens
         |FROM documents
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // ordered pairs; |A∩B| / |A| with the same shingle CTE as the Jaccard
    // oracles — c/n is one IEEE double division of two exact ints
    "d62_containment" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
        | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        | GROUP BY 1, 2)
        |SELECT ida, idb, CAST(c AS DOUBLE) / sa.n AS containment
        |FROM common JOIN sizes sa ON sa.doc_id = ida
        |WHERE CAST(c AS DOUBLE) / sa.n >= 0.8
        |ORDER BY ida, idb""".stripMargin,

    "d81_boilerplate_strip" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents),
        |g2 AS (
        | SELECT doc_id, u['p'] AS p, u['g'] AS g FROM (
        |  SELECT doc_id,
        |   unnest([{'p': i-1, 'g': s[i]||' '||s[i+1]||' '||s[i+2]}
        |           for i in range(1, len(s)-1)]) AS u
        |  FROM t)),
        |thr AS (SELECT greatest(5, CAST(ceil(count(*) * 3 / 1000.0) AS BIGINT)) AS v
        |        FROM t),
        |hot AS (SELECT g FROM g2 GROUP BY g
        |        HAVING count(DISTINCT doc_id) >= (SELECT v FROM thr)),
        |fl AS (SELECT doc_id, list(DISTINCT p) AS fp FROM g2
        |       WHERE g IN (SELECT g FROM hot) GROUP BY 1),
        |rec AS (SELECT t.doc_id, s, coalesce(fp, []) AS fp
        |        FROM t LEFT JOIN fl USING (doc_id)),
        |cov AS (SELECT doc_id, s,
        |         list_distinct(flatten([[p, p+1, p+2] for p in fp])) AS covered
        |        FROM rec),
        |k AS (SELECT doc_id, s, covered,
        |       [s[i] for i in range(1, len(s)+1)
        |        if NOT list_contains(covered, i-1)] AS kept
        |      FROM cov)
        |SELECT doc_id, CAST(len(s) AS INTEGER) AS n_tok,
        | CAST(len(s) - len(kept) AS INTEGER) AS n_removed,
        | coalesce(array_to_string(kept, ' '), '') AS cleaned
        |FROM k ORDER BY doc_id""".stripMargin,

    // Full-DAG mirror of pipeline v3: every stage recomputed in SQL (gate
    // → strip → contamination → novelty → weights → upsample → audit), so
    // the hash-match proves ALL stage rules and their composition at once.
    // Parity notes: share and epochs follow Spark's exact operation order
    // (wq/wsum, then ·budget, then /tok); sqrt is IEEE-correctly-rounded
    // both sides; the quantized wq normalizer sums as exact BIGINTs; the
    // floor/frac upsample rule is the proven d66/d69 arithmetic.
    "d82_pipeline_v3" ->
      s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 97 != 0),
        |gt AS (SELECT * FROM train WHERE ${QueryUtil.oracleGopherKeep}),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS s FROM gt),
        |g2 AS (SELECT doc_id, u['p'] AS p, u['g'] AS gg FROM (
        |  SELECT doc_id, unnest([{'p': i-1, 'g': s[i]||' '||s[i+1]||' '||s[i+2]}
        |    for i in range(1, len(s)-1)]) AS u FROM t)),
        |thr AS (SELECT greatest(5, CAST(ceil(count(*) * 3 / 1000.0) AS BIGINT)) AS v
        |        FROM t),
        |hot AS (SELECT gg FROM g2 GROUP BY gg
        |        HAVING count(DISTINCT doc_id) >= (SELECT v FROM thr)),
        |fl AS (SELECT doc_id, list(DISTINCT p) AS fp FROM g2
        |       WHERE gg IN (SELECT gg FROM hot) GROUP BY 1),
        |rec AS (SELECT t.doc_id, s, coalesce(fp, []) AS fp
        |        FROM t LEFT JOIN fl USING (doc_id)),
        |cov AS (SELECT doc_id, s,
        |         list_distinct(flatten([[p, p+1, p+2] for p in fp])) AS covered
        |        FROM rec),
        |k AS (SELECT doc_id,
        |       [s[i] for i in range(1, len(s)+1)
        |        if NOT list_contains(covered, i-1)] AS kept
        |      FROM cov),
        |cl AS (SELECT doc_id, CAST(len(kept) AS INTEGER) AS n_clean,
        |        list_distinct([kept[i]||' '||kept[i+1]||' '||kept[i+2]
        |          FOR i IN range(1, len(kept)-1)]) AS shs
        |       FROM k),
        |esh AS (SELECT DISTINCT unnest(list_distinct(
        |   [s[i]||' '||s[i+1]||' '||s[i+2] FOR i IN range(1, len(s)-1)])) AS sh
        |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS s
        |        FROM documents WHERE doc_id % 97 = 0)),
        |tshr AS (SELECT doc_id, unnest(shs) AS sh FROM cl),
        |hits AS (SELECT doc_id, count(*) AS n_hit FROM tshr
        |         WHERE sh IN (SELECT sh FROM esh) GROUP BY 1),
        |dcp AS (SELECT cl.doc_id, n_clean, shs, len(shs) AS n_sh,
        |        coalesce(n_hit, 0) AS n_hit
        |       FROM cl LEFT JOIN hits ON cl.doc_id = hits.doc_id),
        |dc AS (SELECT * FROM dcp
        |       WHERE n_sh = 0 OR CAST(n_hit AS DOUBLE) / n_sh < 0.2),
        |sh2 AS (SELECT doc_id, unnest(shs) AS sh FROM dc),
        |fi AS (SELECT sh, min(doc_id) AS first_id FROM sh2 GROUP BY 1),
        |nov AS (SELECT sh2.doc_id FROM sh2 JOIN fi USING (sh)
        |        GROUP BY 1
        |        HAVING CAST(sum(CASE WHEN first_id = sh2.doc_id THEN 1 ELSE 0 END)
        |          AS DOUBLE) / count(*) >= 0.3),
        |kept2 AS (SELECT dc.doc_id, d.source, n_clean
        |          FROM dc JOIN documents d ON dc.doc_id = d.doc_id
        |          WHERE dc.doc_id IN (SELECT doc_id FROM nov)),
        |perq AS (SELECT source, count(*) AS n_kept,
        |          CAST(sum(n_clean) AS BIGINT) AS tok_src,
        |          CAST(floor(sqrt(CAST(sum(n_clean) AS DOUBLE)) * 1000000.0)
        |            AS BIGINT) AS wq
        |         FROM kept2 GROUP BY 1),
        |tot AS (SELECT CAST(sum(wq) AS BIGINT) AS wsum,
        |         CAST(sum(tok_src) AS BIGINT) AS tbudget FROM perq),
        |ww AS (SELECT source, n_kept, tok_src,
        |        CAST(wq AS DOUBLE) / CAST(wsum AS DOUBLE)
        |          * CAST(tbudget AS DOUBLE) / CAST(tok_src AS DOUBLE) AS epochs
        |       FROM perq, tot),
        |upc AS (SELECT k2.doc_id, k2.source, n_clean,
        |         CAST(floor(epochs) + CASE WHEN k2.doc_id % 1000
        |           < (epochs - floor(epochs)) * 1000 THEN 1 ELSE 0 END
        |          AS INTEGER) AS n_copies
        |        FROM kept2 k2 JOIN ww USING (source)),
        |up AS (SELECT doc_id, source, n_clean,
        |        unnest(generate_series(1, n_copies)) AS epoch
        |       FROM upc WHERE n_copies > 0),
        |fin AS (SELECT source, count(*) AS n_rows,
        |         CAST(sum(n_clean) AS BIGINT) AS n_tokens FROM up GROUP BY 1),
        |rawn AS (SELECT source, count(*) AS n_raw FROM train GROUP BY 1),
        |gn AS (SELECT source, count(*) AS n_gated FROM gt GROUP BY 1),
        |dcn AS (SELECT d.source, count(*) AS n_decontam
        |        FROM dc JOIN documents d ON dc.doc_id = d.doc_id GROUP BY 1)
        |SELECT rawn.source, n_raw,
        | coalesce(n_gated, 0) AS n_gated,
        | coalesce(n_decontam, 0) AS n_decontam,
        | coalesce(n_kept, 0) AS n_kept,
        | coalesce(epochs, 0.0) AS epochs,
        | coalesce(n_rows, 0) AS n_rows,
        | coalesce(n_tokens, 0) AS n_tokens
        |FROM rawn LEFT JOIN gn USING (source)
        | LEFT JOIN dcn ON rawn.source = dcn.source
        | LEFT JOIN ww ON rawn.source = ww.source
        | LEFT JOIN fin ON rawn.source = fin.source
        |ORDER BY source""".stripMargin,

    // bin()-length next-pow2 (exact integer arithmetic both engines; <<
    // is DuckDB's shiftleft); one IEEE divide for the fraction
    "d85_length_buckets" ->
      s"""WITH t AS (
        | SELECT CAST(${QueryUtil.oracleTokenCount} AS BIGINT) AS n
        | FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT n,
        |  CASE WHEN n = (CAST(1 AS BIGINT) << (length(bin(n)) - 1)) THEN n
        |       ELSE (CAST(1 AS BIGINT) << length(bin(n))) END AS bucket
        | FROM t)
        |SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
        | CAST(sum(bucket - n) AS BIGINT) AS n_padding,
        | CAST(sum(bucket - n) AS DOUBLE) / CAST(count(*) * bucket AS DOUBLE)
        |   AS pad_frac
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // Same anchor-gram + gaps-and-islands identity, mirrored: 8-gram
    // positional windows, string-keyed join, run = consecutive pa within
    // (pair, pa-pb), longest = max run + 7.
    "d83_longest_span" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents),
        |g AS (
        | SELECT doc_id, u['p'] AS p, u['g'] AS g FROM (
        |  SELECT doc_id,
        |   unnest([{'p': i-1, 'g': s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]
        |     ||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]}
        |           for i in range(1, len(s)-6)]) AS u
        |  FROM t)),
        |m AS (
        | SELECT a.doc_id AS ida, b.doc_id AS idb, a.p AS pa, b.p AS pb
        | FROM g a JOIN g b USING (g) WHERE a.doc_id < b.doc_id),
        |isl AS (
        | SELECT ida, idb, pa,
        |  pa - row_number() OVER (PARTITION BY ida, idb, pa - pb ORDER BY pa) AS isl,
        |  pa - pb AS d
        | FROM m),
        |sp AS (
        | SELECT ida, idb, count(*) AS run
        | FROM isl GROUP BY ida, idb, d, isl)
        |SELECT ida, idb, CAST(max(run) + 7 AS BIGINT) AS longest_tok,
        | count(*) AS n_spans
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "d79_novelty" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), f AS (SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_sh,
        | CAST(sum(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        | CAST(sum(CASE WHEN f.first_id = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |   AS novelty
        |FROM sh JOIN f USING (shingle)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "d80_stitch" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents),
        |b AS (
        | SELECT doc_id, array_to_string(s[1:2], ' ') AS head,
        |        array_to_string(s[len(s)-1:len(s)], ' ') AS tail
        | FROM t WHERE len(s) >= 4)
        |SELECT a.doc_id AS ida, bb.doc_id AS idb, a.tail AS boundary
        |FROM b a JOIN b bb ON a.tail = bb.head AND a.doc_id <> bb.doc_id
        |ORDER BY ida, idb""".stripMargin,

    "d78_source_overlap" ->
      s"""WITH pairs AS (${oracleJaccardCore(0.8)}),
         |m AS (
         | SELECT least(da.source, db.source) AS src_a,
         |        greatest(da.source, db.source) AS src_b
         | FROM pairs
         |  JOIN documents da ON da.doc_id = ida
         |  JOIN documents db ON db.doc_id = idb)
         |SELECT src_a, src_b, count(*) AS n_pairs FROM m
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // shingle identity is the xxhash64 space on the Spark side and the raw
    // string here — identical sets absent 64-bit collisions (the same
    // contract every shingle oracle in this file rests on)
    "d76_contam_score" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0),
        |sizes AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_sh FROM tr GROUP BY 1),
        |hits AS (SELECT doc_id, count(*) AS n_hit FROM tr
        |         WHERE shingle IN (SELECT shingle FROM ev) GROUP BY 1)
        |SELECT s.doc_id, s.n_sh, coalesce(h.n_hit, 0) AS n_hit,
        | CAST(coalesce(h.n_hit, 0) AS DOUBLE) / s.n_sh AS contam_frac
        |FROM sizes s LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "d60_decontaminate" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), ev AS (SELECT doc_id AS eid, shingle FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0)
        |SELECT t.doc_id, count(DISTINCT e.eid) AS n_evals, min(e.eid) AS first_eval
        |FROM tr t JOIN ev e ON t.shingle = e.shingle
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // same 8-hex-nibble integer idiom as t61, widened to 8 digits; u and
    // the threshold are single IEEE divides of exact integers
    "d74_hash_sample" -> {
      val hex8 = (0 until 8).map(i =>
        s"(instr('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}")
        .mkString(" + ")
      s"""WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         |u AS (SELECT doc_id, lang,
         |  CAST($hex8 AS DOUBLE) / 4294967296.0 AS u
         | FROM (SELECT doc_id, lang,
         |   md5('s42:' || CAST(doc_id AS VARCHAR)) AS h FROM documents))
         |SELECT u.doc_id, u.lang FROM u JOIN n USING (lang)
         |WHERE u.u < least(1.0, 200.0 / CAST(n.n_docs AS DOUBLE))
         |ORDER BY doc_id""".stripMargin
    },

    "d73_quality_keep" ->
      s"""WITH pairs AS (${oracleJaccardCore(0.8)}),
         |q AS (SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tok
         | FROM documents),
         |losers AS (
         | SELECT CASE WHEN qa.n_tok < qb.n_tok THEN ida
         |             WHEN qb.n_tok < qa.n_tok THEN idb
         |             ELSE greatest(ida, idb) END AS doc_id
         | FROM pairs
         |  JOIN q qa ON qa.doc_id = ida
         |  JOIN q qb ON qb.doc_id = idb)
         |SELECT doc_id, n_tok FROM q
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // d72 is d60 with a Bloom prefilter that cannot change the result
    // (no false negatives; false positives die in the verify join) — the
    // oracle is therefore d60's, and the hash-match proves the exactness
    // claim end-to-end.
    "d72_bloom_decontam" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), ev AS (SELECT doc_id AS eid, shingle FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0)
        |SELECT t.doc_id, count(DISTINCT e.eid) AS n_evals, min(e.eid) AS first_eval
        |FROM tr t JOIN ev e ON t.shingle = e.shingle
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Same exactness contract as d53's oracle: at J >= 0.8 the banding miss
    // probability is <= 6e-8, so the exact SQL mirror applies.
    "d65_ingest_dedup" ->
      s"""WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS s FROM documents)
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c
        | FROM sh a JOIN sh b ON a.shingle = b.shingle
        | WHERE a.doc_id % $IngestMod = $IngestResidue
        |   AND b.doc_id % $IngestMod != $IngestResidue
        | GROUP BY 1, 2),
        |j AS (SELECT ida, idb FROM common
        |      JOIN sizes sa ON sa.doc_id = ida
        |      JOIN sizes sb ON sb.doc_id = idb
        |      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8)
        |SELECT ida AS doc_id, min(idb) AS dup_of, count(*) AS n_matches
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "d64_decontam_delta" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] FOR i IN range(1, len(s) - 1)])) AS shingle
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |), ev AS (SELECT doc_id AS eid, shingle FROM sh WHERE doc_id % 89 = 1),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 != 0)
        |SELECT t.doc_id, count(DISTINCT e.eid) AS n_evals, min(e.eid) AS first_eval
        |FROM tr t JOIN ev e ON t.shingle = e.shingle AND t.doc_id != e.eid
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // native single-window cumsum over the same (qd DESC, doc_id) order —
    // hash-matching it proves the banded two-pass prefix sum exact; //
    // and DIV agree on the all-positive operands here
    "d90_budget_select" ->
      """WITH b AS (
        | SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tok,
        |  (CAST(len(list_distinct(toks)) AS BIGINT) * 1000000) // len(toks)
        |    AS qd
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |       FROM documents)),
        |c AS (SELECT doc_id, n_tok, qd,
        |  CAST(sum(n_tok) OVER (ORDER BY qd DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tok
        | FROM b)
        |SELECT doc_id, n_tok, qd, cum_tok FROM c
        |WHERE cum_tok <= (SELECT CAST(sum(n_tok) AS BIGINT) // 4 FROM b)
        |ORDER BY qd DESC, doc_id""".stripMargin,

    "d94_scd2_versions" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS t_us,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS prev
        | FROM events),
        |c AS (SELECT user_id, event_id, state, t_us FROM e
        |      WHERE prev IS NULL OR prev <> state),
        |v AS (
        | SELECT user_id, state, t_us AS valid_from_us,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  lead(t_us) OVER w AS valid_to_us
        | FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
        |SELECT user_id, version, state, valid_from_us, valid_to_us,
        | valid_to_us IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    "d95_quantile_partials" ->
      """WITH p AS (
        | SELECT source AS g, n_chars // 64 AS bkt, count(*) AS cnt
        | FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
        |u AS (
        | SELECT g, bkt, cnt FROM p
        | UNION ALL
        | SELECT '__all__' AS g, bkt, CAST(sum(cnt) AS BIGINT) AS cnt
        | FROM p GROUP BY 2),
        |c AS (
        | SELECT g, bkt, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        | FROM u)
        |SELECT g AS source, max(n) AS n_docs,
        | min(CASE WHEN cum * 100 >= n * 50 THEN bkt * 64 END) AS q50_chars,
        | min(CASE WHEN cum * 100 >= n * 90 THEN bkt * 64 END) AS q90_chars,
        | min(CASE WHEN cum * 100 >= n * 99 THEN bkt * 64 END) AS q99_chars
        |FROM c GROUP BY g ORDER BY source""".stripMargin,

    // single-window global cumsum mirror — hash-matching it proves the
    // engine's banded two-pass decomposition exact (the d90/d93 discipline)
    "d96_pps_sample" ->
      """WITH b AS (
        | SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS w,
        |  md5('pps:' || CAST(doc_id AS VARCHAR)) AS h
        | FROM documents WHERE text IS NOT NULL),
        |c AS (
        | SELECT doc_id, w,
        |  COALESCE(CAST(sum(w) OVER (ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS cum
        | FROM b),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS wtot FROM b),
        |k AS (
        | SELECT doc_id, w,
        |  ((cum + w) * 50 + wtot - 1) // wtot
        |    - (cum * 50 + wtot - 1) // wtot AS k
        | FROM c, t)
        |SELECT doc_id, w, k FROM k WHERE k > 0 ORDER BY doc_id""".stripMargin
  )
}
