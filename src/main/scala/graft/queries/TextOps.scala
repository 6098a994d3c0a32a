package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis operators for LLM-data pipelines: quality stats, token
  * counting, language ID, content fingerprinting. All are per-row scalar
  * pipelines — no shuffle, fully codegen-able, embarrassingly parallel at
  * 100 TB (the scan is the only cost; stats push down to the parquet reader's
  * column pruning: only `doc_id`/`text` are read).
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** LEXICAL RETRIEVAL over an inverted index — the BM25-family serving
    * shape with INTEGER-EXACT scoring, the lexical twin of the ANN paths
    * (and one arm of s83's hybrid fusion): score(q, d) = Σ over matched
    * terms of tf_d(t) · w(t), with the rarity weight w(t) = 1e9 DIV df(t)
    * an exact BIGINT (no ln — idf's libm log has no cross-engine mirror;
    * integer rarity preserves the rare-terms-dominate ranking and makes
    * the op bit-oracle-able). Queries = the doc_id < 10 docs (the corpus
    * split every ANN op uses); corpus = the rest.
    *
    * Scale shape: postings (did, token, tf) are one explode + one
    * partial/final count agg — the inverted index, token-partitioned at
    * 100 TB (writeLshBuckets-style layout applies unchanged); df is a
    * second agg REUSING the token partitioning. The probe side is
    * query-term-bounded (|Q|·|doc| distinct terms), so the scoring join
    * shuffles postings of MATCHED terms only, never the corpus; the
    * per-query top-k rides the bounded graft_topk_pairs aggregate
    * (SCALE.md window-vs-aggregate rule). */
  private[graft] def lexicalTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    GraftFunctions.register(s)
    // r16 note: a broadcast-qterms semi-filter of the corpus token stream
    // BEFORE the tf aggregation (guide §3.2's pre-filter) was tried and
    // A/B-measured SLOWER at sf0.1 (tools-era T73AB: orig min 992 ms vs
    // prefiltered 1243 ms — the extra broadcast-build jobs outweigh the
    // smaller exchange at bench scale). The ad-hoc form keeps the full
    // postings aggregate; the genuine 100 TB serving shape is the STORED
    // token-bucketed index ([[writePostingsIndex]]/[[probePostingsIndex]]),
    // where probes are query-term-bounded with no corpus aggregation at
    // all. (guide §1: measure first.)
    val d = docs(s, dir)
    // r17 (VERDICT r16 item 7): the postings and df frames ride the session
    // persist memo — s83's lexical arm calls this same builder, so the
    // corpus token aggregation (the expensive legs of BOTH queries) builds
    // once per session instead of once per invocation per query. Same memo
    // contract the cc:/scc:/ivf: builders share; cold runs still pay the
    // full build from parquet.
    val postings = QueryUtil.persistKeyed(s, s"t73:postings:$dir",
      d.filter(col("doc_id") >= 10)
        .select(col("doc_id").as("did"),
          explode(split(trim(col("text")), "\\s+")).as("token"))
        .groupBy(col("did"), col("token")).agg(count(lit(1)).as("tf")))
    val dfreq = QueryUtil.persistKeyed(s, s"t73:dfreq:$dir",
      postings.groupBy(col("token")).agg(count(lit(1)).as("df")))
    val qterms = d.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .distinct()
    val scores = qterms.join(postings, "token").join(dfreq, "token")
      .groupBy(col("qid"), col("did"))
      // tf·w ≤ 1e3·1e9 and per-pair sums stay < 2^53, so the double cast
      // into the top-k aggregate is exact
      .agg(sum(col("tf") * expr("1000000000L div df")).as("score"))
    scores.groupBy(col("qid"))
      .agg(expr(s"graft_topk_pairs(cast(score as double), did, $k)").as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), col("p.id").as("did"),
        col("p.score").cast(LongType).as("score"),
        (col("pos") + 1).cast(IntegerType).as("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** The inverted index as a STORED layout — t73's 100 TB serving path
    * (parity with writeLshBuckets / writeTrainIndex): postings with the
    * rarity weight w = 1e9 DIV df FROZEN at build time land in a
    * token-bucketed managed table, so every probe joins query terms against
    * a pre-shuffled corpus side (no exchange on the index — the d64/d65
    * stored-index discipline) and day-over-day growth appends batch-sized
    * files per bucket (Sinks.appendBucketed). Freezing w at build is the
    * serving semantics: scores answer "rare in the INDEXED corpus" and
    * cannot drift under probe traffic; a rebuild refreshes them, exactly
    * like retraining an IVF quantizer. */
  def writePostingsIndex(s: SparkSession, dir: String, tableName: String,
      buckets: Int = 16): Unit = {
    val postings = docs(s, dir).filter(col("doc_id") >= 10)
      .select(col("doc_id").as("did"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(col("did"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
    graft.sources.Sinks.writeBucketed(
      postings.join(dfreq, "token")
        .select(col("token"), col("did"), col("tf"),
          expr("1000000000L div df").as("w")),
      tableName, "token", buckets)
  }

  /** Probe a [[writePostingsIndex]] layout with (qid, text) query docs —
    * the same scoring and tie rule as [[lexicalTopK]], weights read from
    * the stored index; the probe side is query-term-bounded and the index
    * side enters the join exchange-free (bucketed on token). */
  def probePostingsIndex(s: SparkSession, tableName: String,
      queryDocs: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(s)
    val qterms = queryDocs.select(col("qid"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .distinct()
    qterms.join(s.table(tableName), "token")
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("tf") * col("w")).as("score"))
      .groupBy(col("qid"))
      .agg(expr(s"graft_topk_pairs(cast(score as double), did, $k)").as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), col("p.id").as("did"),
        col("p.score").cast(LongType).as("score"),
        (col("pos") + 1).cast(IntegerType).as("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quality scoring: length / token / character-class ratios.
    "t46_text_stats" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        length(col("text")).as("n_char"),
        QueryUtil.tokenCount(col("text")).as("n_tokens"),
        length(regexp_replace(col("text"), "[^aeiou]", "")).as("n_vowels"),
        (length(regexp_replace(col("text"), "[^ ]", "")).cast(DoubleType) /
          nullif(length(col("text")), lit(0))).as("space_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + BPE-ish word/punct regex + the
    // chars/4 heuristic LLM-token estimate.
    "t47_token_count" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        QueryUtil.tokenCount(col("text")).as("n_ws"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).as("n_bpeish"),
        ceil(length(col("text")) / 4.0).as("n_est"))
        .orderBy(col("doc_id"))
    }),

    // Readability-style stats: words per sentence-ish segment, vowel-group
    // (syllable proxy) density — the flesch-kincaid shape without the
    // magic constants, exact-arithmetic so it oracle-checks.
    "t51_readability" -> ((s, dir) => {
      val nWords = QueryUtil.tokenCount(col("text"))
      // segments = separators + 1 (trailing empty kept by both engines:
      // Spark split(limit=-1) and DuckDB string_split_regex agree on
      // 'Hi. Bye.' -> [Hi, ' Bye', ''] — pinned in PipelineOpsSpec; this
      // corpus contains no sentence punctuation, so n_segs is 1 here)
      val nSegs = size(split(col("text"), "[.!?]"))
      val nVowelGroups = size(regexp_extract_all(col("text"), lit("[aeiouAEIOU]+"), lit(0)))
      docs(s, dir).select(col("doc_id"),
        nWords.as("n_words"), nSegs.as("n_segs"), nVowelGroups.as("n_vgroups"),
        (nWords.cast(DoubleType) / nSegs).as("words_per_seg"),
        (nVowelGroups.cast(DoubleType) / nullif(nWords, lit(0))).as("vgroups_per_word"))
        .orderBy(col("doc_id"))
    }),

    // Language ID via stopword-profile heuristic (custom Catalyst
    // expression graft_lang_id; engine-specific => rows-only check).
    "t48_lang_id" -> ((s, dir) => {
      GraftFunctions.register(s)
      docs(s, dir)
        .select(col("doc_id"), expr("graft_lang_id(text)").as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // The end-to-end quality gate a training pipeline applies before dedup:
    // length / token-count / vowel-density thresholds composed into one
    // boolean keep decision per document (thresholds chosen to split this
    // corpus non-trivially). Pure scalar pipeline — codegen, scan-bound,
    // no shuffle; ratios are single double divisions of exact ints (IEEE-
    // identical in DuckDB).
    "t50_quality_filter" -> ((s, dir) => {
      val nTok = QueryUtil.tokenCount(col("text"))
      val vowelRatio =
        length(regexp_replace(col("text"), "[^aeiou]", "")).cast(DoubleType) /
          length(col("text"))
      docs(s, dir).select(col("doc_id"), nTok.as("n_tokens"),
          vowelRatio.as("vowel_ratio"),
          QueryUtil.qualityKeep(col("text")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Repetition signals (the Gopher-style quality heuristic): fraction of
    // duplicate tokens and duplicate word-bigrams per document — high values
    // flag boilerplate/TEMPLATED text. Scalar + array ops only, scan-bound.
    "t52_repetition" -> ((s, dir) => {
      // Distinct counts via the codegen'd O(n) graft_ndistinct hash-set
      // kernel: builtin array_distinct has no string fast path (O(n²)
      // pairwise byte equality per row) and made this the single slowest
      // scalar pipeline under honest materialization (18.6s of a 57s sf0.1
      // suite; 0.6s after). Token/bigram arrays are materialized as named
      // columns in staged projects so each is computed once (CollapseProject
      // keeps multi-referenced non-cheap expressions staged).
      GraftFunctions.register(s)
      docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
        .select(col("doc_id"), col("toks"),
          QueryUtil.wordNgrams(col("toks"), 2).as("bigrams"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tok"),
          (lit(1.0) - expr("graft_ndistinct(toks)").cast(DoubleType) /
            size(col("toks"))).as("dup_tok_frac"),
          when(size(col("bigrams")) > 0,
            lit(1.0) - expr("graft_ndistinct(bigrams)").cast(DoubleType) /
              size(col("bigrams")))
            .otherwise(lit(0.0)).as("dup_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // Distinctive-term extraction — the exact-arithmetic core of TF-IDF
    // keyword tagging: per (doc, term) frequency joined with corpus document
    // frequency, top 3 terms per doc ranked by (tf DESC, df ASC, term ASC).
    // Deliberately rational (no ln/idf float) so it oracle-checks bit-exactly;
    // the ranking is order-isomorphic to tf-idf for fixed tf. Scale shape:
    // two partial/final hash aggregates, a shuffle join on `term` that reuses
    // df's partitioning, and a rank window whose `rnk <= 3` filter Spark
    // rewrites to WindowGroupLimit — map-side top-k per doc, no full sort of
    // the tf table.
    // Classifier evaluation: the langid (t48) confusion matrix against the
    // corpus's labeled `lang` column plus per-label precision/recall — the
    // eval every heuristic classifier in the pipeline owes before its
    // output gates anything. One scan + two tiny aggs (matrix is
    // |labels|², label-sized joins); exact counts, single IEEE divides.
    "t64_langid_eval" -> ((s, dir) => {
      GraftFunctions.register(s)
      val m = docs(s, dir)
        .select(col("lang"), expr("graft_lang_id(text)").as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
      val byLabel = m.groupBy(col("lang")).agg(sum(col("n")).as("n_label"))
      val byPred = m.groupBy(col("pred")).agg(sum(col("n")).as("n_pred"))
      m.join(byLabel, "lang").join(byPred, "pred")
        .select(col("lang"), col("pred"), col("n"),
          when(col("lang") === col("pred"),
            col("n").cast(DoubleType) / col("n_pred").cast(DoubleType)).as("precision"),
          when(col("lang") === col("pred"),
            col("n").cast(DoubleType) / col("n_label").cast(DoubleType)).as("recall"))
        .orderBy(col("lang"), col("pred"))
    }),

    // Lexical-diversity scoring — type-token ratio and hapax-legomenon
    // fraction per doc, the vocabulary-richness signals quality filters
    // use next to t52's repetition ratios (low TTR = templated/looping
    // text; high hapax = unusual vocabulary worth a second look). The
    // distinct count runs through the codegen'd graft_ndistinct hash-set
    // kernel (t52's lesson: builtin array_distinct is O(n²) on strings);
    // hapax counting sorts the token array once and counts elements
    // unequal to both neighbors — scan-local array lambdas, no shuffle,
    // exact-int divides.
    "t67_lexical_diversity" -> ((s, dir) => {
      GraftFunctions.register(s)
      docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
        .select(col("doc_id"), col("toks"),
          sort_array(col("toks")).as("st"),
          expr("graft_ndistinct(toks)").as("n_types"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tok"), col("n_types"),
          (col("n_types").cast(DoubleType) / size(col("toks"))).as("ttr"),
          expr("""size(filter(sequence(0, size(st) - 1), i ->
                 (i = 0 OR st[i] != st[i-1]) AND
                 (i = size(st) - 1 OR st[i] != st[i+1])))""").as("n_hapax"))
        .withColumn("hapax_frac",
          col("n_hapax").cast(DoubleType) / col("n_tok"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF keyword extraction — the top-3 most characteristic terms per
    // doc, the classic retrieval/labeling primitive (doc tagging, topic
    // drill-down, near-dup explanation). Deliberately LOG-FREE: score =
    // tf · n_docs / df is order-isomorphic to tf·idf for ranking within a
    // doc (log is monotone), and the rational form is one IEEE divide of
    // exact ints, so the whole pipeline oracle-checks bit-exactly where
    // log would hit libm divergence. Ties break (score DESC, term ASC) —
    // total order, and the rank filter rewrites to WindowGroupLimit
    // (map-side top-3 per doc, never a full sort of the tf table). Scale:
    // per-doc (term, tf) FIRST (bounds join volume by distinct terms, the
    // t59 discipline), df reuses the term partitioning, n_docs is a
    // broadcast 1-row cross join.
    "t68_tfidf_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val tf = d
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score",
          (col("tf") * col("n_docs")).cast(DoubleType) / col("df"))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // FEATURE HASHING (the hashing trick, Weinberger et al. 2009) — the
    // vocabulary-free featurizer that turns a doc into a fixed-k sparse
    // count vector via hash(term) mod k: no dictionary to build, store,
    // or join (the property that makes it the streaming/low-memory
    // baseline featurizer). Bucket = first md5 nibble (k=16 contract
    // instance; production widens to 2^18 with more nibbles — same
    // mechanics), md5 being the engine-portable hash discipline (d67/d74).
    // Scan-local hash + ONE (doc, bucket) count agg, output only non-zero
    // buckets — cost ∝ tokens, memory ∝ k, nothing vocabulary-sized
    // anywhere.
    "t69_feature_hashing" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .select(col("doc_id"),
          conv(substring(md5(col("term").cast(BinaryType)), 1, 1), 16, 10)
            .cast(IntegerType).as("bucket"))
        .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("doc_id"), col("bucket"))),

    // Bigram language-model table — the count-based n-gram LM every
    // data-quality stack keeps around (KenLM-shape scoring, next-token
    // suggestion, perplexity filtering): per (w1, w2) corpus counts, the
    // conditional P(w2|w1) as one exact-int IEEE divide, and only the top-3
    // continuations per w1 kept (cnt DESC, w2 ASC). Scale shape: one
    // generator explode → one (w1,w2) partial/final count agg → one
    // w1-keyed agg for the denominator reusing the same partitioning →
    // rank filter that Spark rewrites to WindowGroupLimit (map-side top-k
    // per w1, no full sort of the bigram table).
    // Collocation mining — top-k bigrams by pointwise mutual information:
    // the corpus-analysis pass that surfaces boilerplate phrases, templated
    // headers, and multi-word terms (PMI-ranked collocations drive both
    // stopphrase lists and tokenizer merge candidates). Integer-exact PMI
    // proxy: score = ((f_ab·1e9) div f_a)·N div f_b — monotone in the PMI
    // ratio f_ab·N/(f_a·f_b), computed in that staged order so every
    // intermediate fits BIGINT (f_ab·1e9 ≤ 1e15 here; at trillion-token
    // scale drop the 1e9 to 1e6 or widen to DECIMAL(38,0) — the scale
    // factor is presentation, not ranking). Min support f_ab >= 5 keeps
    // hapax noise out (PMI's classic failure mode). One token scan feeds
    // both count tables (bigram + unigram, each vocab-sized); N is a 1-row
    // broadcast; the final top-50 is TakeOrderedAndProject — bounded, no
    // global sort materialization.
    "t74_collocations" -> ((s, dir) => {
      val toks = docs(s, dir).select(split(trim(col("text")), "\\s+").as("s"))
      val bi = toks
        .select(explode(QueryUtil.wordNgrams(col("s"), 2)).as("bg"))
        .select(split(col("bg"), " ").getItem(0).as("w1"),
          split(col("bg"), " ").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("f_ab"))
      val nBg = bi.agg(sum(col("f_ab")).as("n_bg")) // pre-filter total
      val uni = toks.select(explode(col("s")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      bi.filter(col("f_ab") >= 5)
        .join(uni.select(col("w").as("w1"), col("f").as("f_a")), "w1")
        .join(uni.select(col("w").as("w2"), col("f").as("f_b")), "w2")
        .crossJoin(broadcast(nBg))
        .select(col("w1"), col("w2"), col("f_ab"),
          expr("((f_ab * 1000000000L) div f_a) * n_bg div f_b").as("score_q"))
        .orderBy(col("score_q").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    "t66_bigram_lm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bi = docs(s, dir)
        .select(explode(QueryUtil.wordNgrams(split(trim(col("text")), "\\s+"), 2))
          .as("bg"))
        .select(split(col("bg"), " ").getItem(0).as("w1"),
          split(col("bg"), " ").getItem(1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
      val tot = bi.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
      val w = Window.partitionBy(col("w1")).orderBy(col("cnt").desc, col("w2"))
      bi.join(tot, "w1")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("w1"), col("w2"), col("cnt"),
          (col("cnt").cast(DoubleType) / col("tot")).as("p"),
          col("rnk").cast(IntegerType).as("rnk"))
        .orderBy(col("w1"), col("rnk"))
    }),

    // Gopher-style document quality rules — the published rule battery
    // (Rae et al. 2021 §A1.1) re-expressed on this corpus: token count in
    // bounds, mean word length in bounds, and a minimum stopword count
    // (this synthetic vocabulary has few true function words, so the
    // "stopword" set mixes the real ones present with the corpus's
    // highest-frequency fillers — the rule mechanics are what's exercised).
    // Each rule is a named boolean column plus the conjunction, so a
    // pipeline can report WHICH rule rejected a doc, not just that one
    // did. Pure scalar pipeline — codegen, scan-bound, no shuffle; the
    // mean-word-length divide is one IEEE op of exact ints, bit-equal in
    // DuckDB.
    "t65_gopher_rules" -> ((s, dir) =>
      // the rule battery lives in QueryUtil.gopherCols — ONE definition
      // shared with the d82 pipeline's gate, so the report and the gate
      // cannot drift
      docs(s, dir)
        .select(col("doc_id") +:
          QueryUtil.gopherCols(col("text")).map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))),

    // Winnowing fingerprint selection (the MOSS algorithm): per position a
    // k=4-token-gram hash, then the MIN hash of each w=5 window of
    // consecutive gram hashes, deduplicated — the guarantee (winnowing
    // theorem) is that any shared token run of length >= w+k-1 = 8 yields
    // a shared selected fingerprint, at expected density 2/(w+1) of
    // positions — robust LOCAL overlap detection (quotes, plagiarized
    // passages) where t49's one-per-doc min-hash only catches whole-doc
    // similarity. Hashes are md5 hex STRINGS min-compared lexicographically
    // (engine-portable, so the full pipeline oracle-checks). Per-doc
    // report: selected count, cross-doc-shared count, shared fraction —
    // the d71 report shape with winnowed keys. Scale: each gram hash is
    // computed ONCE (hk column) and windows slice it — scan-local lambda
    // arithmetic; then one key agg + one co-partitioned join, linear like
    // d71 with ~1/3 the key volume.
    "t63_winnow" -> ((s, dir) => {
      // persisted: BOTH the per-key count agg and the join read the selected
      // fingerprints, and the md5-per-gram selection is the query's dominant
      // cost (0.8 s of 2.3 s at sf0.1) — without the memo it computes twice
      val sel = QueryUtil.persistKeyed(s, s"winnow:$dir", docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) >= 8)
        .withColumn("hk", expr("transform(sequence(1, size(t) - 3), i -> " +
          "md5(cast(concat_ws(' ', slice(t, i, 4)) as binary)))"))
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(hk) - 4), j -> array_min(slice(hk, j, 5)))")))
          .as("fp")))
      val cnt = sel.groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("nd"))
      sel.join(cnt, "fp")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sel"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_sel"), col("n_shared"),
          (col("n_shared").cast(DoubleType) / col("n_sel").cast(DoubleType))
            .as("shared_frac"))
        .orderBy(col("doc_id"))
    }),

    // Overlapping token-window chunking — the retrieval/embedding-pipeline
    // splitter (RAG chunks, long-doc embedding inputs): windows of 128
    // tokens at stride 96 (32-token overlap so no boundary context is lost
    // to either neighbor), with per-chunk provenance (start_tok, len) a
    // retriever maps hits back through. Pure scan-local generator explode —
    // rows ∝ corpus tokens × (W/S overlap factor), zero shuffle before the
    // caller's own sink; the chunk text itself is an array slice, no
    // re-tokenization.
    "t62_chunk" -> ((s, dir) => {
      val W = 128; val S = 96
      docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
        .select(col("doc_id"), size(col("t")).as("n"), col("t"))
        .select(col("doc_id"), col("n"), col("t"),
          explode(expr(s"sequence(1, n, $S)")).as("start_tok"))
        .select(col("doc_id"),
          expr(s"cast((start_tok - 1) div $S as int)").as("chunk_idx"),
          col("start_tok"),
          least(lit(W), col("n") - col("start_tok") + 1).as("len"),
          expr(s"concat_ws(' ', slice(t, start_tok, $W))").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Feature hashing (the hashing trick) — fixed-width sparse count
    // vectors for downstream quality/topic classifiers: token → one of 64
    // buckets via the first two md5 hex chars (engine-portable, the d67
    // idiom), per-doc bucket counts. The point of the trick at 100 TB: NO
    // vocabulary table and no join — the feature id is pure scan-local
    // arithmetic, so featurization is a single partial/final agg over the
    // scan regardless of vocabulary size (contrast t57, which joins the
    // trained vocab when exact ids matter).
    "t61_feature_hash" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .withColumn("bucket",
          (conv(substring(md5(col("term").cast(BinaryType)), 1, 2), 16, 10)
            .cast(IntegerType) % 64))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // Domain-mixture weighting — the sampling-weight table a training run
    // reads: per-source token mass, temperature-flattened weight
    // w = n_tok^alpha at alpha = 0.5 (sqrt is the one power IEEE defines
    // correctly-rounded, so the oracle stays bit-exact where pow/exp would
    // drift), normalized share, and epochs-per-source at a 1M-token budget
    // (share·budget / n_tok — >1 on small domains = upsampling, the d66
    // input). Normalization discipline: the weights are quantized to
    // integers (floor(w·10⁶) — the *1e6 multiply and floor are single
    // deterministic IEEE ops) so the normalizer is an EXACT BIGINT sum:
    // order-free across partitions AND engine-exact (a decimal sum is
    // order-free too, but the decimal→double cast rounds twice in DuckDB —
    // measured 1-ulp share drift at sf0.1). The 1e-6 relative weight
    // quantization is far below any sampling-weight significance; the tiny
    // totals row joins back via a broadcast cross join — no unpartitioned
    // window. Everything upstream is one per-source partial/final agg.
    "t60_mixture_weights" -> ((s, dir) => {
      val per = docs(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast(LongType)).as("n_tok"))
        .select(col("source"), col("n_docs"), col("n_tok"),
          sqrt(col("n_tok").cast(DoubleType)).as("w"))
        .withColumn("wq", floor(col("w") * 1000000.0d).cast(LongType))
      val tot = per.agg(sum(col("wq")).as("wsum"))
      val share = col("wq").cast(DoubleType) / col("wsum").cast(DoubleType)
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tok"), col("w"),
          share.as("share"),
          (lit(1000000.0d) * share / col("n_tok").cast(DoubleType)).as("epochs_at_1m"))
        .orderBy(col("source"))
    }),

    // Token-rarity scoring — the unigram-LM quality proxy: score each doc by
    // how common its tokens are in the corpus itself (mean corpus frequency,
    // rarest token, fraction of near-hapax tokens). Low mean_cf / high
    // rare_frac ⇒ OCR junk, mojibake, random strings; very high mean_cf +
    // zero rare ⇒ stopword soup / boilerplate — the two tails a cleaning
    // pass drops. Deliberately log-free (rational stats only, so the DuckDB
    // oracle hash-matches bit-exactly; ln/exp are the libm-divergence
    // hazard) — thresholding works the same on cf as on log cf. Scale
    // shape: per-doc (term, tf) FIRST (shrinks the join input from token
    // occurrences to distinct terms per doc and bounds hot-key volume by
    // document frequency, not token frequency), then one vocab-keyed join
    // tf⋈cf — broadcast-sized here, a shuffle join with AQE skew handling
    // at web scale — and one per-doc agg. Nothing corpus².
    "t59_token_rarity" -> ((s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
      tf.join(cf, "term")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tok"),
          sum(col("tf") * col("cf")).as("sum_cf"),
          min(col("cf")).as("min_cf"),
          sum(when(col("cf") <= 2, col("tf")).otherwise(0L)).as("n_rare"))
        .select(col("doc_id"), col("n_tok"),
          (col("sum_cf").cast(DoubleType) / col("n_tok").cast(DoubleType)).as("mean_cf"),
          col("min_cf"),
          (col("n_rare").cast(DoubleType) / col("n_tok").cast(DoubleType)).as("rare_frac"))
        .orderBy(col("doc_id"))
    }),

    "t53_distinctive_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir).select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(df, "term")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Token frequency-of-frequencies (the Zipf spectrum): how many distinct
    // tokens occur exactly f times, with the pow2 bucket alongside —
    // floor(log2 f)+1 = length(bin(f)), engine-portable integer arithmetic
    // (no libm). The vocab-sizing / tokenizer-budget audit: the head (few
    // tokens, huge f) vs the hapax tail in one table. Two hash aggregates;
    // the second runs on the vocab-sized table, so cost is the token scan.
    "t70_zipf_spectrum" -> ((s, dir) => {
      docs(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("f"))
        .groupBy(col("f")).agg(count(lit(1)).as("n_terms"))
        .select(col("f"), col("n_terms"), length(bin(col("f"))).as("f_bucket"))
        .orderBy(col("f"))
    }),

    // Text normalization / boilerplate collapse — the cleaning pass that
    // runs before tokenizer training and dedup: collapse consecutive
    // repeated tokens (the dominant repetition artifact in scraped text —
    // this corpus really contains runs like "batch batch batch") and drop
    // 1-char noise tokens; audit output = per-doc before/after counts plus
    // the head of the cleaned stream. Pure per-row higher-order array
    // expressions (filter with index lambda), zero shuffle beyond the final
    // sort — scan-bound like t46-t52, so it inherits their measured 100×
    // behavior.
    "t54_normalize" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
        .withColumn("dedup",
          expr("filter(toks, (t, i) -> i = 0 OR t <> element_at(toks, i))"))
        .withColumn("clean", expr("filter(dedup, t -> length(t) > 1)"))
        .select(col("doc_id"),
          size(col("toks")).as("n_raw"),
          size(col("dedup")).as("n_dedup"),
          size(col("clean")).as("n_clean"),
          array_join(slice(col("clean"), 1, 5), " ").as("head"))
        .orderBy(col("doc_id"))
    }),

    // Sensitive-pattern redaction — the scrubbing pass a training pipeline
    // runs before release (PII, credentials, internal markers). The
    // operator is [[redact]], parameterized on a pattern list; the
    // contract query uses a term-dictionary pattern that actually FIRES on
    // this corpus (the synthetic text contains no PII-shaped strings — a
    // PII-pattern contract query would be a vacuous no-op oracle match),
    // while the standard PII set ships as [[PiiPatterns]] and is spec'd in
    // PipelineOpsSpec on constructed rows carrying real emails/phones/IPs.
    // Pure per-row regexp pipeline: codegen, scan-bound, zero shuffle.
    "t56_redact" -> ((s, dir) =>
      redact(docs(s, dir), Seq("\\b(key|hash|value)\\b"), "[X]")
        .orderBy(col("doc_id"))),

    // Rolling-hash (Rabin-Karp) fingerprint per document + agreement count
    // across the corpus (identical fingerprints = near-identical content).
    "t49_fingerprint" -> ((s, dir) => {
      GraftFunctions.register(s)
      val fp = docs(s, dir)
        .select(col("doc_id"), expr("graft_fingerprint(text, 16)").as("fp"))
      fp.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("first_doc"))
    }),

    // Corpus vocabulary statistics — the tokenizer-training input (BPE/
    // unigram trainers start from exactly this table): global token
    // frequencies with Zipf rank and cumulative coverage share. Scale
    // shape: ONE partial/final hash aggregate reduces the corpus (rows ∝
    // data) to the vocabulary (rows ∝ distinct tokens — bounded, the
    // tokenizer-vocab regime); rank and cum_n come from rankedVocab's
    // two-pass bucketed prefix sums (no unpartitioned window over the
    // vocab), and `total` is a 1-row scalar aggregate broadcast back in.
    // `share` is one IEEE double division of two exact integers —
    // bit-identical across engines and partitionings.
    "t55_vocab" -> ((s, dir) => {
      val v = rankedVocab(s, dir)
      v.crossJoin(broadcast(v.agg(sum(col("n")).as("total"))))
        .select(col("token"), col("n"), col("rnk"), col("cum_n"),
          (col("cum_n").cast(DoubleType) / col("total").cast(DoubleType)).as("share"))
        .orderBy(col("rnk"))
    }),

    // TOKENIZATION against the trained vocabulary — the step that turns the
    // cleaned corpus into the integer sequences training actually consumes:
    // every whitespace token maps to its t55 vocab rank (the id a frequency-
    // sorted tokenizer assigns), re-assembled in document order. Scale
    // shape: tokens explode scan-locally with their positions; the id map
    // is ONE equi-join against the vocab table (broadcastable at this
    // vocab's size, a plain shuffle join at web scale — no hint forces
    // either); re-assembly is a partial/final agg per doc_id
    // (sort_array(collect_list(struct(pos,id)))), so order is recovered
    // without a window over corpus-sized data. Output is scalar-only
    // (length, head preview, exact id sum) to keep the cross-engine compare
    // on primitive columns.
    "t57_tokenize" -> ((s, dir) => {
      GraftFunctions.register(s)
      val toks = docs(s, dir)
        .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+"))
          .as(Seq("pos", "token")))
      // r16 (guide §2.3: aggregate before you shuffle): the report needs
      // only (count, sum, first-10-by-pos) — the bounded graft_topk_pairs
      // heap on score = −pos replaces collect_list of EVERY (pos, tid) +
      // sort_array, so the doc_id exchange ships a 10-entry partial per
      // (doc, map partition) instead of the whole matched token stream.
      // Value-identical: pos is unique per doc (no ties), top-10 by −pos
      // descending IS the first 10 positions ascending, and count/sum are
      // the same rows.
      toks.join(rankedVocab(s, dir).select(col("token"), col("rnk").as("tid")),
          "token")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast(IntegerType).as("n_tok"),
          expr("graft_topk_pairs(cast(-pos as double), cast(tid as bigint), 10)")
            .as("head10"),
          sum(col("tid").cast(LongType)).as("ids_sum"))
        .select(col("doc_id"), col("n_tok"),
          concat_ws(" ",
            expr("transform(head10, x -> cast(x.id AS string))"))
            .as("ids_head"),
          col("ids_sum"))
        .orderBy(col("doc_id"))
    }),

    // BPE MERGE TRAINING — the tokenizer-training step t57's pre-trained
    // vocab assumes: k iterations of the classic byte-pair loop (count
    // adjacent symbol pairs corpus-wide, adopt the most frequent as a new
    // symbol, re-segment, repeat), emitting the learned merge table
    // (rnk, l, r, cnt). Scale shape: the corpus reduces to the word-
    // frequency table FIRST (one partial/final agg — BPE statistics are
    // word-weighted, so training never rescans documents); each iteration
    // is then a vocab-sized pair agg + a driver-collected 1-ROW global
    // decision (the merge rule — the same "broadcast scalar" pattern as
    // s65's stats row) + a scan-local fold re-segmentation. Deterministic
    // (ties broken by (l, r)) => exactly oracle-able at fixed k.
    "t58_bpe_merges" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      bpeMergesFrom(s, words, k = 5)
    }),

    // Corpus-LM quality scoring (the CCNet/Wikipedia-LM filter shape):
    // score every document by the mean conditional probability of its
    // word bigrams under t66's corpus bigram model — low scores mark
    // incoherent/garbled text, high scores formulaic boilerplate; the
    // published pipelines threshold on exactly this statistic (as
    // perplexity, a monotone transform of it). Log-free on purpose: mean
    // P(w2|w1) ranks like mean log P for filtering purposes and stays
    // oracle-exact where ln() diverges per-libm. Each P is one IEEE
    // divide of exact counts, quantized to floor(p·1e9) BIGINTs so the
    // per-doc mean is an exact-int sum + one divide pair (the t60
    // quantize-then-sum discipline). No smoothing needed: the model is
    // trained on the scored corpus itself, so every doc bigram is in the
    // table (the genuinely-held-out variant would left-join with a
    // backoff constant).
    //
    // Scale shape: doc bigrams are a scan-local generator explode; ONE
    // bigram-keyed partial/final count agg builds the model; the
    // w1-marginal re-aggregates the MODEL table (vocab², never the
    // corpus); the doc⋈model join shuffles both sides on the bigram
    // string and the per-doc agg reuses nothing wider than doc_id —
    // linear in corpus tokens at any SF. The corpus IS scanned twice
    // (model-train pass + scoring pass) — the honest train-then-score
    // shape; persisting the token-level bigram frame would cost corpus
    //-sized storage to save one cheap generator re-run.
    "t71_lm_quality" -> ((s, dir) => {
      // r16 note: a (doc_id, bg, c) pre-fold before the scoring join was
      // tried and MEASURED SLOWER at sf0.1 (1.44 -> 2.33 s): doc bigrams
      // are near-unique within a doc, so the extra hash aggregate reduced
      // nothing and just added a pass — reverted (guide §1: measure).
      val db = docs(s, dir).select(col("doc_id"),
        explode(QueryUtil.wordNgrams(split(trim(col("text")), "\\s+"), 2))
          .as("bg"))
      val cnt = db.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
        .withColumn("w1", split(col("bg"), " ").getItem(0))
      val tot = cnt.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
      val lm = cnt.join(tot, "w1")
        .select(col("bg"),
          floor(col("cnt").cast(DoubleType) / col("tot") * lit(1e9))
            .cast(LongType).as("pq"))
      db.join(lm, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("pq")).as("sum_pq"))
        .select(col("doc_id"), col("n_bigrams"),
          ((col("sum_pq").cast(DoubleType) / col("n_bigrams")) / lit(1e9))
            .as("lm_score"))
        .orderBy(col("doc_id"))
    }),

    // Source-vs-corpus distribution drift (mixture monitoring): per source,
    // the TOTAL-VARIATION distance between its unigram distribution and
    // the whole-corpus distribution — the domain-shift audit behind
    // mixture reweighting (which sources are outliers; which batch of a
    // crawl changed character). TV instead of KL on purpose: KL needs
    // ln() (libm-divergent, and infinite on disjoint support); TV =
    // ½·Σ|p−q| is a true metric, bounded [0,1], and computes EXACTLY in
    // quantized integer arithmetic: p = tf·1e9 DIV n (all-int, no
    // doubles anywhere until the final display divide).
    //
    // The absent-term mass never materializes a source×vocab grid:
    // Σ_all |p−q| = Σ_present |p−q| + (Qtot − Σ_present q), with Qtot the
    // corpus-side quantized mass — one broadcast scalar. Scale shape: ONE
    // corpus scan → (source,term) partial/final agg; the corpus table
    // RE-AGGREGATES that frame (never a second scan); one term-keyed
    // join + a |sources|-sized final agg; totals are broadcast 1-rows.
    "t72_source_drift" -> ((s, dir) => {
      val st = docs(s, dir)
        .select(col("source"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("stf"))
      val ct = st.groupBy(col("term")).agg(sum(col("stf")).as("ctf"))
      val sTot = st.groupBy(col("source")).agg(sum(col("stf")).as("sn"))
      val cTot = ct.agg(sum(col("ctf")).as("cn"))
      // the tf*1e9 product is widened to DECIMAL(38,0) BEFORE the multiply:
      // a stopword's corpus tf can exceed ~9.2e9 at 100 TB, where a raw
      // Long product would silently wrap in Spark (and raise in DuckDB) —
      // DIV on the decimal product returns Long again, and the quotient
      // itself is ≤ 1e9 so the downstream arithmetic stays 64-bit
      val qt = ct.crossJoin(broadcast(cTot))
        .select(col("term"),
          expr("CAST(ctf AS DECIMAL(38,0)) * 1000000000 DIV cn").as("q"))
      val qTot = qt.agg(sum(col("q")).as("q_tot"))
      st.join(qt, "term")
        .join(broadcast(sTot), "source")
        .select(col("source"), col("q"),
          expr("CAST(stf AS DECIMAL(38,0)) * 1000000000 DIV sn").as("p"),
          col("sn"))
        .groupBy(col("source"), col("sn"))
        .agg(count(lit(1)).as("n_types"),
          sum(abs(col("p") - col("q"))).as("sum_abs"),
          sum(col("q")).as("sum_q_present"))
        .crossJoin(broadcast(qTot))
        .select(col("source"), col("sn"), col("n_types"),
          (col("sum_abs") + (col("q_tot") - col("sum_q_present"))).as("tvd_q"))
        .withColumn("tvd", col("tvd_q").cast(DoubleType) / lit(2e9))
        .orderBy(col("source"))
    }),

    // Lexical retrieval (see lexicalTopK): rarity-weighted inverted-index
    // top-10 per query doc, integer-exact scoring, fully hash-oracled.
    "t73_lexical_topk" -> ((s, dir) => lexicalTopK(s, dir, 10))
  )

  /** One BPE merge applied to a symbol array: the leftmost-greedy
    * non-overlapping fold ("aaa" + (a,a) -> ["aa","a"]). A single
    * scan-local `aggregate` over the array — no explode, no shuffle, no
    * UDF; the merged symbol is never reconsidered within the pass (the
    * standard single-rule semantics). The DuckDB oracle re-derives the
    * same rule through an independent window formulation (even offset
    * within a run of consecutive matches), so the two cross-check. */
  private def mergeFold(sym: Column, l: Column, r: Column): Column = {
    val empty = array().cast(ArrayType(StringType))
    val nul = lit(null).cast(StringType)
    aggregate(sym,
      struct(empty.as("out"), nul.as("pend")),
      (acc, sNext) => {
        val out = acc.getField("out"); val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), sNext.as("pend")))
          .when(pend === l && sNext === r,
            struct(concat(out, array(concat(l, r))).as("out"), nul.as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), sNext.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** [[TextOps.queries]]' t58 core over an explicit (word, freq) frame —
    * the spec feeds constructed corpora here and compares against a
    * brute-force reference. Each iteration persists its re-segmented
    * vocab and drops the previous one (k-deep lineage would otherwise
    * re-fold from scratch every iteration; at real scale this is a
    * checkpoint). The 1-row collect per iteration is the global merge
    * decision itself, not a data plane collect. */
  private[graft] def bpeMergesFrom(s: SparkSession, words0: DataFrame, k: Int): DataFrame = {
    var words = words0
      .select(col("freq").cast(LongType).as("freq"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("sym"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    try {
      for (it <- 1 to k) {
        val top = words.filter(size(col("sym")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(sym) - 1), " +
              "i -> struct(element_at(sym, i) AS l, element_at(sym, i + 1) AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((it, l, r, cnt))
          val next = words
            .withColumn("sym", mergeFold(col("sym"), lit(l), lit(r))).persist()
          next.count(): Unit // materialize before releasing the parent
          words.unpersist(): Unit
          words = next
        }
      }
    } finally words.unpersist(): Unit
    import s.implicits._
    merges.toSeq.toDF("rnk", "l", "r", "cnt").orderBy(col("rnk"))
  }

  /** The t55 frequency-ranked vocabulary (token, n, rnk, cum_n) — rank 1 =
    * most frequent, ties broken by token text; shared by the vocab-statistics
    * query and t57 tokenization so the id assignment cannot drift.
    *
    * Ranking is the d59 two-pass bucketed prefix scheme, keyed on the sort
    * order itself: a bucket is `(n, 2-char token prefix)` — a contiguous
    * RANGE of the `(n desc, token asc)` total order (string-prefix order is
    * consistent with full-string order), so
    * `global rank = exclusive count of earlier buckets + bucket-local
    * row_number`, and the cumulative frequency `cum_n` falls out of the same
    * construction with sum instead of count. No window touches the full
    * vocab unpartitioned: per-bucket windows each sort one bucket (the
    * frequency-1 tail spreads across prefix buckets), and the only global
    * window runs over the bucket-summary table, |buckets| ≪ |vocab| rows —
    * at a scale where THAT outgrows one task the same construction recurses
    * (buckets of buckets), exactly as d59's offsets table. */
  private def rankedVocab(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = docs(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val bucketed = vocab.withColumn("pfx", substring(col("token"), 1, 2))
    val wLocal = Window.partitionBy(col("n"), col("pfx")).orderBy(col("token"))
    val local = bucketed
      .withColumn("local_rnk", row_number().over(wLocal))
      .withColumn("local_cum", sum(col("n")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wOff = Window.orderBy(col("n").desc, col("pfx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("n"), col("pfx"))
      .agg(count(lit(1)).as("bkt_rows"), sum(col("n")).as("bkt_n"))
      .withColumn("rnk_off", coalesce(sum(col("bkt_rows")).over(wOff), lit(0L)))
      .withColumn("cum_off", coalesce(sum(col("bkt_n")).over(wOff), lit(0L)))
      .select(col("n").as("o_n"), col("pfx").as("o_pfx"),
        col("rnk_off"), col("cum_off"))
    local.join(broadcast(offsets),
        col("n") === col("o_n") && col("pfx") === col("o_pfx"))
      .select(col("token"), col("n"),
        (col("rnk_off") + col("local_rnk")).cast(IntegerType).as("rnk"),
        (col("cum_off") + col("local_cum")).as("cum_n"))
  }

  /** The standard PII scrub set: email addresses, phone-shaped number
    * groups, IPv4 addresses. Java-regex and RE2-compatible (no lookaround,
    * no backreferences) so the same strings drive Spark and any
    * RE2-engined mirror. Gated by the PipelineOpsSpec redaction spec on
    * constructed PII-bearing rows (this corpus contains none). */
  val PiiPatterns: Seq[String] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Redact every match of `patterns` in `text`. Patterns are applied
    * sequentially (left fold), so a replacement never re-matches an earlier
    * pattern; `n_redacted` counts matches per pattern on the ORIGINAL text
    * (overlaps across patterns count once each — the audit-log convention).
    * Output keeps the doc_id, the count, a 60-char preview, and the md5 of
    * the full cleaned text (full-content equality without corpus-sized
    * result rows). Per-row scalar pipeline: whole-stage codegen, scan-bound,
    * embarrassingly parallel at 100 TB like t46-t54. */
  /** The scrub column itself: `text` with every `patterns` match replaced,
    * applied as a sequential left fold (a replacement never re-matches an
    * earlier pattern). Public so specs and callers that need the full
    * cleaned text (not [[redact]]'s audit digest) can reuse the exact rule. */
  def redactedText(patterns: Seq[String], replacement: String): org.apache.spark.sql.Column =
    patterns.foldLeft(col("text"))((c, p) => regexp_replace(c, p, replacement))

  def redact(d: DataFrame, patterns: Seq[String],
      replacement: String): DataFrame = {
    require(patterns.nonEmpty, "redact needs at least one pattern")
    val n = patterns.map(p =>
        size(regexp_extract_all(col("text"), lit(p), lit(0))))
      .reduce(_ + _)
    val clean = redactedText(patterns, replacement)
    d.select(col("doc_id"), n.as("n_redacted"),
      substring(clean, 1, 60).as("head"), md5(clean.cast("binary")).as("clean_md5"))
  }

  private val tok = QueryUtil.oracleTokenCount

  /** DuckDB mirror of Kernels.rollingFingerprint(text, 16): the rolling
    * 64-bit Rabin-Karp hash is computed per window directly (each window's
    * polynomial hash = sum of byte * B^(15-j), with B^j mod 2^64 precomputed
    * as literals — Scala's wrapping Long multiply IS mod-2^64), then fmix64
    * is applied through list_transform lambdas. All arithmetic runs in
    * HUGEINT with explicit mod 2^64; a 64x64 wrapping multiply is split into
    * 32-bit halves so no intermediate exceeds HUGEINT range; xor() supports
    * HUGEINT natively; >>> 33 is integer division by 2^33. The final value
    * is re-signed to BIGINT, and the min is taken over SIGNED values
    * (matching the kernel's Long comparison).
    *
    * Preconditions (hold for this corpus, asserted in the t49 spec): text is
    * pure ASCII (so DuckDB's per-character ord == the kernel's UTF-8 bytes)
    * and every doc has >= 16 chars (no short-string fallback branch). */
  private val fingerprintOracle: String = {
    val B = 1000003L
    val pows = Iterator.iterate(1L)(_ * B).take(16).toArray // B^j mod 2^64
    def u(l: Long): String = java.lang.Long.toUnsignedString(l)
    val M64 = "18446744073709551616::HUGEINT"
    def mul64(a: String, c: Long): String = {
      val c1 = u(c >>> 32); val c0 = u(c & 0xffffffffL)
      s"(($a % 4294967296) * $c0::HUGEINT + " +
        s"((($a % 4294967296) * $c1::HUGEINT + ($a // 4294967296) * $c0::HUGEINT) % 4294967296) * 4294967296) % $M64"
    }
    def xorShift33(a: String): String = s"xor($a, $a // 8589934592)"
    val poly = (0 until 16)
      .map(j => s"ord(t[i+$j]) * ${u(pows(15 - j))}::HUGEINT").mkString(" + ")
    s"""WITH fp AS (
       |  SELECT doc_id, list_aggregate(list_transform(list_transform(
       |      list_transform(list_transform(list_transform(
       |        [($poly) % $M64 FOR i IN range(1, length(t) - 14)],
       |        (h) -> ${xorShift33("h")}),
       |      (h) -> ${mul64("h", 0xff51afd7ed558ccdL)}),
       |      (h) -> ${xorShift33("h")}),
       |      (h) -> ${mul64("h", 0xc4ceb9fe1a85ec53L)}),
       |      (h) -> CASE WHEN ${xorShift33("h")} >= 9223372036854775808::HUGEINT
       |                  THEN CAST(${xorShift33("h")} - $M64 AS BIGINT)
       |                  ELSE CAST(${xorShift33("h")} AS BIGINT) END),
       |    'min') AS fp
       |  FROM (SELECT doc_id, text AS t FROM documents))
       |SELECT fp, count(*) AS n_docs, min(doc_id) AS first_doc
       |FROM fp GROUP BY fp ORDER BY first_doc""".stripMargin
  }

  /** Mechanically unrolled DuckDB mirror of k BPE iterations. The
    * re-segmentation uses a window formulation of the leftmost-greedy rule
    * (a position merges iff it matches the pair AND sits at an even offset
    * within its run of consecutive matches — runs only exceed length 1 when
    * l = r), which is an INDEPENDENT derivation of the Spark side's
    * sequential fold: agreement checks the semantics, not a shared
    * implementation. */
  private def oracleBpe(k: Int): String = {
    val base =
      """WITH w AS (
        | SELECT word, CAST(count(*) AS BIGINT) AS freq FROM
        |  (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        | WHERE length(word) > 0 GROUP BY word),
        |s0 AS (
        | SELECT word, freq,
        |  list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS sym
        | FROM w)""".stripMargin
    val iters = (1 to k).map { i =>
      s"""p$i AS (
         | SELECT u.l AS l, u.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
         | FROM s${i - 1}, UNNEST(list_transform(generate_series(1, len(sym) - 1),
         |   i -> {'l': sym[i], 'r': sym[i + 1]})) AS t(u)
         | GROUP BY u.l, u.r),
         |m$i AS (SELECT CAST($i AS INTEGER) AS rnk, l, r, cnt FROM p$i
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |x$i AS (
         | SELECT word, freq, i AS pos, sym[i] AS s,
         |  (i < len(sym) AND sym[i] = (SELECT l FROM m$i)
         |     AND sym[i + 1] = (SELECT r FROM m$i)) AS mtch
         | FROM s${i - 1}, UNNEST(generate_series(1, len(sym))) AS g(i)),
         |r$i AS (
         | SELECT *, CASE WHEN mtch THEN pos - row_number()
         |   OVER (PARTITION BY word, mtch ORDER BY pos) END AS grp FROM x$i),
         |mg$i AS (
         | SELECT word, freq, pos, s,
         |  mtch AND ((pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0) AS merged
         | FROM r$i),
         |k$i AS (
         | SELECT word, freq, pos, s, merged,
         |  coalesce(lag(merged) OVER (PARTITION BY word ORDER BY pos), false) AS pm
         | FROM mg$i),
         |s$i AS (
         | SELECT word, any_value(freq) AS freq,
         |  list(CASE WHEN merged THEN (SELECT l || r FROM m$i) ELSE s END ORDER BY pos)
         |    FILTER (WHERE NOT pm) AS sym
         | FROM k$i GROUP BY word)""".stripMargin
    }
    val union = (1 to k).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
    (base +: iters).mkString(",\n") +
      s"\nSELECT rnk, l, r, cnt FROM ($union) ORDER BY rnk"
  }

  /** t48's langid heuristic as DuckDB SQL producing (doc_id, lang_pred) —
    * shared by the t48 oracle and the t64 confusion-matrix oracle. */
  private val oracleLangIdCore: String =
    """WITH toks AS (
      | SELECT doc_id, unnest(list_filter(
      |   string_split_regex(lower(text), '[^a-z]+'), t -> t != '')) AS t
      | FROM documents),
      |sc AS (SELECT doc_id,
      | count(*) FILTER (WHERE t IN ('the','and','of','to','is','in','that','it','was','for')) AS s_en,
      | count(*) FILTER (WHERE t IN ('der','und','die','das','ist','nicht','ein','mit','auf','zu')) AS s_de,
      | count(*) FILTER (WHERE t IN ('le','la','et','les','des','est','un','une','dans','que')) AS s_fr,
      | count(*) FILTER (WHERE t IN ('el','la','de','que','y','en','los','del','las','una')) AS s_es
      | FROM toks GROUP BY doc_id)
      |SELECT d.doc_id, CASE
      | WHEN coalesce(s_en,0) > 0 AND s_en >= coalesce(s_de,0) AND s_en >= coalesce(s_fr,0) AND s_en >= coalesce(s_es,0) THEN 'en'
      | WHEN coalesce(s_de,0) > 0 AND s_de > coalesce(s_en,0) AND s_de >= coalesce(s_fr,0) AND s_de >= coalesce(s_es,0) THEN 'de'
      | WHEN coalesce(s_fr,0) > 0 AND s_fr > coalesce(s_en,0) AND s_fr > coalesce(s_de,0) AND s_fr >= coalesce(s_es,0) THEN 'fr'
      | WHEN coalesce(s_es,0) > 0 AND s_es > coalesce(s_en,0) AND s_es > coalesce(s_de,0) AND s_es > coalesce(s_fr,0) THEN 'es'
      | ELSE 'und' END AS lang_pred
      |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t58_bpe_merges" -> oracleBpe(5),
    // The vocab CTE mirrors t55's rank rule; list(... ORDER BY pos)
    // rebuilds document order; sum(INTEGER) widened by DuckDB to HUGEINT,
    // cast back to Spark's BIGINT fold result.
    "t57_tokenize" ->
      """WITH v AS (
        | SELECT token, count(*) AS n FROM
        |  (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |   FROM documents)
        | GROUP BY 1),
        |r AS (SELECT token,
        |  CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INTEGER)
        |    AS tid
        | FROM v),
        |t AS (
        | SELECT doc_id, generate_subscripts(s, 1) - 1 AS pos,
        |  unnest(s) AS token
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s
        |       FROM documents)),
        |j AS (SELECT doc_id, pos, tid FROM t JOIN r USING (token))
        |SELECT doc_id,
        | CAST(count(*) AS INTEGER) AS n_tok,
        | array_to_string(list(tid ORDER BY pos)[1:10], ' ') AS ids_head,
        | CAST(sum(tid) AS BIGINT) AS ids_sum
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same regex in both engines (Java regex here, RE2 there — the pattern
    // uses only shared syntax); DuckDB needs the explicit 'g' flag for
    // replace-all, which is Spark's default. len() narrowed to Spark's
    // INTEGER size().
    "t56_redact" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\b(key|hash|value)\b')) AS INTEGER)
        |   AS n_redacted,
        | substr(regexp_replace(text, '\b(key|hash|value)\b', '[X]', 'g'), 1, 60)
        |   AS head,
        | md5(regexp_replace(text, '\b(key|hash|value)\b', '[X]', 'g')) AS clean_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t49_fingerprint" -> fingerprintOracle,

    "t55_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |freq AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
        |SELECT token, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INTEGER) AS rnk,
        |  CAST(sum(n) OVER (ORDER BY n DESC, token ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  CAST(sum(n) OVER (ORDER BY n DESC, token ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |    CAST(sum(n) OVER () AS DOUBLE) AS share
        |FROM freq ORDER BY rnk""".stripMargin,

    // Spark's size() is INTEGER; count columns cast to match. The list
    // comprehension keeps s[i] != s[i-1] 1-based like Spark's 0-based
    // (t, i) -> element_at(toks, i) guard (both compare against the
    // previous element; first element always kept).
    "t54_normalize" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents),
        |d AS (
        | SELECT doc_id, s,
        |   [s[i] FOR i IN range(1, len(s) + 1) IF i = 1 OR s[i] != s[i-1]] AS dd
        | FROM t),
        |c AS (SELECT doc_id, s, dd, list_filter(dd, t -> length(t) > 1) AS cc FROM d)
        |SELECT doc_id, CAST(len(s) AS INTEGER) AS n_raw,
        | CAST(len(dd) AS INTEGER) AS n_dedup,
        | CAST(len(cc) AS INTEGER) AS n_clean,
        | array_to_string(cc[1:5], ' ') AS head
        |FROM c ORDER BY doc_id""".stripMargin,

    "t67_lexical_diversity" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM c GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_types,
        |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_hapax
        |        FROM tc GROUP BY 1)
        |SELECT t.doc_id, CAST(len(toks) AS INTEGER) AS n_tok, n_types,
        | CAST(n_types AS DOUBLE) / len(toks) AS ttr,
        | n_hapax, CAST(n_hapax AS DOUBLE) / len(toks) AS hapax_frac
        |FROM t JOIN agg ON agg.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // first-md5-nibble bucket via the instr idiom (= Spark's conv base-16)
    "t69_feature_hashing" ->
      """SELECT doc_id,
        | CAST(instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1
        |   AS INTEGER) AS bucket,
        | count(*) AS cnt
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // rational tf·n/df score (log-free, one IEEE divide of exact ints);
    // row_number narrowed to Spark's INTEGER; identical tiebreak
    "t68_tfidf_keywords" ->
      """WITH tf AS (
        | SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents)
        | GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, tf, df,
        |  CAST(tf * n_docs AS DOUBLE) / df AS score,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, term)
        |   AS INTEGER) AS rnk
        | FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, tf, df, score, rnk FROM sc WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    // 2-gram construction mirrors d52's shingle CTE; conditional p is one
    // IEEE divide of exact ints (DuckDB's HUGEINT sum widens transparently)
    // same staged integer-division order as the engine (floor composition
    // must match term for term — a single combined division rounds
    // differently); LIMIT under the same total order
    "t74_collocations" ->
      """WITH tk AS (
        | SELECT string_split_regex(trim(text), '\s+') AS s FROM documents),
        |bg AS (SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS bg
        |       FROM tk),
        |b AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
        |      FROM bg),
        |c AS (SELECT w1, w2, count(*) AS f_ab FROM b GROUP BY 1, 2),
        |nb AS (SELECT CAST(sum(f_ab) AS BIGINT) AS n_bg FROM c),
        |u AS (SELECT unnest(s) AS w FROM tk),
        |uc AS (SELECT w, count(*) AS f FROM u GROUP BY 1)
        |SELECT c.w1, c.w2, c.f_ab,
        |  ((c.f_ab * 1000000000) // ua.f) * nb.n_bg // ub.f AS score_q
        |FROM c
        |CROSS JOIN nb
        |JOIN uc ua ON ua.w = c.w1
        |JOIN uc ub ON ub.w = c.w2
        |WHERE c.f_ab >= 5
        |ORDER BY score_q DESC, c.w1, c.w2 LIMIT 50""".stripMargin,

    "t66_bigram_lm" ->
      """WITH sh AS (
        | SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS bg
        | FROM (SELECT string_split_regex(trim(text), '\s+') AS s FROM documents)),
        |b AS (SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
        |      FROM sh),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (SELECT w1, sum(cnt) AS tot FROM c GROUP BY 1),
        |r AS (SELECT w1, w2, cnt, CAST(cnt AS DOUBLE) / tot AS p,
        |  CAST(row_number() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS INTEGER)
        |    AS rnk
        | FROM c JOIN t USING (w1))
        |SELECT w1, w2, cnt, p, rnk FROM r WHERE rnk <= 3
        |ORDER BY w1, rnk""".stripMargin,

    // len()/list_filter lengths are INTEGER-narrowed to Spark's size();
    // the mean-word-length divide is the same IEEE op both sides.
    "t65_gopher_rules" ->
      """WITH s AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |  length(regexp_replace(text, '\s+', '', 'g')) AS nc
        | FROM documents),
        |r AS (SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tok,
        |  CAST(nc AS DOUBLE) / len(toks) AS mean_wlen,
        |  CAST(len(list_filter(toks, x ->
        |    x IN ('the','a','is','on','fast','slow'))) AS INTEGER) AS n_stop
        | FROM s)
        |SELECT doc_id, n_tok, mean_wlen, n_stop,
        | (n_tok >= 20 AND n_tok <= 80) AS r_wordcount,
        | (mean_wlen >= 4.0 AND mean_wlen <= 5.0) AS r_wordlen,
        | (n_stop >= 3) AS r_stopwords,
        | ((n_tok >= 20 AND n_tok <= 80) AND (mean_wlen >= 4.0 AND mean_wlen <= 5.0)
        |   AND n_stop >= 3) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // count(*) is already BIGINT in DuckDB (= Spark's LongType counts);
    // row_number() needs the INTEGER narrowing to match Spark's.
    // md5 hex strings min-compare lexicographically the same way in both
    // engines; list slices are 1-based inclusive both sides.
    "t63_winnow" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |h AS (SELECT doc_id,
        |  [md5(array_to_string(t[i:i+3], ' ')) FOR i IN range(1, len(t) - 2)] AS hk
        | FROM d WHERE len(t) >= 8),
        |s AS (SELECT doc_id,
        |  list_distinct([list_min(hk[j:j+4]) FOR j IN range(1, len(hk) - 3)]) AS sel
        | FROM h),
        |selr AS (SELECT doc_id, unnest(sel) AS fp FROM s),
        |cnt AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM selr GROUP BY 1)
        |SELECT doc_id, count(*) AS n_sel,
        | CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        | CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |   AS shared_frac
        |FROM selr JOIN cnt USING (fp)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // DuckDB list slice t[a:b] is 1-based inclusive and end-clamped, same
    // as Spark's slice(t, a, W); generate_series carries the stride.
    "t62_chunk" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |s AS (SELECT doc_id, t, len(t) AS n FROM d),
        |c AS (SELECT doc_id, t, n,
        |  unnest(generate_series(1, n, 96)) AS start_tok FROM s)
        |SELECT doc_id,
        | CAST((start_tok - 1) // 96 AS INTEGER) AS chunk_idx,
        | CAST(start_tok AS INTEGER) AS start_tok,
        | CAST(least(128, n - start_tok + 1) AS INTEGER) AS len,
        | array_to_string(t[start_tok:start_tok + 127], ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // bucket = first two md5 hex chars as an integer, mod 64 — the d67
    // hex-digit idiom widened to two nibbles.
    "t61_feature_hash" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        | FROM documents),
        |b AS (SELECT doc_id,
        |  CAST(((instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(md5(term), 2, 1)) - 1)) % 64
        |    AS INTEGER) AS bucket
        | FROM toks)
        |SELECT doc_id, bucket, count(*) AS cnt FROM b
        |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,

    // sqrt is correctly-rounded IEEE (unlike pow/exp); weights quantized
    // to exact BIGINTs (floor(w·1e6)) so the normalizer sum is exact and
    // every divide is a single IEEE op on exactly-representable values.
    "t60_mixture_weights" ->
      """WITH per AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tok
        | FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs, n_tok, sqrt(CAST(n_tok AS DOUBLE)) AS w,
        |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1000000.0) AS BIGINT) AS wq
        | FROM per),
        |tot AS (SELECT CAST(sum(wq) AS BIGINT) AS wsum FROM w)
        |SELECT source, n_docs, n_tok, w,
        | CAST(wq AS DOUBLE) / CAST(wsum AS DOUBLE) AS share,
        | 1000000.0 * (CAST(wq AS DOUBLE) / CAST(wsum AS DOUBLE))
        |   / CAST(n_tok AS DOUBLE) AS epochs_at_1m
        |FROM w, tot ORDER BY source""".stripMargin,

    // DuckDB sum(BIGINT) widens to DECIMAL — cast back to Spark's BIGINT;
    // the two ratio columns are single IEEE divides of exact integers
    // (deterministic, engine-identical).
    "t59_token_rarity" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        | FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
        | CAST(sum(tf * cf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS mean_cf,
        | min(cf) AS min_cf,
        | CAST(sum(CASE WHEN cf <= 2 THEN tf ELSE 0 END) AS DOUBLE)
        |   / CAST(sum(tf) AS DOUBLE) AS rare_frac
        |FROM tf JOIN cf USING (term)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "t53_distinctive_terms" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        | FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |r AS (
        | SELECT doc_id, term, tf, df,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tf DESC, df ASC, term ASC) AS INTEGER) AS rnk
        | FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, rnk FROM r
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "t52_repetition" ->
      """SELECT doc_id,
        | CAST(len(s) AS INTEGER) AS n_tok,
        | 1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s) AS dup_tok_frac,
        | CASE WHEN len(s) >= 2 THEN
        |   1.0 - CAST(len(list_distinct(
        |     [s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))])) AS DOUBLE)
        |     / (len(s) - 1)
        | ELSE 0.0 END AS dup_bigram_frac
        |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "t50_quality_filter" ->
      s"""SELECT doc_id, CAST($tok AS INTEGER) AS n_tokens,
        | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
        |   / length(text) AS vowel_ratio,
        | ${QueryUtil.oracleQualityPredicate} AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t46_text_stats" ->
      s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_char,
        | CAST($tok AS INTEGER) AS n_tokens,
        | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS INTEGER) AS n_vowels,
        | CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / nullif(length(text), 0) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t51_readability" ->
      s"""SELECT doc_id,
        | CAST($tok AS INTEGER) AS n_words,
        | CAST(len(string_split_regex(text, '[.!?]')) AS INTEGER) AS n_segs,
        | CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS INTEGER) AS n_vgroups,
        | CAST($tok AS DOUBLE)
        |   / len(string_split_regex(text, '[.!?]')) AS words_per_seg,
        | CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS DOUBLE)
        |   / nullif($tok, 0) AS vgroups_per_word
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Exact SQL mirror of Kernels.langId for an ASCII corpus: tokens are
    // [a-z]+ runs of lower(text) (Character.isLetter == [a-z] on ASCII),
    // per-occurrence stopword counts, first-profile-order tie-breaking
    // (a later profile needs a STRICTLY greater score to win), 'und' when
    // no profile word appears. CJK counting is identically zero on ASCII.
    "t48_lang_id" ->
      s"""$oracleLangIdCore
        |ORDER BY doc_id""".stripMargin,

    // the t64 confusion matrix reuses t48's langid mirror verbatim (one
    // definition — the eval and the classifier cannot drift)
    "t64_langid_eval" ->
      s"""WITH pred AS ($oracleLangIdCore),
        |m AS (
        | SELECT d.lang, p.lang_pred AS pred, count(*) AS n
        | FROM documents d JOIN pred p USING (doc_id)
        | GROUP BY 1, 2),
        |bl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_label FROM m GROUP BY 1),
        |bp AS (SELECT pred, CAST(sum(n) AS BIGINT) AS n_pred FROM m GROUP BY 1)
        |SELECT m.lang, m.pred, m.n,
        | CASE WHEN m.lang = m.pred
        |   THEN CAST(m.n AS DOUBLE) / CAST(bp.n_pred AS DOUBLE) END AS precision,
        | CASE WHEN m.lang = m.pred
        |   THEN CAST(m.n AS DOUBLE) / CAST(bl.n_label AS DOUBLE) END AS recall
        |FROM m JOIN bl USING (lang) JOIN bp USING (pred)
        |ORDER BY lang, pred""".stripMargin,

    "t47_token_count" ->
      s"""SELECT doc_id,
        | CAST($tok AS INTEGER) AS n_ws,
        | CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INTEGER) AS n_bpeish,
        | CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t70_zipf_spectrum" ->
      """WITH toks AS (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        | FROM documents),
        |tf AS (SELECT term, count(*) AS f FROM toks GROUP BY 1)
        |SELECT f, count(*) AS n_terms,
        | CAST(length(bin(f)) AS INTEGER) AS f_bucket
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,

    // bigram construction mirrors t66's CTE; p is quantized to
    // floor(p*1e9) BIGINTs before the per-doc sum so the mean is exact
    // ints + the same two IEEE divides on both engines
    "t71_lm_quality" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS bg
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS s
        |       FROM documents)),
        |c AS (SELECT bg, count(*) AS cnt,
        |       string_split(bg, ' ')[1] AS w1 FROM sh GROUP BY 1),
        |t AS (SELECT w1, sum(cnt) AS tot FROM c GROUP BY 1),
        |lm AS (SELECT bg,
        |  CAST(floor(CAST(cnt AS DOUBLE) / tot * 1e9) AS BIGINT) AS pq
        | FROM c JOIN t USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        | CAST(sum(pq) AS DOUBLE) / count(*) / 1e9 AS lm_score
        |FROM sh JOIN lm USING (bg)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // same quantized-integer TV identity: Σ_all |p−q| = Σ_present |p−q|
    // + (Qtot − Σ_present q); // and DIV agree on the positive operands
    "t72_source_drift" ->
      """WITH toks AS (
        | SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
        | FROM documents),
        |st AS (SELECT source, term, count(*) AS stf FROM toks GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(stf) AS BIGINT) AS ctf FROM st GROUP BY 1),
        |stot AS (SELECT source, CAST(sum(stf) AS BIGINT) AS sn
        |         FROM st GROUP BY 1),
        |ctot AS (SELECT CAST(sum(ctf) AS BIGINT) AS cn FROM ct),
        |qt AS (SELECT term,
        |  CAST((CAST(ctf AS HUGEINT) * 1000000000) // cn AS BIGINT) AS q
        |  FROM ct, ctot),
        |qtot AS (SELECT CAST(sum(q) AS BIGINT) AS q_tot FROM qt),
        |ag AS (
        | SELECT st.source, sn, count(*) AS n_types,
        |  CAST(sum(abs(CAST((CAST(stf AS HUGEINT) * 1000000000) // sn
        |    AS BIGINT) - q)) AS BIGINT) AS sum_abs,
        |  CAST(sum(q) AS BIGINT) AS sum_q_present
        | FROM st JOIN qt USING (term) JOIN stot ON stot.source = st.source
        | GROUP BY 1, 2)
        |SELECT source, sn, n_types,
        | sum_abs + (q_tot - sum_q_present) AS tvd_q,
        | CAST(sum_abs + (q_tot - sum_q_present) AS DOUBLE) / 2e9 AS tvd
        |FROM ag, qtot ORDER BY source""".stripMargin,

    // lexical retrieval mirror: same postings/df/query-term CTEs, the
    // integer rarity weight as DuckDB `//`, rank window over the tiny
    // per-query score set (score DESC, did — graft_topk_pairs' tie rule)
    "t73_lexical_topk" ->
      """WITH post AS (
        | SELECT did, token, count(*) AS tf FROM (
        |  SELECT doc_id AS did,
        |   unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents WHERE doc_id >= 10) GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
        |qt AS (SELECT DISTINCT qid, token FROM (
        | SELECT doc_id AS qid,
        |  unnest(string_split_regex(trim(text), '\s+')) AS token
        | FROM documents WHERE doc_id < 10)),
        |sc AS (
        | SELECT qid, did, CAST(sum(tf * (1000000000 // df)) AS BIGINT) AS score
        | FROM qt JOIN post USING (token) JOIN dfreq USING (token)
        | GROUP BY 1, 2),
        |rer AS (SELECT qid, did, score,
        |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rnk
        | FROM sc)
        |SELECT qid, did, score, CAST(rnk AS INTEGER) AS rnk
        |FROM rer WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  )
}
