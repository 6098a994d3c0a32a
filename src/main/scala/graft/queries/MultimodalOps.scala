package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Multimodal-column handling: opaque `binary` payloads + typed metadata.
  * The decode step is a clearly-marked deterministic fake (no image/audio
  * libs in this container — see Kernels.fakeWidth); what is real and tested
  * is the Spark-side plumbing: binary column schema, the scalar
  * decode-expression boundary (codegen row path), and the batched
  * mapPartitions shape (the Scala analogue of mapInPandas: one iterator per
  * partition, constant memory, no driver materialization).
  */
object MultimodalOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload -> typed metadata struct via custom expression.
    "m60_image_meta" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"), expr("graft_image_meta(payload)").as("meta"))
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.format").as("format"))
        .orderBy(col("doc_id"))
    }),

    // Audio-shaped payload metadata: duration/sample-rate stubs derived from
    // byte length (real decode would use an audio lib; arithmetic keeps it
    // oracle-checkable). Same binary plumbing as m60 with a second modality.
    "m62_audio_meta" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          (octet_length(col("payload")).cast("double") / 16000.0).as("duration_s"),
          (lit(8000) + (octet_length(col("payload")) % 3) * lit(8000)).as("sample_rate"),
          (octet_length(col("payload")) % 2 === 0).as("stereo"))
        .orderBy(col("doc_id"))
    }),

    // Modality routing + per-format corpus stats: the aggregation a
    // pipeline runs to decide how to shard decode work across format-
    // specific workers. Groups on decoded (stub) format, exact byte
    // accounting (integer sums — no float drift).
    "m63_format_stats" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        // explicit null guard BOTH sides: without it a NULL payload would
        // group under a NULL format here but under 'webp' in the oracle
        // (CASE NULL%3 falls to ELSE) — don't leave that to corpus luck
        .filter(col("text").isNotNull)
        .select(col("text").cast("binary").as("payload"))
        .select(expr("graft_image_meta(payload)").as("meta"))
        .select(col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes").cast("long")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy(col("format"))
    }),

    // Interleaved multimodal context-window packing — the vision-language
    // final mile: each doc contributes its text tokens PLUS its image's
    // patch tokens (ViT-style (w/16)·(h/16) patches from the m60 stub
    // metadata; the count is what a real decoder would also produce), and
    // the combined token stream packs into fixed-1024 windows under d70's
    // EXACT prefix-sum rule (shared seqPackFrame — the two packers cannot
    // drift). Output keeps the per-doc modality split (n_txt, n_patch) next
    // to each fragment so a loader can budget attention masks. Cost = the
    // d70 two-pass prefix sum + one co-partitioned doc_id join; patch
    // arithmetic is scan-local.
    "m65_interleaved_pack" -> ((s, dir) => {
      val cost = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          QueryUtil.tokenCount(col("text")).cast("long").as("n_txt"),
          expr("cast(((64 + length(text) % 512) div 16) * " +
            "((64 + (length(text) * 7) % 512) div 16) as bigint)").as("n_patch"))
      DedupOps.seqPackFrame(
          cost.select(col("doc_id"), (col("n_txt") + col("n_patch")).as("n_tok")),
          L = 1024L, twoPass = true)
        .join(cost, "doc_id")
        .select(col("seq_id"), col("doc_id"), col("seq_off"), col("doc_off"),
          col("len"), col("n_txt"), col("n_patch"))
        .orderBy(col("seq_id"), col("seq_off"))
    }),

    // Batched frame extraction over binary payloads via mapPartitions —
    // the partition-iterator shape a real decoder (ffmpeg/PIL worker) would
    // use. The fake frame features are pure byte arithmetic over the ASCII
    // payload (mean byte of each 200-byte block), so a full DuckDB oracle
    // IS expressible (ord-per-char mirror below) — the stub decode is
    // hash-checked, not just rows-counted.
    "m61_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .repartition(s.sparkContext.defaultParallelism) // decode runs per partition
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // fake "video": one frame per started 200-byte block, capped at 4;
          // feature = mean byte value of the frame's slice (a stand-in for a
          // decoded frame embedding). Null payloads produce no frames.
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            val nFrames = math.min(4, (bytes.length + 199) / 200)
            (0 until nFrames).iterator.map { f =>
              val from = f * 200
              val until = math.min(bytes.length, from + 200)
              var sum = 0L; var i = from
              while (i < until) { sum += bytes(i) & 0xff; i += 1 }
              (id, f, sum.toDouble / (until - from))
            }
          }
        }
      }.toDF("doc_id", "frame_idx", "feat_mean")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // DE-STUBBED modality: REAL RIFF/WAVE round-trip in pure JVM byte
    // arithmetic (no media lib needed for PCM WAV — headers are fixed-offset
    // little-endian fields). Each doc's bytes become the PCM payload of a
    // genuine WAV file (graft_wav_build; rate/channels varied per doc), and
    // the metadata comes from actually PARSING those bytes back with a
    // chunk-walking RIFF reader (graft_wav_meta) — not from length
    // arithmetic. The oracle computes the expected fields directly from the
    // construction parameters, so the driver compare proves the
    // encode→parse round-trip recovers them exactly. Golden-byte and
    // foreign-chunk/corruption specs in KernelsSpec prove the parser
    // against fixtures the builder didn't produce.
    // PCM sample statistics through the REAL codec path: build the WAV
    // (m64's encoder), walk its RIFF chunks, and aggregate the 8-bit data
    // chunk — n/mean/RMS/peak-deviation, the per-file numbers an audio
    // pipeline gates on (silence ⇒ near-zero peak dev; clipping ⇒ peak at
    // the rail; loudness buckets from RMS). Integer-exact sums inside the
    // kernel; the only floats are one division and one IEEE-exact sqrt, so
    // the byte-level DuckDB mirror hash-matches. Scan-local decode —
    // embarrassingly parallel, the m60-m64 cost model.
    "m66_wav_stats" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          expr("graft_wav_stats8(graft_wav_build(cast(text as binary), " +
            "cast(8000 * (1 + doc_id % 3) as int), cast(1 + doc_id % 2 as int), 8))")
            .as("st"))
        .select(col("doc_id"),
          col("st")(0).as("n_samples"),
          (col("st")(1).cast("double") / col("st")(0).cast("double")).as("mean_level"),
          sqrt(col("st")(2).cast("double") / col("st")(0).cast("double")).as("rms"),
          col("st")(3).as("peak_dev"))
        .orderBy(col("doc_id"))
    }),

    "m64_wav_meta" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          expr("graft_wav_build(cast(text as binary), " +
            "cast(8000 * (1 + doc_id % 3) as int), cast(1 + doc_id % 2 as int), 8)")
            .as("payload"))
        .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"),
          expr("graft_wav_meta(payload)").as("meta"))
        .select(col("doc_id"), col("n_bytes"),
          col("meta.channels").as("channels"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_samples").as("n_samples"),
          col("meta.duration_s").as("duration_s"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // d70's prefix-sum packing oracle with the multimodal cost (text tokens
    // + stub ViT patches) and the per-doc modality split carried through.
    "m65_interleaved_pack" ->
      s"""WITH t AS (
         | SELECT doc_id, CAST(${QueryUtil.oracleTokenCount} AS BIGINT) AS n_txt,
         |  CAST(((64 + strlen(text) % 512) // 16)
         |    * ((64 + (strlen(text) * 7) % 512) // 16) AS BIGINT) AS n_patch
         | FROM documents),
         |c AS (
         | SELECT doc_id, n_txt, n_patch, n_txt + n_patch AS n_tok,
         |  coalesce(CAST(sum(n_txt + n_patch) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
         | FROM t WHERE n_txt + n_patch > 0),
         |f AS (
         | SELECT CAST(u.seq_id AS BIGINT) AS seq_id, doc_id, cb, n_tok, n_txt, n_patch
         | FROM c, UNNEST(generate_series(cb // 1024, (cb + n_tok - 1) // 1024))
         |   AS u(seq_id))
         |SELECT seq_id, doc_id,
         | greatest(cb, seq_id * 1024) - seq_id * 1024 AS seq_off,
         | greatest(cb, seq_id * 1024) - cb AS doc_off,
         | least(cb + n_tok, (seq_id + 1) * 1024) - greatest(cb, seq_id * 1024) AS len,
         | n_txt, n_patch
         |FROM f ORDER BY seq_id, seq_off""".stripMargin,
    // Mirror of the mapPartitions fake decoder: one frame per started
    // 200-byte block (capped at 4), feature = mean byte value of the block.
    // ASCII corpus (spec-asserted precondition, shared with the t49 oracle)
    // makes per-char ord == the UTF-8 byte Spark sums. The integer sum and
    // count are exact on both engines; the single double division of equal
    // integers is IEEE-identical.
    "m61_frame_sample" ->
      """SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
        | CAST(list_sum([ord(t[i]) FOR i IN
        |   range(f * 200 + 1, least(length(t), f * 200 + 200) + 1)]) AS DOUBLE)
        |  / (least(length(t), f * 200 + 200) - f * 200) AS feat_mean
        |FROM (
        |  SELECT doc_id, t,
        |    unnest(range(0, least(4, (length(t) + 199) // 200))) AS f
        |  FROM (SELECT doc_id, text AS t FROM documents
        |        WHERE text IS NOT NULL AND length(text) > 0))
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "m62_audio_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        | CAST(strlen(text) AS DOUBLE) / 16000.0 AS duration_s,
        | CAST(8000 + (strlen(text) % 3) * 8000 AS INTEGER) AS sample_rate,
        | strlen(text) % 2 = 0 AS stereo
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m63_format_stats" ->
      """SELECT CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |   ELSE 'webp' END AS format,
        | count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | CAST(max(strlen(text)) AS INTEGER) AS max_bytes
        |FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    // Byte-level mirror of the data-chunk aggregate (ASCII corpus ⇒ ord ==
    // payload byte, the t49/m61 precondition); exact integer sums, one
    // IEEE divide, one correctly-rounded sqrt.
    "m66_wav_stats" ->
      """WITH b AS (
        | SELECT doc_id,
        |  [ord(text[i]) FOR i IN range(1, strlen(text) + 1)] AS bs
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |s AS (SELECT doc_id, CAST(len(bs) AS BIGINT) AS n,
        |  CAST(list_sum(bs) AS BIGINT) AS sm,
        |  CAST(list_sum([x * x FOR x IN bs]) AS BIGINT) AS sq,
        |  CAST(list_max([abs(x - 128) FOR x IN bs]) AS BIGINT) AS peak_dev
        | FROM b)
        |SELECT doc_id, n AS n_samples,
        | CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean_level,
        | sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) AS rms,
        | peak_dev
        |FROM s ORDER BY doc_id""".stripMargin,

    // Mirrors the CONSTRUCTION parameters, not the parse: Spark's side
    // builds real WAV bytes and walks the chunks back; equality proves the
    // round-trip. ASCII corpus => strlen == byte count (t49's precondition).
    // The single double division of exact integers is IEEE-identical.
    "m64_wav_meta" ->
      """SELECT doc_id, CAST(44 + strlen(text) AS INTEGER) AS n_bytes,
        | CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        | CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
        | CAST(strlen(text) // (1 + doc_id % 2) AS BIGINT) AS n_samples,
        | CAST(strlen(text) AS DOUBLE)
        |   / (8000 * (1 + doc_id % 3) * (1 + doc_id % 2)) AS duration_s
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    // Metadata is pure arithmetic on byte length => SQL-expressible.
    "m60_image_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        | CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
        | CAST(64 + (strlen(text) * 7) % 512 AS INTEGER) AS height,
        | CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |   ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
