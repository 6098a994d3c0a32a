package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{GraftFunctions, Kernels}

/** Multimodal-column handling: opaque `binary` payloads + typed metadata.
  * Both decode modalities are REAL codecs in pure JVM byte arithmetic (no
  * media libs needed for uncompressed formats): a 24bpp DIB/BMP encoder +
  * fixed-offset parser (bottom-up rows, stride padding) and a RIFF/WAVE
  * encoder + chunk-walking parser. Since no media files ship in this
  * container, payloads are BUILT from corpus bytes and then parsed back —
  * the driver compare proves each encode→decode round-trip recovers the
  * construction parameters exactly. Also real and tested: binary column
  * schema, the scalar decode-expression boundary (codegen row path), and
  * the batched mapPartitions shape (the Scala analogue of mapInPandas: one
  * iterator per partition, constant memory, no driver materialization).
  */
object MultimodalOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DE-STUBBED image modality: each doc's bytes become the pixel stream
    // of a REAL 24bpp BMP (graft_bmp_build; width varied per doc), and the
    // metadata comes from actually PARSING those bytes back with a
    // fixed-offset DIB reader (graft_bmp_meta) — not from length
    // arithmetic. The oracle computes the expected geometry (height from
    // ceil-division, 4-byte row stride, image size) directly from the
    // construction parameters, so the compare proves the encode→parse
    // round-trip. Golden-byte, top-down, offset-gap and corruption specs
    // in KernelsSpec prove the parser against fixtures the builder never
    // produces.
    "m60_image_meta" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          expr("graft_bmp_build(cast(text as binary), cast(16 + doc_id % 49 as int))")
            .as("img"))
        .select(col("doc_id"), octet_length(col("img")).as("n_bytes"),
          expr("graft_bmp_meta(img)").as("meta"))
        .select(col("doc_id"), col("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.bpp").as("bpp"), col("meta.img_size").as("img_size"))
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

    // Modality routing + per-shape corpus stats: the aggregation a
    // pipeline runs to decide how to shard decode work across
    // geometry-specific workers (e.g. resize kernels batched by aspect
    // class). The routing key comes from the REAL parsed BMP geometry
    // (width vs height out of graft_bmp_meta), exact byte accounting
    // (integer sums — no float drift).
    // Width is jittered around sqrt(pixel count) so the corpus genuinely
    // spans all three aspect classes (a fixed narrow width made every doc
    // portrait — a 1-group degenerate test). floor(sqrt(n)) is safe
    // cross-engine: IEEE sqrt is correctly rounded on both.
    "m63_shape_stats" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(expr(
          "graft_bmp_meta(graft_bmp_build(cast(text as binary), " +
            "greatest(1, cast(floor(sqrt(cast((length(text) + 2) div 3 " +
            "as double))) as int) - 3 + cast(doc_id % 7 as int))))").as("m"))
        .select(
          when(col("m.width") > col("m.height"), "landscape")
            .when(col("m.width") < col("m.height"), "portrait")
            .otherwise("square").as("shape"),
          col("m.height").as("h"), col("m.img_size").as("img_size"))
        .groupBy(col("shape"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("img_size").cast("long")).as("total_bytes"),
          max(col("h")).as("max_height"))
        .orderBy(col("shape"))
    }),

    // Interleaved multimodal context-window packing — the vision-language
    // final mile: each doc contributes its text tokens PLUS its image's
    // patch tokens (ViT-style ceil(w/16)·ceil(h/16) patches over the SAME
    // geometry the m60 encoder produces — width 16+doc_id%49, height from
    // the ceil-division rule; a patch COUNT needs only the dims, so this
    // stays scan-local arithmetic), and the combined token stream packs
    // into fixed-1024 windows under d70's EXACT prefix-sum rule (shared
    // seqPackFrame — the two packers cannot drift). Output keeps the
    // per-doc modality split (n_txt, n_patch) next to each fragment so a
    // loader can budget attention masks. Cost = the d70 two-pass prefix
    // sum + one co-partitioned doc_id join; patch arithmetic is scan-local.
    "m65_interleaved_pack" -> ((s, dir) => {
      val cost = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          QueryUtil.tokenCount(col("text")).cast("long").as("n_txt"),
          expr("cast((((16 + doc_id % 49) + 15) div 16) * " +
            "((((length(text) + 2) div 3 + (16 + doc_id % 49) - 1) " +
            "div (16 + doc_id % 49) + 15) div 16) as bigint)").as("n_patch"))
      DedupOps.seqPackFrame(
          cost.select(col("doc_id"), (col("n_txt") + col("n_patch")).as("n_tok")),
          L = 1024L, twoPass = true)
        .join(cost, "doc_id")
        .select(col("seq_id"), col("doc_id"), col("seq_off"), col("doc_off"),
          col("len"), col("n_txt"), col("n_patch"))
        .orderBy(col("seq_id"), col("seq_off"))
    }),

    // Batched frame/tile extraction over binary payloads via mapPartitions
    // — the partition-iterator shape a real decoder worker uses (one
    // iterator per partition, constant memory). DE-STUBBED: each payload
    // is encoded as a real 24bpp BMP and the bands are read back through
    // the PARSED geometry — pixel-data offset, 4-byte row stride, and the
    // bottom-up row order (a reader that ignored orientation would sample
    // the wrong bands). One frame per started 8-row band, capped at 4;
    // feature = mean pixel byte over the band (stride padding excluded,
    // zero-fill of the final partial row included). The DuckDB oracle
    // mirrors the LOGICAL pixel order from the construction parameters, so
    // the hash-match proves the bottom-up walk is correct.
    "m61_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val src = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .repartition(s.sparkContext.defaultParallelism) // decode runs per partition
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = Kernels.bmpBuild(bytes, (16 + id % 49).toInt)
          val m = Kernels.bmpParse(img)
          val nFrames = math.min(4, (m.height + 7) / 8)
          (0 until nFrames).iterator.map { f =>
            val (sum, cnt) =
              Kernels.bmpBandSum(img, m, f * 8, math.min(m.height, f * 8 + 8))
            (id, f, sum.toDouble / cnt)
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

    // Per-CHANNEL pixel statistics through the real codec path — the
    // normalize/resize precursor an image pipeline computes per file
    // (channel means feed mean-subtraction; a grayscale-ish image shows
    // near-equal channels). graft_bmp_chanstats walks the PARSED
    // stride/orientation and sums the storage-order BGR bytes per channel
    // (padding excluded, zero-fill of the last partial pixel included).
    // The oracle mirrors the logical pixel stream by residue class
    // (channel c = bytes at positions ≡ c mod 3), so the hash-match
    // proves the interleaved-channel walk. Integer-exact sums; the only
    // floats are three divisions of exact ints.
    "m67_channel_stats" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          expr("graft_bmp_chanstats(graft_bmp_build(cast(text as binary), " +
            "cast(16 + doc_id % 49 as int)))").as("st"))
        .select(col("doc_id"), col("st")(0).as("n_pix"),
          (col("st")(1).cast("double") / col("st")(0)).as("mean_c0"),
          (col("st")(2).cast("double") / col("st")(0)).as("mean_c1"),
          (col("st")(3).cast("double") / col("st")(0)).as("mean_c2"))
        .orderBy(col("doc_id"))
    }),

    // 16-bit (CD-depth) PCM statistics through the same real codec path as
    // m66: build the WAV at bits=16 (text truncated to an even byte count
    // — an odd data size is malformed for int16 and the parser rejects
    // it), walk its RIFF chunks, and aggregate the data chunk as SIGNED
    // little-endian int16 samples — n/mean/RMS/peak-|v|. The oracle pairs
    // the logical bytes (lo + 256·hi, two's-complement fold) so the
    // hash-match proves the int16 LE decode; signedness edge cases
    // (0x8000 → −32768) are KernelsSpec-pinned since the ASCII corpus
    // never produces a negative sample.
    "m68_wav16_stats" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) >= 2)
        .select(col("doc_id"),
          expr("graft_wav_stats16(graft_wav_build(cast(substr(text, 1, " +
            "length(text) - length(text) % 2) as binary), 16000, 1, 16))")
            .as("st"))
        .select(col("doc_id"), col("st")(0).as("n_samples"),
          (col("st")(1).cast("double") / col("st")(0).cast("double")).as("mean_level"),
          sqrt(col("st")(2).cast("double") / col("st")(0).cast("double")).as("rms"),
          col("st")(3).as("peak_abs"))
        .orderBy(col("doc_id"))
    }),

    // IMAGE RESIZE through the real codec — the transform stage of an
    // image pipeline (decode → downsample → re-encode), not just a decode:
    // nearest-neighbor 2× downsample (output pixel (x,y) = input (2x,2y),
    // top-left anchor), then the RESIZED image is parsed back and
    // channel-aggregated. The oracle computes the sampled byte indices
    // straight from the construction parameters (idx = 3·(2y·w + 2x) + c),
    // so the hash-match proves parse → sample → re-encode → re-parse
    // end-to-end. Scan-local per doc, embarrassingly parallel.
    "m69_resize" -> ((s, dir) => {
      GraftFunctions.register(s)
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          expr("graft_bmp_downsample2x(graft_bmp_build(cast(text as binary), " +
            "cast(16 + doc_id % 49 as int)))").as("img2"))
        .select(col("doc_id"), expr("graft_bmp_meta(img2)").as("m"),
          expr("graft_bmp_chanstats(img2)").as("st"))
        .select(col("doc_id"),
          col("m.width").as("w2"), col("m.height").as("h2"),
          col("st")(0).as("n_pix2"),
          (col("st")(1).cast("double") / col("st")(0)).as("mean_c0"),
          (col("st")(2).cast("double") / col("st")(0)).as("mean_c1"),
          (col("st")(3).cast("double") / col("st")(0)).as("mean_c2"))
        .orderBy(col("doc_id"))
    }),

    // Perceptual near-dup fingerprint (average hash) through the REAL
    // codec: build → parse → 8×8 nearest-neighbor luma grid → threshold
    // at the grid mean (scale-free 64·l > Σl integer compare) → 64-bit
    // row-major bit string. n_same counts hash collisions corpus-wide —
    // the perceptual-dedup grouping an image pipeline runs before paying
    // for embeddings. Scan-local kernel + one hash-keyed window; the
    // oracle recomputes every grid sample byte-for-byte in SQL, so the
    // whole decode+hash path is hash-matched, not just spec'd.
    "m70_ahash" -> ((s, dir) => {
      GraftFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          expr("graft_bmp_ahash(graft_bmp_build(cast(text as binary), " +
            "cast(16 + doc_id % 49 as int)))").as("ahash"))
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy(col("ahash"))))
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
    // + ViT patches over the m60 encoder's real geometry) and the per-doc
    // modality split carried through.
    "m65_interleaved_pack" ->
      s"""WITH t AS (
         | SELECT doc_id, CAST(${QueryUtil.oracleTokenCount} AS BIGINT) AS n_txt,
         |  CAST(((16 + doc_id % 49 + 15) // 16)
         |    * ((((strlen(text) + 2) // 3 + (16 + doc_id % 49) - 1)
         |        // (16 + doc_id % 49) + 15) // 16) AS BIGINT) AS n_patch
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
    // Mirrors the LOGICAL pixel order of the m61 band reader from the
    // construction parameters: pixel byte i is the doc's byte i (ord ==
    // UTF-8 byte on the ASCII corpus — spec-asserted precondition shared
    // with the t49 oracle), zero-filled to complete the last row; band f
    // covers logical rows [f*8, min(h, f*8+8)), w*3 payload bytes per row
    // (stride padding excluded). Spark reads the same bytes through the
    // PARSED offset/stride/bottom-up geometry — equality proves that walk.
    // Integer sum and count are exact; the one double division of equal
    // integers is IEEE-identical.
    "m61_frame_sample" ->
      """WITH p AS (
        | SELECT doc_id, text AS t, strlen(text) AS len, 16 + doc_id % 49 AS w
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT doc_id, t, len, w,
        |  ((len + 2) // 3 + w - 1) // w AS h FROM p),
        |f AS (SELECT doc_id, t, len, w, h,
        |  unnest(range(0, least(4, (h + 7) // 8))) AS fr FROM g)
        |SELECT doc_id, CAST(fr AS INTEGER) AS frame_idx,
        | CAST(coalesce(list_sum([ord(t[i]) FOR i IN
        |   range(fr * 8 * w * 3 + 1,
        |         least(len, least(h, fr * 8 + 8) * w * 3) + 1)]), 0) AS DOUBLE)
        |  / ((least(h, fr * 8 + 8) - fr * 8) * w * 3) AS feat_mean
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // Channel c of logical pixel p is byte 3p+c of the stream (text ords
    // with zero-fill); mirrored by the 1-based step-3 residue ranges.
    // Spark reads the SAME bytes through the parsed bottom-up stride walk.
    "m67_channel_stats" ->
      """WITH p AS (
        | SELECT doc_id, text AS t, strlen(text) AS len, 16 + doc_id % 49 AS w
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT doc_id, t, len, w,
        |  ((len + 2) // 3 + w - 1) // w AS h FROM p)
        |SELECT doc_id, CAST(w * h AS BIGINT) AS n_pix,
        | CAST(coalesce(list_sum([ord(t[i]) FOR i IN range(1, len + 1, 3)]), 0)
        |   AS DOUBLE) / (w * h) AS mean_c0,
        | CAST(coalesce(list_sum([ord(t[i]) FOR i IN range(2, len + 1, 3)]), 0)
        |   AS DOUBLE) / (w * h) AS mean_c1,
        | CAST(coalesce(list_sum([ord(t[i]) FOR i IN range(3, len + 1, 3)]), 0)
        |   AS DOUBLE) / (w * h) AS mean_c2
        |FROM g ORDER BY doc_id""".stripMargin,

    // sampled byte index from the construction params: output pixel k →
    // (x, y) = (k % wo, k // wo) → input byte 3·(2y·w + 2x) + c, zero
    // beyond len (the encoder's zero-fill). Exact int sums, one divide.
    "m69_resize" ->
      """WITH p AS (
        | SELECT doc_id, text AS t, strlen(text) AS len, 16 + doc_id % 49 AS w
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT doc_id, t, len, w,
        |  ((len + 2) // 3 + w - 1) // w AS h FROM p),
        |o AS (SELECT doc_id, t, len, w,
        |  (w + 1) // 2 AS wo, (h + 1) // 2 AS ho FROM g)
        |SELECT doc_id, CAST(wo AS INTEGER) AS w2, CAST(ho AS INTEGER) AS h2,
        | CAST(wo * ho AS BIGINT) AS n_pix2,
        | CAST(coalesce(list_sum([CASE
        |    WHEN 3 * (2 * (k // wo) * w + 2 * (k % wo)) < len
        |    THEN ord(t[3 * (2 * (k // wo) * w + 2 * (k % wo)) + 1]) ELSE 0 END
        |   FOR k IN range(0, wo * ho)]), 0) AS DOUBLE) / (wo * ho) AS mean_c0,
        | CAST(coalesce(list_sum([CASE
        |    WHEN 3 * (2 * (k // wo) * w + 2 * (k % wo)) + 1 < len
        |    THEN ord(t[3 * (2 * (k // wo) * w + 2 * (k % wo)) + 2]) ELSE 0 END
        |   FOR k IN range(0, wo * ho)]), 0) AS DOUBLE) / (wo * ho) AS mean_c1,
        | CAST(coalesce(list_sum([CASE
        |    WHEN 3 * (2 * (k // wo) * w + 2 * (k % wo)) + 2 < len
        |    THEN ord(t[3 * (2 * (k // wo) * w + 2 * (k % wo)) + 3]) ELSE 0 END
        |   FOR k IN range(0, wo * ho)]), 0) AS DOUBLE) / (wo * ho) AS mean_c2
        |FROM o ORDER BY doc_id""".stripMargin,

    // every grid sample recomputed byte-for-byte: logical pixel (x,y) of
    // the built image carries payload bytes 3*(y*w+x).. (zero-filled past
    // the text end, exactly like the builder)
    "m70_ahash" ->
      """WITH p AS (
        | SELECT doc_id, text AS t, strlen(text) AS len, 16 + doc_id % 49 AS w
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT doc_id, t, len, w,
        |  ((len + 2) // 3 + w - 1) // w AS h FROM p),
        |l AS (SELECT doc_id,
        |  [299 * (CASE WHEN 3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) < len
        |     THEN ord(t[3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) + 1]) ELSE 0 END)
        |   + 587 * (CASE WHEN 3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) + 1 < len
        |     THEN ord(t[3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) + 2]) ELSE 0 END)
        |   + 114 * (CASE WHEN 3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) + 2 < len
        |     THEN ord(t[3 * (((k // 8) * h // 8) * w + (k % 8) * w // 8) + 3]) ELSE 0 END)
        |   FOR k IN range(0, 64)] AS ls
        | FROM g),
        |hsh AS (SELECT doc_id, array_to_string(list_transform(ls,
        |    x -> CASE WHEN 64 * x > list_sum(ls) THEN '1' ELSE '0' END), '')
        |   AS ahash
        | FROM l)
        |SELECT doc_id, ahash,
        | CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same
        |FROM hsh ORDER BY doc_id""".stripMargin,

    "m62_audio_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS n_bytes,
        | CAST(strlen(text) AS DOUBLE) / 16000.0 AS duration_s,
        | CAST(8000 + (strlen(text) % 3) * 8000 AS INTEGER) AS sample_rate,
        | strlen(text) % 2 = 0 AS stereo
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Geometry from the construction parameters; Spark's side groups on
    // the PARSED width/height — equality proves the decode.
    "m63_shape_stats" ->
      """WITH p AS (
        | SELECT greatest(1, CAST(floor(sqrt((strlen(text) + 2) // 3))
        |   AS BIGINT) - 3 + doc_id % 7) AS w, strlen(text) AS len
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT w, ((len + 2) // 3 + w - 1) // w AS h,
        |  (((w * 3 + 3) // 4) * 4) * (((len + 2) // 3 + w - 1) // w) AS img
        | FROM p)
        |SELECT CASE WHEN w > h THEN 'landscape' WHEN w < h THEN 'portrait'
        |   ELSE 'square' END AS shape,
        | count(*) AS n_docs, CAST(sum(img) AS BIGINT) AS total_bytes,
        | CAST(max(h) AS INTEGER) AS max_height
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // int16 LE pairing of the logical bytes (lo + 256·hi with the
    // two's-complement fold); exact integer sums, IEEE divides, one
    // correctly-rounded sqrt.
    "m68_wav16_stats" ->
      """WITH b AS (
        | SELECT doc_id,
        |  [ord(text[i]) FOR i IN range(1, strlen(text) - strlen(text) % 2 + 1)] AS bs
        | FROM documents WHERE text IS NOT NULL AND strlen(text) >= 2),
        |v AS (SELECT doc_id,
        |  [CASE WHEN bs[2*k+1] + 256 * bs[2*k+2] >= 32768
        |     THEN bs[2*k+1] + 256 * bs[2*k+2] - 65536
        |     ELSE bs[2*k+1] + 256 * bs[2*k+2] END
        |   FOR k IN range(0, len(bs) // 2)] AS vs
        | FROM b)
        |SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_samples,
        | CAST(list_sum(vs) AS DOUBLE) / CAST(len(vs) AS DOUBLE) AS mean_level,
        | sqrt(CAST(list_sum([x * x FOR x IN vs]) AS DOUBLE)
        |   / CAST(len(vs) AS DOUBLE)) AS rms,
        | CAST(list_max([abs(x) FOR x IN vs]) AS BIGINT) AS peak_abs
        |FROM v ORDER BY doc_id""".stripMargin,

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

    // Mirrors the CONSTRUCTION parameters of the 24bpp encoder (pixel
    // count = ceil(len/3), height = ceil(npix/w), stride = 4-byte-aligned
    // row, file = 54-byte headers + stride·h), not the parse: Spark builds
    // real DIB bytes and reads the fields back — equality proves the
    // round-trip.
    "m60_image_meta" ->
      """WITH p AS (
        | SELECT doc_id, strlen(text) AS len, 16 + doc_id % 49 AS w
        | FROM documents WHERE text IS NOT NULL AND strlen(text) > 0),
        |g AS (SELECT doc_id, w, ((len + 2) // 3 + w - 1) // w AS h,
        |  ((w * 3 + 3) // 4) * 4 AS stride FROM p)
        |SELECT doc_id, CAST(54 + stride * h AS INTEGER) AS n_bytes,
        | CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        | CAST(24 AS INTEGER) AS bpp, CAST(stride * h AS INTEGER) AS img_size
        |FROM g ORDER BY doc_id""".stripMargin
  )
}
