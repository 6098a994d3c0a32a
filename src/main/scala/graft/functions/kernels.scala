package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar kernels behind the custom Catalyst expressions. Static methods so
  * generated code (doGenCode) can call them directly without boxing the
  * expression tree. All hashes are standard public constructions (FNV-1a 64,
  * Murmur3 fmix64) — deterministic across JVMs, no java hashCode reliance.
  */
object Kernels {

  // --- hashing primitives -------------------------------------------------

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Murmur3 64-bit finalizer — cheap high-quality mix for derived hashes. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  // --- minhash ------------------------------------------------------------

  /** MinHash signature: for each of `numHashes` hash functions h_i, the min
    * over the input element hashes of fmix64(x ^ mix(seed,i)). Single pass,
    * mergeable (elementwise min) — the shape that scales to 100 TB because a
    * signature is computed per-row with no shuffle.
    */
  def minHashSignature(elems: ArrayData, numHashes: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    // per-hash seed mixes are element-independent — hoist out of the loop
    val mixes = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      mixes(i) = fmix64(seed * 0x9e3779b97f4a7c15L + i); i += 1
    }
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      if (!elems.isNullAt(j)) {
        val x = elems.getLong(j)
        i = 0
        while (i < numHashes) {
          val h = fmix64(x ^ mixes(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    sig
  }

  /** Distinct-element count of a string array via a hash set — O(n) per
    * row. Spark's `array_distinct` has no fast path for string elements (it
    * falls back to a pairwise-equality scan, O(n²) byte comparisons per
    * row), which made the repetition metrics the single most expensive
    * scalar pipeline in the suite; this kernel replaces `size(array_distinct
    * (...))` in that hot path. Null elements count as one distinct value,
    * matching array_distinct (split output never contains them anyway). */
  def distinctCount(a: ArrayData): Int = {
    val n = a.numElements()
    val seen = new java.util.HashSet[Any](Math.max(8, n * 2))
    var i = 0
    while (i < n) {
      seen.add(if (a.isNullAt(i)) null else a.getUTF8String(i))
      i += 1
    }
    seen.size()
  }

  /** Kept tokens after removing every position covered by a width-`w` span
    * starting at any index in `starts` (clamped to the token range): the
    * d81 boilerplate rebuild in O(n + |starts|·w) via a boolean mask —
    * replaces a per-token array_contains probe that was O(n·|cov|),
    * quadratic on boilerplate-heavy long documents. */
  def stripSpans(toks: ArrayData, starts: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val mask = new Array[Boolean](n)
    val m = starts.numElements()
    var i = 0
    while (i < m) {
      // graft_strip_spans is SQL-registered: a caller can pass an array<int>
      // with null elements — skip them rather than reading garbage/NPE.
      if (!starts.isNullAt(i)) {
        var p = math.max(0, starts.getInt(i))
        val end = math.min(n, p.toLong + w).toInt
        while (p < end) { mask(p) = true; p += 1 }
      }
      i += 1
    }
    var kept = 0
    i = 0
    while (i < n) { if (!mask(i)) kept += 1; i += 1 }
    val res = new Array[Any](kept)
    i = 0; var j = 0
    while (i < n) {
      if (!mask(i)) {
        res(j) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  /** Intersection size of two ascending-sorted long arrays (single merge
    * pass — no per-row hash-set allocation like array_intersect). Null
    * elements (possible via the public SQL surface; internal callers never
    * produce them) are skipped — they are "not a value", so they can't
    * match anything, and skipping keeps the merge's sortedness assumption
    * over the remaining real values. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  // --- simhash ------------------------------------------------------------

  /** 64-bit SimHash over an array of token strings: per-bit vote weighted by
    * each token's FNV-1a hash bits. */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = fnv64(tokens.getUTF8String(j))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // --- cosine similarity --------------------------------------------------

  /** Cosine similarity of two float vectors, accumulated in double in array
    * order (bit-compatible with DuckDB's list_cosine_similarity over
    * DOUBLE[] on the same inputs).
    *
    * Contract: throws on dimension mismatch (an upstream schema bug must
    * fail the job, not yield plausible-looking similarities over a silent
    * truncation — DuckDB's list_cosine_similarity errors the same way);
    * returns NaN when either norm is zero (0/0), matching DuckDB. A null
    * ELEMENT (reachable only via the public SQL surface) reads as 0.0 —
    * the value UnsafeArrayData already yields for a null slot; the
    * explicit branch makes GenericArrayData (which would otherwise NPE in
    * the generic unbox) behave identically. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = checkedDim(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (a.isInstanceOf[UnsafeArrayData] && b.isInstanceOf[UnsafeArrayData]) {
      // Unsafe layout zero-fills null slots, so the unguarded read IS the
      // null-as-0 rule — no per-element bitmap probe in the O(|Q|·|C|·d)
      // hot loop
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = gF(a, i); val y = gF(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Array[Float] overload of [[cosineFloat]] for JVM-side callers (typed
    * mapGroups closures, specs) — same arithmetic and same contract (throws
    * on dimension mismatch, NaN on a zero norm), so similarity semantics
    * live in one place. */
  def cosineFloat(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length) throw new IllegalArgumentException(
      s"graft_cosine: vector dimension mismatch (${a.length} vs ${b.length})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def checkedDim(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) throw new IllegalArgumentException(
      s"graft_cosine: vector dimension mismatch ($na vs $nb)")
    na
  }

  /** Same contract as [[cosineFloat]] (incl. the null-element-as-0 rule
    * and the Unsafe fast path). */
  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val n = checkedDim(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (a.isInstanceOf[UnsafeArrayData] && b.isInstanceOf[UnsafeArrayData]) {
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    } else {
      while (i < n) {
        val x = gD(a, i); val y = gD(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // --- hyperplane LSH -----------------------------------------------------

  /** Random-hyperplane (sign-of-dot-product) LSH bucket for a float vector:
    * `nbits` Rademacher (+-1) hyperplanes derived deterministically from
    * (table, bit, dim) hashes. Bucket ids are stable across executors/JVMs.
    * The sign matrix is row-invariant, so it is memoized per
    * (table, nbits, dim) — the per-row cost is pure multiply-adds. */
  private val signMatrices =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()

  private def signMatrix(table: Int, nbits: Int, d: Int): Array[Byte] =
    signMatrices.computeIfAbsent((table, nbits, d), _ => {
      val m = new Array[Byte](nbits * d)
      var j = 0
      while (j < nbits) {
        var i = 0
        while (i < d) {
          val r = fmix64(table.toLong * 1000003L + j.toLong * 131L + i)
          m(j * d + i) = if ((r & 1L) == 0L) 1 else -1
          i += 1
        }
        j += 1
      }
      m
    })

  def hyperplaneSig(v: ArrayData, table: Int, nbits: Int): Int = {
    val d = v.numElements()
    val signs = signMatrix(table, nbits, d)
    var bucket = 0
    var j = 0
    while (j < nbits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        // null element reads as 0 (the cosineFloat rule — see its contract)
        if (!v.isNullAt(i)) dot += v.getFloat(i) * signs(j * d + i)
        i += 1
      }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  // --- rolling-hash fingerprint -------------------------------------------

  /** Document fingerprint: min rolling polynomial (Rabin-Karp) hash over all
    * character k-grams — a winnowing-style content fingerprint robust to
    * reordering of large blocks. */
  def rollingFingerprint(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length < k) return fmix64(fnv64(s))
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = fmix64(h)
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      val m = fmix64(h)
      if (m < min) min = m
      i += 1
    }
    min
  }

  // --- language id --------------------------------------------------------

  private val langProfiles: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Array("der", "und", "die", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Array("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
    "es" -> Array("el", "la", "de", "que", "y", "en", "los", "del", "las", "una"),
    "zh" -> Array("的", "是", "了", "在", "我", "有", "和", "不", "这", "人"))

  private val langWordSets: Array[(String, java.util.HashSet[String])] =
    langProfiles.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (l, s)
    }

  /** Stopword-profile language ID over whitespace-ish tokens; 'und' =
    * undetermined (no profile word seen). Deterministic n-gram-free
    * heuristic — ties broken by profile order. */
  def langId(text: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    // Locale.ROOT: default-locale lowercasing (e.g. tr-TR dotless i) would
    // change results per executor JVM and break the exact t48 oracle
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val scores = new Array[Int](langWordSets.length)
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      val boundary = i == len || !Character.isLetter(s.charAt(i))
      if (boundary) {
        if (i > start) {
          val w = s.substring(start, i)
          var p = 0
          while (p < langWordSets.length) {
            if (langWordSets(p)._2.contains(w)) scores(p) += 1
            p += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    // CJK characters count directly for zh
    i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) scores(4) += 1
      i += 1
    }
    var best = -1; var bestScore = 0
    var p = 0
    while (p < scores.length) {
      if (scores(p) > bestScore) { bestScore = scores(p); best = p }
      p += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      if (best < 0) "und" else langWordSets(best)._1)
  }

  // --- int8 scalar quantization (the s65 scheme, packed) ------------------

  /** Pack a float vector into one byte per dimension under the s65
    * per-dimension affine scheme: q_d = clamp(floor((v_d - lo_d) /
    * (hi_d - lo_d) * 256), 0, 255), degenerate dims (hi == lo) code to 0 —
    * IDENTICAL arithmetic to the s65 contract query, so the stored codes
    * are the audited ones. Stored byte = q - 128 (signed int8 range). 4×
    * smaller than the float array: at 100 TB of embeddings this is the
    * difference between a vector store that fits the page cache and one
    * that doesn't. */
  // null elements read as 0 across every numeric-array kernel (the
  // cosineFloat contract): the value UnsafeArrayData already yields for a
  // null slot, made explicit so GenericArrayData (SQL-literal inputs)
  // cannot NPE in the generic unbox
  @inline private def gF(a: ArrayData, i: Int): Double =
    if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
  @inline private def gD(a: ArrayData, i: Int): Double =
    if (a.isNullAt(i)) 0.0 else a.getDouble(i)

  def q8Encode(v: ArrayData, lo: ArrayData, hi: ArrayData): Array[Byte] = {
    val n = v.numElements()
    require(lo.numElements() == n && hi.numElements() == n,
      s"graft_q8_encode: stats dimension mismatch (${lo.numElements()}/${hi.numElements()} vs $n)")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val l = gD(lo, i); val h = gD(hi, i)
      val q =
        if (h == l) 0
        else {
          val raw = math.floor((gF(v, i) - l) / (h - l) * 256.0).toInt
          if (raw < 0) 0 else if (raw > 255) 255 else raw
        }
      out(i) = (q - 128).toByte
      i += 1
    }
    out
  }

  /** Asymmetric cosine distance: FLOAT query vs INT8-coded candidate,
    * dequantizing on the fly at the cell midpoint v̂_d = lo_d + (q_d + 0.5)
    * · (hi_d - lo_d) / 256 (degenerate dims reconstruct exactly to lo_d).
    * No intermediate array materializes — the decode is fused into the
    * dot-product loop, which is what makes scanning int8 inverted lists at
    * 4× the vectors per byte an actual win rather than decode-then-cosine
    * at the same memory cost. */
  def cosineQ8(q: ArrayData, code: Array[Byte], lo: ArrayData, hi: ArrayData): Double = {
    val n = code.length
    if (q.numElements() != n) throw new IllegalArgumentException(
      s"graft_cosine_q8: vector dimension mismatch (${q.numElements()} vs $n)")
    var dot = 0.0; var nq = 0.0; var nc = 0.0
    var i = 0
    while (i < n) {
      val l = gD(lo, i); val h = gD(hi, i)
      val qd = (code(i) + 128).toDouble // stored byte = q - 128; back to 0..255
      val v = if (h == l) l else l + (qd + 0.5) * (h - l) / 256.0
      val x = gF(q, i)
      dot += x * v; nq += x * x; nc += v * v
      i += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  // --- product quantization (PQ) ------------------------------------------
  // Codebook layout (flat array<double>): [sub][centroid][dim-in-subspace],
  // i.e. entry ((sub * k) + c) * ds + j. m = code length (bytes); ds =
  // dim / m; k inferred = |cb| / (m * ds). One flat array so the codebook
  // rides a single broadcastable column, same policy as the q8 (lo, hi) row.

  /** PQ-encode: per subspace, the index of the L2-nearest codebook centroid
    * (one byte each — k ≤ 256). Runs once per corpus vector at index-build
    * time; codegen'd static call like q8Encode. */
  def pqEncode(v: ArrayData, cb: ArrayData, m: Int): Array[Byte] = {
    val dim = v.numElements()
    require(m > 0 && dim % m == 0,
      s"graft_pq_encode: dim $dim not divisible by m=$m")
    val ds = dim / m
    require(cb.numElements() % (m * ds) == 0,
      s"graft_pq_encode: codebook size ${cb.numElements()} not a multiple of m*ds=${m * ds}")
    val k = cb.numElements() / (m * ds)
    require(k >= 1 && k <= 256, s"graft_pq_encode: k=$k out of byte range")
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (sub * k + c) * ds
        var d2 = 0.0
        var j = 0
        while (j < ds) {
          val diff = gF(v, sub * ds + j) - gD(cb, base + j)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  /** Asymmetric PQ cosine: FLOAT query vs m-byte PQ code, reconstructing
    * each subvector as its codebook centroid inside the dot-product loop —
    * no float array materializes on the corpus side (same fusion policy as
    * cosineQ8, at m bytes/vector instead of dim). */
  def pqCosine(q: ArrayData, code: Array[Byte], cb: ArrayData): Double = {
    val m = code.length
    val dim = q.numElements()
    if (m == 0 || dim % m != 0) throw new IllegalArgumentException(
      s"graft_pq_cosine: dim $dim not divisible by code length $m")
    val ds = dim / m
    val k = cb.numElements() / (m * ds)
    var dot = 0.0; var nq = 0.0; var nc = 0.0
    var sub = 0
    while (sub < m) {
      val base = (sub * k + (code(sub) & 0xff)) * ds
      var j = 0
      while (j < ds) {
        val x = gF(q, sub * ds + j)
        val v = gD(cb, base + j)
        dot += x * v; nq += x * x; nc += v * v
        j += 1
      }
      sub += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nc))
  }

  /** k-probe Bloom membership of a 64-bit shingle hash against the packed
    * word array — bit-identical probe positions to the SQL path
    * (`pmod(xxhash64(i, sh), m)`): Spark's XxHash64 hashes its children
    * sequentially with the running hash as seed, starting at 42, so the
    * kernel replays hashInt(i) then hashLong(sh) with the same chaining. */
  def bloomContains(sh: Long, words: Array[Long], mBits: Long, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      var h = 42L
      h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, h)
      h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sh, h)
      val p = ((h % mBits) + mBits) % mBits
      if ((words((p / 64).toInt) & (1L << (p % 64).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  // --- BMP (DIB): the de-stubbed image modality ---------------------------
  // An uncompressed 24bpp BMP is fixed-offset little-endian byte arithmetic
  // — no image library needed, so the image modality gets a REAL encoder +
  // parser (the m64/m66 WAV pattern). Layout: BITMAPFILEHEADER (14 bytes:
  // "BM", u32 fileSize, u32 reserved, u32 pixelDataOffset) then
  // BITMAPINFOHEADER (40 bytes: u32 dibSize, i32 width, i32 height —
  // positive ⇒ rows stored BOTTOM-UP, negative ⇒ top-down — u16 planes,
  // u16 bpp, u32 compression(0=BI_RGB), u32 imageSize, …) then pixel rows
  // each padded to a 4-byte stride. The bottom-up row order and the stride
  // padding are what make the parser a genuine decode, not length math.

  /** Encode raw bytes as the pixel stream of a real 24bpp bottom-up BMP.
    * Logical pixel byte i (row-major, top-left origin) is `pixels(i)`,
    * zero-filled past the input's end to complete the last row; height is
    * the minimal row count for the given width. Parseable by any image
    * tool (GIMP, PIL, MS Paint). */
  def bmpBuild(pixels: Array[Byte], width: Int): Array[Byte] = {
    // width bound + Long-computed size: a crafted SQL width near 2^31
    // would overflow h/stride Int arithmetic into a negative allocation
    // (NegativeArraySizeException) instead of a diagnosable reject
    require(width > 0 && width <= (1 << 26),
      s"bmpBuild: width must be in [1, 2^26], got $width")
    val nPix = math.max(1, (pixels.length + 2) / 3)
    val h = ((nPix.toLong + width - 1) / width).toInt
    val stride = ((width * 3 + 3) / 4) * 4
    val imgSizeL = stride.toLong * h
    require(imgSizeL <= Int.MaxValue - 54,
      s"bmpBuild: image size $imgSizeL exceeds the array limit")
    val imgSize = imgSizeL.toInt
    val out = new Array[Byte](54 + imgSize)
    out(0) = 'B'; out(1) = 'M'
    putLE32(out, 2, 54 + imgSize) // file size
    putLE32(out, 6, 0) // reserved
    putLE32(out, 10, 54) // pixel data offset
    putLE32(out, 14, 40) // BITMAPINFOHEADER size
    putLE32(out, 18, width)
    putLE32(out, 22, h) // positive: bottom-up row storage
    putLE16(out, 26, 1) // planes
    putLE16(out, 28, 24) // bits per pixel
    putLE32(out, 30, 0) // BI_RGB (uncompressed)
    putLE32(out, 34, imgSize)
    putLE32(out, 38, 2835); putLE32(out, 42, 2835) // 72 DPI
    putLE32(out, 46, 0); putLE32(out, 50, 0) // palette fields
    var r = 0
    while (r < h) {
      val dst = 54 + (h - 1 - r) * stride // logical row r stored bottom-up
      val rowBase = r * width * 3
      var k = 0
      val lim = math.min(width * 3, pixels.length - rowBase)
      while (k < lim) { out(dst + k) = pixels(rowBase + k); k += 1 }
      r += 1
    }
    out
  }

  /** Parsed BMP geometry, or null for anything that isn't a valid
    * uncompressed BMP: magic, DIB size, planes, BI_RGB compression,
    * positive width, non-zero height, pixel offset past the headers, and
    * the full stride×height payload present (truncation rejected). `topDown`
    * reflects the height sign — a parser that ignored it would read real
    * images upside down. */
  final case class BmpMeta(width: Int, height: Int, bpp: Int, pixOff: Int,
      stride: Int, imgSize: Int, topDown: Boolean) {
    /** File offset of logical (top-origin) row r. */
    def rowOff(r: Int): Int =
      pixOff + (if (topDown) r else height - 1 - r) * stride
  }
  def bmpParse(b: Array[Byte]): BmpMeta = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return null // core-header variants not supported
    val w = le32(b, 18); val hRaw = le32(b, 22)
    val planes = le16(b, 26); val bpp = le16(b, 28)
    val comp = le32(b, 30)
    // hRaw == Int.MinValue would survive math.abs still negative; huge w
    // would overflow an Int stride into a negative that passes the
    // truncation check — do the geometry arithmetic in Long and reject.
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || planes != 1 || comp != 0)
      return null
    if (bpp != 24 && bpp != 8 && bpp != 32) return null
    val h = math.abs(hRaw)
    val stride = ((w.toLong * bpp / 8 + 3) / 4) * 4
    val imgSize = stride * h
    // biSizeImage may legally be 0 for BI_RGB — recompute, never trust it
    if (off < 14L + dibSize || off.toLong + imgSize > b.length) return null
    // imgSize <= b.length here, so both narrow safely
    BmpMeta(w, h, bpp, off, stride.toInt, imgSize.toInt, hRaw < 0)
  }

  /** Per-channel pixel sums over a 24bpp BMP, read through the PARSED
    * stride/orientation with padding excluded: [nPix, sumC0, sumC1, sumC2]
    * with C0..C2 the pixel bytes in storage order (BGR in a BMP) — the
    * per-channel aggregate a normalize/resize pipeline computes per image.
    * Exact integer sums; null for invalid or non-24bpp payloads. */
  def bmpChanStats(b: Array[Byte]): Array[Long] = {
    val m = bmpParse(b)
    if (m == null || m.bpp != 24) return null
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    var r = 0
    while (r < m.height) {
      val base = m.rowOff(r)
      var x = 0
      while (x < m.width) {
        val o = base + x * 3
        s0 += b(o) & 0xff; s1 += b(o + 1) & 0xff; s2 += b(o + 2) & 0xff
        x += 1
      }
      r += 1
    }
    Array(m.width.toLong * m.height, s0, s1, s2)
  }

  /** Nearest-neighbor 2× downsample of a 24bpp BMP through the FULL codec
    * path — the brief's "resize" op made real: parse the geometry, sample
    * every second pixel of every second logical row (top-left anchor, so
    * output pixel (x,y) = input pixel (2x,2y)), and re-encode with
    * bmpBuild. Output dims are ceil(w/2)×ceil(h/2) (every even index is
    * kept). Orientation-correct: a top-down input samples the same
    * LOGICAL pixels as its bottom-up equivalent. Null for
    * invalid/non-24bpp input. */
  def bmpDownsample2x(b: Array[Byte]): Array[Byte] = {
    val m = bmpParse(b)
    if (m == null || m.bpp != 24) return null
    val wO = (m.width + 1) / 2
    val hO = (m.height + 1) / 2
    val pix = new Array[Byte](wO * hO * 3)
    var y = 0
    while (y < hO) {
      val srcRow = m.rowOff(2 * y)
      var x = 0
      while (x < wO) {
        val so = srcRow + (2 * x) * 3
        val po = (y * wO + x) * 3
        pix(po) = b(so); pix(po + 1) = b(so + 1); pix(po + 2) = b(so + 2)
        x += 1
      }
      y += 1
    }
    bmpBuild(pix, wO) // height = ceil(wO·hO / wO) = hO exactly
  }

  /** (sum, count) of pixel byte values over logical rows [r0, r1), read
    * through the parsed stride/orientation and EXCLUDING stride padding —
    * the per-band aggregate a frame/tile sampler computes. Null meta or an
    * out-of-range band is the caller's bug: require'd. */
  def bmpBandSum(b: Array[Byte], m: BmpMeta, r0: Int, r1: Int): (Long, Long) = {
    require(m != null && r0 >= 0 && r1 <= m.height && r0 <= r1,
      s"bmpBandSum: bad band [$r0,$r1) for height ${if (m == null) -1 else m.height}")
    val rowBytes = m.width * (m.bpp / 8)
    var sum = 0L
    var r = r0
    while (r < r1) {
      val base = m.rowOff(r)
      var k = 0
      while (k < rowBytes) { sum += b(base + k) & 0xff; k += 1 }
      r += 1
    }
    (sum, (r1 - r0).toLong * rowBytes)
  }

  /** Perceptual average-hash (aHash) of a 24bpp BMP through the parsed
    * geometry — the classic image near-dup fingerprint: an 8×8
    * nearest-neighbor grid of integer lumas (299·C0 + 587·C1 + 114·C2
    * over the storage-order channels), each cell thresholded at the grid
    * mean via the scale-free integer compare 64·l_k > Σl (no division,
    * no float), packed row-major as a 64-char '0'/'1' string. The
    * bit-string output keeps the SQL oracle free of 2^63 sign traps a
    * BIGINT hash would hit. Reads LOGICAL pixels through rowOff, so a
    * top-down re-layout of the same image hashes identically (spec'd).
    * Null for invalid/non-24bpp payloads. */
  def bmpAHash(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val m = bmpParse(b)
    if (m == null || m.bpp != 24) return null
    val l = new Array[Long](64)
    var sum = 0L
    var k = 0
    while (k < 64) {
      val x = (k % 8) * m.width / 8
      val y = (k / 8) * m.height / 8
      val o = m.rowOff(y) + x * 3
      val lum = 299L * (b(o) & 0xff) + 587L * (b(o + 1) & 0xff) +
        114L * (b(o + 2) & 0xff)
      l(k) = lum; sum += lum; k += 1
    }
    val sb = new java.lang.StringBuilder(64)
    k = 0
    while (k < 64) { sb.append(if (64L * l(k) > sum) '1' else '0'); k += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  // --- WAV (RIFF): the de-stubbed modality --------------------------------
  // A PCM WAV file is fixed-offset little-endian byte arithmetic — no media
  // library needed, so this modality gets a REAL encoder + parser instead of
  // the length-arithmetic stubs above. Layout (canonical PCM):
  // "RIFF" u32(36+data) "WAVE" then chunks; "fmt " carries
  // (audioFormat=1, channels u16, sampleRate u32, byteRate u32,
  // blockAlign u16, bitsPerSample u16); "data" carries the PCM bytes.

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode PCM bytes as a canonical 44-byte-header WAV file. */
  def wavBuild(pcm: Array[Byte], sampleRate: Int, channels: Int,
      bitsPerSample: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && bitsPerSample > 0 &&
      bitsPerSample % 8 == 0,
      s"wavBuild: bad params ($sampleRate, $channels, $bitsPerSample)")
    val blockAlign = channels * bitsPerSample / 8
    // the byte-rate header field is u32: crafted params that overflow it
    // would write a silently-wrong header instead of failing loudly
    require(blockAlign > 0 && sampleRate.toLong * blockAlign <= Int.MaxValue,
      s"wavBuild: byte rate overflows ($sampleRate x $blockAlign)")
    val out = new Array[Byte](44 + pcm.length)
    "RIFF".getBytes.copyToArray(out, 0)
    putLE32(out, 4, 36 + pcm.length)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    putLE32(out, 16, 16) // fmt chunk size (PCM)
    putLE16(out, 20, 1) // audio format: PCM
    putLE16(out, 22, channels)
    putLE32(out, 24, sampleRate)
    putLE32(out, 28, sampleRate * blockAlign) // byte rate
    putLE16(out, 32, blockAlign)
    putLE16(out, 34, bitsPerSample)
    "data".getBytes.copyToArray(out, 36)
    putLE32(out, 40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** Parsed WAV header fields, or null for anything that isn't a valid PCM
    * RIFF/WAVE payload. A real chunk walk, not offset-44 arithmetic: any
    * number of foreign chunks (LIST, fact, …) may precede or separate
    * "fmt " and "data" (chunks are even-aligned per RIFF; a missing fmt
    * before data, truncation, or a non-PCM format code all reject). */
  final case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, durationS: Double)
  def wavParse(b: Array[Byte]): WavMeta = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return null
    var off = 12
    var channels = -1; var sampleRate = -1; var bits = -1; var blockAlign = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      // compare in Long: sz near Int.MaxValue would wrap the Int sum negative
      if (sz < 0 || off.toLong + 8 + sz > b.length) return null // truncated/corrupt
      if (id == "fmt ") {
        if (sz < 16 || le16(b, off + 8) != 1) return null // non-PCM
        channels = le16(b, off + 10)
        sampleRate = le32(b, off + 12)
        blockAlign = le16(b, off + 20)
        bits = le16(b, off + 22)
        if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0) return null
      } else if (id == "data") {
        if (channels < 0) return null // data before fmt
        val nSamples = sz.toLong / blockAlign
        return WavMeta(channels, sampleRate, bits, nSamples,
          sz.toDouble / (sampleRate.toLong * blockAlign))
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    null
  }

  /** 16-bit signed LE PCM sample statistics over a WAV payload's data
    * chunk (same chunk walk as wavParse): [n, sum, sumSq, peakAbs] with
    * samples decoded as signed little-endian int16 — the companion of
    * wavStats8 for the CD-depth path. Integer-exact; null for invalid,
    * non-16-bit, or odd-sized (malformed for int16) data. */
  def wavStats16(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return null
    var off = 12
    var sawFmt = false; var bits = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0 || off.toLong + 8 + sz > b.length) return null
      if (id == "fmt ") {
        if (sz < 16 || le16(b, off + 8) != 1) return null
        bits = le16(b, off + 22); sawFmt = true
      } else if (id == "data") {
        if (!sawFmt || bits != 16 || sz % 2 != 0) return null
        var i = off + 8; val end = off + 8 + sz
        var n = 0L; var sum = 0L; var sq = 0L; var peak = 0L
        while (i < end) {
          val v = ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)).toShort.toLong
          sum += v; sq += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          n += 1; i += 2
        }
        return Array(n, sum, sq, peak)
      }
      off += 8 + sz + (sz & 1)
    }
    null
  }

  /** 8-bit PCM sample statistics over a WAV payload's data chunk (the same
    * chunk walk as wavParse — foreign chunks skipped, truncation rejected):
    * [n, sum, sumSq, peakDev] with samples read as unsigned bytes and
    * deviation measured from the 128 midpoint. Integer-exact, so the SQL
    * oracle mirrors it byte for byte. Null for invalid or non-8-bit PCM. */
  def wavStats8(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return null
    var off = 12
    var sawFmt = false; var bits = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0 || off.toLong + 8 + sz > b.length) return null
      if (id == "fmt ") {
        if (sz < 16 || le16(b, off + 8) != 1) return null
        bits = le16(b, off + 22); sawFmt = true
      } else if (id == "data") {
        if (!sawFmt || bits != 8) return null
        var i = off + 8; val end = off + 8 + sz
        var n = 0L; var sum = 0L; var sq = 0L; var peak = 0L
        while (i < end) {
          val v = b(i) & 0xff
          sum += v; sq += v.toLong * v
          val d = math.abs(v - 128).toLong
          if (d > peak) peak = d
          n += 1; i += 1
        }
        return Array(n, sum, sq, peak)
      }
      off += 8 + sz + (sz & 1)
    }
    null
  }
}
