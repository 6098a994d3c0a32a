package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Kernels

class KernelsSpec extends AnyFunSuite {

  test("fnv64 is deterministic and spreads") {
    val a = Kernels.fnv64(UTF8String.fromString("hello"))
    val b = Kernels.fnv64(UTF8String.fromString("hello"))
    val c = Kernels.fnv64(UTF8String.fromString("hellp"))
    assert(a == b)
    assert(a != c)
  }

  test("minhash signature: elementwise min merge property") {
    val x = new GenericArrayData(Array[Any](1L, 2L, 3L))
    val y = new GenericArrayData(Array[Any](4L, 5L))
    val xy = new GenericArrayData(Array[Any](1L, 2L, 3L, 4L, 5L))
    val sx = Kernels.minHashSignature(x, 32, 42L)
    val sy = Kernels.minHashSignature(y, 32, 42L)
    val sxy = Kernels.minHashSignature(xy, 32, 42L)
    assert(sxy.toSeq == sx.zip(sy).map { case (a, b) => math.min(a, b) }.toSeq)
  }

  test("minhash jaccard estimate correlates with true jaccard") {
    val n = 512
    val base = (0L until 100L).toArray
    val near = (0L until 95L).toArray ++ Array(900L, 901L, 902L, 903L, 904L)
    val far = (1000L until 1100L).toArray
    def sig(xs: Array[Long]) =
      Kernels.minHashSignature(new GenericArrayData(xs.map(_.asInstanceOf[Any])), n, 7L)
    def est(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / n
    val eNear = est(sig(base), sig(near)) // true J ~ 0.905
    val eFar = est(sig(base), sig(far)) // true J = 0
    assert(math.abs(eNear - 0.905) < 0.1, s"near estimate $eNear")
    assert(eFar < 0.05, s"far estimate $eFar")
  }

  test("simhash: near-identical token sets have small hamming distance") {
    def arr(ts: String*) = new GenericArrayData(
      ts.map(t => UTF8String.fromString(t).asInstanceOf[Any]).toArray)
    val toks = (1 to 100).map(i => s"tok$i")
    val a = Kernels.simHash64(arr(toks: _*))
    val b = Kernels.simHash64(arr((toks.drop(2) ++ Seq("x", "y")): _*))
    val c = Kernels.simHash64(arr((1 to 100).map(i => s"other$i"): _*))
    assert(java.lang.Long.bitCount(a ^ b) < 16)
    assert(java.lang.Long.bitCount(a ^ c) > 16)
  }

  test("cosine: unit and orthogonal vectors") {
    def f(xs: Float*) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
    assert(math.abs(Kernels.cosineFloat(f(1f, 0f), f(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(Kernels.cosineFloat(f(1f, 0f), f(0f, 1f))) < 1e-12)
    assert(math.abs(Kernels.cosineFloat(f(1f, 1f), f(-1f, -1f)) + 1.0) < 1e-12)
  }

  test("rolling fingerprint: equal content equal fp, shifted content shares") {
    val a = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    val b = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    assert(Kernels.rollingFingerprint(a, 8) == Kernels.rollingFingerprint(b, 8))
    // min-over-kgrams is invariant to prepending unless the new grams are smaller
    val c = UTF8String.fromString("zzz " + a.toString)
    val fa = Kernels.rollingFingerprint(a, 8)
    val fc = Kernels.rollingFingerprint(c, 8)
    assert(fc <= fa) // superset of k-grams => min can only decrease
  }

  test("langId picks profile languages") {
    def lid(s: String) = Kernels.langId(UTF8String.fromString(s)).toString
    assert(lid("the cat and the dog is in that house") == "en")
    assert(lid("der Hund und die Katze ist nicht das Problem") == "de")
    assert(lid("le chat et la maison est dans les arbres") == "fr")
    assert(lid("el perro y la casa de los árboles en una calle") == "es")
    assert(lid("我是一个人") == "zh")
    assert(lid("xyzzy qwerty") == "und")
  }

  test("hyperplane sig: deterministic, in range, similar vectors same bucket") {
    def f(xs: Float*) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
    val v = f(1f, 2f, 3f, 4f)
    val s1 = Kernels.hyperplaneSig(v, 0, 8)
    val s2 = Kernels.hyperplaneSig(f(1f, 2f, 3f, 4f), 0, 8)
    assert(s1 == s2 && s1 >= 0 && s1 < 256)
    // scaled vector -> identical signs
    assert(Kernels.hyperplaneSig(f(2f, 4f, 6f, 8f), 0, 8) == s1)
    // different table -> (almost surely) different hyperplanes
    assert(Kernels.hyperplaneSig(v, 1, 8) != s1 ||
      Kernels.hyperplaneSig(v, 2, 8) != s1)
  }

  test("q8 encode: boundary codes, degenerate dims, and mismatch rejection") {
    def f(xs: Float*) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
    def d(xs: Double*) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
    val lo = d(0.0, -1.0, 5.0)
    val hi = d(1.0, 1.0, 5.0) // third dim degenerate (hi == lo)
    val code = Kernels.q8Encode(f(0f, 1f, 5f), lo, hi)
    // v = lo -> q 0 -> byte -128; v = hi -> floor(256) clamps to 255 -> 127;
    // degenerate dim -> q 0 by the guard
    assert(code.toSeq == Seq(-128, 127, -128).map(_.toByte))
    // midpoint of dim 0: q = floor(0.5*256) = 128 -> byte 0
    assert(Kernels.q8Encode(f(0.5f, 0f, 5f), lo, hi)(0) == 0.toByte)
    intercept[IllegalArgumentException] {
      Kernels.q8Encode(f(0f, 1f), lo, hi)
    }
  }

  test("q8 asymmetric cosine tracks float cosine within quantization error") {
    // deterministic pseudo-random 64-dim vectors (the embeddings' shape)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 31 + i * 7).toFloat))
    def f(xs: Array[Float]) = new GenericArrayData(xs.map(_.asInstanceOf[Any]))
    val vs = (1 to 8).map(vec)
    val dims = 0 until 64
    val lo = new GenericArrayData(
      dims.map(i => vs.map(_(i)).min.toDouble.asInstanceOf[Any]).toArray)
    val hi = new GenericArrayData(
      dims.map(i => vs.map(_(i)).max.toDouble.asInstanceOf[Any]).toArray)
    for (q <- vs; c <- vs) {
      val exact = Kernels.cosineFloat(f(q), f(c))
      val approx = Kernels.cosineQ8(f(q), Kernels.q8Encode(f(c), lo, hi), lo, hi)
      // 256 levels/dim over these ranges: cosine moves < 0.01
      assert(math.abs(exact - approx) < 0.01,
        s"quantized cosine drifted: $exact vs $approx")
    }
    intercept[IllegalArgumentException] {
      Kernels.cosineQ8(f(vec(1).take(63)), Kernels.q8Encode(f(vec(2)), lo, hi), lo, hi)
    }
  }

  test("wav build emits a canonical header; parse recovers the fields") {
    val pcm = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val b = Kernels.wavBuild(pcm, 44100, 2, 16)
    assert(b.length == 52)
    // golden header spot-checks (little-endian fields at canonical offsets)
    assert(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE")
    assert((b(4) & 0xff) == 44 && b(5) == 0) // chunk size 36+8
    assert((b(22) & 0xff) == 2) // channels
    assert((b(24) & 0xff) == 0x44 && (b(25) & 0xff) == 0xac) // 44100 LE
    assert((b(32) & 0xff) == 4 && (b(34) & 0xff) == 16) // block align, bits
    assert(new String(b, 36, 4) == "data" && (b(40) & 0xff) == 8)
    val m = Kernels.wavParse(b)
    assert(m == Kernels.WavMeta(2, 44100, 16, 2L, 8.0 / (44100 * 4)))
  }

  test("wav parse walks foreign chunks and rejects corrupt payloads") {
    // a WAV the builder never produces: LIST chunk (odd size -> pad byte)
    // between fmt and data — a real-world file shape (metadata chunks)
    val pcm = Array[Byte](9, 9, 9)
    val base = Kernels.wavBuild(pcm, 8000, 1, 8)
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte]('I', 'N', 'F', 0) // size 3 + 1 pad byte
    val withList = base.take(36) ++ listChunk ++ base.drop(36)
    assert(Kernels.wavParse(withList) == Kernels.WavMeta(1, 8000, 8, 3L, 3.0 / 8000))
    // rejects: bad magic, truncated data, non-PCM format, data before fmt
    val badMagic = base.clone(); badMagic(0) = 'X'
    assert(Kernels.wavParse(badMagic) == null)
    // data chunk claims 3 bytes but only 2 remain after the 44-byte header
    assert(Kernels.wavParse(base.take(46)) == null)
    val nonPcm = base.clone(); nonPcm(20) = 3 // IEEE float format code
    assert(Kernels.wavParse(nonPcm) == null)
    val dataFirst = base.take(12) ++ base.drop(36) // strip the fmt chunk
    assert(Kernels.wavParse(dataFirst) == null)
    assert(Kernels.wavParse(Array[Byte](1, 2, 3)) == null)
  }

  test("wav 8-bit sample stats: exact integer aggregates; skips foreign chunks; rejects non-8-bit") {
    val pcm = Array[Byte](100, (200 & 0xff).toByte, 128.toByte)
    val base = Kernels.wavBuild(pcm, 8000, 1, 8)
    val st = Kernels.wavStats8(base)
    assert(st.toSeq == Seq(3L, 100L + 200L + 128L,
      100L * 100 + 200L * 200 + 128L * 128, 72L)) // peak dev = |200-128|
    // foreign chunk between fmt and data is walked over, stats unchanged
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte]('I', 'N', 'F', 0)
    assert(Kernels.wavStats8(base.take(36) ++ listChunk ++ base.drop(36)).toSeq
      == st.toSeq)
    // a 16-bit payload is meta-parseable but NOT byte-per-sample: stats
    // must refuse rather than aggregate half-samples
    val b16 = Kernels.wavBuild(Array[Byte](1, 2, 3, 4), 8000, 1, 16)
    assert(Kernels.wavParse(b16) != null && Kernels.wavStats8(b16) == null)
    assert(Kernels.wavStats8(Array[Byte](1, 2, 3)) == null)
  }

  test("wav 16-bit stats decode signed LE samples; reject odd/non-16-bit data") {
    // samples: 0x0102=258, 0x8000=-32768 (the sign edge the ASCII corpus
    // never produces), 0xFFFF=-1
    val pcm = Array[Byte](0x02, 0x01, 0x00, 0x80.toByte, 0xff.toByte, 0xff.toByte)
    val wav = Kernels.wavBuild(pcm, 16000, 1, 16)
    val st = Kernels.wavStats16(wav)
    assert(st.toSeq == Seq(3L, 258L - 32768 - 1,
      258L * 258 + 32768L * 32768 + 1L, 32768L))
    // foreign chunk between fmt and data is walked over, stats unchanged
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte]('I', 'N', 'F', 0)
    assert(Kernels.wavStats16(wav.take(36) ++ listChunk ++ wav.drop(36)).toSeq
      == st.toSeq)
    // an 8-bit payload parses but must NOT aggregate as int16; odd data
    // size is malformed for int16; truncation rejects
    assert(Kernels.wavStats16(Kernels.wavBuild(Array[Byte](1, 2), 8000, 1, 8)) == null)
    assert(Kernels.wavStats16(Kernels.wavBuild(Array[Byte](1, 2, 3), 16000, 1, 16)) == null)
    assert(Kernels.wavStats16(wav.dropRight(1)) == null)
  }

  test("strip spans masks covered positions in O(n): equals the array_contains form") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Any*) = new GenericArrayData(xs.map {
      case s: String => UTF8String.fromString(s)
      case x => x
    }.toArray)
    def run(toks: Seq[String], starts: Seq[Int], w: Int): Seq[String] = {
      val r = Kernels.stripSpans(arr(toks: _*), arr(starts: _*), w)
      (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
    }
    // reference semantics: token i survives iff no start p has p <= i < p+w
    def brute(toks: Seq[String], starts: Seq[Int], w: Int): Seq[String] =
      toks.zipWithIndex.collect {
        case (t, i) if !starts.exists(p => p <= i && i < p + w) => t
      }
    val toks = Seq("a", "b", "c", "d", "e", "f", "g")
    for (starts <- Seq(Seq.empty[Int], Seq(0), Seq(5), Seq(6), Seq(1, 3), Seq(0, 2, 4, 6)))
      assert(run(toks, starts, 3) == brute(toks, starts, 3), s"starts=$starts")
    // span clamped at the array end; overlapping spans; empty input
    assert(run(Seq("x"), Seq(0), 3) == Nil)
    assert(run(Nil, Seq(0, 1), 3) == Nil)
    // randomized equivalence over longer docs
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(40)
      val ts = (0 until n).map(i => s"t$i")
      val ss = Seq.fill(rnd.nextInt(10))(rnd.nextInt(n))
      assert(run(ts, ss, 3) == brute(ts, ss, 3))
    }
  }

  test("bmp build emits a valid 24bpp DIB; parse round-trips the geometry") {
    // 7 payload bytes -> 3 pixels; width 2 => height 2; stride ((6+3)/4)*4=8
    val img = Kernels.bmpBuild(Array[Byte](1, 2, 3, 4, 5, 6, 7), 2)
    assert(img.length == 54 + 16 && img(0) == 'B' && img(1) == 'M')
    val m = Kernels.bmpParse(img)
    assert(m == Kernels.BmpMeta(2, 2, 24, 54, 8, 16, topDown = false))
    // bottom-up storage: logical row 0 lives at the END of the pixel block
    assert(m.rowOff(0) == 54 + 8 && m.rowOff(1) == 54)
    // band sums read through the parsed geometry, exclude stride padding,
    // include the zero-fill completing the last pixel/row
    assert(Kernels.bmpBandSum(img, m, 0, 1) == ((1 + 2 + 3 + 4 + 5 + 6).toLong, 6L))
    assert(Kernels.bmpBandSum(img, m, 0, 2) == (28L, 12L)) // row1 = 7,0,0,0,0,0
  }

  test("bmp channel stats sum storage-order channels through the stride walk") {
    // pixels from bytes 1..7 at width 2: [1,2,3] [4,5,6] [7,0,0] [0,0,0]
    val img = Kernels.bmpBuild(Array[Byte](1, 2, 3, 4, 5, 6, 7), 2)
    assert(Kernels.bmpChanStats(img).toSeq == Seq(4L, 1L + 4 + 7, 2L + 5, 3L + 6))
    // top-down re-layout preserves the per-channel sums (same logical image)
    val base = Kernels.bmpBuild(Array[Byte](10, 20, 30, 40, 50, 60), 1)
    val td = base.clone()
    td(22) = -2; td(23) = -1; td(24) = -1; td(25) = -1
    for (k <- 0 until 4) { td(54 + k) = base(58 + k); td(58 + k) = base(54 + k) }
    assert(Kernels.bmpChanStats(td).toSeq == Kernels.bmpChanStats(base).toSeq)
    // rejects truncation and non-image bytes
    assert(Kernels.bmpChanStats(base.dropRight(1)) == null)
    assert(Kernels.bmpChanStats(Array[Byte](1, 2, 3)) == null)
  }

  test("bmp 2x downsample samples even pixels of even logical rows and re-encodes") {
    // 3x3 image from bytes 1..27: logical pixels (x,y) = value 3*(3y+x)+1..
    val img = Kernels.bmpBuild((1 to 27).map(_.toByte).toArray, 3)
    val m0 = Kernels.bmpParse(img)
    assert(m0.width == 3 && m0.height == 3)
    val small = Kernels.bmpDownsample2x(img)
    val m = Kernels.bmpParse(small)
    assert(m.width == 2 && m.height == 2) // ceil(3/2) each way
    // kept input pixels: (0,0)=1,2,3 (2,0)=7,8,9 (0,2)=19,20,21 (2,2)=25,26,27
    assert(Kernels.bmpChanStats(small).toSeq ==
      Seq(4L, 1L + 7 + 19 + 25, 2L + 8 + 20 + 26, 3L + 9 + 21 + 27))
    // a top-down re-layout of the input samples the SAME logical pixels
    val base = Kernels.bmpBuild(Array[Byte](10, 20, 30, 40, 50, 60), 1)
    val td = base.clone()
    td(22) = -2; td(23) = -1; td(24) = -1; td(25) = -1
    for (k <- 0 until 4) { td(54 + k) = base(58 + k); td(58 + k) = base(54 + k) }
    assert(Kernels.bmpDownsample2x(td).toSeq == Kernels.bmpDownsample2x(base).toSeq)
    assert(Kernels.bmpDownsample2x(Array[Byte](1, 2, 3)) == null)
  }

  test("bmp average hash: orientation-invariant, mean-threshold correct, rejects corrupt") {
    // 2x2 image with one bright pixel: exactly that grid cell exceeds the
    // mean, every 8x8 cell sampling pixel (>=1,>=1)... nearest-neighbor
    // on a 2x2 source maps grid cell (kx,ky) -> pixel (kx*2/8, ky*2/8),
    // so the grid quarters follow the four pixels
    val pix = Array[Byte](0, 0, 0, -1, -1, -1, 0, 0, 0, 0, 0, 0) // (1,0) bright
    val img = Kernels.bmpBuild(pix, 2)
    val h = Kernels.bmpAHash(img).toString
    assert(h.length == 64 && h.count(_ == '1') == 16,
      s"expected exactly the bright quarter set: $h")
    // the bright pixel is logical (1,0): grid columns 4-7 of rows 0-3
    assert((0 until 64).forall { k =>
      (h(k) == '1') == (k % 8 >= 4 && k / 8 < 4)
    }, s"bright quarter misplaced: $h")
    // a top-down re-layout of the same logical image hashes identically
    val td = img.clone()
    td(22) = -2; td(23) = -1; td(24) = -1; td(25) = -1
    for (k <- 0 until 8) { td(54 + k) = img(62 + k); td(62 + k) = img(54 + k) }
    assert(Kernels.bmpAHash(td).toString == h, "orientation changed the hash")
    // flat image: no cell is strictly above the mean
    val flat = Kernels.bmpBuild(Array.fill[Byte](12)(7), 2)
    assert(Kernels.bmpAHash(flat).toString == "0" * 64)
    assert(Kernels.bmpAHash(img.dropRight(1)) == null)
    assert(Kernels.bmpAHash(Array[Byte](1, 2, 3)) == null)
  }

  test("bmp parse honors top-down storage and pixel-offset gaps; rejects corrupt payloads") {
    // width 1 => 2 rows of one pixel each, stride 4 (1 padding byte per row)
    val base = Kernels.bmpBuild(Array[Byte](10, 20, 30, 40, 50, 60), 1)
    val m0 = Kernels.bmpParse(base)
    assert(m0 == Kernels.BmpMeta(1, 2, 24, 54, 4, 8, topDown = false))
    // a TOP-DOWN variant the builder never produces: height := -2 and the
    // two rows swapped — same logical image, different byte layout
    val td = base.clone()
    td(22) = -2; td(23) = -1; td(24) = -1; td(25) = -1 // LE32(-2) at biHeight
    for (k <- 0 until 4) { td(54 + k) = base(58 + k); td(58 + k) = base(54 + k) }
    val mt = Kernels.bmpParse(td)
    assert(mt.topDown && mt.rowOff(0) == 54)
    assert(Kernels.bmpBandSum(td, mt, 0, 1) == Kernels.bmpBandSum(base, m0, 0, 1))
    assert(Kernels.bmpBandSum(td, mt, 0, 2) == Kernels.bmpBandSum(base, m0, 0, 2))
    // a pixel-data GAP (offset 58, 4 junk bytes after the headers) — legal
    // BMP the builder never emits; the parser must honor the offset field
    val gap = new Array[Byte](58 + 8)
    System.arraycopy(base, 0, gap, 0, 54)
    gap(10) = 58 // bfOffBits: bytes 11-13 stay 0
    gap(54) = 99; gap(55) = 98; gap(56) = 97; gap(57) = 96 // junk, not pixels
    System.arraycopy(base, 54, gap, 58, 8)
    val mg = Kernels.bmpParse(gap)
    assert(mg.pixOff == 58 &&
      Kernels.bmpBandSum(gap, mg, 0, 2) == Kernels.bmpBandSum(base, m0, 0, 2))
    // rejects: bad magic, truncation, RLE compression, zero width, tiny buf
    val badMagic = base.clone(); badMagic(0) = 'X'
    assert(Kernels.bmpParse(badMagic) == null)
    assert(Kernels.bmpParse(base.dropRight(1)) == null)
    val rle = base.clone(); rle(30) = 1 // BI_RLE8
    assert(Kernels.bmpParse(rle) == null)
    val zw = base.clone(); zw(18) = 0
    assert(Kernels.bmpParse(zw) == null)
    assert(Kernels.bmpParse(Array[Byte](1, 2, 3)) == null)
  }

  test("bmp/wav parsers reject overflow-crafted geometry (Long arithmetic guards)") {
    // r9 advisor: crafted headers whose sizes overflow Int arithmetic used
    // to slip past the truncation checks — each must reject with null, not
    // return garbage meta / [0,0,0,0] stats / throw AIOOBE downstream.
    val base = Kernels.bmpBuild(Array[Byte](10, 20, 30, 40, 50, 60), 1)
    // width 2^28 at 24bpp: w*bpp wraps negative in Int, so the old stride
    // came out negative and the stride×height truncation check passed
    val hugeW = base.clone()
    hugeW(18) = 0; hugeW(19) = 0; hugeW(20) = 0; hugeW(21) = 0x10
    assert(Kernels.bmpParse(hugeW) == null)
    assert(Kernels.bmpChanStats(hugeW) == null) // was AIOOBE pre-fix
    assert(Kernels.bmpDownsample2x(hugeW) == null)
    // biHeight = Int.MinValue: math.abs stays negative -> garbage meta
    val minH = base.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(Kernels.bmpParse(minH) == null)
    // WAV data-chunk size near Int.MaxValue: off+8+sz wraps negative in
    // Int, bypassing truncation; the stats sample loop then never runs and
    // returned [0,0,0,0] instead of null
    val w16 = Kernels.wavBuild(Array[Byte](1, 0), 16000, 1, 16)
    val crafted16 = w16.clone()
    crafted16(40) = 0xf0.toByte; crafted16(41) = 0xff.toByte
    crafted16(42) = 0xff.toByte; crafted16(43) = 0x7f
    assert(Kernels.wavParse(crafted16) == null)
    assert(Kernels.wavStats16(crafted16) == null)
    val w8 = Kernels.wavBuild(Array[Byte](1), 8000, 1, 8)
    val crafted8 = w8.clone()
    crafted8(40) = 0xf0.toByte; crafted8(41) = 0xff.toByte
    crafted8(42) = 0xff.toByte; crafted8(43) = 0x7f
    assert(Kernels.wavParse(crafted8) == null)
    assert(Kernels.wavStats8(crafted8) == null)
  }

  test("numeric array kernels treat null elements as 0 / absent (public SQL surface hardening)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // GenericArrayData is what SQL array literals arrive as; before the
    // guard, a null element NPE'd in the generic unbox (UnsafeArrayData
    // silently read 0 — the guard makes both yield the SAME answer)
    def fa(xs: Any*) = new GenericArrayData(xs.map {
      case f: Float => Float.box(f); case x => x
    }.toArray)
    val a = fa(1.0f, null, 2.0f)
    val b = fa(1.0f, 5.0f, 2.0f)
    val aZero = fa(1.0f, 0.0f, 2.0f)
    assert(Kernels.cosineFloat(a, b) == Kernels.cosineFloat(aZero, b))
    val da = new GenericArrayData(Array[Any](1.0, null, 2.0))
    val db = new GenericArrayData(Array[Any](1.0, 5.0, 2.0))
    val dz = new GenericArrayData(Array[Any](1.0, 0.0, 2.0))
    assert(Kernels.cosineDouble(da, db) == Kernels.cosineDouble(dz, db))
    // sorted intersect: null elements are "not a value" and are skipped
    val la = new GenericArrayData(Array[Any](1L, null, 3L, 7L))
    val lb = new GenericArrayData(Array[Any](null, 3L, 5L, 7L))
    assert(Kernels.sortedIntersectSize(la, lb) == 2)
    // hyperplane: null dim contributes 0 — same bucket as an explicit 0
    assert(Kernels.hyperplaneSig(a, 3, 4) == Kernels.hyperplaneSig(aZero, 3, 4))
    // q8 round trip: null dim encodes like 0.0
    val lo = new GenericArrayData(Array[Any](-1.0, -1.0, -1.0))
    val hi = new GenericArrayData(Array[Any](1.0, 1.0, 1.0))
    assert(Kernels.q8Encode(a, lo, hi).toSeq == Kernels.q8Encode(aZero, lo, hi).toSeq)
    assert(Kernels.cosineQ8(a, Kernels.q8Encode(aZero, lo, hi), lo, hi) ==
      Kernels.cosineQ8(aZero, Kernels.q8Encode(aZero, lo, hi), lo, hi))
  }

  test("strip spans skips null start elements (public SQL surface hardening)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = new GenericArrayData(
      Seq("a", "b", "c", "d").map(UTF8String.fromString).toArray[Any])
    // graft_strip_spans is SQL-registered: array(1, NULL) is a legal input
    val starts = new GenericArrayData(Array[Any](1, null))
    val r = Kernels.stripSpans(toks, starts, 2)
    assert((0 until r.numElements()).map(r.getUTF8String(_).toString) == Seq("a", "d"))
  }
}
