package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.DataTable
import graft.functions.Kernels

/** Property-based checks over the pure kernels and the ingest coercion —
  * the reference has no property tests (SURVEY §5); these pin the algebraic
  * contracts the operators rely on. */
object KernelProps extends Properties("graft.kernels") {

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
  private def sarr(xs: Seq[String]) =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s).asInstanceOf[Any]).toArray)

  private val longSet = Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct)

  property("sortedIntersectSize equals set intersection") =
    forAll(longSet, longSet) { (a, b) =>
      Kernels.sortedIntersectSize(arr(a.sorted), arr(b.sorted)) ==
        a.toSet.intersect(b.toSet).size
    }

  property("sortedIntersectSize on duplicates = multiset intersection (min multiplicities)") =
    forAll(Gen.listOf(Gen.chooseNum(-20L, 20L)), Gen.listOf(Gen.chooseNum(-20L, 20L))) {
      (a, b) =>
        val expected = (a.toSet ++ b.toSet).toSeq.map { v =>
          math.min(a.count(_ == v), b.count(_ == v))
        }.sum
        Kernels.sortedIntersectSize(arr(a.sorted), arr(b.sorted)) == expected
    }

  property("minhash is order-invariant") =
    forAll(longSet.suchThat(_.nonEmpty)) { xs =>
      val p = scala.util.Random.shuffle(xs)
      Kernels.minHashSignature(arr(xs), 16, 42L).toSeq ==
        Kernels.minHashSignature(arr(p), 16, 42L).toSeq
    }

  property("minhash merge is elementwise min") =
    forAll(longSet.suchThat(_.nonEmpty), longSet.suchThat(_.nonEmpty)) { (a, b) =>
      val sa = Kernels.minHashSignature(arr(a), 16, 7L)
      val sb = Kernels.minHashSignature(arr(b), 16, 7L)
      val sab = Kernels.minHashSignature(arr(a ++ b), 16, 7L)
      sab.toSeq == sa.zip(sb).map { case (x, y) => math.min(x, y) }.toSeq
    }

  property("identical sets get identical minhash; equal signature <=> plausible dup") =
    forAll(longSet.suchThat(_.nonEmpty)) { xs =>
      Kernels.minHashSignature(arr(xs), 32, 1L).toSeq ==
        Kernels.minHashSignature(arr(xs), 32, 1L).toSeq
    }

  property("simhash identical token arrays -> zero hamming") =
    forAll(Gen.listOf(Gen.alphaNumStr)) { ts =>
      Kernels.simHash64(sarr(ts)) == Kernels.simHash64(sarr(ts))
    }

  property("cosine is symmetric and bounded") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100, 100)),
      Gen.nonEmptyListOf(Gen.chooseNum(-100, 100))) { (a0, b0) =>
      val n = math.min(a0.size, b0.size)
      val a = a0.take(n).map(_.toFloat); val b = b0.take(n).map(_.toFloat)
      def f(xs: Seq[Float]) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
      val ab = Kernels.cosineFloat(f(a), f(b))
      val ba = Kernels.cosineFloat(f(b), f(a))
      (ab.isNaN && ba.isNaN) || (ab == ba && ab >= -1.0000001 && ab <= 1.0000001)
    }

  property("hyperplane signature is scale-invariant for positive scales") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-64, 64)), Gen.chooseNum(0, 3)) { (v0, t) =>
      val v = v0.map(_.toFloat)
      def f(xs: Seq[Float]) = new GenericArrayData(xs.map(_.asInstanceOf[Any]).toArray)
      Kernels.hyperplaneSig(f(v), t, 8) == Kernels.hyperplaneSig(f(v.map(_ * 4f)), t, 8)
    }

  property("distinctCount equals the set size for any string multiset") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(""), Gen.const("a b")))) { xs =>
      Kernels.distinctCount(sarr(xs)) == xs.toSet.size
    }

  property("fingerprint of superset content is <= (min over more k-grams)") =
    forAll(Gen.alphaNumStr.suchThat(_.length >= 8), Gen.alphaNumStr) { (base, extra) =>
      val fa = Kernels.rollingFingerprint(UTF8String.fromString(base), 8)
      val fc = Kernels.rollingFingerprint(UTF8String.fromString(base + extra + base), 8)
      fc <= fa
    }

  property("langId total and closed over profile codes") =
    forAll(Gen.asciiPrintableStr) { s =>
      Set("en", "de", "fr", "es", "zh", "und")
        .contains(Kernels.langId(UTF8String.fromString(s)).toString)
    }

  property("misra-gries: every value with freq > n/(cap+1) survives, any merge split") =
    forAll(Gen.listOf(Gen.chooseNum(0, 30)), Gen.chooseNum(1, 50)) { (xs, splitRaw) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val cap = 8
      val agg = graft.functions.MisraGriesTopK(Literal("x"), cap)
      def sketch(part: Seq[Int]) = {
        val buf = agg.createAggregationBuffer()
        part.foreach { v =>
          val key = UTF8String.fromString(v.toString)
          buf.get(key) match {
            case Some(c) => buf.update(key, c + 1)
            case None if buf.size < cap => buf.update(key, 1L)
            case None =>
              val dead = buf.iterator.filter(_._2 <= 1).map(_._1).toList
              buf.mapValuesInPlace((_, c) => c - 1)
              dead.foreach(buf.remove)
          }
        }
        buf
      }
      val split = if (xs.isEmpty) 0 else splitRaw % (xs.size + 1)
      val (a, b) = xs.splitAt(split)
      val merged = agg.merge(sketch(a), sketch(b))
      val survivors = merged.keySet.map(_.toString)
      val n = xs.size
      val mustSurvive = xs.groupBy(identity).collect {
        case (v, occ) if occ.size > n.toDouble / (cap + 1) => v.toString
      }
      mustSurvive.forall(survivors.contains) && merged.size <= cap
    }


  property("TopKBuffer: any insertion order + merge splits + serde = exact top-k (incl. NaN)") =
    forAll(Gen.listOf(Gen.zip(
        Gen.frequency(9 -> Gen.chooseNum(-100, 100).map(_ / 10.0),
          1 -> Gen.const(Double.NaN)),
        Gen.chooseNum(0L, 50L))), Gen.chooseNum(1, 5)) { (pairs, k) =>
      import graft.functions.{TopKBuffer, TopKPairs}
      // reference: SQL double ordering (NaN largest) desc, then id asc
      val expect = pairs.sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2) // NaN sorts largest
        c > 0 || (c == 0 && i1 < i2)
      }.take(k)
      // single buffer
      val one = new TopKBuffer(k)
      pairs.foreach { case (s, i) => one.insert(s, i) }
      // split into chunks, separate buffers, merged pairwise
      val chunks = pairs.grouped(math.max(1, pairs.size / 3 + 1)).toList
      val merged = chunks.map { c =>
        val b = new TopKBuffer(k); c.foreach { case (s, i) => b.insert(s, i) }; b
      }.reduceOption { (x, y) =>
        var j = 0
        while (j < y.size) { x.insert(y.scores(j), y.ids(j)); j += 1 }
        x
      }.getOrElse(new TopKBuffer(k))
      // serde roundtrip through the aggregate's wire format
      import org.apache.spark.sql.catalyst.expressions.Literal
      val agg = TopKPairs(Literal(0.0), Literal(0L), k)
      val rt = agg.deserialize(agg.serialize(one))
      def dump(b: TopKBuffer) = (0 until b.size).map(j => (b.scores(j), b.ids(j)))
      def eqNaN(a: Seq[(Double, Long)], b: Seq[(Double, Long)]) =
        a.size == b.size && a.zip(b).forall { case ((s1, i1), (s2, i2)) =>
          i1 == i2 && (s1 == s2 || (s1.isNaN && s2.isNaN)) }
      eqNaN(dump(one), expect) && eqNaN(dump(merged), expect) && eqNaN(dump(rt), dump(one))
    }

  property("coercion: numeric strings roundtrip for int/long/double") =
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { i =>
      DataTable.coerce(i.toString, IntegerType) == i &&
        DataTable.coerce(i.toString, LongType) == i.toLong &&
        DataTable.coerce(java.lang.Integer.valueOf(i), DoubleType) == i.toDouble
    }

  property("coercion: ISO date/timestamp strings parse (regression: dash-digit guard)") =
    forAll(Gen.chooseNum(1970, 2100), Gen.chooseNum(1, 12), Gen.chooseNum(1, 28)) {
      (y, m, d) =>
        val iso = f"$y%04d-$m%02d-$d%02d"
        DataTable.coerce(iso, DateType).toString == iso &&
          DataTable.coerce(s"$iso 12:30:00", TimestampType)
            .asInstanceOf[java.sql.Timestamp].toString.startsWith(s"$iso 12:30:00")
    }

  property("coercion: epoch millis produce matching date and timestamp") =
    forAll(Gen.chooseNum(0L, 4102444800000L)) { ms =>
      val ts = DataTable.coerce(java.lang.Long.valueOf(ms), TimestampType)
        .asInstanceOf[java.sql.Timestamp]
      val dt = DataTable.coerce(ms.toString, TimestampType)
        .asInstanceOf[java.sql.Timestamp]
      ts.getTime == ms && dt.getTime == ms
    }

  // PII redaction idempotence at the pattern level: "[PII]" can never
  // create a new match for any pattern in the set, so a second pass is a
  // no-op. Spark's regexp_replace runs this exact Java regex engine, so
  // String.replaceAll is a faithful single-node mirror of the fold in
  // TextOps.redactedText.
  private val piiWord = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val piiToken = Gen.oneOf(
    piiWord,
    for { a <- piiWord; b <- piiWord } yield s"$a@$b.com",
    for { a <- Gen.chooseNum(100, 999); b <- Gen.chooseNum(100, 999);
          c <- Gen.chooseNum(1000, 9999) } yield s"$a-$b-$c",
    Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString(".")))

  property("PII redaction is idempotent (second pass is a no-op)") =
    forAll(Gen.listOf(piiToken).map(_.mkString(" "))) { text =>
      def scrub(t: String) = graft.queries.TextOps.PiiPatterns
        .foldLeft(t)((acc, p) => acc.replaceAll(p, "[PII]"))
      val once = scrub(text)
      scrub(once) == once
    }

  // Int8 quantization invariant the s68 rerank rests on: for any corpus
  // column (one dimension's values) coded on its own (lo=min, hi=max) grid,
  // the midpoint reconstruction v̂ = lo + (q + 0.5)(hi - lo)/256 is within
  // half a quantization step of the original — the worst case (v == hi,
  // clamped to code 255) attains exactly step/2. Dims are independent, so
  // the per-dim bound IS the vector bound.
  property("q8 per-dim reconstruction error <= half a quantization step") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-64.0, 64.0))) { ds =>
      val vals = ds.map(_.toFloat)
      val lo = vals.min.toDouble; val hi = vals.max.toDouble
      val step = (hi - lo) / 256.0
      def farr(v: Float) = new GenericArrayData(Array[Any](v))
      def darr(d: Double) = new GenericArrayData(Array[Any](d))
      vals.forall { v =>
        val q = Kernels.q8Encode(farr(v), darr(lo), darr(hi))(0) + 128
        val vhat = if (hi == lo) lo else lo + (q + 0.5) * step
        math.abs(vhat - v) <= step / 2 + 1e-9
      }
    }
}
