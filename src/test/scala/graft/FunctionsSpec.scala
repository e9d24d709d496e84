package graft

import graft.functions.{DotProduct, IndexStats, Posting, Scored, TopK}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}

/** Algebraic pins for the custom functions: the properties that make
  * distributed partial aggregation and codegen correct, checked over
  * random inputs (ScalaCheck) without spinning Spark jobs.
  */
class FunctionsSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------- TopK
  private val scoredGen: Gen[Scored] = for {
    id <- Gen.chooseNum(0L, 500L)
    score <- Gen.chooseNum(-100, 100).map(_ / 10.0)
  } yield Scored(id, score)

  private def reference(xs: List[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("TopK: any split/merge order yields the global top-k") {
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.chooseNum(1, 8)) {
      (xs: List[Scored], k: Int) =>
        val agg = new TopK(k)
        // random 3-way split, reduced independently then merged
        val (a, rest) = xs.splitAt(xs.length / 3)
        val (b, c) = rest.splitAt(rest.length / 2)
        def reduceAll(part: List[Scored]) =
          part.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.merge(agg.merge(reduceAll(a), reduceAll(b)), reduceAll(c))
        agg.finish(merged) == reference(xs, k)
    })
  }

  test("TopK: merge with zero is identity on the finished value") {
    check(Prop.forAll(Gen.listOf(scoredGen)) { xs: List[Scored] =>
      val agg = new TopK(5)
      val r = xs.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(r, agg.zero)) == reference(xs, 5)
    })
  }

  // ------------------------------------------------------- IndexStats
  // contract: input rows are the DISTINCT (term, doc) pre-aggregate,
  // so generated postings carry unique doc ids per group
  private val postingsGen: Gen[List[Posting]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0L, 500L)
      occ <- Gen.chooseNum(1L, 9L)
    } yield Posting(id, occ)).map(_.distinctBy(_.docId))

  private def ixReference(xs: List[Posting], k: Int): (Long, Long, String) =
    (xs.map(_.occ).sum, xs.length.toLong,
      xs.map(_.docId).sorted.take(k).mkString(","))

  test("IndexStats: any split/merge order matches (cf, df, k smallest)") {
    check(Prop.forAll(postingsGen, Gen.chooseNum(1, 8)) {
      (xs: List[Posting], k: Int) =>
        val agg = new IndexStats(k)
        val (a, rest) = xs.splitAt(xs.length / 3)
        val (b, c) = rest.splitAt(rest.length / 2)
        def reduceAll(part: List[Posting]) =
          part.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.merge(agg.merge(reduceAll(a), reduceAll(b)), reduceAll(c))
        agg.finish(merged) == ixReference(xs, k)
    })
  }

  test("IndexStats: buffer stays under 2k ids under any growth") {
    check(Prop.forAll(postingsGen) { xs: List[Posting] =>
      val agg = new IndexStats(4)
      val b = xs.foldLeft(agg.zero)(agg.reduce)
      b.ids.length < 8 && agg.finish(agg.merge(b, agg.zero)) == ixReference(xs, 4)
    })
  }

  test("IndexStatsNativeAgg ≡ IndexStats (typed) through a real shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}
    // per-term group sizes straddle every trim edge: below k, exactly k,
    // between k and 2k, and far past 2k (forces partial-buffer merge
    // saturation through the 13-partition shuffle)
    val k = 4
    val rows = (for {
      (w, n) <- Seq(("a", 2), ("b", 4), ("c", 7), ("d", 40))
      i <- 0 until n
    } yield (w, (997L * i + 13) % 601, i.toLong % 9 + 1)) // unique ids per w
    val df = rows.toDF("w", "doc_id", "occ").repartition(13)
    val native = df.groupBy($"w")
      .agg(asCol(graft.functions.IndexStatsNativeAgg(
        asExpr($"doc_id"), asExpr($"occ"), k).toAggregateExpression()).as("ix"))
      .select($"w", $"ix.cf", $"ix.df", $"ix.postings")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val expected = rows.groupBy(_._1).map { case (w, g) =>
      val ref = ixReference(g.map(t => Posting(t._2, t._3)).toList, k)
      (w, ref._1, ref._2, ref._3)
    }.toSet
    assert(native == expected)
  }

  // ------------------------------------------------------- DotProduct
  test("DotProduct: interpreted eval equals the codegen'd query result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Array(1.5f, -2.0f, 3.25f, 0.5f)
    val b = Array(2.0f, 4.0f, -1.0f, 8.0f)
    // interpreted path (nullSafeEval on raw ArrayData)
    val expr = DotProduct(
      Literal(new GenericArrayData(a.map(_.toDouble)), ArrayType(DoubleType)),
      Literal(new GenericArrayData(b.map(_.toDouble)), ArrayType(DoubleType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    // codegen path through a real query over float arrays
    val df = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
    val fromQuery = df.select(
      graft.functions.VectorExpressions.vecDot(col("x"), col("y")).as("d"))
      .first().getDouble(0)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(interpreted == expected)
    assert(fromQuery == expected)
  }

  test("DotProduct: null array and ragged lengths both yield null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f)))).toDF("x", "y")
    val out = df.select(
      graft.functions.VectorExpressions.vecDot(col("x"), col("y")).as("d"))
      .collect()
    assert(out(0).isNullAt(0)) // ragged → null, never a truncated dot
    assert(out(1).isNullAt(0))
  }

  // --------------------------------------------------- LshBandBuckets
  test("LshBandBuckets: eval ≡ codegen ≡ the when-chain of per-plane dots") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bands = 4
    val ppb = 3
    val dim = 64
    val planes = graft.ext.Similarity.hyperplanesInt(bands * ppb, dim)
    val flat = planes.flatten.toArray
    // deterministic pseudo-grid vectors (long elements, like gridVec)
    val rows = (0 until 20).map { r =>
      (0 until dim).map(i => ((r * 31L + i * 17L) % 2000L) - 1000L)
    }
    val df = rows.map(Tuple1(_)).toDF("g")
    val fromKernel = df.select(graft.functions.VectorExpressions
        .lshBandBuckets(col("g"), flat, bands, ppb).as("bks"))
      .collect().map(_.getSeq[Int](0))
    // reference: the original when-chain semantics, computed in Scala
    val expected = rows.map { v =>
      (0 until bands).map { b =>
        (0 until ppb).map { p =>
          val pl = planes(b * ppb + p)
          val s = (0 until dim).foldLeft(0.0)((acc, i) => acc + pl(i) * v(i))
          if (s > 0) 1 << p else 0
        }.sum
      }
    }
    assert(fromKernel.map(_.toList).toList == expected.map(_.toList).toList)
    // interpreted path agrees with codegen
    val interp = graft.functions.LshBandBuckets(
      Literal(new GenericArrayData(rows.head.toArray), ArrayType(LongType)),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat),
      bands, ppb).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toIntArray().toList == expected.head.toList)
  }

  test("LshBandBuckets: structural equality (Catalyst canonicalization)") {
    // two instances built from DISTINCT but equal plane arrays must be
    // equal — case-class equality on the immutable ArraySeq is
    // structural, so CSE/canonicalization can merge them (an Array
    // param compared by reference identity and never matched)
    val child = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, ArrayType(LongType), nullable = true)
    val mk = () => graft.functions.LshBandBuckets(child,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(
        Array(1.0, -2.0, 3.0, -4.0)), 2, 2)
    val (e1, e2) = (mk(), mk())
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
  }

  // --------------------------------------------------------- MaskPairs
  test("MaskPairs: eval ≡ codegen ≡ reference bit enumeration") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val S = 20
    // the last two carry bits ≥ S: the expression must mask them BEFORE
    // sizing the output (r9 advisory — unmasked bitCount left trailing
    // 0 codes that decode as spurious (0,0) pairs downstream)
    val masksList = Seq(0L, 1L, 1L << 19, (1L << 20) - 1, 0b1010110L,
      1L << 5 | 1L << 17, 1L << 21 | 0b101L, -1L)
    // reference enumeration in Scala
    def ref(m: Long): Seq[Int] = {
      val bits = (0 until S).filter(a => ((m >>> a) & 1L) == 1L)
      bits.flatMap(a => ((a << 8) | 255) +: bits.filter(_ > a).map(b => (a << 8) | b))
    }
    val out = masksList.toDF("m")
      .select(graft.functions.MaskPairs.maskPairs(col("m"), S).as("p"))
      .collect().map(_.getSeq[Int](0).toList)
    assert(out.toList == masksList.map(m => ref(m).toList))
    // interpreted path agrees
    val interp = graft.functions.MaskPairs(
      Literal(0b1010110L, LongType), S).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toIntArray().toList == ref(0b1010110L).toList)
    // null in → null out
    assert(Seq[Option[Long]](None).toDF("m")
      .select(graft.functions.MaskPairs.maskPairs(col("m"), S).as("p"))
      .collect()(0).isNullAt(0))
  }

  test("LshBandBuckets: ragged vector and null both yield null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val flat = graft.ext.Similarity.hyperplanesInt(4, 8).flatten.toArray
    val df = Seq(Some(Seq(1L, 2L, 3L)), None)
      .toDF("g") // wrong dim (3 ≠ 8) and null
    val out = df.select(graft.functions.VectorExpressions
        .lshBandBuckets(col("g"), flat, 2, 2).as("bks")).collect()
    assert(out(0).isNullAt(0)) // ragged → null, never a truncated bucket
    assert(out(1).isNullAt(0))
  }

  // ------------------------------------------------------ CappedPairs
  private val docPosGen: Gen[(Long, Long)] = for {
    d <- Gen.chooseNum(0L, 6L)   // few docs → real collisions per group
    i <- Gen.chooseNum(1L, 40L)
  } yield (d, i)

  /** Reference semantics: the relational probe + join + pair expansion
    * the aggregate replaced — keep iff 2 ≤ n ≤ cap, emit every
    * cross-doc a<b occurrence pair. */
  private def refPairs(xs: List[(Long, Long)], cap: Int) = {
    if (xs.length < 2 || xs.length > cap) Set.empty[(Long, Long, Long, Long)]
    else (for {
      x <- xs; y <- xs; if x._1 < y._1
    } yield (x._1, y._1, x._2, y._2)).toSet
  }

  test("CappedPairs: any split/merge order matches the relational reference") {
    import graft.functions.CappedPairs
    check(Prop.forAll(Gen.listOf(docPosGen), Gen.chooseNum(2, 10)) {
      (xs: List[(Long, Long)], cap: Int) =>
        val agg = new CappedPairs(cap)
        val (a, rest) = xs.splitAt(xs.length / 3)
        val (b, c) = rest.splitAt(rest.length / 2)
        def reduceAll(part: List[(Long, Long)]) =
          part.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.merge(agg.merge(reduceAll(a), reduceAll(b)), reduceAll(c))
        val got = agg.finish(merged)
          .map(p => (p.a_id, p.b_id, p.ai, p.bi)).toSet
        got == refPairs(xs, cap)
    })
  }

  test("CappedPairs: buffer never exceeds 2(cap+1) longs under any growth") {
    import graft.functions.CappedPairs
    check(Prop.forAll(Gen.listOf(docPosGen), Gen.chooseNum(2, 6)) {
      (xs: List[(Long, Long)], cap: Int) =>
        val agg = new CappedPairs(cap)
        val buf = xs.foldLeft(agg.zero)(agg.reduce)
        val doubled = agg.merge(buf, buf)
        buf.length <= 2 * (cap + 1) && doubled.length <= 2 * (cap + 1)
    })
  }

  test("CappedPairsAgg (native) ≡ CappedPairs (typed) through a real shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftColumnBridge.{column => asCol, expression => asExpr}
    // groups covering every semantic edge: singleton (no emit),
    // cross-doc pair, same-doc-only (no a<b pair), exactly-at-cap,
    // saturated past cap (no emit), int-typed positions
    val cap = 3
    val rows = Seq(
      (1L, 10L, 1L),                                  // singleton
      (2L, 10L, 1L), (2L, 20L, 7L),                   // one cross-doc pair
      (3L, 10L, 1L), (3L, 10L, 2L),                   // same doc twice
      (4L, 10L, 1L), (4L, 20L, 2L), (4L, 30L, 3L),    // at cap: 3 pairs
      (5L, 10L, 1L), (5L, 20L, 2L), (5L, 30L, 3L), (5L, 40L, 4L)) // > cap
    val df = rows.toDF("h", "doc_id", "i").repartition(7) // force merges
    def collectPairs(c: org.apache.spark.sql.Column) =
      df.groupBy($"h").agg(c.as("pairs"))
        .select($"h", explode($"pairs").as("p"))
        .select($"h", $"p.a_id", $"p.b_id", $"p.ai", $"p.bi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val typedUdaf = udaf(new graft.functions.CappedPairs(cap))
    val typed = collectPairs(typedUdaf($"doc_id", $"i"))
    val native = collectPairs(asCol(graft.functions.CappedPairsAgg(
      asExpr($"doc_id"), asExpr($"i"), cap).toAggregateExpression()))
    assert(native == typed)
    assert(native.map(_._1) == Set(2L, 4L)) // only h=2 and h=4 emit
    assert(native.count(_._1 == 4L) == 3)
    // and the whole-operator plan (CappedPairsPlan → exec) agrees too
    import org.apache.spark.sql.GraftPlanBridge
    val viaPlan = GraftPlanBridge.ofRows(spark, graft.plans.CappedPairsPlan(
        GraftPlanBridge.analyzed(df.select($"h", $"doc_id", $"i")), cap))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaPlan == native.map(t => (t._2, t._3, t._4, t._5)))
  }

  test("LongSquaredDistance: eval ≡ codegen ≡ reference; ragged → null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Array(1000000L, -2500000L, 0L, 77L)
    val b = Array(-999999L, 2500000L, 4L, 77L)
    val expected = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // interpreted path
    val interpreted = graft.functions.LongSquaredDistance(
      Literal(new GenericArrayData(a), ArrayType(LongType)),
      Literal(new GenericArrayData(b), ArrayType(LongType)))
      .eval(null).asInstanceOf[Long]
    assert(interpreted == expected)
    // codegen path through a real query
    val df = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
    assert(df.select(graft.functions.VectorExpressions
      .vecL2Sq(col("x"), col("y")).as("d")).first().getLong(0) == expected)
    // and the HOF formulation agrees (the oracle's shape)
    assert(df.select(expr(
      "aggregate(zip_with(x, y, (p, q) -> (p - q) * (p - q)), 0L, (acc, v) -> acc + v)")
      .as("d")).first().getLong(0) == expected)
    // ragged → null
    val ragged = Seq((Seq(1L, 2L), Seq(3L))).toDF("x", "y")
    assert(ragged.select(graft.functions.VectorExpressions
      .vecL2Sq(col("x"), col("y")).as("d")).collect()(0).isNullAt(0))
  }

  // ------------------------------------------------------ TopicOffset
  // --------------------------------------------------- BigramHashPairs
  test("BigramHashPairs: eval ≡ codegen ≡ the composed split/concat_ws/xxhash64 chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // adversarial surface: normal text, no spaces (no pairs), empty
    // string, doubled/leading/trailing spaces (EMPTY tokens — split
    // keeps them at limit −1, and the byte-slice identity must hold
    // through them), multi-byte UTF-8 around the delimiters
    val texts = Seq(
      "the quick brown fox", "single", "", "a  b", " lead", "trail ",
      "  ", "héllo wörld ünïcode", "a b", "ab  cd  ef")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = df.select($"doc_id",
        explode(graft.functions.TextKernels.bigramHashPairs($"text")).as("b"))
      .select($"doc_id", $"b.bh", $"b.w1h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val composed = df
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws)-1), " +
          "i -> struct(xxhash64(concat_ws(' ', element_at(ws,i), element_at(ws,i+1))) as bh, " +
          "            xxhash64(element_at(ws,i)) as w1h))")).as("b"))
      .select($"doc_id", $"b.bh", $"b.w1h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(kernel == composed)
    // interpreted eval path agrees with the codegen'd query result
    val e = graft.functions.BigramHashPairs(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("a  b c"),
      org.apache.spark.sql.types.StringType))
    val rows = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaEval = (0 until rows.numElements()).map { i =>
      val r = rows.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
    val viaQuery = Seq(("a  b c", 0L)).toDF("text", "z")
      .select(explode(graft.functions.TextKernels.bigramHashPairs($"text")).as("b"))
      .select($"b.bh", $"b.w1h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaEval == viaQuery)
    // null in → null out
    assert(df.select(graft.functions.TextKernels.bigramHashPairs(
      lit(null).cast("string"))).first().isNullAt(0))
  }

  test("TopicOffset JSON round-trips for any partition map (property)") {
    import graft.sources.TopicOffset
    // checkpointed offsets survive serialize → recover exactly; -1 is
    // a legitimate pre-consumption value
    val mapGen: Gen[Map[Int, Long]] = Gen.mapOf(for {
      p <- Gen.chooseNum(0, 512)
      o <- Gen.chooseNum(-1L, Long.MaxValue / 2)
    } yield p -> o)
    check(Prop.forAll(mapGen) { m =>
      TopicOffset.parse(TopicOffset(m).json()).offsets == m
    })
    // canonical form: equal maps serialize identically regardless of
    // insertion order (the engine compares offset JSON strings)
    check(Prop.forAll(mapGen) { m =>
      TopicOffset(m).json() ==
        TopicOffset(m.toSeq.reverse.toMap).json()
    })
  }
}
