package graft

import graft.transform.Transforms
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5 rebuild strategy) over scalacheck
  * generators: batching arithmetic, hash normalization idempotence,
  * anti-join containment, signature bounds.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 60): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("batch count arithmetic: ceil(n/size) with the empty->1 quirk") {
    samples(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(1, 5000)), 200)
      .foreach { case (n, size) =>
        val batches = Transforms.batchCount(n, size)
        if (n == 0) assert(batches == 1) // reference emits one empty batch
        else {
          assert(batches == (n + size - 1) / size)
          assert(batches * size >= n && (batches - 1) * size < n)
        }
      }
  }

  test("grouped() preserves order, sizes, and total count") {
    samples(Gen.zip(Gen.listOf(Gen.chooseNum(0, 1000)), Gen.chooseNum(1, 17)), 100)
      .foreach { case (xs, size) =>
        val groups = Transforms.grouped(xs.iterator, size).toSeq
        assert(groups.flatten == xs)
        assert(groups.dropRight(1).forall(_.size == size))
        // reference quirk: empty input yields ONE empty batch
        // (batches_from_executions.py:113-131)
        if (xs.isEmpty) assert(groups == Seq(Seq.empty))
        else groups.lastOption.foreach(g => assert(g.nonEmpty && g.size <= size))
      }
  }

  test("gmail normalization digest is deterministic and idempotent") {
    val emails = Seq("John.Doe@GMAIL.com", "a.b.c@googlemail.com", "x@y.com",
      " padded@gmail.com ", "no.at.sign", "UPPER@Example.ORG")
    val df = (emails ++ emails).toDF("email")
    val hashed = graft.transform.PiiHashing.adsShape(df)
      .select("hashed_email").as[String].collect()
    // both copies of each email hash identically
    assert(hashed.take(emails.size).toSeq == hashed.drop(emails.size).toSeq)
  }

  test("anti-join output = source minus uploaded keys (multiset semantics)") {
    samples(Gen.zip(Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L)),
      Gen.listOf(Gen.chooseNum(0L, 50L))), 12).foreach { case (src, up) =>
      val out = Transforms.antiJoinUploaded(src.toDF("k"), up.toDF("k"), Seq("k"))
        .as[Long].collect().toList
      assert(out.toSet.intersect(up.toSet).isEmpty)
      assert(out.sorted == src.filterNot(up.toSet).sorted)
    }
  }

  test("minhash signature values are bounded by the universe prime") {
    val texts = samples(Gen.alphaStr, 40) ++ Seq("", "ab", "exactly5")
    val sigs = texts.toDF("t")
      .select(col("t"), graft.functions.KernelExpressions.minhashSig(col("t"), 5, 16).as("sig"))
      .as[(String, Seq[Long])].collect()
    sigs.foreach { case (text, sig) =>
      assert(sig.size == 16)
      assert(sig.forall(v => v >= 0 && v <= graft.functions.Kernels.MinhashP))
      if (text.length < 5) assert(sig.forall(_ == graft.functions.Kernels.MinhashP))
    }
  }

  test("native as-of join matches a naive per-row reference across directions and tolerances") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nKeys = 1 + rnd.nextInt(6)
      val left = Seq.tabulate(120)(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(500).toLong))
      val right = Seq.tabulate(40)(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(500).toLong, i.toDouble))
        .distinctBy(r => (r._1, r._2)) // unique (key, ts) contract
      val lDf = left.toDF("id", "key", "t")
      val rDf = right.toDF("rkey", "rt", "v")
      for ((fwd, tol) <- Seq((false, -1L), (false, 60L), (true, -1L), (true, 60L))) {
        def naive(k: Long, t: Long): Option[Double] = {
          val c = right.filter(r => r._1 == k &&
            (if (fwd) r._2 >= t && (tol < 0 || r._2 - t <= tol)
             else r._2 <= t && (tol < 0 || t - r._2 <= tol)))
          if (c.isEmpty) None
          else Some((if (fwd) c.minBy(_._2) else c.maxBy(_._2))._3)
        }
        val got = graft.operators.Temporal.asofJoinNative(lDf, rDf,
            Seq("key"), Seq("rkey"), "t", "rt", toleranceUs = tol, forward = fwd)
          .select("id", "v").as[(Long, Option[Double])].collect().toMap
        left.foreach { case (id, k, t) =>
          assert(got(id) === naive(k, t),
            s"trial=$trial fwd=$fwd tol=$tol id=$id key=$k t=$t")
        }
      }
    }
  }

  test("wordNgramStats matches a naive reference on random token streams") {
    val textGen = Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))
    val texts = samples(textGen, 60) ++ Seq("", "  ", "aa", "aa aa aa aa")
    val stats = texts.toDF("t")
      .select(col("t"), graft.functions.KernelExpressions.wordNgramStats(col("t"), 2).as("s"))
      .as[(String, Seq[Long])].collect()
    stats.foreach { case (text, s) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      assert(s(0) == grams.size.toLong, s"total for '$text'")
      assert(s(1) == counts.size.toLong, s"distinct for '$text'")
      assert(s(2) == (if (grams.isEmpty) 0L else counts.values.max.toLong), s"maxRun for '$text'")
    }
  }

  test("BPE kernel count matches the naive symbol-merging reference") {
    // Random merge tables trained on random word sets, applied to random
    // texts: the in-place symbol-array kernel must count exactly what
    // explicit symbol-list merging produces, word by word.
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    samples(Gen.zip(Gen.nonEmptyListOf(wordGen), Gen.chooseNum(0, 12)), 25)
      .foreach { case (words, numMerges) =>
        val freqs = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        val merges = graft.functions.Bpe.train(freqs, numMerges)
        val (pats, reps) = graft.functions.Bpe.compiled(merges)
        val texts = samples(Gen.listOf(Gen.oneOf(words)).map(_.mkString(" ")), 8) ++
          Seq("", "   ", words.head)
        val kernel = texts.toDF("t")
          .select(graft.functions.KernelExpressions.bpeTokenCount(
            col("t"), pats.toSeq, reps.toSeq))
          .as[Long].collect()
        texts.zip(kernel).foreach { case (text, k) =>
          val naive = text.trim.split("\\s+").filter(_.nonEmpty)
            .map(w => graft.functions.Bpe.tokenizeWordNaive(w, merges).size.toLong).sum
          assert(k == naive, s"text '$text' merges $merges: kernel $k != naive $naive")
        }
      }
  }

  test("BPE training is deterministic and merges the most frequent pair first") {
    val freqs = Seq(("abab", 10L), ("abc", 5L), ("cab", 3L))
    val m1 = graft.functions.Bpe.train(freqs, 4)
    val m2 = graft.functions.Bpe.train(freqs, 4)
    assert(m1 == m2)
    // ("a","b") dominates: 2×10 + 5 + 3 occurrences
    assert(m1.head == ("a", "b"))
    // a merge table exhausts once every word is one symbol
    val tiny = graft.functions.Bpe.train(Seq(("ab", 1L)), 10)
    assert(tiny == Seq(("a", "b")))
  }

  test("int8 quantization invariants vs a naive reference") {
    import graft.functions.KernelExpressions.int8Quantize
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f))
    samples(vecGen, 40).zipWithIndex.foreach { case (v, _) =>
      val got = Seq(Tuple1(v.toArray)).toDF("v")
        .select(int8Quantize(col("v"))).as[Seq[Long]].collect().head
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      val naive =
        if (maxAbs == 0.0) v.map(_ => 0L)
        else v.map(x => math.floor(x.toDouble * (127.0 / maxAbs) + 0.5).toLong)
      assert(got == naive)
      assert(got.forall(q => q >= -127L && q <= 127L))
      if (maxAbs > 0.0) assert(got.map(math.abs).max == 127L) // range is spanned
    }
  }

  test("char n-gram occurrence hashes: count, order, and distinct-set agreement") {
    import graft.functions.KernelExpressions.{charNgramOccHashes, charShingleHashes}
    val textGen = Gen.listOf(Gen.oneOf('a', 'b', 'C', ' ', 'é')).map(_.mkString)
    samples(textGen, 50).foreach { t =>
      val (occ, dst) = Seq(Tuple1(t)).toDF("t")
        .select(charNgramOccHashes(col("t"), 3), charShingleHashes(col("t"), 3))
        .as[(Seq[Long], Seq[Long])].collect().head
      val nCps = t.codePointCount(0, t.length)
      assert(occ.length == math.max(0, nCps - 2)) // every occurrence, in order
      // the occurrence stream's distinct set IS the sorted shingle set
      assert(occ.distinct.sorted == dst)
    }
  }

  test("packed image dims agree with per-format parses on random planted headers") {
    import graft.functions.KernelExpressions.imageDims
    def be32(v: Long) = f"$v%08X"
    def le16(v: Long) = { val h = f"$v%04X"; h.substring(2) + h.substring(0, 2) }
    samples(Gen.zip(Gen.chooseNum(1L, 0x7FFFFFL), Gen.chooseNum(1L, 0xFFFFL)), 30)
      .foreach { case (w, h) =>
        val png = "89504E470D0A1A0A0000000D49484452" + be32(w) + be32(h)
        val gif = "474946383961" + le16(w & 0xFFFFL) + le16(h)
        val rows = Seq(png, gif, "DEADBEEF").toDF("hx")
          .select(imageDims(unhex(col("hx")))).as[Long].collect()
        assert(rows(0) == ((w << 32) | h))
        assert(rows(1) == (((w & 0xFFFFL) << 32) | h))
        assert(rows(2) == -1L)
      }
  }

  test("simhash ignores whitespace amount between identical tokens") {
    val tokLists = samples(Gen.listOfN(5, Gen.oneOf("alpha", "beta", "gamma", "delta")), 30)
    val pairs = tokLists.map(t => (t.mkString(" "), t.mkString("  ") + " "))
    val sigs = pairs.flatMap(p => Seq(p._1, p._2)).toDF("t")
      .select(graft.functions.KernelExpressions.simhash60(col("t")))
      .as[Long].collect()
    sigs.grouped(2).foreach(g => assert(g(0) == g(1)))
  }

  test("zValue2 matches a naive bit-interleave reference and is monotone per quadrant") {
    def naive(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val cases = samples(Gen.zip(Gen.chooseNum(0L, (1L << 21) - 1),
      Gen.chooseNum(0L, (1L << 21) - 1)), 60)
    val got = cases.toDF("x", "y")
      .select(graft.functions.KernelExpressions.zValue2(col("x"), col("y"), 21))
      .as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == naive(x, y, 21), s"zValue2($x, $y)")
    }
    // masking semantics: values beyond `bits` interleave only their low bits
    val masked = Seq((1L << 21, 1L)).toDF("x", "y")
      .select(graft.functions.KernelExpressions.zValue2(col("x"), col("y"), 21))
      .as[Long].collect()(0)
    assert(masked == naive(0L, 1L, 21))
  }

  test("dup-span scrub and stats agree on random corpora: kept + covered = total") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
    val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = samples(doc, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val stats = graft.operators.Dedup.dupSpanStats(df, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val scrub = graft.operators.Dedup.dupSpanScrub(df, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    docs.foreach { case (id, text) =>
      val total = if (text.trim.isEmpty) 0L else text.trim.split("\\s+").length.toLong
      val (clean, kept) = scrub(id)
      assert(kept == total - stats(id), s"doc $id")
      val cleanToks = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
      assert(cleanToks == kept, s"doc $id rebuild")
    }
  }

  test("histogramQuantiles error is bounded by binWidth vs exact quantiles") {
    val valueLists = samples(Gen.listOfN(200, Gen.chooseNum(0.0, 100.0)), 10)
    valueLists.foreach { vs =>
      val est = graft.operators.Sketches
        .histogramQuantiles(vs.toDF("v"), "v", 5.0, Seq(250, 500, 900))
        .as[(Long, Double)].collect().toMap
      val sorted = vs.sorted
      Seq(250, 500, 900).foreach { q =>
        // rank = ceil(q*n/1000), 1-indexed
        val exact = sorted((q * vs.size + 999) / 1000 - 1)
        val e = est(q.toLong)
        assert(e <= exact && exact < e + 5.0,
          s"q=$q est=$e exact=$exact (bin width 5)")
      }
    }
  }

  test("containment pairs equal the naive all-pairs shingle computation") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    samples(Gen.listOfN(6, doc), 6).zipWithIndex.foreach { case (texts, _) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.containmentPairs(df, "doc_id", "text",
          n = 3, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // naive reference: distinct word-3-gram sets, directional ratios
      def grams(t: String): Set[Seq[String]] =
        t.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3).toSet
      val sets = texts.zipWithIndex.map { case (t, i) => i.toLong -> grams(t) }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a != b
        sa = sets(a); sb = sets(b) if sa.nonEmpty
        c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.4
      } yield (a, b) -> (math.rint(c * 1e6) / 1e6)).toMap
      assert(got == want, s"texts=$texts")
    }
  }

  test("jaroWinkler: symmetry, bounds, identity, and containment ordering") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double = graft.functions.Kernels.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))
    val str = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    samples(Gen.zip(str, str), 300).foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"($a,$b) -> $s")
      assert(s == jw(b, a), s"asymmetric on ($a,$b)") // matching is symmetric
      assert(jw(a, a) == (if (a.isEmpty) 1.0 else 1.0))
    }
    // more shared prefix can only help (same suffix edit)
    assert(jw("prefixab", "prefixba") > jw("prefab", "prefba"))
  }

  test("nodeSimilarity equals the naive neighborhood-jaccard on random graphs") {
    val rng = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val n = 2 + rng.nextInt(7)
      val edges = (for {
        a <- 1 to n; b <- 1 to n
        if a != b && rng.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = graft.operators.Graph.nodeSimilarity(
            edges.toDF("src", "dst"), "src", "dst", k = 1000, maxDegree = 1000)
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(3)).toMap
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        val want = (for {
          a <- adj.keys; b <- adj.keys if a < b
          inter = adj(a).intersect(adj(b)).size if inter > 0
          un = adj(a).size + adj(b).size - inter
        } yield (a, b) -> inter.toLong * 1000000L / un).toMap
        assert(got == want, s"edges=$edges")
      }
    }
  }

  test("kmv set similarity is exact whenever the union sketch is under k") {
    val rng = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val xs = (1 to 20).filter(_ => rng.nextBoolean()).map(_.toLong)
      val ys = (1 to 20).filter(_ => rng.nextBoolean()).map(_.toLong)
      if (xs.nonEmpty && ys.nonEmpty) {
        val df = (xs.map(("a", _)) ++ ys.map(("b", _))).toDF("g", "x")
        val out = graft.operators.Sketches.kmvSetSimilarity(df, "g",
            graft.operators.Dedup.shingleHash(col("x").cast("string")), k = 64)
          .as[(String, String, Long, Long)].collect().head
        val inter = xs.toSet.intersect(ys.toSet).size.toLong
        val expect = inter * 1000000L / (xs.toSet ++ ys.toSet).size
        assert(out._3 === expect, s"exact xs=$xs ys=$ys")
        assert(out._4 === expect, s"sketch xs=$xs ys=$ys")
      }
    }
  }

  test("attribution conserves credit: sum == number of converted segments") {
    // random timelines: whatever the touch mix, total credit must equal
    // the count of conversions that had at least one preceding touch
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val types = Seq("view", "click", "purchase", "signup")
      val rows = (1 to 200).map { i =>
        (rng.nextInt(8).toLong, rng.nextInt(50).toLong + 1, i.toLong,
          types(rng.nextInt(types.size)))
      }
      val df = rows.toDF("u", "t", "eid", "ch")
      val total = graft.operators.Marketing
        .attributeU(df, "u", "t", "eid", "ch", Seq("view", "click"), "purchase")
        .agg(sum(col("credit"))).collect().head.getDouble(0)
      // reference: a touch belongs to the min conv_t STRICTLY greater than
      // its ts; total credit = count of owned (user, conv_t) segments
      // (every segment's U-shape sums to exactly 1)
      val exact = rows.groupBy(_._1).toSeq.map { case (_, evs) =>
        val convs = evs.filter(_._4 == "purchase").map(_._2)
        val touches = evs.filter(e => e._4 == "view" || e._4 == "click")
        touches.flatMap(tc => convs.filter(_ > tc._2).minOption)
          .distinct.size
      }.sum
      // per-channel credits are released rounded to 1e-4, so the cross-
      // channel sum can sit a few 1e-4 off the exact integer
      assert(math.abs(total - exact) < 1e-3,
        s"credit $total != converted segments $exact")
    }
  }

  test("luhn flips on every single-digit mutation of a valid card") {
    import graft.operators.Safety
    val valid = "4539578763621486"
    val muts = (0 until 16).map { i =>
      val d = valid(i) - '0'
      valid.updated(i, (((d + 1) % 10) + '0').toChar)
    }
    val out = (valid +: muts).toDF("card")
      .select(col("card"), Safety.luhnValid16(col("card")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out(valid))
    muts.foreach(m => assert(!out(m), s"mutation $m still validates"))
  }

  test("token entropy is bounded by ln(distinct chars) and ln(length)") {
    import graft.operators.Safety
    val rng = new scala.util.Random(7)
    val toks = (1 to 30).map { _ =>
      val len = 16 + rng.nextInt(20)
      (1L, (1 to len).map(_ => ('a' + rng.nextInt(6)).toChar).mkString)
    }
    val docs = toks.zipWithIndex.map { case ((id, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Safety.secretScan(docs, "doc_id", "text", minLen = 16, minNats = 99.0)
      .collect()
    out.foreach { r =>
      val h = r.getDouble(3)
      val len = r.getLong(2)
      assert(h >= 0.0 && h <= math.log(math.min(6L, len).toDouble) + 1e-9,
        s"entropy $h out of bounds for len $len over 6-char alphabet")
    }
    assert(out.length == toks.size)
  }

  test("bitmapDistinct == count(DISTINCT) on arbitrary longs incl. negatives") {
    samples(Gen.listOfN(300,
        Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(-5000L, 5000L))), 8)
      .foreach { rows =>
        val df = rows.toDF("g", "id")
        val got = graft.operators.Sketches.bitmapDistinct(df, Seq("g"), "id")
          .as[(String, Long)].collect().toMap
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(_._2).distinct.length.toLong }
        assert(got == want, s"got $got want $want")
      }
  }

  test("soleLatestActor: output groups have >=2 actors and a strict sole max") {
    samples(Gen.listOfN(120, Gen.zip(Gen.chooseNum(1, 12),
        Gen.chooseNum(1L, 6L), Gen.chooseNum(1L, 9L))), 6)
      .foreach { rows =>
        val df = rows.map { case (g, a, t) => (s"g$g", a, t) }
          .toDF("grp", "actor", "ts")
        val got = graft.operators.Temporal
          .soleLatestActor(df, "grp", "actor", "ts")
          .as[(String, Long)].collect().toMap
        val byGrp = rows.groupBy(r => s"g${r._1}")
        // reference model: per group, distinct actors at the global max ts
        val want = byGrp.collect { case (g, rs)
            if rs.map(_._2).distinct.size >= 2 &&
              rs.filter(_._3 == rs.map(_._3).max).map(_._2).distinct.size == 1 =>
          g -> rs.filter(_._3 == rs.map(_._3).max).head._2
        }
        assert(got == want.toMap, s"got $got want $want")
      }
  }

  test("prefixSum equals the sequential scan for random unique-key frames") {
    // random (key, value) sets with random partition counts — the scan's
    // offsets must agree with a driver-side sequential fold every time
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-5000L, 5000L),
        Gen.chooseNum(-100L, 100L))).map(_.toMap.toSeq), // unique keys
      Gen.chooseNum(1, 13))
    samples(gen, 8).foreach { case (rows, parts) =>
      val got = graft.operators.Scan
        .prefixSum(rows.toDF("k", "v"), "k", "v", "cum", numPartitions = parts)
        .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
      val want = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).tail
      assert(got.map(_._2).toSeq == want,
        s"parts=$parts rows=${rows.size}: ${got.toSeq} vs $want")
    }
  }

  test("slidingDistinct equals brute-force windowed distinct on random activity") {
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(0L, 25L))),
      Gen.chooseNum(1, 9))
    samples(gen, 8).foreach { case (rows, w) =>
      val got = graft.operators.Temporal
        .slidingDistinct(rows.toDF("u", "p"), "u", "p", w)
        .as[(Long, Long)].collect().toMap
      val lo = rows.map(_._2).min; val hi = rows.map(_._2).max + w - 1
      val want = (lo to hi).map { d =>
        d -> rows.collect { case (u, ad) if ad <= d && d < ad + w => u }
          .distinct.size.toLong
      }.filter(_._2 > 0).toMap
      assert(got == want, s"w=$w rows=$rows:\n$got\nvs\n$want")
    }
  }
}
