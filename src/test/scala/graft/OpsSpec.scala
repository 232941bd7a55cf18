package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("shingles: 3-gram word windows, short docs → whole text") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val out = df.select($"id", Dedup.shingles($"text").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).sorted === Seq("a b c", "b c d"))
    assert(out(2L) === Seq("x y"))
  }

  test("shinglesHashed == sorted xxhash64 of the string shingles " +
      "(short docs, empty text, duplicate grams included)") {
    val df = Seq((1L, "a b c d a b c"), (2L, "x y"), (3L, ""))
      .toDF("id", "text")
    val got = df.select($"id", Dedup.shinglesHashed($"text").as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = df.select($"id",
        sort_array(transform(Dedup.shingles($"text"), s => xxhash64(s)))
          .as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got === want)
    assert(got(1L).size === 4) // "a b c" repeats → distinct keeps 4 of 5
    assert(got(2L).size === 1) // whole short text is the one shingle
    assert(got(3L).size === 1) // empty text → one empty-string shingle
    assert(got(1L) === got(1L).sorted)
  }

  test("minhash+LSH finds a planted near-dup and skips unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok40", "tokX") // 37/39 shared shingles
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash: identical docs identical, disjoint docs differ") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("exact dedup keeps min id per normalized text") {
    val df = Seq((5L, "Hello  world"), (2L, "hello world"), (9L, "bye"))
      .toDF("doc_id", "text")
    val kept = Dedup.exact(df, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 9L))
  }

  test("brute-force cosine top-k is exact and deterministically ordered") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(1f, 0.01f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(df, df.where($"vec_id" === 0), "vec_id",
      "embedding", 2)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toList
    assert(out === List(3L, 1L)) // 3 is closer to (1,0) than 1
  }

  test("langid ballot: first max wins, zero hits → unk") {
    val df = Seq(
      (1L, "the cat and the dog"),   // en
      (2L, "der hund und die katze"), // de
      (3L, "qqq www eee"))            // unk
      .toDF("id", "text")
    val out = df.select($"id", TextOps.langId($"text").as("l"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "unk"))
  }

  test("token stats and fingerprint normalization") {
    val df = Seq((1L, "a  b c")).toDF("id", "text") // double space → empty tok
    val r = df.select(
      TextOps.nTokens($"text").as("n"),
      TextOps.fingerprint($"text").as("fp"),
      TextOps.fingerprint(lit("A B c")).as("fp2")).head()
    assert(r.getAs[Int]("n") === 4)
    assert(r.getAs[String]("fp") === r.getAs[String]("fp2")) // ws+case normalized
  }

  test("multimodal featurizer: deterministic, schema-stable, batch-run") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
    val out = Multimodal.featurize(df, "doc_id", "payload")
    assert(out.schema === Multimodal.featSchema)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(2))).toMap
    assert(rows(1L) === ((3L, 'a'.toInt)))
    assert(rows(2L) === ((0L, -1)))
    // deterministic across runs
    val again = Multimodal.featurize(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(again === first)
  }

  test("multimodal codec lifecycle: ONE init per partition, batched " +
      "calls, closed on completion") {
    val inits = spark.sparkContext.longAccumulator("codec_inits")
    val calls = spark.sparkContext.longAccumulator("codec_batches")
    val closes = spark.sparkContext.longAccumulator("codec_closes")
    val df = (1L to 40L).map(i => (i, s"payload$i")).toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .repartition(4)
    val factory = () => {
      inits.add(1)
      new Multimodal.BatchCodec {
        def featurizeBatch(ps: Array[Array[Byte]]): Array[Array[Float]] = {
          calls.add(1); ps.map(Multimodal.stubFeaturize)
        }
        override def close(): Unit = closes.add(1)
      }
    }
    val out = Multimodal.featurize(df, "doc_id", "payload",
      batchSize = 5, codecFactory = factory)
    assert(out.count() === 40)
    assert(inits.value === 4, s"expected one codec init per partition")
    // 40 rows / batchSize 5 → ~8 batch calls (±partition-size skew),
    // i.e. BATCHED — nowhere near one call per row
    assert(calls.value >= 4 && calls.value <= 12,
      s"expected batched codec calls, got ${calls.value}")
    assert(closes.value === 4, s"expected one close per partition")
    // batching must not change results vs the default per-stub path
    val base = Multimodal.featurize(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val batched = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(batched === base)
  }

  test("ImageIoCodec: real PNG decode through the featurize seam — " +
      "dims + channel means extracted, undecodable bytes fail-captured") {
    // generate two tiny PNGs in memory: 4x2 solid red, 3x3 solid
    // (10, 20, 30) — javax.imageio round-trips PNG losslessly, so the
    // channel means are exact
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(4, 2, 0xff0000)),
      (2L, png(3, 3, (10 << 16) | (20 << 8) | 30)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.featurize(df, "doc_id", "payload",
        codecFactory = () => new Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(out(1L).take(2) === Seq(4.0f, 2.0f))
    assert(out(1L).slice(3, 6) === Seq(255.0f, 0.0f, 0.0f))
    assert(out(2L).take(2) === Seq(3.0f, 3.0f))
    assert(out(2L).slice(3, 6) === Seq(10.0f, 20.0f, 30.0f))
    assert(out(2L)(7) === 1.0f) // aspect
    assert(out(3L)(0) === -1.0f, "undecodable payload must fail-capture")
  }

  test("lexiconScore: signed integer points, zero-hit docs kept at 0") {
    val docs = Seq(
      (1L, "spark the spark engine"),   // 5 + (-1) + 5 = 9 over 4 tokens
      (2L, "nothing matches here"),     // zero hits, still a row
      (3L, "the the the")               // -3 (negative scores work)
    ).toDF("doc_id", "text")
    val lex = Seq(("spark", 5L), ("the", -1L)).toDF("term", "weight")
    val out = graft.ops.TextOps.lexiconScore(docs, "doc_id", "text", lex)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      1L -> ((4L, 3L, 9L, 2.25)),
      2L -> ((3L, 0L, 0L, 0.0)),
      3L -> ((3L, 3L, -3L, -1.0))))
  }

  test("ppJoin prefix candidates + verify match brute-force exact Jaccard") {
    // mixed corpus: two planted near-dup clusters + noise docs sharing a
    // popular token (stresses the frequency-ordered prefix: the popular
    // shingle must not pair everything)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "tokX")
    val docs = Seq((1L, base), (2L, near), (3L, base + " extra trailing junk")) ++
      (10 to 29).map(i => (i.toLong, s"common noise$i filler$i " * 5))
    val df = docs.toDF("doc_id", "text")
    val sh = df.select($"doc_id", sort_array(Dedup.shingles($"text")).as("sh"))
    val t = 0.5
    val cands = Dedup.ppJoinCandidates(sh, "doc_id", "sh", t)
    val got = Dedup.jaccardVerifySh(sh, cands, "doc_id", t, shCol = "sh")
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // brute-force truth
    val truth = Dedup.jaccardVerifySh(sh,
        sh.select($"doc_id".as("id1")).crossJoin(sh.select($"doc_id".as("id2")))
          .where($"id1" < $"id2"),
        "doc_id", t, shCol = "sh")
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(got === truth)
    assert(got.contains((1L, 2L)))
  }

  test("persist lifecycle: persisting operators leave no CacheManager entries") {
    spark.catalog.clearCache() // clean slate (other suites may share the session)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base.replace("tok30", "tokX")),
      (3L, "unrelated filler words entirely")).toDF("doc_id", "text")
    Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5).count()
    val sh = docs.select($"doc_id", sort_array(Dedup.shingles($"text")).as("sh"))
    Dedup.ppJoinCandidates(sh, "doc_id", "sh", 0.5).count()
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 10).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    Similarity.cosineNearDups(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 0.95).count()
    assert(org.apache.spark.sql.CacheProbe.noCachedPlans(spark),
      "an operator left a persisted intermediate in the CacheManager")
  }

  test("dedup clusters close transitive chains; canonicalize keeps min id") {
    // chain 1~2~3, pair 5~4 (reversed order), singleton 9
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("id1", "id2")
    val cl = Dedup.clusters(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (9L, "f")).toDF("doc_id", "text")
    val kept = Dedup.canonicalize(rows, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 9L))
  }

  test("contamination counts shared n-gram shingles per test doc") {
    val train = Seq((1L, "a b c d e"), (2L, "x y z w v")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "a b c q r"),      // shares exactly 'a b c'
      (11L, "b c d e f"),      // shares 'b c d' and 'c d e'
      (12L, "p q r s t"))      // clean
      .toDF("doc_id", "text")
    val out = Dedup.contamination(train, test, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(10L -> 1L, 11L -> 2L)) // clean doc absent
  }

  test("deterministic sampling: pure id function, disjoint covering splits") {
    val df = (0L until 500L).toDF("doc_id")
    val a = graft.ops.Sampling.deterministicSample(df, "doc_id", 32)
      .as[Long].collect().toSet
    // re-evaluation and repartitioning cannot change membership
    val again = graft.ops.Sampling.deterministicSample(df.repartition(7),
      "doc_id", 32).as[Long].collect().toSet
    assert(a === again)
    assert(a.nonEmpty && a.size < 500)
    // a 3-way range split is disjoint and covers everything
    val s1 = graft.ops.Sampling.deterministicRange(df, "doc_id", 0, 240)
      .as[Long].collect().toSet
    val s2 = graft.ops.Sampling.deterministicRange(df, "doc_id", 240, 248)
      .as[Long].collect().toSet
    val s3 = graft.ops.Sampling.deterministicRange(df, "doc_id", 248, 256)
      .as[Long].collect().toSet
    assert((s1 & s2).isEmpty && (s1 & s3).isEmpty && (s2 & s3).isEmpty)
    assert((s1 | s2 | s3) === (0L until 500L).toSet)
  }

  test("banded cosine LSH near-dups match brute force on planted dups") {
    // 2 planted near-dup pairs (scaled copies, cos = 1) + noise vectors
    val rnd = new scala.util.Random(7)
    val noise = (0 until 30).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val planted = Seq(
      (100L, noise(0)._2.map(_ * 2f)), (101L, noise(1)._2.map(_ * 3f)))
    val df = (noise ++ planted).toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDups(df, "vec_id", "embedding", 0.95)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    import graft.ops.Similarity.{cosine, toDoubleVec}
    val v = df.select($"vec_id", toDoubleVec($"embedding").as("v"))
    val truth = v.as("a").join(v.as("b"), $"a.vec_id" < $"b.vec_id")
      .where(cosine($"a.v", $"b.v") >= 0.95)
      .select($"a.vec_id", $"b.vec_id").as[(Long, Long)].collect().toSet
    assert(got === truth)
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)))
  }

  test("banded lshTopK reproduces exact bruteTopK at high-recall banding") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 5)
    val exact = Similarity.bruteTopK(df, q, "vec_id", "embedding", 3)
      .as[(Long, Long, Int)].collect().toSet
    val approx = Similarity.lshTopK(df, q, "vec_id", "embedding", 3,
      bands = 32, planesPerBand = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(approx === exact)
  }

  test("ivfTopK reproduces exact bruteTopK with full-recall probes " +
      "and prunes cells at nProbe=1") {
    val rnd = new scala.util.Random(11)
    // two well-separated clusters so the quantizer has real structure
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 4.0 else -4.0
      (i.toLong, Array.fill(16)((base + rnd.nextGaussian()).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 5)
    val exact = Similarity.bruteTopK(df, q, "vec_id", "embedding", 3)
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(df, q, "vec_id", "embedding", 3,
      nCells = 4, nProbe = 4, iters = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf === exact)
    // nProbe=1 prunes to a single cell per query yet still yields a
    // well-formed ranking (dense ranks from 1, no self-pairs). Recall
    // under pruning is the probe-count trade-off, not asserted here —
    // the full-probe equality above is the correctness claim.
    val pruned = Similarity.ivfTopK(df, q, "vec_id", "embedding", 3,
      nCells = 4, nProbe = 1, iters = 3)
      .as[(Long, Long, Int)].collect()
    assert(pruned.nonEmpty && pruned.forall { case (qid, nid, _) => qid != nid })
    pruned.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toSeq)
    }
  }

  test("recallAtK: partial and zero-hit queries score fractionally, not drop") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 99L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.recallAtK(approx, exact)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // query 1: found 2 of 3 true neighbors (the extra 99 doesn't count);
    // query 2: no approx rows at all → recall 0 row, present
    assert(out === Map(1L -> ((3L, 2L, 0.6667)), 2L -> ((2L, 0L, 0.0))))
  }

  test("repetitionStats: dup-word and top-bigram fractions, short-doc edges") {
    val df = Seq(
      (1L, "a b a b a"),   // 5 words, 3 dups of 2 distinct; bigrams: "a b"×2, "b a"×2 → top 2/4
      (2L, "x y z"),       // no repetition: dup 0, each bigram once → top 1/2
      (3L, "w")            // single word: no bigrams → top frac 0
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((5L, 0.6, 0.5)))
    assert(out(2L) === ((3L, 0.0, 0.5)))
    assert(out(3L) === ((1L, 0.0, 0.0)))
  }

  test("scrubPii: counts and redacts emails, phones, IPs; order-safe") {
    val df = Seq(
      (1L, "mail a.b@x.io or c@y.co call 555-123-4567 from 10.0.0.1"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val out = TextOps.scrubPii(df, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 2 && out(1L)._3 === 1 && out(1L)._4 === 1)
    assert(out(1L)._5 ===
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP>")
    assert(out(2L) === ((2L, 0, 0, 0, "clean text only")))
  }

  test("topTerms: frequency head with deterministic term ties") {
    val df = Seq((1L, "b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.topTerms(df, "text", 2)
      .as[(String, Long)].collect().toList
    assert(out === List(("b", 3L), ("a", 2L)))
  }

  test("tfIdfTopTerms: raw-idf scores, deterministic score/term ranking") {
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c d"))
      .toDF("doc_id", "text")
    // N=3; df: a=2 b=1 c=2 d=1 → d1: a 2·(3/2)=3.0 ties b 1·3=3.0 (term
    // asc breaks); d3: c 3·1.5=4.5 beats d 3.0
    val out = TextOps.tfIdfTopTerms(df, "doc_id", "text", 2)
      .as[(Long, Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, 1L)) === (("a", 2L, 3.0)))
    assert(out((1L, 2L)) === (("b", 1L, 3.0)))
    assert(out((2L, 1L)) === (("a", 1L, 1.5)))
    assert(out((3L, 1L)) === (("c", 3L, 4.5)))
    assert(out((3L, 2L)) === (("d", 1L, 3.0)))
  }

  test("bm25Rank: more query-term hits rank higher; non-matching docs drop") {
    val df = Seq(
      (1L, "q q q x"), (2L, "q x x x"), (3L, "x x x x"), (4L, "q r x x"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25Rank(df, "doc_id", "text", Seq("q", "r"), k = 4)
      .as[(Long, Long, Double)].collect().toList
    assert(out.map(_._1) === List(4L, 1L, 2L)) // 2 terms beats 1; tf breaks
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(4L)._2 === 2L && byDoc(1L)._2 === 1L)
    assert(byDoc(1L)._3 > byDoc(2L)._3) // same dl, higher tf → higher score
    assert(!out.exists(_._1 === 3L))
  }

  test("lengthQuantiles: nearest-rank per group, integer-exact") {
    val df = Seq(("a", "w"), ("a", "w w"), ("a", "w w w"), ("a", "w w w w"),
      ("b", "w w w w w")).toDF("source", "text")
    val out = TextOps.lengthQuantiles(df, "source", "text", Seq(50, 100))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("a", 50L, 2L), ("a", 100L, 4L),
      ("b", 50L, 5L), ("b", 100L, 5L)))
  }

  test("exactN: deterministic exact-count sample in md5 order") {
    val df = (1L to 50L).map(i => (i, s"d$i")).toDF("id", "v")
    val a = graft.ops.Sampling.exactN(df, "id", 7)
      .select($"id").as[Long].collect().toList
    val b = graft.ops.Sampling.exactN(df.repartition(13), "id", 7)
      .select($"id").as[Long].collect().toList
    assert(a.size === 7 && a === b) // layout-independent pick
    // matches the driver-computed md5 order
    def hex(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(a === (1L to 50L).sortBy(i => (hex(i), i)).take(7).toList)
  }

  test("keepBest: per-cluster max-score survivor, min-id ties") {
    val df = Seq((1L, "fp1", 10L), (2L, "fp1", 30L), (3L, "fp1", 30L),
      (4L, "fp2", 5L)).toDF("doc_id", "cl", "score")
    val out = Dedup.keepBest(df, col("cl"), "doc_id", "score")
      .select($"doc_id").as[Long].collect().toSet
    assert(out === Set(2L, 4L))
  }

  test("keepBest: null scores lose to any real score; all-null cluster " +
      "falls back to min id") {
    val df = Seq((1L, "c1", Some(1L)), (2L, "c1", None),
      (7L, "c2", None), (5L, "c2", None)).toDF("doc_id", "cl", "score")
    val out = Dedup.keepBest(df, col("cl"), "doc_id", "score")
      .select($"doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 5L))
  }

  test("keepBest: long scores past 2^53 stay exact — adjacent giants " +
      "must not collapse in a lossy double and fall to the id tie-break") {
    // 2^60 and 2^60+1 collapse to the same double; the higher-score row
    // carries the HIGHER id, so a double-negated ordering would "tie"
    // and keep the lower-scored min-id row. The decimal(20,0) widening
    // keeps them distinct. Long.MinValue still must not overflow-wrap.
    val big = 1L << 60
    val df = Seq((1L, "c1", big), (2L, "c1", big + 1L),
      (9L, "c2", Long.MinValue), (8L, "c2", Long.MinValue + 1L))
      .toDF("doc_id", "cl", "score")
    val out = Dedup.keepBest(df, col("cl"), "doc_id", "score")
      .select($"doc_id").as[Long].collect().toSet
    assert(out === Set(2L, 8L))
  }

  test("exact/keepBest plan as combinable aggregates, never a window " +
      "over the fingerprint/cluster key") {
    val df = Seq((1L, "x", 1L)).toDF("doc_id", "text", "score")
    for (plan <- Seq(
        Dedup.exact(df, "doc_id", "text"),
        Dedup.keepBest(df, col("text"), "doc_id", "score"),
        Dedup.incrementalExact(df, df, "doc_id", "text"))) {
      val phys = plan.queryExecution.executedPlan.toString
      assert(!phys.contains("Window"), phys)
      assert(phys.contains("Aggregate"), phys)
    }
  }

  test("collocations: lift ranks rare-but-bound pairs over frequent ones") {
    val df = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    // unigrams a2 b2 c1 d1, T=6; bigrams "a b"x2, "b a"x1, "c d"x1
    // lifts: cd 1·6/(1·1)=6, ab 2·6/(2·2)=3, ba 1·6/(2·2)=1.5
    val out = TextOps.collocations(df, "text", minCount = 1, k = 10)
      .as[(String, String, Long, Double)].collect().toList
    assert(out === List(("c", "d", 1L, 6.0), ("a", "b", 2L, 3.0),
      ("b", "a", 1L, 1.5)))
    // minCount prunes before ranking
    val pruned = TextOps.collocations(df, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect().toList
    assert(pruned === List(("a", "b", 2L, 3.0)))
  }

  test("groupSplit: whole groups co-travel; widths must sum to 256") {
    val df = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g3"))
      .toDF("doc_id", "grp")
    val out = graft.ops.Sampling.groupSplit(df, "grp",
        Seq("train" -> 192, "val" -> 32, "test" -> 32))
      .as[(Long, String, String)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byGroup.values.forall(_.size === 1), s"split a group: $out")
    // fold matches the md5-prefix rule computed independently
    def expected(g: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val h = d.take(1).map("%02x".format(_)).mkString
      if (h < "c0") "train" else if (h < "e0") "val" else "test"
    }
    assert(out.forall(r => r._3 === expected(r._2)))
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.groupSplit(df, "grp", Seq("a" -> 100, "b" -> 100))
    }
  }

  test("quantizeInt8: max-abs scale, half-up codes, zero-vector edge") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1.0)
    // floor(x/1*127 + 0.5): 127, floor(-63.5+0.5) = -63, floor(31.75+0.5) = 32
    assert(out(1L)._3 === Seq(127, -63, 32))
    assert(out(2L)._2 === 0.0 && out(2L)._3 === Seq(0, 0, 0))
  }

  test("skew ops: two-stage distinct count and salted sum match plain agg") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("k", "v")
    val d = graft.ops.Skew.distinctCount(df, Seq("k"), "v")
      .as[(String, Long)].collect().toMap
    assert(d === Map("a" -> 2L, "b" -> 1L))
    val nums = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
      .toDF("k", "n")
    val s = graft.ops.Skew.salted(nums, Seq("k"), saltBy = "n", salts = 4,
      partials = Seq(sum($"n").as("_s"), count(lit(1)).as("_c")),
      combine = Seq(sum($"_s").as("total"), sum($"_c").as("cnt")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(s === Map("a" -> ((6L, 3L)), "b" -> ((10L, 1L))))
  }

  test("resizeNearest: real PNG decode, integer sampling grid, " +
      "failure capture") {
    def png(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 4x4 with pixel = x*16 + y in the blue channel
    val good = png(4, 4)((x, y) => x * 16 + y)
    val df = Seq(
      (1L, good),
      (2L, Array[Byte](1, 2, 3)),       // no reader matches → unreadable
      (3L, good.take(24))               // PNG magic, truncated body →
    ).toDF("id", "png")                 //   the reader throws mid-decode
    val out = Multimodal.resizeNearest(df, "id", "png", 2, 2)
      .select($"id", $"in_w", $"in_h", $"pixels", $"reason")
      .as[(Long, Int, Int, Seq[Int], String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 4 && out(1L)._3 === 4)
    // sampled at (0,0), (2,0), (0,2), (2,2) → blue = 0, 32, 2, 34
    assert(out(1L)._4.map(_ & 0xffffff) === Seq(0, 32, 2, 34))
    assert(out(1L)._5 === "ok")
    // per-class fail capture, schema-stable (dims -1, empty pixels)
    assert(out(2L)._2 === -1 && out(2L)._4.isEmpty)
    assert(out(2L)._5 === "unreadable")
    assert(out(3L)._2 === -1 && out(3L)._4.isEmpty)
    assert(out(3L)._5.startsWith("decode-error:"),
      s"want decode-error:*, got ${out(3L)._5}")
  }

  test("decodeWavStats: real javax.sound WAV decode, hand-checked " +
      "PCM stats, stereo downmix, per-class failure capture") {
    def wav(samples: Array[Short], channels: Int = 1,
        bits: Int = 16,
        enc: javax.sound.sampled.AudioFormat.Encoding =
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        : Array[Byte] = {
      val bytesPer = bits / 8
      val fmt = new javax.sound.sampled.AudioFormat(enc,
        8000f, bits, channels, bytesPer * channels, 8000f, false)
      val pcm = new Array[Byte](samples.length * bytesPer)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcm(bytesPer * i) = (v & 0xFF).toByte
        if (bytesPer == 2) pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt,
          (samples.length / channels).toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val pcmU = javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val df = Seq(
      (1L, wav(Array[Short](100, -200, 32767, -32768))),
      (2L, Array[Byte](9, 9, 9)),                          // not a WAV
      // stereo: frames (100,200),(−300,100) → downmix 150, −100
      (3L, wav(Array[Short](100, 200, -300, 100), channels = 2)),
      (4L, wav(Array[Short](10, 20, 30, 250), bits = 8, enc = pcmU)),
      // 16-bit mono whose fmt-chunk format tag is PATCHED to ALAW (6):
      // a header lying about the encoding — decoding those bytes as
      // signed PCM would be silently wrong, so it must fail-capture
      // (either the parser refuses or the PCM_SIGNED gate fires)
      (5L, { val b = wav(Array[Short](100, 200)); b(20) = 6; b })
    ).toDF("id", "wav")
    val out = Multimodal.decodeWavStats(df, "id", "wav")
      .as[(Long, Int, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // |100| + |-200| + |32767| + |-32768| = 65835
    assert(out(1L) === ((1L, 8000, 4L, 65835L, "ok")))
    assert(out(2L) === ((2L, -1, 0L, 0L, "unreadable")))
    // (100+200)>>1 = 150; (−300+100)>>1 = −100 → Σ|·| = 250
    assert(out(3L) === ((3L, 8000, 2L, 250L, "ok")))
    assert(out(4L)._2 === -1 && out(4L)._5.startsWith("unsupported:8b"))
    assert(out(5L)._2 === -1 && out(5L)._5 != "ok")
  }

  test("temperatureMix: smallest group keeps all, big groups thin ~√-prop") {
    val df = ((1L to 4L).map(i => (i, "tail")) ++
      (101L to 500L).map(i => (i, "head"))).toDF("doc_id", "source")
    val kept = graft.ops.Sampling.temperatureMix(df, "source", "doc_id")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("tail") === 4) // min group keeps 100%
    // head buckets = floor(256·√(4/400)) = 25 → expect ≈ 400·25/256 ≈ 39
    assert(bySrc("head") > 15 && bySrc("head") < 70)
    // deterministic under relayout
    val again = graft.ops.Sampling
      .temperatureMix(df.repartition(7), "source", "doc_id")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    assert(kept.toSet === again.toSet)
  }

  test("vocabDrift: integer cross-multiplied ranking, absent terms → 0") {
    val a = Seq((1L, "x x x y z")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y y y")).toDF("doc_id", "text")
    // n_a = 5, n_b = 5; drift: x |3·5−1·5| = 10, y |1·5−4·5| = 15,
    // z |1·5−0·5| = 5
    val out = TextOps.vocabDrift(a, b, "text", topK = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("y", 1L, 4L, 15L), ("x", 3L, 1L, 10L),
      ("z", 1L, 0L, 5L)))
  }

  test("lmScore: common transitions outscore rare ones; short docs zero") {
    // corpus: ten docs "a b", one doc "a z" — left context `a` seen 11
    // times, so P(b|a) = 10/11, P(z|a) = 1/11
    val df = ((1L to 10L).map(i => (i, "a b")) :+ ((11L, "a z")) :+
      ((12L, "solo"))).toDF("doc_id", "text")
    val out = TextOps.lmScore(df, "doc_id", "text", minCount = 2)
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(12L) === ((12L, 0L, 0.0, 0L)))        // no bigrams
    assert(out(1L)._2 === 1L)
    assert(out(1L)._3 === math.rint(10.0 / 11 * 1e6) / 1e6)
    assert(out(11L)._3 === math.rint(1.0 / 11 * 1e6) / 1e6)
    assert(out(1L)._4 === 0L)                        // a->b count 10 >= 2
    assert(out(11L)._4 === 1L)                       // a->z count 1 < 2
  }

  test("lmScore: fold order is position order (deterministic sum)") {
    val df = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    // pairs: (x,y)x2 of c1(x)=2 -> 1.0? c2(x,y)=2, c1(x)=2 -> p=1.0;
    // (y,x): c2=1, c1(y)=2 -> 0.5; (y,z): c2=1, c1(y)=2 -> 0.5
    // sum in pos order: 1.0 + 0.5 + 1.0 + 0.5 = 3.0; avg = 0.75
    val out = TextOps.lmScore(df, "doc_id", "text")
      .as[(Long, Long, Double, Long)].collect().head
    assert(out._2 === 4L && out._3 === 0.75)
  }

  test("heavyHitters: exact top-k under MG eviction, matches plain agg") {
    // skewed corpus with m far below distinct cardinality, so the
    // per-partition summaries actually evict: a=60, b=40, c=25, plus
    // 100 singletons
    val rows = Seq.fill(60)("a") ++ Seq.fill(40)("b") ++ Seq.fill(25)("c") ++
      (0 until 100).map(i => s"u$i")
    val df = rows.toDF("k").repartition(4)
    val got = graft.ops.Skew.heavyHitters(df, "k", k = 3, m = 16,
        checkGuarantee = true)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 60L), ("b", 40L), ("c", 25L)))
    val naive = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"k").limit(3).as[(String, Long)].collect().toSeq
    assert(got === naive)
  }

  test("heavyHitters: guarantee check throws on an uncertifiable ranking") {
    // 50 uniform singletons with a tiny summary: nothing clears n/(m+1)
    val df = (0 until 50).map(i => s"u$i").toDF("k").repartition(4)
    intercept[IllegalArgumentException] {
      graft.ops.Skew.heavyHitters(df, "k", k = 2, m = 4,
        checkGuarantee = true).collect()
    }
  }

  test("heavyHitters: underfull result certified only when keys exhaust") {
    val df = Seq("a", "a", "b", "c").toDF("k")
    val got = graft.ops.Skew.heavyHitters(df, "k", k = 10, m = 16,
        checkGuarantee = true)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L), ("b", 1L), ("c", 1L)))
  }

  test("frameSample: uniform integer strides, short-payload edge") {
    val bytes = Array.tabulate(100)(_.toByte)
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3))).toDF("id", "b")
    val out = Multimodal.frameSample(df, "id", "b", n = 4, frameLen = 10)
      .select($"id", $"frame_idx", $"offset", length($"frame").as("flen"))
      .as[(Long, Long, Long, Int)].collect()
    val byDoc = out.groupBy(_._1)
    // span = 90 → offsets 0, 30, 60, 90; full 10-byte frames
    assert(byDoc(1L).sortBy(_._2).map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 10), (30L, 10), (60L, 10), (90L, 10)))
    // payload shorter than frameLen: four copies of the whole payload
    assert(byDoc(2L).sortBy(_._2).map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 3), (0L, 3), (0L, 3), (0L, 3)))
  }

  test("weightedMix: per-group rates (none / some / all) and determinism") {
    val df = (1L to 300L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt))).toDF("id", "src")
    val out = graft.ops.Sampling.weightedMix(df, "src", "id",
        rates = Map("a" -> 0, "b" -> 128))
      .as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySrc.contains("a"))                       // rate 0 → dropped
    assert(bySrc("c") === 100)                          // default 256 → all
    val b = bySrc("b")
    assert(b > 20 && b < 80, s"~half of b expected, got $b") // rate 128 ≈ 1/2
    // deterministic: identical pick on re-run
    val again = graft.ops.Sampling.weightedMix(df, "src", "id",
        rates = Map("a" -> 0, "b" -> 128)).as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("incrementalExact drops cross-batch and within-batch duplicates") {
    val corpus = Seq((1L, "alpha text", 1L), (2L, "beta text", 2L))
      .toDF("doc_id", "text", "n")
    val batch = Seq(
      (10L, "ALPHA  text", 3L),  // dup of corpus doc 1 (normalized)
      (11L, "gamma", 4L), (12L, "gamma", 5L), // within-batch dup → min id
      (13L, "delta", 6L)).toDF("doc_id", "text", "n")
    val out = graft.ops.Dedup.incrementalExact(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(11L, 13L))
  }

  test("perGroupQuota caps each group deterministically in hash order") {
    val df = (1L to 30L).map(i => (i, if (i <= 25) "big" else "small"))
      .toDF("id", "src")
    val out = graft.ops.Sampling.perGroupQuota(df, "src", "id", 5)
      .as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc("big").length === 5)      // capped
    assert(bySrc("small").length === 5)    // under quota → all kept
    // deterministic: same pick on re-run
    val again = graft.ops.Sampling.perGroupQuota(df, "src", "id", 5)
      .as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("chunk: overlapping windows cover every token; short docs one chunk") {
    val df = Seq((1L, (1 to 10).map("t" + _).mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", chunkSize = 4, stride = 2)
      .as[(Long, Long, String)].collect().toSet
    // n=10, size=4, stride=2 → 1+ceil(6/2)=4 chunks at starts 1,3,5,7
    assert(out === Set(
      (1L, 0L, "t1 t2 t3 t4"), (1L, 1L, "t3 t4 t5 t6"),
      (1L, 2L, "t5 t6 t7 t8"), (1L, 3L, "t7 t8 t9 t10"),
      (2L, 0L, "a b")))
  }

  test("packSequences: cumulative bins, straddling doc stays in earlier bin") {
    val df = Seq(
      (1L, (1 to 6).map("w" + _).mkString(" ")),   // 6 tokens, cum-before 0  → bin 0
      (2L, (1 to 6).map("w" + _).mkString(" ")),   // cum-before 6  → bin 0 (straddles 8)
      (3L, "a b"),                                  // cum-before 12 → bin 1
      (4L, "x")                                     // cum-before 14 → bin 1
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(df, "doc_id", "text", capacity = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(1L -> ((6L, 0L)), 2L -> ((6L, 0L)),
      3L -> ((2L, 1L)), 4L -> ((1L, 1L))))
  }

  test("partitioned packSequences packs within shards and avoids the " +
      "single-task global window") {
    val df = Seq(
      (1L, "s0", "w1 w2 w3 w4 w5 w6"), // s0: cum-before 0 → bin 0
      (2L, "s0", "a b c"),             // s0: cum-before 6 → bin 0 (straddle)
      (3L, "s0", "x"),                 // s0: cum-before 9 → bin 1
      (4L, "s1", "p q r s t u v w x"), // s1: cum-before 0 → bin 0
      (5L, "s1", "k")                  // s1: cum-before 9 → bin 1
    ).toDF("doc_id", "source", "text")
    val out = TextOps.packSequences(df, "doc_id", "text",
      capacity = 8, partitionCol = "source")
    val rows = out.as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows === Map(
      1L -> (("s0", 6L, 0L)), 2L -> (("s0", 3L, 0L)), 3L -> (("s0", 1L, 1L)),
      4L -> (("s1", 9L, 0L)), 5L -> (("s1", 1L, 1L))))
    // the plan must partition the window by the shard column — the whole
    // point of the overload; the global form funnels through ONE task
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"sharded packing still uses a global window:\n$plan")
    assert(plan.contains("hashpartitioning(source"),
      s"expected window partitioned by source:\n$plan")
  }

  test("global packSequences: no global window, no single-partition " +
      "funnel — range-partition + broadcast prefix offsets") {
    val docs = (1L to 100L).map(i => (i, (1L to (i % 7 + 1)).map("w" + _).mkString(" ")))
    val df = docs.toDF("doc_id", "text").repartition(8)
    val out = TextOps.packSequences(df, "doc_id", "text", capacity = 10)
    // correctness vs a driver-computed cumulative packing
    val expected = {
      var cum = 0L
      docs.map { case (id, t) =>
        val n = t.split(" ").length.toLong
        val bin = cum / 10; cum += n; id -> ((n, bin))
      }.toMap
    }
    val got = out.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expected)
    // plan shape: the old Window.orderBy form planned a SinglePartition
    // exchange; the rewrite must plan NEITHER a window nor a one-task
    // funnel, and the result must actually live on many partitions
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global packing uses a window:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global packing funnels through one task:\n$plan")
    assert(out.rdd.getNumPartitions > 1,
      s"global packing collapsed to ${out.rdd.getNumPartitions} partition(s)")
  }

  test("text-ranking plan shapes: per-doc/per-group windows, TakeOrdered " +
      "top-k, no global window anywhere") {
    val df = Seq((1L, "a b", "s0"), (2L, "a c d", "s1"))
      .toDF("doc_id", "text", "source")
    // quantiles: the cumulative window must partition by the group column
    // and nothing in the plan may funnel to a single partition (the corpus
    // reduces to a histogram first — that is the operator's whole point)
    val qp = TextOps.lengthQuantiles(df, "source", "text", Seq(50, 99))
      .queryExecution.executedPlan.toString
    assert(qp.contains("windowspecdefinition(source"),
      s"quantile window not partitioned by group:\n$qp")
    assert(!qp.contains("SinglePartition"),
      s"quantiles funnel through one task:\n$qp")
    // tf-idf: the rank window partitions by the document key
    val tp = TextOps.tfIdfTopTerms(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(tp.contains("windowspecdefinition(doc_id"),
      s"tf-idf rank window not partitioned by doc:\n$tp")
    // bm25: top-k lowers to TakeOrderedAndProject, never a global Sort
    val bp = TextOps.bm25Rank(df, "doc_id", "text", Seq("a"), 5)
      .queryExecution.executedPlan.toString
    assert(bp.contains("TakeOrderedAndProject"),
      s"bm25 top-k did not lower to TakeOrdered:\n$bp")
  }

  test("exactNearDups fail-fast cap: oversized input throws before the cartesian") {
    val df = (0 until 20).map(i => (i.toLong, Array(1.0f, i.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactNearDups(df, "vec_id", "embedding", 0.5, maxRows = 10)
    }
    assert(e.getMessage.contains("maxRows"))
    // under the cap it still computes (id1 < id2, threshold filter)
    val ok = Similarity.exactNearDups(df.limit(3), "vec_id", "embedding",
      -1.0, maxRows = 10).as[(Long, Long, Double)].collect()
    assert(ok.length === 3 && ok.forall { case (a, b, _) => a < b })
  }

  test("tokenBudget: md5-ordered first-fit per group, straddler stays, " +
      "every non-empty group keeps a doc") {
    val df = Seq(
      (1L, "g1", "a b c"), (2L, "g1", "d e f"), (3L, "g1", "g h i"),
      (4L, "g2", "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "source", "text")
    val out = graft.ops.Sampling.tokenBudget(df, "source", "doc_id",
      "text", budget = 5)
    val kept = out.select($"doc_id").as[Long].collect().toSet
    // g1 md5 order: md5(1) < md5(2) < md5(3) (c4ca < c81e < eccb) →
    // doc1 (cum-before 0), doc2 (cum-before 3 < 5), doc3 (cum-before
    // 6 ≥ 5, cut)
    assert(kept === Set(1L, 2L, 4L))
    // g2's single 10-token doc exceeds the budget alone but stays (the
    // first doc of a group always fits the before-< rule at cum 0)
    assert(out.where($"doc_id" === 4).select($"n_tokens").as[Long].head === 10L)
  }

  test("stripBoilerplate: frequent lines drop everywhere, order preserved, " +
      "all-boilerplate doc becomes empty") {
    val df = Seq(
      (1L, "alpha\nSUBSCRIBE\nbeta"),
      (2L, "SUBSCRIBE\ngamma"),
      (3L, "SUBSCRIBE"),
      (4L, "delta")).toDF("doc_id", "text")
    // SUBSCRIBE appears in 3 of 4 docs ≥ 50% → boilerplate; every other
    // line is unique → kept in original order
    val out = TextOps.stripBoilerplate(df, "doc_id", "text", 0.5)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> (("alpha\nbeta", 1L)), 2L -> (("gamma", 1L)),
      3L -> (("", 1L)), 4L -> (("delta", 0L))))
  }

  test("sessionize: gap threshold splits sessions, ties break on id") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val df = Seq(
      (1L, 7L, t(0)), (2L, 7L, t(100)),   // session 0
      (3L, 7L, t(4000)),                  // gap 3900 > 3600 → session 1
      (4L, 7L, t(4100)),
      (5L, 9L, t(50))                      // other user → own session 0
    ).toDF("event_id", "user_id", "ts")
    val out = graft.ops.TimeOps.sessionize(df, "user_id", "ts", 3600, "event_id")
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("asofJoin: latest prior (or equal-time) right row per key") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val clicks = Seq((10L, 7L, t(100)), (11L, 7L, t(300)), (12L, 9L, t(50)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (20L, 7L, t(100), 1.5), // equal ts → matches click 10
      (21L, 7L, t(250), 2.5), // latest before click 11
      (22L, 7L, t(200), 3.5)) // superseded by 21
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.TimeOps.asofJoin(
        clicks, purchases, "user_id", "ts", "event_id", Seq("value"))
      .select($"event_id", $"asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(10L -> Some(1.5), 11L -> Some(2.5), 12L -> None))
  }

  test("intervalJoin: binned band join — boundary bins, inclusive ends, " +
      "no nested loop") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    // interval [95, 205] spans bins 0/1/2 at width 100
    val iv = Seq((1L, 7L, t(95), t(205)), (2L, 9L, t(0), t(10)))
      .toDF("iid", "k", "lo", "hi")
    val pts = Seq((30L, 7L, t(95)), (31L, 7L, t(100)), (32L, 7L, t(205)),
      (33L, 7L, t(206)), (34L, 9L, t(5)), (35L, 8L, t(100)))
      .toDF("pid", "k", "ts")
    val out = graft.ops.TimeOps.intervalJoin(iv, pts, "k", "lo", "hi", "ts",
      binSeconds = 100, payloadCols = Seq("pid"))
    val got = out.select($"iid", $"pt_pid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 30L), (1L, 31L), (1L, 32L), (2L, 34L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"band join planned a nested loop:\n$plan")
  }

  test("asofJoinNearest: closest row either direction, ties prefer earlier") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val clicks = Seq((10L, 7L, t(100)), (11L, 7L, t(220)), (12L, 7L, t(300)),
      (13L, 9L, t(50)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (20L, 7L, t(90), 1.5),  // 10 behind click 10 (next is 110 ahead)
      (21L, 7L, t(210), 2.5), // 10 behind click 11... and 10 AHEAD via 22
      (22L, 7L, t(230), 3.5)) // equidistant from click 11 → earlier wins
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.TimeOps.asofJoinNearest(
        clicks, purchases, "user_id", "ts", "event_id", Seq("value"))
      .select($"event_id", $"near_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // click 12 (t=300): nearest is 22 at 230 (70 back) vs nothing ahead
    assert(out === Map(10L -> Some(1.5), 11L -> Some(2.5),
      12L -> Some(3.5), 13L -> None))
  }

  test("intervalJoin fail-fasts on corrupt intervals instead of exploding") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    // hi far in the future: would explode to ~315k bins at width 100
    val corrupt = Seq((1L, 7L, t(0), t(31536000L)))
      .toDF("iid", "k", "lo", "hi")
    val pts = Seq((30L, 7L, t(5))).toDF("pid", "k", "ts")
    val e = intercept[Exception] {
      graft.ops.TimeOps.intervalJoin(corrupt, pts, "k", "lo", "hi", "ts",
        binSeconds = 100, payloadCols = Seq("pid"),
        maxBinsPerInterval = 1000).count()
    }
    assert(e.getMessage.contains("intervalJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("intervalJoin")))
    // swapped bounds (lo > hi) fail-fast too — sequence() would silently
    // generate a descending bin list otherwise
    val swapped = Seq((1L, 7L, t(205), t(95))).toDF("iid", "k", "lo", "hi")
    intercept[Exception] {
      graft.ops.TimeOps.intervalJoin(swapped, pts, "k", "lo", "hi", "ts",
        binSeconds = 100, payloadCols = Seq("pid")).count()
    }
  }

  test("minhash signatures drop docs with empty or null shingle arrays") {
    val sh = Seq(
      (1L, Seq("a b c")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("doc_id", "_sh")
    val out = Dedup.minhashSignaturesSh(sh, "doc_id", k = 4)
    assert(out.select($"doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("LSH bucket join candidates are a subset of all pairs with dups found") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val df = ((1 to 20).map(i => (i.toLong, s"junk$i " * 30)) :+
      (98L, base) :+ (99L, base)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    val cands = Dedup.lshCandidates(sigs, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((98L, 99L)))
    assert(cands.size < 22 * 21 / 2) // pruning really happened
  }

  private val semVecs = Seq(
    1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0f, 1f),
    11L -> Seq(0.99f, 0.1f, 0f), 12L -> Seq(0.98f, 0.15f, 0f),
    21L -> Seq(0.1f, 0.99f, 0f), 31L -> Seq(0f, 0.1f, 0.995f))

  test("semanticDedup (oracle mode): planted semantic twins drop, " +
      "seeds survive") {
    val df = semVecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
        nClusters = 3, threshold = 0.9, iters = 0)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, cl, k) => id -> ((cl, k)) }.toMap
    assert(out.keySet === semVecs.map(_._1).toSet)
    assert(out.filter(_._2._2).keySet === Set(1L, 2L, 3L))
    // twins land in their seed's cluster
    assert(out(11L)._1 === out(1L)._1 && out(12L)._1 === out(1L)._1)
    assert(out(21L)._1 === out(2L)._1 && out(31L)._1 === out(3L)._1)
  }

  test("semanticDedup (trained): kept/dropped satisfy the drop rule " +
      "exactly, whatever the quantizer did") {
    val df = semVecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
        nClusters = 3, threshold = 0.9, iters = 2)
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._1).toSet === semVecs.map(_._1).toSet)
    val vec = semVecs.toMap.map { case (id, v) => id -> v.map(_.toDouble) }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    for ((id, cl, kept) <- out) {
      val smallerSameCell = out.filter(o => o._2 == cl && o._1 < id)
      val hasDup = smallerSameCell.exists(o => cos(vec(o._1), vec(id)) >= 0.9)
      assert(kept === !hasDup, s"drop rule violated for id $id")
    }
  }

  test("dupGramFraction: exact per-doc duplicated-window share; short " +
      "docs report zero windows, fully-copied docs report 1.0") {
    // n=3 grams; doc 2 copies doc 1 verbatim → every window of both
    // duplicated (frac 1.0); doc 3 shares no gram; doc 4 too short
    val df = Seq(
      (1L, "a b c d"),  // windows: "a b c","b c d"
      (2L, "a b c d"),
      (3L, "x y z w"),
      (4L, "p q")).toDF("doc_id", "text")
    val got = graft.ops.Dedup.dupGramFraction(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 2L, 1.0)))
    assert(got(2L) === ((2L, 2L, 2L, 1.0)))
    assert(got(3L) === ((3L, 2L, 0L, 0.0)))
    assert(got(4L) === ((4L, 0L, 0L, 0.0)))
    // partial overlap: doc 5 embeds doc 3's text plus fresh tokens —
    // 5 windows, the 2 covered by doc 3's grams are duplicated (and
    // doc 3's own windows flip to duplicated)
    val df2 = df.unionAll(Seq((5L, "x y z w k m n")).toDF("doc_id", "text"))
    val got2 = graft.ops.Dedup.dupGramFraction(df2, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got2(5L) === ((5L, 5L, 2L, 0.4)))
    assert(got2(3L) === ((3L, 2L, 2L, 1.0)))
  }

  test("duplicateSpans: cross-doc and within-doc repeats merge to " +
      "maximal spans; unique docs emit nothing") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e z"),
      (3L, "p q r s p q r s"),
      (4L, "u v w")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set(
      (1L, 0L, 4L, 5L),   // shared "a b c d e" run with doc 2
      (2L, 2L, 6L, 5L),
      (3L, 0L, 7L, 8L)))  // self-repeat: adjacent islands merge whole-doc
  }

  test("stripDuplicateSpans: duplicated tokens deleted, clean docs " +
      "round-trip, fully-duplicated docs empty") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e z"),
      (3L, "p q r s p q r s"),
      (4L, "u v w")).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(df, "doc_id", "text", n = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("f g h", 5L)))
    assert(out(2L) === (("x y z", 5L)))
    assert(out(3L) === (("", 8L)))
    assert(out(4L) === (("u v w", 0L)))
  }

  test("contaminatedSpans / stripContamination: only test-overlapping " +
      "spans cut, train-internal duplication untouched") {
    val train = Seq(
      (1L, "a b c d e f g h"),   // "a b c d e" appears in test doc 90
      (2L, "p q r s t u"),       // train-internal dup with doc 3 only
      (3L, "p q r s x y")).toDF("doc_id", "text")
    val test = Seq((90L, "z z a b c d e w")).toDF("doc_id", "text")
    val spans = Dedup.contaminatedSpans(train, test, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1 pos 0-4 overlaps test; docs 2/3 share "p q r s" with EACH
    // OTHER but never with test — decontamination must not touch them
    assert(spans === Set((1L, 0L, 4L, 5L)))
    val out = Dedup.stripContamination(train, test, "doc_id", "text", n = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1L -> (("f g h", 5L)),
      2L -> (("p q r s t u", 0L)),
      3L -> (("p q r s x y", 0L))))
  }

  test("shuffleDeterministic: contiguous permutation, stable across " +
      "partitionings, equal to the single-task rank") {
    val df = (0L until 500L).toDF("doc_id")
    val a = graft.ops.Sampling.shuffleDeterministic(df, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted === (0L until 500L))
    val b = graft.ops.Sampling.shuffleDeterministic(
      df.repartition(7), "doc_id").as[(Long, Long)].collect().toMap
    assert(a === b)
    // the permutation the operator promises: md5 rank order
    val expected = df.select($"doc_id",
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          md5(concat_ws(":", lit("42"), $"doc_id".cast("string"))),
          $"doc_id")) - 1).cast("long").as("pos"))
      .as[(Long, Long)].collect().toMap
    assert(a === expected)
  }

  test("kmvSketch: k smallest distinct hashes, duplicate-proof, " +
      "layout-independent, and mergeable") {
    import graft.ops.Sketches
    // heavy duplication: every value appears 5×
    val df = (0L until 1000L).map(_ % 200).toDF("v")
    val sk = Sketches.kmvSketch(df, $"v", k = 32).as[String].collect()
    val expected = (0L until 200L).map(v => // reference: full sort
        org.apache.commons.codec.digest.DigestUtils.md5Hex(v.toString))
      .distinct.sorted.take(32)
    assert(sk.toSeq === expected)
    // layout independence
    val sk2 = Sketches.kmvSketch(df.repartition(13), $"v", k = 32)
      .as[String].collect()
    assert(sk2.toSeq === expected)
    // merge of per-half sketches == sketch of the union
    val a = Sketches.kmvSketch(df.where($"v" % 2 === 0), $"v", 32)
    val b = Sketches.kmvSketch(df.where($"v" % 2 === 1), $"v", 32)
    val merged = Sketches.kmvMerge(32, a, b).as[String].collect()
    assert(merged.toSeq === expected)
  }

  test("kmvEstimate: exact below k, within 3/sqrt(k) above it") {
    import graft.ops.Sketches
    val small = (0L until 20L).toDF("v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, $"v", k = 64), 64)
      .select($"est").as[Double].head()
    assert(est === 20.0)
    val big = (0L until 5000L).toDF("v")
    val est2 = Sketches.kmvEstimate(
      Sketches.kmvSketch(big, $"v", k = 256), 256)
      .select($"est").as[Double].head()
    assert(math.abs(est2 - 5000.0) / 5000.0 < 3.0 / math.sqrt(256))
  }

  test("stratifiedSplit: exact floor(n*f) sizes, disjoint-complete, " +
      "stable across partitionings") {
    import graft.ops.Sampling
    val df = ((0L until 330L).map(i => (i, "en")) ++
        (330L until 401L).map(i => (i, "zh"))).toDF("doc_id", "lang")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.stratifiedSplit(df, "lang", "doc_id", fr)
    val sizes = out.groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    assert(sizes(("en", "train")) === 264) // floor(330*0.8)
    assert(sizes(("en", "val")) === 33)
    assert(sizes(("en", "test")) === 33)
    assert(sizes(("zh", "train")) === 56) // floor(71*0.8)
    assert(sizes(("zh", "val")) === 7)
    assert(sizes(("zh", "test")) === 71 - 56 - 7) // remainder
    assert(out.count() === 401) // complete, no dup/drop
    val again = Sampling.stratifiedSplit(df.repartition(9), "lang",
        "doc_id", fr)
      .as[(Long, String, String)].collect().toSet
    assert(again === out.as[(Long, String, String)].collect().toSet)
    // non-string stratum columns work (internal string key, original
    // column preserved in the output)
    val intStrata = (0L until 100L).map(i => (i, i % 3)).toDF("id", "g")
    val outInt = Sampling.stratifiedSplit(intStrata, "g", "id",
      Seq("a" -> 0.5, "b" -> 0.5))
    assert(outInt.columns.toSeq === Seq("id", "g", "split"))
    assert(outInt.count() === 100)
  }

  test("stratifiedSplit: NULL strata are a stratum of their own — " +
      "disjoint-complete, exact sizes, no silent row loss") {
    import graft.ops.Sampling
    val df = ((0L until 40L).map(i => (i, Some("en"))) ++
        (40L until 60L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedSplit(df, "lang", "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(out.count() === 60) // the 20 null-stratum rows survive
    val sizes = out.groupBy("lang", "split").count()
      .as[(Option[String], String, Long)].collect()
      .map { case (l, s, n) => (l, s) -> n }.toMap
    assert(sizes((Some("en"), "train")) === 20)
    assert(sizes((None, "train")) === 10) // exact within the null stratum
    assert(sizes((None, "test")) === 10)
    // the split of non-null rows is unchanged by null rows being present
    val withoutNulls = Sampling.stratifiedSplit(
        df.where(col("lang").isNotNull), "lang", "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .as[(Long, String, String)].collect().toSet
    assert(out.where(col("lang").isNotNull)
      .as[(Long, String, String)].collect().toSet === withoutNulls)
  }

  test("stratifiedSplit: past maxStrata the offsets go distributed and " +
      "agree bit-for-bit with the driver-map path") {
    import graft.ops.Sampling
    // 300 strata × 4 rows — comfortably over maxStrata=1, so the
    // distributed-offsets path runs; the driver-map path at the default
    // cap is the reference
    val df = (0L until 1200L).map(i => (i, s"host${i % 300}"))
      .toDF("id", "host")
    val fracs = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val dist = Sampling.stratifiedSplit(df, "host", "id", fracs,
        maxStrata = 1)
      .as[(Long, String, String)].collect().toSet
    val drv = Sampling.stratifiedSplit(df, "host", "id", fracs)
      .as[(Long, String, String)].collect().toSet
    assert(dist === drv)
    // split contract on the distributed path: disjoint-complete, exact
    // ⌊n·f⌋ per stratum (n=4 → 2/1/1)
    assert(dist.size === 1200)
    val perStratum = dist.groupBy(r => (r._2, r._3)).view.mapValues(_.size)
    (0 until 300).foreach { h =>
      assert(perStratum.getOrElse((s"host$h", "train"), 0) === 2)
      assert(perStratum.getOrElse((s"host$h", "val"), 0) === 1)
      assert(perStratum.getOrElse((s"host$h", "test"), 0) === 1)
    }
  }

  test("stratifiedSplit: WIDE mixed-size strata on the distributed path " +
      "keep the full split contract (disjoint-complete, exact floor)") {
    import graft.ops.Sampling
    // 6k strata of sizes 1..5 (url-host-grade width, ScaleBench's
    // stratified_split_wide regime), far past maxStrata=4: every
    // stratum must get exactly ⌊n·f⌋ rows per split + remainder in the
    // last, with no row lost or duplicated
    val rows = for (s <- 0 until 6000; r <- 0 to s % 5)
      yield (s.toLong * 8 + r, s"h$s")
    val df = rows.toDF("id", "host")
    val out = Sampling.stratifiedSplit(df, "host", "id",
        Seq("train" -> 0.6, "test" -> 0.4), maxStrata = 4)
      .as[(Long, String, String)].collect()
    assert(out.length === rows.length)
    assert(out.map(_._1).distinct.length === rows.length)
    val perStratum = out.groupBy(_._2)
    perStratum.foreach { case (h, rs) =>
      val n = rs.length
      val train = rs.count(_._3 == "train")
      assert(train === math.floor(n * 0.6).toInt,
        s"stratum $h n=$n train=$train")
      assert(rs.count(_._3 == "test") === n - train)
    }
  }

  test("stratifiedSplit: high-cardinality strata (one row per stratum) " +
      "run distributed without driver collect") {
    import graft.ops.Sampling
    // every row its own stratum: 20k strata >> maxStrata=4 — the shape
    // that used to fail loudly; now the offsets frame stays distributed
    val df = (0L until 20000L).map(i => (i, s"h$i")).toDF("id", "host")
    val out = Sampling.stratifiedSplit(df, "host", "id",
        Seq("a" -> 0.5, "b" -> 0.5), maxStrata = 4)
      .as[(Long, String, String)].collect()
    assert(out.length === 20000)
    assert(out.map(_._1).distinct.length === 20000)
    // single-row strata: ⌊1·0.5⌋ = 0 rows in 'a', remainder in 'b'
    assert(out.forall(_._3 == "b"))
  }

  test("kmvSketch: NULL values are skipped (no NPE), matching the " +
      "aggregator's null contract") {
    import graft.ops.Sketches
    val df = (Seq[Option[String]](None, None) ++
        (1 to 10).map(i => Some(s"v$i"))).toDF("x")
    val sk = Sketches.kmvSketch(df, col("x"), k = 8)
    assert(sk.count() === 8) // 10 distinct non-null values, k-capped
    // agg form on the same data agrees row-for-row
    val viaAgg = df.select(md5(col("x").cast("string")).as("h"))
      .agg(Sketches.kmvAgg(8, col("h")).as("sk"))
      .select(explode(col("sk")).as("h")).as[String].collect().toSet
    assert(sk.as[String].collect().toSet === viaAgg)
  }

  test("exactNPerGroup: min(n, |group|) rows per group, deterministic " +
      "across partitionings, input columns preserved") {
    import graft.ops.Sampling
    val df = ((0L until 30L).map(i => (i, "big")) ++
        (100L until 103L).map(i => (i, "tiny"))).toDF("id", "g")
    val out = Sampling.exactNPerGroup(df, "id", "g", n = 5)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("big" -> 5L, "tiny" -> 3L)) // tiny group kept whole
    assert(out.columns.toSeq === df.columns.toSeq)
    val again = Sampling.exactNPerGroup(df.repartition(7), "id", "g", 5)
      .as[(Long, String)].collect().toSet
    assert(again === out.as[(Long, String)].collect().toSet)
  }

  test("exactNPerGroup plan: the rank limit pushes BELOW the exchange " +
      "(WindowGroupLimit both sides — partial top-n per partition, " +
      "never a full per-group sort spill)") {
    import graft.ops.Sampling
    val df = (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val plan = Sampling.exactNPerGroup(df, "id", "g", 5)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit, plan:\n$plan")
  }

  test("datasetDiff: added/removed/changed/unchanged per id; NULL vs " +
      "non-NULL reads as changed") {
    import graft.ops.Profile
    val v1 = Seq((1L, Some("a"), "en"), (2L, Some("b"), "en"),
      (3L, Some("c"), "de"), (4L, Option.empty[String], "de"))
      .toDF("id", "text", "lang")
    val v2 = Seq((1L, Some("a"), "en"),   // unchanged
      (2L, Some("B"), "en"),              // changed (text)
      (4L, Some("now"), "de"),            // changed (null -> value)
      (5L, Some("new"), "fr"))            // added; 3 removed
      .toDF("id", "text", "lang")
    val got = Profile.datasetDiff(v1, v2, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("datasetCard merge law: per-shard sketch -> merge -> finalize " +
      "equals the whole-corpus card, empty shards included") {
    import graft.ops.Profile
    val rnd = new scala.util.Random(7L)
    val rows = (0L until 200L).map(i =>
      (i, s"s${rnd.nextInt(40)}", rnd.nextDouble() * 100, i % 5))
    val df = rows.toDF("id", "name", "score", "grp")
    val cols = Seq("id", "name", "score", "grp")
    val whole = Profile.datasetCard(df, cols, k = 16)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val shards = Seq(df.where(col("id") % 2 === 0),
      df.where(col("id") % 2 === 1),
      df.where(lit(false))) // empty shard must be a no-op in the merge
    val shardCards = shards.map(Profile.datasetCardSketch(_, cols, k = 16))
    val merged = Profile.finalizeDatasetCard(
        Profile.mergeDatasetCards(
          shardCards.reduce(_ unionByName _), k = 16), k = 16)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(merged === whole)
    // roll-up of roll-ups: a merged card re-merges to the same answer
    val twice = Profile.finalizeDatasetCard(
        Profile.mergeDatasetCards(
          Profile.mergeDatasetCards(
              shardCards.take(2).reduce(_ unionByName _), k = 16)
            .unionByName(Profile.mergeDatasetCards(shardCards(2), k = 16)),
          k = 16), k = 16)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(twice === whole)
    // mixed-k sketches refuse to merge (silent mis-estimates
    // otherwise); the guard rides the merge aggregation itself, so it
    // surfaces at execution — one pass over the input, not a separate
    // validation scan
    val e = intercept[Exception] {
      Profile.mergeDatasetCards(
        shardCards.head.unionByName(
          Profile.datasetCardSketch(shards(1), cols, k = 8)), k = 16)
        .collect()
    }
    assert(e.getMessage.contains("equal k"))
  }

  test("histogram: equal-width bins, empty bins emitted, overflow " +
      "clamped to the last bin, constant column degenerates to one bin") {
    import graft.ops.Profile
    val df = Seq(0.0, 1.0, 1.5, 3.9, 4.0, 10.0, -1.0).toDF("v")
    // bounds [0, 4], 4 bins of width 1: -1 and 10 out of range; 4.0 is
    // the inclusive upper edge and clamps into bin 3
    val got = Profile.histogram(df, "v", 4, Some(0.0), Some(4.0))
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(got === Seq((0, 0.0, 1.0, 1L), (1, 1.0, 2.0, 2L),
      (2, 2.0, 3.0, 0L), (3, 3.0, 4.0, 2L)))
    // auto bounds: min/max from the data
    val auto = Profile.histogram(Seq(2.0, 6.0).toDF("v"), "v", 2)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(auto === Seq((0, 2.0, 4.0, 1L), (1, 4.0, 6.0, 1L)))
    // constant column: hi == lo → everything in bin 0
    val const = Profile.histogram(Seq(5.0, 5.0).toDF("v"), "v", 3)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(const.map(_._4).toSeq === Seq(2L, 0L, 0L))
  }

  test("dedupLines: first occurrence of each distinct line survives in " +
      "order; single-line and all-dup docs handled") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"), // nav repeats 3x
      (2L, "only line"),                         // nothing to drop
      (3L, "x\nx\nx"))                           // collapses to one line
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.dedupLines(df, "doc_id", "text")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(got(1L) === (("nav\nbody one\nbody two", 2L)))
    // NULL text must pass through (text NULL, 0 dropped), not vanish
    val withNull = Seq((1L, Some("a\na")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val gotNull = graft.ops.TextOps.dedupLines(withNull, "doc_id", "text")
      .as[(Long, Option[String], Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(gotNull(1L) === ((Some("a"), 1L)))
    assert(gotNull(2L) === ((None, 0L)))
    assert(got(2L) === (("only line", 0L)))
    assert(got(3L) === (("x", 2L)))
  }

  test("gapFill: complete per-key grid, zero-count gaps, forward fill") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0)
    val rows = Seq(
      (1L, t0, 10.0), (1L, t0.plusMinutes(30), 30.0),
      (1L, t0.plusHours(3), 5.0), // hours 1-2 are gaps
      (2L, t0.plusHours(1), 7.0))
    val df = rows.toDF("user_id", "ts", "value")
    val out = graft.ops.TimeOps.gapFill(df, "user_id", "ts", "value")
      .select($"user_id", $"ts_bucket", $"n_events", $"filled_max")
      .as[(Long, LocalDateTime, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.size === 5) // user 1: hours 0-3; user 2: hour 1
    assert(out((1L, t0)) === ((2L, 30.0)))
    assert(out((1L, t0.plusHours(1))) === ((0L, 30.0))) // gap, carried
    assert(out((1L, t0.plusHours(2))) === ((0L, 30.0)))
    assert(out((1L, t0.plusHours(3))) === ((1L, 5.0)))
    assert(out((2L, t0.plusHours(1))) === ((1L, 7.0)))
  }

  test("KmvAggregator: groupBy agg equals the mapPartitions sketch, " +
      "duplicate-proof, partial-agg safe") {
    import graft.ops.Sketches
    val df = (0L until 1000L).map(_ % 200).toDF("v").repartition(13)
    val viaAgg = df
      .select(md5($"v".cast("string")).as("h"))
      .agg(Sketches.kmvAgg(32, $"h").as("sk"))
      .select(explode($"sk").as("h")).as[String].collect()
    val viaSketch = Sketches.kmvSketch(df, $"v", 32).as[String].collect()
    assert(viaAgg.toSeq.sorted === viaSketch.toSeq)
    // reduce-path unit check: duplicates never shrink, order maintained
    val a = new Sketches.KmvAggregator(3)
    val s1 = Seq("b", "d").foldLeft(a.zero)(a.reduce)
    assert(a.reduce(s1, "b") === Seq("b", "d"))
    assert(a.reduce(s1, "c") === Seq("b", "c", "d"))
    assert(a.reduce(a.reduce(s1, "c"), "a") === Seq("a", "b", "c"))
    assert(a.reduce(a.reduce(s1, "c"), "z") === Seq("b", "c", "d"))
    assert(a.merge(Seq("a", "c"), Seq("a", "b", "z")) ===
      Seq("a", "b", "c"))
  }

  test("datasetCard: one-pass per-column profile with nulls and " +
      "exact-below-k cardinalities") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)), (2L, Some("b"), None),
      (3L, None, Some(2.5)), (4L, Some("a"), Some(1.5)))
      .toDF("id", "s", "v")
    val out = graft.ops.Profile.datasetCard(df, Seq("id", "s", "v"), k = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L)
    assert(id.getDouble(3) === 4.0) // exact below k
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    val s = out("s")
    assert(s.getLong(2) === 1L) // one null
    assert(s.getDouble(3) === 2.0) // a, b
    assert(s.getString(6) === "a" && s.getString(7) === "b")
    assert(s.isNullAt(4) && s.isNullAt(5))
    val v = out("v")
    assert(v.getLong(2) === 1L && v.getDouble(3) === 2.0)
    assert(v.getDouble(4) === 1.5 && v.getDouble(5) === 2.5)
  }

  test("kmvEstimateCol: per-group estimates equal the one-row form") {
    import graft.ops.Sketches
    val df = (0L until 600L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val perGroup = df
      .select($"g", md5($"v".cast("string")).as("h"))
      .groupBy($"g").agg(Sketches.kmvAgg(32, $"h").as("sk"))
      .select($"g", Sketches.kmvEstimateCol($"sk", 32).as("est"))
      .as[(String, Double)].collect().toMap
    (0 until 3).foreach { g =>
      val single = Sketches.kmvEstimate(
        Sketches.kmvSketch(df.where($"g" === s"g$g"), $"v", 32), 32)
        .select($"est").as[Double].head()
      assert(perGroup(s"g$g") === single, s"group g$g")
    }
  }

  test("exactQuantiles: matches the sorted-collect reference, " +
      "stable across partitionings") {
    import graft.ops.Skew
    val vals = (0L until 997L).map(i => ((i * 7919) % 997).toDouble / 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("value", "id")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val out = Skew.exactQuantiles(df, "value", "id", qs)
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val expect = sorted(math.floor((vals.size - 1) * q).toInt)
      assert(out(q) === expect, s"q=$q")
    }
    val again = Skew.exactQuantiles(df.repartition(11), "value", "id", qs)
      .as[(Double, Double)].collect().toMap
    assert(again === out)
  }

  test("bpePairCounts: vocab-weighted adjacent pairs, hand-checked") {
    val df = Seq((1L, "abab cd"), (2L, "abab"), (3L, "x")).toDF("id", "text")
    // vocab: abab freq 2, cd freq 1; "x" dropped (len<2)
    // abab pairs: a|b ×2, b|a ×1 per occurrence
    val out = graft.ops.TextOps.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a|b" -> 4L, "b|a" -> 2L, "c|d" -> 1L))
  }

  test("bm25QueryBatch: one plan reproduces per-query bm25Query exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bm25batch").toString
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "data join data"),
      (3L, "spark data window"), (4L, "noise terms only here"))
      .toDF("doc_id", "text")
    graft.ops.TextOps.buildTextIndex(docs, "doc_id", "text",
      "bm25batch_t", dir + "/idx")
    val qs = Seq(10L -> Seq("spark", "window"), 20L -> Seq("data", "join"))
    val batch = graft.ops.TextOps.bm25QueryBatch(
      spark, "bm25batch_t", "doc_id", qs, k = 3)
      .select($"query_id", $"doc_id", $"n_matched", $"score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val singles = qs.flatMap { case (qid, terms) =>
      graft.ops.TextOps.bm25Query(spark, "bm25batch_t", "doc_id", terms, 3)
        .as[(Long, Long, Double)].collect()
        .map { case (d, nm, s) => (qid, d, nm, s) }
    }.toSet
    assert(batch === singles)
  }

  test("hybridTopKBatch: one fused plan reproduces per-query hybridTopK") {
    val docs = Seq((1L, "spark window merge"), (2L, "data join data"),
      (3L, "spark data"), (4L, "noise only")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((10L, Seq("spark", "window"), 1L),
      (20L, Seq("data", "join"), 2L))
    val batch = graft.ops.Similarity.hybridTopKBatch(
      docs, "doc_id", "text", emb, "vec_id", "embedding", qs, k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val singles = qs.flatMap { case (qid, terms, qvec) =>
      graft.ops.Similarity.hybridTopK(docs, "doc_id", "text", terms,
        emb, "vec_id", "embedding", qvec, k = 3)
        .as[(Long, Long, Long, Double)].collect()
        .map { case (d, lr, vr, r) => (qid, d, lr, vr, r) }
    }.toSet
    assert(batch === singles)
  }

  test("weightedSample: exact md5-coin membership, full keep at max") {
    import org.apache.commons.codec.digest.DigestUtils
    val rows = (0L until 500L).map(i => (i, 1L + i % 100))
    val df = rows.toDF("id", "w")
    val kept = graft.ops.Sampling.weightedSample(df, "id", "w", 100)
      .select($"id").as[Long].collect().toSet
    val expect = rows.filter { case (i, w) =>
      val hn = java.lang.Long.parseLong(
        DigestUtils.md5Hex(s"42:$i").take(13), 16)
      BigInt(hn) * 100 < BigInt(w) * BigInt(4503599627370496L)
    }.map(_._1).toSet
    assert(kept === expect)
    // weight == maxWeight keeps everything
    val all = graft.ops.Sampling.weightedSample(
      df.withColumn("w", lit(100L)), "id", "w", 100)
    assert(all.count() === 500)
  }

  test("madOutliers: exact median/MAD, only the planted outlier flags") {
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("value", "id")
    // median = 5 (rank 4), devs sorted 0,1,1,2,2,3,3,4,4,95 → MAD = 2
    val out = graft.ops.Skew.madOutliers(df, "value", "id")
      .select($"value", $"is_outlier").as[(Double, Boolean)]
      .collect().toMap
    assert(out(100.0) === true)
    assert((1 to 9).forall(v => !out(v.toDouble)))
  }

  test("conversionFunnel: first-match chain, strict order, window cut") {
    import java.time.LocalDateTime
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0)
    val rows = Seq(
      // user 1: A at 0h, B at 1h, C at 2h → converted (within 3h)
      (1L, t0, "A"), (1L, t0.plusHours(1), "B"), (1L, t0.plusHours(2), "C"),
      // user 2: B BEFORE A — chain must use the B after A (none) → not
      (2L, t0.plusHours(1), "B"), (2L, t0.plusHours(2), "A"),
      // user 3: complete but C lands outside the window
      (3L, t0, "A"), (3L, t0.plusMinutes(30), "B"), (3L, t0.plusHours(9), "C"),
      // user 4: first-match — earliest B after A picked, not the later one
      (4L, t0, "A"), (4L, t0.plusHours(1), "B"), (4L, t0.plusHours(5), "B"),
      (4L, t0.plusHours(2), "C"))
    val df = rows.toDF("user_id", "ts", "event_type")
    val out = graft.ops.TimeOps.conversionFunnel(
      df, "user_id", "ts", "event_type", Seq("A", "B", "C"),
      withinSeconds = 3 * 3600L)
      .select($"user_id", $"converted").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    // user 4's chain: B at +1h (not +5h), C at +2h → within window
    val t4 = graft.ops.TimeOps.conversionFunnel(
      df.where($"user_id" === 4), "user_id", "ts", "event_type",
      Seq("A", "B", "C"), 3 * 3600L)
      .select($"t_2", $"t_3").as[(LocalDateTime, LocalDateTime)].head()
    assert(t4 === ((t0.plusHours(1), t0.plusHours(2))))
  }

  test("containmentJoin: finds Jaccard-invisible subset duplicates") {
    val full = (1 to 40).map(i => s"tok$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"tok$i").mkString(" ") // J ≈ 0.16
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, full), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val sh = df.select($"doc_id",
      sort_array(graft.ops.Dedup.shingles($"text")).as("sh"))
    val pairs = graft.ops.Dedup.containmentJoin(sh, "doc_id", "sh", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs === Set((1L, 2L, 1.0))) // excerpt fully contained
    // sanity: the same pair is invisible to Jaccard at any real threshold
    val j = graft.ops.Dedup.ppJoin(sh, "doc_id", "sh", 0.5)
    assert(j.count() === 0)
  }

  test("leakageAudit: counts cross-split dup pairs, diagonal = waste") {
    val df = Seq(
      (1L, "same text", "train"), (2L, "same  text", "test"), // leak (norm)
      (3L, "same text", "train"), // intra-train dup with 1 → diagonal
      (4L, "unique a", "train"), (5L, "unique b", "test"))
      .toDF("doc_id", "text", "split")
    val out = graft.ops.Dedup.leakageAudit(df, "doc_id", "text", "split")
      .as[(String, String, Long)].collect().toSet
    // pairs among {1,2,3}: (1,2) train/test, (1,3) train/train,
    // (2,3) test/train
    assert(out === Set(("test", "train", 2L), ("train", "train", 1L)))
  }

  test("bpeLearn: greedy left-to-right merges cascade across rounds") {
    // corpus: "aaab" ×2, "ab" ×1 → round 1: a|a wins (2 per aaab ×2 = 4
    // occurrences BUT greedy non-overlap inside one word counts pairs
    // positionally: aaab has a|a at (1,2),(2,3) → weighted 2·2 = 4);
    // merge a|a → aaab = [aa, a, b], ab unchanged.
    // round 2 pairs: aa|a ×2, a|b ×3 (2 from aaab? no — aaab is now
    // [aa,a,b] → pairs aa|a, a|b per word ×2 → a|b: 2 + 1 (from ab) = 3
    // → a|b wins. round 3: aa|ab ×2 wins.
    val df = Seq((1L, "aaab aaab ab")).toDF("id", "text")
    val out = graft.ops.TextOps.bpeLearn(df, "text", nMerges = 3)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    // vocab is DISTINCT words × corpus frequency: aaab freq 2, ab freq 1
    assert(out === Seq((1, "a|a", 4L), (2, "a|b", 3L), (3, "aa|ab", 2L)))
  }

  test("bpeLearnRounds: greedy non-interacting batches; batchK=1 round " +
      "equals sequential; accepted pairs symbol-disjoint per round") {
    // corpus with clearly separable top pairs: "ab" and "cd" share no
    // symbol → round 1 at batchK=2 accepts BOTH; "bc" (rank below)
    // conflicts with both and is deferred to round 2 — after ab/cd
    // merged, b|c occurrences are gone, so round 2 learns ab|cd
    val df = Seq((1L, "abcd abcd ab cd")).toDF("id", "text")
    val out = graft.ops.TextOps.bpeLearnRounds(df, "text",
        rounds = 2, batchK = 2)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    // round 1 pairs (vocab: abcd ×2, ab ×1, cd ×1): a|b 3, b|c 2,
    // c|d 3 → rank a|b(3), c|d(3), b|c(2); greedy takes a|b then c|d
    // (disjoint), b|c blocked. round 2 vocab: [ab,cd]×2, [ab], [cd] →
    // ab|cd ×2 wins; second-rank pair conflicts (none left ≥1 symbol
    // free) — accepts what exists
    assert(out.take(3).map(x => (x._1, x._2)) ===
      Seq((1, "a|b"), (2, "c|d"), (3, "ab|cd")))
    assert(out.head._3 === 3L && out(1)._3 === 3L && out(2)._3 === 2L)
    // per-round disjointness: rounds=1 batch shares no symbol
    val r1 = out.takeWhile(_._1 <= 2).map(_._2.split("\\|", 2))
    val syms = r1.flatten
    assert(syms.distinct.size === syms.size)
    // batchK=1 reduces to the sequential learner
    val a = graft.ops.TextOps.bpeLearnRounds(df, "text",
      rounds = 3, batchK = 1).as[(Int, String, Long)].collect().toSeq
    val b = graft.ops.TextOps.bpeLearn(df, "text", nMerges = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(a.sortBy(_._1) === b.sortBy(_._1))
    // pipe-containing words never enter the learning vocab
    val piped = Seq((1L, "x|y x|y zz zz")).toDF("id", "text")
    val m = graft.ops.TextOps.bpeLearn(piped, "text", nMerges = 1)
      .as[(Int, String, Long)].collect().toSeq
    assert(m === Seq((1, "z|z", 2L)))
  }

  test("bpeLearnRounds: a DEEP run (64+ rounds, 1000+ merges) stays " +
      "linear per round — lineage truncation bounds the replace chain") {
    // production-shaped round count, far past the 12-round checkpoint
    // interval: 4000 deterministic 16-char words over a 62-symbol
    // alphabet give ~3.8k distinct starting pairs, so 64 rounds ×
    // batchK=16 can accept 1000+ symbol-disjoint merges. Without the
    // periodic localCheckpoint the final rounds would carry 1000+
    // nested replace calls (quadratic re-analysis, codegen blowup);
    // with it no plan ever exceeds ~12·16 nested replaces.
    val alpha = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(4000)(
      (1 to 16).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val t0 = System.nanoTime()
    val out = graft.ops.TextOps.bpeLearnRounds(df, "text",
        rounds = 64, batchK = 16)
      .as[(Int, String, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"64 rounds, ${out.length} merges in $secs%.1f s")
    assert(out.length >= 1000, s"expected 1000+ merges, got ${out.length}")
    // contract sanity at depth: iters contiguous from 1, pairs distinct
    assert(out.map(_._1).sorted.toSeq === (1 to out.length))
    assert(out.map(_._2).distinct.length === out.length)
  }

  test("bpeEncode: learned merges drive per-doc token counts; unseen " +
      "words encode through the same merges; 1-char words = 1 token") {
    // merges learned on ["ab ab", "abc"]: a|b then ab|c (hand-derived:
    // round 1 pairs a|b ×3 wins; round 2 ab|c ×1 wins)
    val learn = Seq((1L, "ab ab"), (2L, "abc")).toDF("id", "text")
    val merges = graft.ops.TextOps.bpeLearn(learn, "text", nMerges = 2)
      .orderBy("iter").select("pair").as[String].collect().toSeq
    assert(merges === Seq("a|b", "ab|c"))
    // encode a corpus containing words the learn corpus never saw:
    //   "ab"   → [ab]            = 1 token
    //   "abc"  → [abc]           = 1 token
    //   "xaby" → [x, ab, y]      = 3 tokens (merge applies mid-word)
    //   "z"    → 1-char word     = 1 token (never entered the vocab)
    //   "ba"   → [b, a]          = 2 tokens (no merge matches)
    val corpus = Seq((1L, "ab ab"), (2L, "abc z"), (3L, "xaby ba"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.bpeEncode(corpus, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 5L))
  }
}
