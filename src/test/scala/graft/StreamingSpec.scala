package graft

import graft.sources.RowIngest
import graft.streaming.{StreamingAssert, StreamingFunnel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")

  test("streaming assert: flatten + incremental card-one resolution") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val rows = input.toDF().toDF("id", "status", "ts")
    val spec = RowIngest.specFor(rows, "ord", Seq("id"))
    val triples = StreamingAssert.streamTriplesWithTime(rows, spec, "ts")
    val resolved = StreamingAssert.resolveCardOne(
      triples.where(col("a") === "ord:status"))
    val q = resolved.writeStream.format("memory").queryName("res")
      .outputMode("append").start()
    try {
      input.addData((1L, "OPEN", ts(1)))
      q.processAllAvailable()
      input.addData((1L, "SHIPPED", ts(10)), (2L, "OPEN", ts(11)))
      q.processAllAvailable()
      // re-assert identical fact → no new emission (idempotent)
      input.addData((1L, "SHIPPED", ts(20)))
      q.processAllAvailable()
      // by event time: e1 OPEN@1, e1 SHIPPED@10, e2 OPEN@11; the
      // re-asserted identical SHIPPED@20 emitted nothing
      val out = spark.sql("SELECT value FROM res ORDER BY atMicros, value")
        .as[String].collect().toList
      assert(out === List("OPEN", "SHIPPED", "OPEN"))
    } finally q.stop()
  }

  test("card-one resolution with a state TTL: an idle (e, a) pair " +
      "evicts past the horizon — a later re-assert of the SAME value " +
      "re-emits (proving the state is gone)") {
    implicit val sql = spark.sqlContext
    def tsl(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val rows = input.toDF().toDF("id", "status", "ts")
    val spec = RowIngest.specFor(rows, "ord", Seq("id"))
    val triples = StreamingAssert.streamTriplesWithTime(rows, spec, "ts")
    val resolved = StreamingAssert.resolveCardOne(
      triples.where(col("a") === "ord:status"),
      watermarkDelay = "5 seconds", stateTtlSeconds = Some(30L))
    val q = resolved.writeStream.format("memory").queryName("resttl")
      .outputMode("append").start()
    try {
      input.addData((1L, "OPEN", tsl(1)))      // emits OPEN
      q.processAllAvailable()
      input.addData((99L, "X", tsl(10000)))    // watermark far past horizon
      q.processAllAvailable()
      input.addData((98L, "X", tsl(10001)))    // timeout fires → evict e1
      q.processAllAvailable()
      // WITHOUT eviction this identical re-assert is suppressed (the
      // first test's idempotency contract); WITH the TTL the state is
      // gone, so it must emit again
      input.addData((1L, "OPEN", tsl(10002)))
      q.processAllAvailable()
      val opens = spark.sql(
          "SELECT count(*) FROM resttl WHERE value = 'OPEN'")
        .as[Long].head()
      assert(opens === 2L, "evicted pair did not re-emit on re-assert")
    } finally q.stop()
  }

  test("streaming first-seen dedup drops repeats within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val dd = graft.streaming.StreamingDedup.firstSeen(
      docs, "text", "ts", watermarkDelay = "30 seconds")
    val q = dd.writeStream.format("memory").queryName("fsd")
      .outputMode("append").start()
    try {
      input.addData((1L, "a b", ts(1)), (3L, "other", ts(3)))
      q.processAllAvailable()
      // "A  b" ≡ "a b" under normalization and arrives within the
      // watermark → dropped against batch-1 state; "fresh" passes
      input.addData((2L, "A  b", ts(5)), (4L, "fresh", ts(6)))
      q.processAllAvailable()
      val out = spark.sql("SELECT id FROM fsd ORDER BY id")
        .as[Long].collect().toList
      assert(out === List(1L, 3L, 4L))
    } finally q.stop()
  }

  test("first-seen dedup state survives a checkpoint restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val data = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    def write(rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(data)
    // file sink: the one that actually supports checkpoint recovery
    // (the memory sink is test-only and refuses to resume)
    def start() = {
      val stream = spark.readStream
        .schema("id BIGINT, text STRING, ts TIMESTAMP")
        .parquet(data)
      graft.streaming.StreamingDedup
        .firstSeen(stream, "text", "ts", watermarkDelay = "1 hour")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def ids() = spark.read.parquet(out).select($"id")
      .as[Long].collect().toList.sorted
    // run 1: establish dedup state, then STOP
    write(Seq((1L, "a b", ts(1)), (2L, "other", ts(2))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(ids() === List(1L, 2L))
    // run 2: restart from the SAME checkpoint; the duplicate of run 1's
    // "a b" must be dropped by RECOVERED state, the fresh doc passes
    write(Seq((3L, "A  b", ts(10)), (4L, "fresh", ts(11))))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(ids() === List(1L, 2L, 4L))
  }

  test("first-seen dedup restart survival holds on the RocksDB state " +
      "store (the provider the bench harness pins)") {
    val pkey = "spark.sql.streaming.stateStore.providerClass"
    val oldP = spark.conf.getOption(pkey)
    spark.conf.set(pkey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_rocks").toString
      val data = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
      def write(rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
        rows.toDF("id", "text", "ts").coalesce(1)
          .write.mode("append").parquet(data)
      def start() = {
        val stream = spark.readStream
          .schema("id BIGINT, text STRING, ts TIMESTAMP")
          .parquet(data)
        graft.streaming.StreamingDedup
          .firstSeen(stream, "text", "ts", watermarkDelay = "1 hour")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
      }
      def ids() = spark.read.parquet(out).select($"id")
        .as[Long].collect().toList.sorted
      write(Seq((1L, "a b", ts(1)), (2L, "other", ts(2))))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(ids() === List(1L, 2L))
      // restart from the same checkpoint: RocksDB snapshots + changelog
      // must reload the dedup state, not just an in-heap map
      write(Seq((3L, "A  b", ts(10)), (4L, "fresh", ts(11))))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      assert(ids() === List(1L, 2L, 4L))
    } finally oldP match {
      case Some(p) => spark.conf.set(pkey, p)
      case None => spark.conf.unset(pkey)
    }
  }

  test("session_window state survives a checkpoint restart and merges " +
      "across runs") {
    val base = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val data = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    def write(rows: Seq[(Long, Long, java.sql.Timestamp)]): Unit =
      rows.toDF("event_id", "user_id", "ts").coalesce(1)
        .write.mode("append").parquet(data)
    def start() = {
      val stream = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .parquet(data)
      StreamingAssert.sessionWindowCounts(stream,
          gap = "10 seconds", watermarkDelay = "5 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def sessions() = spark.read.parquet(out)
      .select($"user_id", $"n").as[(Long, Long)].collect().toList.sorted
    // run 1: two events 5s apart (one open session for user 1), stop
    write(Seq((1L, 1L, ts(0)), (2L, 1L, ts(5))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2 from the SAME checkpoint: an event at +8s must MERGE into the
    // recovered session (gap 3s < 10s); a far-future event closes it
    write(Seq((3L, 1L, ts(8))))
    write(Seq((4L, 9L, ts(1000))))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // user 1's single 3-event session emitted once; user 9's still open
    assert(sessions() === List((1L, 3L)))
  }

  test("streaming near-dup first-seen: exact and hamming<=3 dups dropped, " +
      "far docs pass, band state expires past the watermark") {
    implicit val sql = spark.sqlContext
    def tsl(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    def mkText(p: String) = (1 to 100).map(j => s"$p$j").mkString(" ")
    val a = mkText("a")
    // find a one-token variant with hamming in [1, 3] from the COMPUTED
    // simhashes (one token of 100 changed flips ~2-3 of 64 bits; the test
    // adapts to the actual hashes instead of hardcoding an assumption)
    val variants = (1 to 30).map(j =>
      a.split(" ").updated(j, s"chg$j").mkString(" "))
    val sims = graft.ops.Dedup.simhash(
      (a +: variants).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val near = variants.zipWithIndex.collectFirst {
      case (t, i) if {
        val h = java.lang.Long.bitCount(sims(0L) ^ sims(i + 1L))
        h >= 1 && h <= 3
      } => t
    }
    assert(near.isDefined, "no 1..3-hamming one-token variant found")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val verdicts = graft.streaming.StreamingDedup.firstSeenNearVerdicts(
      docs, "id", "text", "ts", watermarkDelaySeconds = 30)
    val outDir = java.nio.file.Files.createTempDirectory("graft_fsn").toString
    val q = verdicts.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.StreamingDedup.combineNearVerdicts(b, "id", "ts")
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append").start()
    try {
      // batch 1: two far docs + an exact within-batch dup (id 3 of id 1)
      input.addData((1L, a, tsl(1)), (2L, mkText("b"), tsl(2)),
        (3L, a, tsl(3)))
      q.processAllAvailable()
      // batch 2: the hamming<=3 near-dup of id 1 (dropped) + a far doc
      input.addData((4L, near.get, tsl(5)), (5L, mkText("c"), tsl(6)))
      q.processAllAvailable()
      // sentinel: watermark → 60, which EXPIRES the band state of
      // batches 1-2 (bucket timeout = last arrival + 30s < 60)
      input.addData((90L, mkText("s"), tsl(90)))
      q.processAllAvailable()
      // post-expiry re-arrival of id 1's exact text must RE-emit —
      // bounded-state semantics, not once-per-stream-lifetime
      input.addData((6L, a, tsl(95)))
      q.processAllAvailable()
      val got = spark.read.parquet(outDir).select($"id")
        .as[Long].collect().toList.sorted
      assert(got === List(1L, 2L, 5L, 6L, 90L))
    } finally q.stop()
  }

  test("streaming near-dup: a HOT band bucket still expires individual " +
      "fingerprints — a doc arriving horizons after its near-dup re-emits " +
      "even when unrelated traffic keeps the bucket alive") {
    implicit val sql = spark.sqlContext
    def tsl(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    def mkText(p: String) = (1 to 100).map(j => s"$p$j").mkString(" ")
    val a = mkText("a")
    def bandsOf(h: Long) = (0 until 4).map(b => (h >>> (b * 16)) & 0xffffL)
    // find variants that SHARE ≥1 of a's 4 SimHash bands but sit at
    // hamming ≥ 4 (so they are NOT near-dups at maxHamming=3): their
    // arrivals keep a's bucket ALIVE without legitimately suppressing
    // anything — the exact hot-bucket scenario. Searched from computed
    // hashes, not assumed.
    val cands = (1 to 80).map { j =>
      a.split(" ").patch(j % 60, Seq(s"q${j}x", s"q${j}y", s"q${j}z"), 3)
        .mkString(" ") }
    val sims = graft.ops.Dedup.simhash(
      (a +: cands).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val aBands = bandsOf(sims(0L)).toSet
    var traffic = List.empty[String]
    for ((t, i) <- cands.zipWithIndex
         if traffic.size < 4) {
      val h = sims(i + 1L)
      val far = java.lang.Long.bitCount(sims(0L) ^ h) >= 4 &&
        traffic.forall { u =>
          java.lang.Long.bitCount(sims(cands.indexOf(u) + 1L) ^ h) >= 4 }
      if (far && bandsOf(h).exists(aBands.contains)) traffic :+= t
    }
    assert(traffic.size == 4, s"found only ${traffic.size} hot-bucket docs")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val verdicts = graft.streaming.StreamingDedup.firstSeenNearVerdicts(
      docs, "id", "text", "ts", watermarkDelaySeconds = 30)
    val outDir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val q = verdicts.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.StreamingDedup.combineNearVerdicts(b, "id", "ts")
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append").start()
    try {
      // t=1: the original; t=5: a copy INSIDE the horizon — suppressed
      input.addData((1L, a, tsl(1)), (2L, a, tsl(5)))
      q.processAllAvailable()
      // sustained far-but-bucket-sharing traffic keeps a's bucket alive
      // across several watermark horizons (delay = 30s)
      for ((t, i) <- traffic.zipWithIndex) {
        input.addData((10L + i, t, tsl(20 + i * 25)))
        q.processAllAvailable()
      }
      // t=120: watermark is now ~65 (95-30), many horizons past t=1 —
      // the fingerprint stored at t=1 must have EXPIRED even though its
      // bucket never did: the copy re-emits (bounded-memory semantics)
      input.addData((99L, a, tsl(120)))
      q.processAllAvailable()
      val got = spark.read.parquet(outDir).select($"id")
        .as[Long].collect().toList.sorted
      assert(got === List(1L, 10L, 11L, 12L, 13L, 99L),
        s"got $got — 99 missing means the hot bucket never pruned entries")
    } finally q.stop()
  }

  test("ingest loop replay: re-running a microbatch reproduces its match " +
      "output bit-for-bit and appends nothing to the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rpl").toString
    def text(i: Long) = (1 to 12).map(j => s"c${i}w$j").mkString(" ")
    val corpus = (1L to 20L).map(i => (i, text(i))).toDF("doc_id", "text")
    graft.ops.Dedup.buildLshIndex(corpus, "doc_id", "text",
      "rpl_idx", s"$dir/idx", buckets = 16)
    // 101 near-dups corpus doc 5; 103 is an intra-batch exact copy of
    // 102 (dropped by the smaller-id rule BEFORE the index join); 104
    // is fresh — so survivors {102, 104} get appended
    val batch = Seq(
      (101L, text(5) + " extra"),
      (102L, (1 to 12).map(j => s"n$j").mkString(" ")),
      (103L, (1 to 12).map(j => s"n$j").mkString(" ")),
      (104L, (1 to 12).map(j => s"q$j").mkString(" "))
    ).toDF("doc_id", "text")
    val out = s"$dir/matches"
    def run(): Unit = graft.streaming.StreamingDedup.ingestBatch(
      batch, 7L, "doc_id", "text", "rpl_idx",
      onMatches = graft.streaming.StreamingDedup.parquetMatchSink(out))
    run()
    def matches() = spark.read.parquet(s"$out/batch_*")
      .as[(Long, Long, Double)].collect().toSet
    val m1 = matches()
    assert(m1.map(t => (t._1, t._2)) === Set((101L, 5L)))
    val bandRows = spark.table("rpl_idx").count()
    val shRows = spark.table("rpl_idx_sh").count()
    assert(spark.table("rpl_idx_sh").where($"corpus_id".isin(102L, 104L))
      .select($"corpus_id").distinct().count() === 2,
      "survivors were not appended")
    // REPLAY the same batch under the same batchId — the crashed-
    // foreachBatch scenario: the self-match filter restores the original
    // match set, the batchId-keyed sink overwrites instead of appending,
    // and the indexed-id skip makes the index append a no-op
    run()
    assert(matches() === m1, "replay changed the match output")
    assert(spark.table("rpl_idx").count() === bandRows,
      "replay double-appended band rows")
    assert(spark.table("rpl_idx_sh").count() === shRows,
      "replay double-appended shingle rows")
  }

  test("ingest loop survives a checkpoint restart and dedups against " +
      "docs appended before the stop") {
    val base = java.nio.file.Files.createTempDirectory("graft_ing").toString
    val data = s"$base/in"; val ckpt = s"$base/ckpt"
    val mdir = s"$base/matches"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    def text(p: String) = (1 to 12).map(j => s"$p$j").mkString(" ")
    val corpus = (1L to 10L).map(i => (i, text(s"c${i}w")))
      .toDF("doc_id", "text")
    graft.ops.Dedup.buildLshIndex(corpus, "doc_id", "text",
      "ing_idx", s"$base/idx", buckets = 16)
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(data)
    def start() = graft.streaming.StreamingDedup.nearDedupIngest(
        spark.readStream.schema("doc_id BIGINT, text STRING").parquet(data),
        "doc_id", "text", "ing_idx",
        onMatches = graft.streaming.StreamingDedup.parquetMatchSink(mdir))
      .option("checkpointLocation", ckpt).start()
    // run 1: a fresh doc — no matches, appended to the index
    write(Seq((201L, text("x"))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2 from the SAME checkpoint: a near-copy of 201 must match the
    // doc APPENDED BEFORE THE STOP — the index IS the recovered state
    write(Seq((301L, text("x") + " extra")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$mdir/batch_*")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(got === Set((301L, 201L)))
  }

  test("semantic ingest loop replay: re-running a microbatch reproduces " +
      "its match output and appends nothing to the IVF index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_srpl").toString
    // 4 axis prototypes (minid seeds) — one cell per axis
    val corpus = Seq(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f), 4L -> Seq(0f, 0f, 0f, 1f)
    ).toDF("vec_id", "embedding")
    graft.ops.Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      "srpl_idx", s"$dir/idx", nCells = 4, iters = 0,
      centroidInit = "minid", buckets = 8)
    val batch = Seq(
      101L -> Seq(0.995f, 0.05f, 0f, 0f), // twin of corpus 1 → match
      102L -> Seq(0.6f, 0.8f, 0f, 0f),    // cell 1, fresh → appended
      103L -> Seq(0.59f, 0.805f, 0f, 0f), // twin of 102 → intra drop
      104L -> Seq(0f, 0.5f, 0.85f, 0f)    // cell 2 at cos .86 → fresh
    ).toDF("vec_id", "embedding")
    val out = s"$dir/matches"
    def run(): Unit = graft.streaming.StreamingDedup.semanticIngestBatch(
      batch, 3L, "vec_id", "embedding", "srpl_idx", threshold = 0.9,
      buckets = 8,
      onMatches = graft.streaming.StreamingDedup.parquetMatchSink(out))
    run()
    def matches() = spark.read.parquet(s"$out/batch_*")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val m1 = matches()
    assert(m1 === Set((101L, 1L)))
    val idxRows = spark.table("srpl_idx").count()
    assert(idxRows === 6, "survivors 102 and 104 were not appended")
    // REPLAY under the same batchId: the self-match filter restores the
    // original match set (102/104 now match THEMSELVES at cosine 1),
    // the sink overwrites, and the indexed-id probe skips the append
    run()
    assert(matches() === m1, "replay changed the match output")
    assert(spark.table("srpl_idx").count() === idxRows,
      "replay double-appended index rows")
  }

  test("semantic ingest loop survives a checkpoint restart and dedups " +
      "against vectors appended before the stop") {
    val base = java.nio.file.Files.createTempDirectory("graft_sing").toString
    val data = s"$base/in"; val ckpt = s"$base/ckpt"
    val mdir = s"$base/matches"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    val corpus = Seq(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f), 4L -> Seq(0f, 0f, 0f, 1f)
    ).toDF("vec_id", "embedding")
    graft.ops.Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      "sing_idx", s"$base/idx", nCells = 4, iters = 0,
      centroidInit = "minid", buckets = 8)
    def write(rows: Seq[(Long, Seq[Float])]): Unit =
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(data)
    def start() = graft.streaming.StreamingDedup.semanticDedupIngest(
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
          .parquet(data),
        "vec_id", "embedding", "sing_idx", threshold = 0.9, buckets = 8,
        onMatches = graft.streaming.StreamingDedup.parquetMatchSink(mdir))
      .option("checkpointLocation", ckpt).start()
    // run 1: a fresh vector — no matches, appended to the index
    write(Seq(201L -> Seq(0.6f, 0.8f, 0f, 0f)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2 from the SAME checkpoint: a near-copy of 201 must match the
    // vector APPENDED BEFORE THE STOP — the index IS the recovered state
    write(Seq(301L -> Seq(0.59f, 0.805f, 0f, 0f)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$mdir/batch_*")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(got === Set((301L, 201L)))
  }

  test("streaming windowed aggregation over events") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingAssert.windowedEventCounts(events,
      window = "10 seconds", watermarkDelay = "5 seconds")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
        (ts(11), "view", 5.0))
      q.processAllAvailable()
      val out = spark.sql(
        "SELECT event_type, n, sum_value FROM winagg ORDER BY event_type")
        .as[(String, Long, Double)].collect().toList
      assert(out === List(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming funnel: chain state carries ACROSS microbatches, " +
      "strict order and window enforced") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val rows = input.toDF().toDF("user_id", "ts", "event_type")
    val prog = StreamingFunnel.funnelProgress(
      rows, "user_id", "ts", "event_type", Seq("A", "B"),
      withinSeconds = 30L)
    val q = prog.writeStream.format("memory").queryName("fnl")
      .outputMode("update").start()
    try {
      // batch 1: user 1 matches A; user 2 sees B first (no chain)
      input.addData((1L, ts(1), "A"), (2L, ts(2), "B"))
      q.processAllAvailable()
      // batch 2: user 1's B arrives → chain completes across batches;
      // user 2's A starts a chain whose B (batch 1) is already gone
      input.addData((1L, ts(5), "B"), (2L, ts(6), "A"))
      q.processAllAvailable()
      // update-mode sink holds one snapshot per batch; the most
      // advanced snapshot is the final state (progress only grows)
      val last = spark.sql(
          "SELECT user_id, t_2 IS NOT NULL, converted FROM fnl")
        .as[(Long, Boolean, Boolean)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.maxBy(r => (r._2, r._3)) }
      assert(last(1L) === ((1L, true, true)))
      assert(last(2L) === ((2L, false, false)))
    } finally q.stop()
  }

  test("streaming funnel: chain state (and its event-time timeout) " +
      "survives a checkpoint restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_fnlck").toString
    val data = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(data))
    def write(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "ts", "event_type").coalesce(1)
        .write.mode("append").parquet(data)
    def start() = {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING")
        .parquet(data)
      graft.streaming.StreamingFunnel.funnelProgress(
          stream, "user_id", "ts", "event_type", Seq("A", "B"),
          withinSeconds = 30L, watermarkDelay = Some("5 seconds"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
    }
    // run 1: user 1 matches step A, then STOP mid-funnel
    write(Seq((1L, ts(1), "A")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2: same checkpoint; B arrives inside the window — the chain
    // must complete from RECOVERED state, converted = true
    write(Seq((1L, ts(5), "B")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val fin = spark.read.parquet(out)
      .where($"user_id" === 1L && $"t_2".isNotNull)
      .select($"converted").as[Boolean].collect().toList
    assert(fin === List(true), "recovered state did not complete the chain")
  }

  test("streaming funnel: EventTimeTimeout evicts lapsed keys — a " +
      "post-eviction event starts a FRESH attempt, not a completion") {
    implicit val sql = spark.sqlContext
    def tsl(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val rows = input.toDF().toDF("user_id", "ts", "event_type")
    val prog = StreamingFunnel.funnelProgress(
      rows, "user_id", "ts", "event_type", Seq("A", "B"),
      withinSeconds = 30L, watermarkDelay = Some("5 seconds"))
    val q = prog.writeStream.format("memory").queryName("fnlev")
      .outputMode("update").start()
    try {
      // user 1 starts a chain at t=1; horizon = t_1 + 30s = 31s
      input.addData((1L, tsl(1), "A"))
      q.processAllAvailable()
      // push the watermark far past the horizon (10000-5 ≫ 31)…
      input.addData((99L, tsl(10000), "A"))
      q.processAllAvailable()
      // …and run one more batch so the timeout fires (timeouts use
      // the watermark from the previous batch's end)
      input.addData((98L, tsl(10001), "A"))
      q.processAllAvailable()
      // user 1's B: WITHOUT eviction this would complete the old
      // chain (t_2 set); WITH eviction state is gone → B matches no
      // step and the snapshot stays chainless
      input.addData((1L, tsl(10002), "B"))
      q.processAllAvailable()
      val rowsOut = spark.sql(
          "SELECT t_1 IS NOT NULL, t_2 IS NOT NULL, converted " +
            "FROM fnlev WHERE user_id = 1")
        .as[(Boolean, Boolean, Boolean)].collect().toList
      // batch-1 snapshot: chain started; post-eviction snapshot:
      // fresh and chainless (sink row order is nondeterministic, so
      // assert set membership, not position)
      assert(rowsOut.contains((true, false, false)))
      assert(rowsOut.contains((false, false, false)))
      assert(!rowsOut.exists(_._2), "eviction failed: old chain completed")
    } finally q.stop()
  }
}
