package graft

import graft.tools.Cli
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI runs mirroring the reference README walkthrough
  * (cli.py:72-115): JSON docs in → join dump / pull docs out. */
class CliSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def writeInput(): (String, String) = {
    val dir = Files.createTempDirectory("graft_cli").toString
    val in = dir + "/in.json"
    Files.writeString(Paths.get(in),
      """{"cft.seq:id": "QA255-seq1", "cft.seq:subject": {"cft.subject:id": "QA255"}}
        |{"cft.seq:id": "QA255-seq2", "cft.seq:subject": {"cft.subject:id": "QA255"}}
        |""".stripMargin)
    (dir, in)
  }

  test("CLI pull: pattern match + nested pull expr → JSONL docs") {
    val (dir, in) = writeInput()
    val out = dir + "/pulled"
    Cli.run(spark, Array("pull", "-i", in,
      "-p", """["cft.seq:id", {"cft.seq:subject": ["cft.subject:id"]}]""",
      "-e", """{"cft.seq:subject": {"cft.subject:id": "QA255"}}""",
      "-I", "cft.seq:id,cft.subject:id",
      "-o", out))
    val back = spark.read.json(out)
    import spark.implicits._
    // both seqs match through the (lazy) subject ref; ids round-trip
    val ids = back.select(org.apache.spark.sql.functions.explode($"id"))
      .as[String].collect().toSet
    assert(ids === Set("QA255-seq1", "QA255-seq2"))
    val subj = back.selectExpr("explode(subject.id)").collect()
      .flatMap(_.getSeq[String](0)).toSet
    assert(subj === Set("QA255"))
  }

  test("CLI join: EAV JSONL dump contains the asserted facts") {
    val (dir, in) = writeInput()
    val out = dir + "/joined"
    Cli.run(spark, Array("join", "-i", in,
      "-I", "cft.seq:id,cft.subject:id", "-o", out))
    val dump = spark.read.json(out)
    assert(dump.columns.contains("e") && dump.columns.contains("attrs"))
    // 2 seq entities + 1 shared subject entity (cross-doc resolution)
    assert(dump.count() === 3)
  }

  test("CLI datalog: query dict with rules, sort and take (tripl.py:571-584)") {
    val dir = Files.createTempDirectory("graft_cli_dl").toString
    val in = dir + "/people.json"
    // chain: ada → bob → cyn through person:parent
    Files.writeString(Paths.get(in),
      """{"person:id": "ada", "person:parent": {"person:id": "bob"}}
        |{"person:id": "bob", "person:parent": {"person:id": "cyn"}}
        |""".stripMargin)
    val out = dir + "/ancestors"
    Cli.run(spark, Array("datalog", "-i", in, "-I", "person:id",
      "-s", """{"person:parent": {"db:valueType": "db.type:ref"}}""",
      "-q",
      """{"find": ["?x", "?y"],
         "where": [["?a", "person:id", "?x"], ["?a", "ancestor", "?b"],
                   ["?b", "person:id", "?y"]],
         "rules": [[["ancestor", "?s", "?o"], ["?s", "person:parent", "?o"]],
                   [["ancestor", "?s", "?o"], ["?s", "person:parent", "?m"],
                    ["?m", "ancestor", "?o"]]],
         "sort": "?y", "take": 2}""",
      "-o", out))
    import spark.implicits._
    val rows = spark.read.json(out).select($"x", $"y")
      .as[(String, String)].collect().toSet
    // full closure is (ada,bob), (ada,cyn), (bob,cyn); sort by ?y asc +
    // take 2 keeps the two 'bob'/'cyn'-smallest — ada→bob and one of the
    // ?y='cyn' rows; sort is on ?y only, so assert semantics not order
    assert(rows.size === 2)
    assert(rows.contains(("ada", "bob")))
    assert(rows.forall(p => Set(("ada", "bob"), ("ada", "cyn"), ("bob", "cyn"))(p)))
    // parser shapes
    val q = Cli.parseDatalogQuery(
      """{"find": ["?x"], "where": [["?e", "a:b", 3]],
         "rules": [[["anc", "?s", "?o"], ["?s", "p:q", "?o"]]],
         "sort": "x", "take": 5}""")
    assert(q.find === Seq("?x"))
    assert(q.where === Seq(("?e", "a:b", 3L)))
    assert(q.rules === Seq(query.DatalogRule(("?s", "anc", "?o"),
      Seq(("?s", "p:q", "?o")))))
    assert(q.sortBy === Some("?x") && q.take === Some(5))
    assert(!q.recursiveCte)
    // the engine-extension key routes the SAME program through the
    // WITH RECURSIVE lowering — identical answer from the shell grammar
    val out2 = dir + "/ancestors_cte"
    Cli.run(spark, Array("datalog", "-i", in, "-I", "person:id",
      "-s", """{"person:parent": {"db:valueType": "db.type:ref"}}""",
      "-q",
      """{"find": ["?x", "?y"],
         "where": [["?a", "person:id", "?x"], ["?a", "ancestor", "?b"],
                   ["?b", "person:id", "?y"]],
         "rules": [[["ancestor", "?s", "?o"], ["?s", "person:parent", "?o"]],
                   [["ancestor", "?s", "?o"], ["?s", "person:parent", "?m"],
                    ["?m", "ancestor", "?o"]]],
         "recursive_cte": true}""",
      "-o", out2))
    import spark.implicits._
    assert(spark.read.json(out2).select($"x", $"y")
      .as[(String, String)].collect().toSet ===
      Set(("ada", "bob"), ("ada", "cyn"), ("bob", "cyn")))
    intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?e", "a:b", 3]],
           "recursive_cte": "yes"}""")
    }
  }

  test("CLI datalog 'agg' key: find-aggregates group and run end-to-end") {
    val dir = Files.createTempDirectory("graft_cli_agg").toString
    val in = dir + "/people.json"
    Files.writeString(Paths.get(in),
      """{"person:id": "ada", "person:pet": ["rex", "tom"]}
        |{"person:id": "bob", "person:pet": ["rex"]}
        |""".stripMargin)
    val out = dir + "/petcounts"
    Cli.run(spark, Array("datalog", "-i", in, "-I", "person:id", "-q",
      """{"find": ["?n"],
         "where": [["?p", "person:id", "?n"], ["?p", "person:pet", "?x"]],
         "agg": [["count", "?x", "n_pets"]], "sort": "n_pets", "take": 1}""",
      "-o", out))
    import spark.implicits._
    val rows = spark.read.json(out).select($"n", $"n_pets")
      .as[(String, Long)].collect().toList
    assert(rows === List(("bob", 1L))) // sort by the agg output, asc
    // grammar: mis-shaped agg entries fail loudly
    val e = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?n"], "where": [["?e", "p:name", "?n"]],
           "agg": [["count", "?e"]]}""")
    }
    assert(e.getMessage.contains("agg entry"))
  }

  test("CLI datalog 'not' key: parses clause lists, rejects non-arrays") {
    val q = Cli.parseDatalogQuery(
      """{"find": ["?n"], "where": [["?e", "p:name", "?n"]],
         "not": [["?e", "p:flag", "y"]]}""")
    assert(q.notWhere === Seq(("?e", "p:flag", "y")))
    // a scalar/object 'not' must fail loudly, not silently un-negate
    val e = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?n"], "where": [["?e", "p:name", "?n"]],
           "not": "bogus"}""")
    }
    assert(e.getMessage.contains("'not' must be a list"))
    // a single un-nested clause is also malformed
    val e2 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?n"], "where": [["?e", "p:name", "?n"]],
           "not": ["?e", "p:flag", "y"]}""")
    }
    assert(e2.getMessage.contains("'not' must be a list"))
  }

  test("CLI datalog parse rejects empty rules and unknown sort vars") {
    val e1 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?x", "a:b", 1]], "rules": [[]]}""")
    }
    assert(e1.getMessage.contains("rule must be"))
    val e2 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?x", "a:b", 1]], "sort": "y"}""")
    }
    assert(e2.getMessage.contains("neither in 'find'"))
    // mis-typed list keys must fail loudly, never silently become Nil
    val e3 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?x", "a:b", 1]], "rules": "bogus"}""")
    }
    assert(e3.getMessage.contains("'rules' must be a list"))
    val e4 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery("""{"find": "?x", "where": [["?x", "a:b", 1]]}""")
    }
    assert(e4.getMessage.contains("'find' must be a list"))
    val e5 = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?x", "a:b", 1]], "take": "all"}""")
    }
    assert(e5.getMessage.contains("'take' must be an integer"))
  }

  test("CLI datalog rule-level negation: {\"not\": ...} body literal parses " +
      "and the stratified program runs end-to-end") {
    val q = Cli.parseDatalogQuery(
      """{"find": ["?x"], "where": [["?x", "leaf", "?x"]],
         "rules": [[["haskid", "?p", "?c"], ["?c", "p:parent", "?p"]],
                   [["leaf", "?x", "?x"], ["?x", "p:id", "?i"],
                    {"not": ["?x", "haskid", "?c"]}]]}""")
    assert(q.rules(1).negBody === Seq(("?x", "haskid", "?c")))
    assert(q.rules(1).body === Seq(("?x", "p:id", "?i")))
    // malformed negation objects fail loudly
    val e = intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery(
        """{"find": ["?x"], "where": [["?x", "a:b", 1]],
           "rules": [[["p", "?s", "?o"], {"not": ["?s", "a:b", 1],
                      "extra": 1}]]}""")
    }
    assert(e.getMessage.contains("negated body literal"))
    // end-to-end: ada → bob → cyn; leaves (entities with no child) = ada
    val dir = Files.createTempDirectory("graft_cli_neg").toString
    val in = dir + "/people.json"
    Files.writeString(Paths.get(in),
      """{"person:id": "ada", "person:parent": {"person:id": "bob"}}
        |{"person:id": "bob", "person:parent": {"person:id": "cyn"}}
        |""".stripMargin)
    val out = dir + "/leaves"
    Cli.run(spark, Array("datalog", "-i", in, "-I", "person:id",
      "-s", """{"person:parent": {"db:valueType": "db.type:ref"}}""",
      "-q",
      """{"find": ["?n"],
         "where": [["?x", "leaf", "?x"], ["?x", "person:id", "?n"]],
         "rules": [[["haskid", "?p", "?c"], ["?c", "person:parent", "?p"]],
                   [["leaf", "?x", "?x"], ["?x", "person:id", "?i"],
                    {"not": ["?x", "haskid", "?c"]}]]}""",
      "-o", out))
    import spark.implicits._
    val leaves = spark.read.json(out).select($"n").as[String].collect().toSet
    assert(leaves === Set("ada"))
  }

  test("CLI pipeline verbs: dedup / sample / chunk / pack / scrub end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_pipe").toString
    val in = dir + "/docs.json"
    Files.writeString(Paths.get(in),
      """{"doc_id": 1, "source": "s0", "text": "a b c d"}
        |{"doc_id": 2, "source": "s0", "text": "a  b c d"}
        |{"doc_id": 3, "source": "s1", "text": "mail me x@y.io now"}
        |{"doc_id": 4, "source": "s1", "text": "e f g h i j"}
        |""".stripMargin)
    // dedup: docs 1 and 2 share a normalized fingerprint → min id kept
    Cli.run(spark, Array("dedup", "-i", in, "-o", dir + "/dd"))
    val dd = spark.read.json(dir + "/dd").select($"doc_id")
      .as[Long].collect().toSet
    assert(dd === Set(1L, 3L, 4L))
    // chunk: size 3 stride 2 over doc 4 (6 tokens → 1+ceil(3/2)=3 chunks)
    Cli.run(spark, Array("chunk", "-i", in, "--size", "3", "--stride", "2",
      "-o", dir + "/ch"))
    val ch = spark.read.json(dir + "/ch").where($"doc_id" === 4)
      .select($"chunk_idx", $"chunk").as[(Long, String)].collect().toMap
    assert(ch === Map(0L -> "e f g", 1L -> "g h i", 2L -> "i j"))
    // pack --by shard: per-shard bins (s0: 4+5 tokens, s1: 4+6 tokens;
    // capacity 4 → the second doc of each shard starts bin 1)
    Cli.run(spark, Array("pack", "-i", in, "--capacity", "4",
      "--by", "source", "-o", dir + "/pk"))
    val pk = spark.read.json(dir + "/pk")
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(pk === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
    // scrub: the planted email is counted and redacted
    Cli.run(spark, Array("scrub", "-i", in, "-o", dir + "/sc"))
    val sc = spark.read.json(dir + "/sc").where($"doc_id" === 3)
      .select($"n_emails", $"redacted").as[(Long, String)].head()
    assert(sc === ((1L, "mail me <EMAIL> now")))
    // sample --buckets 256 keeps everything (identity cut)
    Cli.run(spark, Array("sample", "-i", in, "--buckets", "256",
      "-o", dir + "/sm"))
    assert(spark.read.json(dir + "/sm").count() === 4)
    // split: folds hashed on the group — both docs of a source agree
    Cli.run(spark, Array("split", "-i", in, "--group", "source",
      "--folds", "train:192,val:32,test:32", "-o", dir + "/sp"))
    val sp = spark.read.json(dir + "/sp")
      .select($"source", $"fold").as[(String, String)].collect()
    assert(sp.length === 4)
    assert(sp.groupBy(_._1).values.forall(_.map(_._2).toSet.size === 1))
    // bad fold spec fails fast
    intercept[RuntimeException] {
      Cli.run(spark, Array("split", "-i", in, "--folds", "oops", "-o",
        dir + "/bad"))
    }
  }

  test("CLI analysis verbs: funnel / hitters / mix / drift / lmscore / " +
      "curriculum end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_an").toString
    val in = dir + "/docs.json"
    Files.writeString(Paths.get(in),
      """{"doc_id": 1, "source": "s0", "text": "the cat and the dog and the bird"}
        |{"doc_id": 2, "source": "s0", "text": "the cat and the dog and the fish"}
        |{"doc_id": 3, "source": "s1", "text": "x"}
        |{"doc_id": 4, "source": "s1", "text": "der hund und die katze und das tier"}
        |""".stripMargin)
    // funnel: token band drops doc 3, lang gate drops doc 4
    Cli.run(spark, Array("funnel", "-i", in,
      "--gates", "tokens:2:100,lang:en", "-o", dir + "/fu"))
    val fu = spark.read.json(dir + "/fu")
      .select($"stage", $"dropped", $"remaining")
      .as[(String, Long, Long)].collect()
      .map { case (s, d, r) => s -> ((d, r)) }.toMap
    assert(fu("ingest") === ((0L, 4L)))
    assert(fu("tokens") === ((1L, 3L)))
    assert(fu("lang") === ((1L, 2L)))
    // --keep emits the survivors instead
    Cli.run(spark, Array("funnel", "-i", in,
      "--gates", "tokens:2:100,lang:en", "--keep", "-o", dir + "/fk"))
    assert(spark.read.json(dir + "/fk").select($"doc_id")
      .as[Long].collect().toSet === Set(1L, 2L))
    // bad gate spec fails fast
    intercept[RuntimeException] {
      Cli.run(spark, Array("funnel", "-i", in, "--gates", "oops:1",
        "-o", dir + "/fb"))
    }
    // hitters over a derived term table (certified exact top-k)
    spark.read.json(in)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("term"))
      .write.json(dir + "/terms.json")
    Cli.run(spark, Array("hitters", "-i", dir + "/terms.json",
      "--group", "term", "--top", "2", "-o", dir + "/hh"))
    val hh = spark.read.json(dir + "/hh").select($"term", $"n")
      .as[(String, Long)].collect().toSet
    assert(hh === Set(("the", 6L), ("and", 4L)))
    // mix keeps the whole min group (both sources equal here → all kept)
    Cli.run(spark, Array("mix", "-i", in, "--group", "source",
      "-o", dir + "/mx"))
    assert(spark.read.json(dir + "/mx").count() === 4)
    // drift vs a copy of itself: all drift_num 0
    Cli.run(spark, Array("drift", "-i", in, "--test", in, "--top", "3",
      "-o", dir + "/dr"))
    assert(spark.read.json(dir + "/dr")
      .select($"drift_num").as[Long].collect().forall(_ === 0L))
    // lmscore: repeated "the cat" transitions score high for docs 1-2
    Cli.run(spark, Array("lmscore", "-i", in, "-o", dir + "/lm"))
    val lm = spark.read.json(dir + "/lm")
      .select($"doc_id", $"n_bigrams").as[(Long, Long)].collect().toMap
    assert(lm(1L) === 7L && lm(3L) === 0L)
    // curriculum: 2 bins over the quality score, all docs binned
    Cli.run(spark, Array("curriculum", "-i", in, "--bins", "2",
      "-o", dir + "/cu"))
    val cu = spark.read.json(dir + "/cu")
      .select($"curriculum_bin").as[Long].collect().sorted.toSeq
    assert(cu === Seq(0L, 0L, 1L, 1L))
  }

  test("CLI sketch/split/quantile/BPE/gapfill verbs end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_sk").toString
    val in = dir + "/docs.json"
    Files.writeString(Paths.get(in),
      (0L until 40L).map(i =>
        s"""{"doc_id": $i, "source": "s${i % 2}", "text": "abab cd"}""")
        .mkString("", "\n", "\n"))
    // plot: distributed histogram of --score-col (the reference's
    // planned-only `plot` subcommand) — 40 ids over 4 auto-bound bins
    // of width ~9.75: 10 per bin
    Cli.run(spark, Array("plot", "-i", in, "--score-col", "doc_id",
      "--bins", "4", "-o", dir + "/pl"))
    val pl = spark.read.json(dir + "/pl")
      .select($"bin", $"n").as[(Long, Long)].collect().toMap
    assert(pl === Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 10L))
    // kmv with k > distinct → exact estimate
    Cli.run(spark, Array("kmv", "-i", in, "--k", "64", "-o", dir + "/kv"))
    assert(spark.read.json(dir + "/kv").select($"est")
      .as[Double].head() === 40.0)
    // stratified exact split: 20 per stratum → 16/2/2
    Cli.run(spark, Array("stratsplit", "-i", in, "--group", "source",
      "--fracs", "train:0.8,val:0.1,test:0.1", "-o", dir + "/ss"))
    val ss = spark.read.json(dir + "/ss").groupBy($"source", $"split")
      .count().as[(String, String, Long)].collect()
      .map { case (s, sp, n) => (s, sp) -> n }.toMap
    assert(ss(("s0", "train")) === 16L && ss(("s0", "val")) === 2L &&
      ss(("s0", "test")) === 2L && ss(("s1", "train")) === 16L)
    // quantiles over an explicit score column
    Cli.run(spark, Array("quantiles", "-i", in, "--score-col", "doc_id",
      "--qs", "0.0,0.5,1.0", "-o", dir + "/qq"))
    val qq = spark.read.json(dir + "/qq").select($"q", $"value")
      .as[(Double, Double)].collect().toMap
    assert(qq(0.0) === 0.0 && qq(0.5) === 19.0 && qq(1.0) === 39.0)
    // bpelearn: same corpus as the OpsSpec hand-check, scaled
    Cli.run(spark, Array("bpelearn", "-i", in, "--merges", "2",
      "-o", dir + "/bp"))
    val bp = spark.read.json(dir + "/bp").select($"iter", $"pair")
      .as[(Long, String)].collect().toMap
    assert(bp(1L) === "a|b" && bp(2L) === "ab|ab")
    // gapfill over a tiny event log (hour 1 is a gap for user 1)
    Files.writeString(Paths.get(dir + "/ev.json"),
      """{"event_id": 1, "user_id": 1, "ts": "2024-01-01 00:10:00", "value": 5.0}
        |{"event_id": 2, "user_id": 1, "ts": "2024-01-01 02:20:00", "value": 7.0}
        |""".stripMargin)
    Cli.run(spark, Array("gapfill", "-i", dir + "/ev.json",
      "--group", "user_id", "--ts-col", "ts", "--val-col", "value",
      "-o", dir + "/gf"))
    val gf = spark.read.json(dir + "/gf")
      .select($"n_events", $"filled_max").as[(Long, Double)].collect().toSet
    assert(gf === Set((1L, 5.0), (0L, 5.0), (1L, 7.0)))
    // leakage: two identical docs split across folds
    Files.writeString(Paths.get(dir + "/lk.json"),
      """{"doc_id": 1, "fold": "train", "text": "dup text"}
        |{"doc_id": 2, "fold": "test", "text": "dup text"}
        |{"doc_id": 3, "fold": "test", "text": "clean"}
        |""".stripMargin)
    Cli.run(spark, Array("leakage", "-i", dir + "/lk.json",
      "--group", "fold", "-o", dir + "/lko"))
    val lk = spark.read.json(dir + "/lko")
      .select($"split_a", $"split_b", $"n_pairs")
      .as[(String, String, Long)].collect().toSet
    assert(lk === Set(("test", "train", 1L)))
    // conversion: A then B within the window for user 1 only
    Files.writeString(Paths.get(dir + "/cv.json"),
      """{"user_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "A"}
        |{"user_id": 1, "ts": "2024-01-01 00:10:00", "event_type": "B"}
        |{"user_id": 2, "ts": "2024-01-01 00:00:00", "event_type": "B"}
        |""".stripMargin)
    Cli.run(spark, Array("conversion", "-i", dir + "/cv.json",
      "--group", "user_id", "--ts-col", "ts", "--text", "event_type",
      "--steps", "A,B", "--window", "3600", "-o", dir + "/cvo"))
    val cv = spark.read.json(dir + "/cvo")
      .select($"user_id", $"converted").as[(Long, Boolean)].collect().toMap
    assert(cv === Map(1L -> true)) // user 2 never matched step 1
    // diff: v2 mutates doc 0's text, drops doc 1, adds doc 99
    Files.writeString(Paths.get(dir + "/v2.json"),
      (Seq(s"""{"doc_id": 0, "source": "s0", "text": "CHANGED"}""") ++
        (2L until 40L).map(i =>
          s"""{"doc_id": $i, "source": "s${i % 2}", "text": "abab cd"}""") ++
        Seq(s"""{"doc_id": 99, "source": "s1", "text": "abab cd"}"""))
        .mkString("", "\n", "\n"))
    Cli.run(spark, Array("diff", "-i", in, "--test", dir + "/v2.json",
      "--id", "doc_id", "--cols", "text", "-o", dir + "/df"))
    val dfo = spark.read.json(dir + "/df").groupBy($"status").count()
      .as[(String, Long)].collect().toMap
    assert(dfo === Map("changed" -> 1L, "removed" -> 1L,
      "added" -> 1L, "unchanged" -> 38L))
    // groupsample: 3 per source, deterministic
    Cli.run(spark, Array("groupsample", "-i", in, "--id", "doc_id",
      "--group", "source", "--top", "3", "-o", dir + "/gs"))
    val gs = spark.read.json(dir + "/gs").groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(gs === Map("s0" -> 3L, "s1" -> 3L))
    // sharded profiling round-trip: shard cards -> merged == whole card
    Files.writeString(Paths.get(dir + "/sh1.json"),
      (0L until 20L).map(i =>
        s"""{"doc_id": $i, "source": "s${i % 2}", "text": "abab cd"}""")
        .mkString("", "\n", "\n"))
    Files.writeString(Paths.get(dir + "/sh2.json"),
      (20L until 40L).map(i =>
        s"""{"doc_id": $i, "source": "s${i % 2}", "text": "abab cd"}""")
        .mkString("", "\n", "\n"))
    for (sh <- Seq("sh1", "sh2"))
      Cli.run(spark, Array("cardsketch", "-i", dir + s"/$sh.json",
        "--cols", "doc_id,source", "-o", dir + s"/c_$sh"))
    Cli.run(spark, Array("cardmerge", "-i", dir + "/c_sh1",
      dir + "/c_sh2", "--format", "json", "-o", dir + "/cm"))
    Cli.run(spark, Array("card", "-i", in, "--cols", "doc_id,source",
      "-o", dir + "/cw"))
    // bit-for-bit: EVERY finalized-card field must agree between the
    // shard→merge→finalize path and the whole-corpus single pass — the
    // q157 discipline, CLI-side
    def cardRows(p: String) = spark.read.json(p)
      .select($"column", $"n_rows", $"n_nulls", $"ndv_est",
        $"min_num", $"max_num", $"min_str", $"max_str")
      .as[(String, Long, Long, Double,
        Option[Double], Option[Double], Option[String], Option[String])]
      .collect().toSet
    assert(cardRows(dir + "/cm") === cardRows(dir + "/cw"))
  }

  test("CLI index verbs: build, near-dedup against, append, re-dedup") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_idx").toString
    def docLine(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text"}"""
    def longText(p: String) = (1 to 12).map(j => s"$p$j").mkString(" ")
    Files.writeString(Paths.get(dir + "/corpus.json"),
      (1L to 10L).map(i => docLine(i, longText(s"c$i"))).mkString("", "\n", "\n"))
    // batch: a near-copy of corpus doc 3 (one appended word) + a fresh doc
    Files.writeString(Paths.get(dir + "/batch.json"),
      Seq(docLine(101L, longText("c3") + " extra"),
        docLine(102L, longText("z"))).mkString("", "\n", "\n"))
    Cli.run(spark, Array("indexbuild", "-i", dir + "/corpus.json",
      "--table", "cli_idx_test", "--index-path", dir + "/idx",
      "-o", dir + "/r1"))
    assert(spark.read.json(dir + "/r1").select($"n_docs")
      .as[Long].head() === 10L)
    Cli.run(spark, Array("indexdedup", "-i", dir + "/batch.json",
      "--table", "cli_idx_test", "-o", dir + "/pairs"))
    val pairs = spark.read.json(dir + "/pairs")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((101L, 3L)))
    // append the SURVIVOR, then a copy of it must near-dup on re-dedup
    Files.writeString(Paths.get(dir + "/keep.json"),
      docLine(102L, longText("z")) + "\n")
    Cli.run(spark, Array("indexappend", "-i", dir + "/keep.json",
      "--table", "cli_idx_test", "-o", dir + "/r2"))
    assert(spark.read.json(dir + "/r2").select($"n_docs")
      .as[Long].head() === 11L)
    Files.writeString(Paths.get(dir + "/batch2.json"),
      docLine(202L, longText("z")) + "\n")
    Cli.run(spark, Array("indexdedup", "-i", dir + "/batch2.json",
      "--table", "cli_idx_test", "-o", dir + "/pairs2"))
    val pairs2 = spark.read.json(dir + "/pairs2")
      .select($"new_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs2 === Set((202L, 102L, 1.0)))
  }

  test("CLI indexingest + indexcompact: replay-idempotent ingest from the " +
      "shell, then compact + vacuum keeps the index answering") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_ing").toString
    def docLine(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text"}"""
    def longText(p: String) = (1 to 12).map(j => s"$p$j").mkString(" ")
    Files.writeString(Paths.get(dir + "/corpus.json"),
      (1L to 10L).map(i => docLine(i, longText(s"c$i"))).mkString("", "\n", "\n"))
    Cli.run(spark, Array("indexbuild", "-i", dir + "/corpus.json",
      "--table", "cli_ing_test", "--index-path", dir + "/idx",
      "-o", dir + "/r0"))
    // batch: a corpus near-dup (101~3), an intra-batch copy pair
    // (103 copies 102 — dropped before the index join), a fresh doc
    Files.writeString(Paths.get(dir + "/batch.json"),
      Seq(docLine(101L, longText("c3") + " extra"),
        docLine(102L, longText("z")), docLine(103L, longText("z")),
        docLine(104L, longText("q"))).mkString("", "\n", "\n"))
    def ingest(): Unit = Cli.run(spark, Array("indexingest",
      "-i", dir + "/batch.json", "--table", "cli_ing_test",
      "--matches", dir + "/m", "--batch-id", "7", "-o", dir + "/r1"))
    ingest()
    val r1 = spark.read.json(dir + "/r1")
      .select($"n_matches", $"n_docs").as[(Long, Long)].head()
    // one match (101~3); survivors 102, 104 appended → 12 indexed docs
    assert(r1 === ((1L, 12L)))
    val m1 = spark.read.parquet(dir + "/m/batch_7")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    assert(m1 === Set((101L, 3L)))
    // REPLAY the same --batch-id: identical matches, nothing re-appended
    ingest()
    assert(spark.read.json(dir + "/r1")
      .select($"n_matches", $"n_docs").as[(Long, Long)].head() === ((1L, 12L)))
    assert(spark.read.parquet(dir + "/m/batch_7")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet === m1)
    // compact the pair + vacuum the superseded copies; the index still
    // answers (the appended doc 102's copy must near-dup) and old files
    // are gone
    Cli.run(spark, Array("indexcompact", "--table", "cli_ing_test",
      "--index-path", dir + "/idx2", "--vacuum", "-o", dir + "/r2"))
    assert(spark.read.json(dir + "/r2").select($"n_docs")
      .as[Long].head() === 12L)
    assert(!new java.io.File(dir + "/idx").exists)
    assert(!new java.io.File(dir + "/idx_sh").exists)
    Files.writeString(Paths.get(dir + "/batch2.json"),
      docLine(202L, longText("z")) + "\n")
    Cli.run(spark, Array("indexdedup", "-i", dir + "/batch2.json",
      "--table", "cli_ing_test", "-o", dir + "/pairs"))
    assert(spark.read.json(dir + "/pairs")
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet ===
      Set((202L, 102L)))
  }

  test("CLI vidxbuild + vidxappend + vidxcompact: the full value-index " +
      "lifecycle from the shell — build, drifted append, compact + vacuum") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_vidx").toString
    Files.writeString(Paths.get(dir + "/corpus.json"),
      (1L to 50L).map(i => s"""{"doc_id": $i, "n": ${i * 3}}""")
        .mkString("", "\n", "\n"))
    Cli.run(spark, Array("vidxbuild", "-i", dir + "/corpus.json",
      "--table", "cli_vidx", "--index-path", dir + "/vidx",
      "--cols", "n", "--buckets", "4", "-o", dir + "/r0"))
    assert(spark.read.json(dir + "/r0").select($"attr", $"n_facts")
      .as[(String, Long)].head() === (("cli_vidx:n", 50L)))
    def stats(tag: String): (Long, Long, Long, Double, Long) = {
      Cli.run(spark, Array("vidxstats", "--table", "cli_vidx",
        "-o", dir + s"/st$tag"))
      spark.read.json(dir + s"/st$tag")
        .select($"n_facts", $"n_buckets", $"n_manifest_rows", $"frag",
          $"max_tx")
        .as[(Long, Long, Long, Double, Long)].head()
    }
    // post-build: one manifest row per bucket — tight (frag 1.0)
    assert(stats("0") === ((50L, 4L, 4L, 1.0, 0L)))
    // append a drifted batch from the shell — bucketed by harvested
    // cuts, corpus never read — that also RE-ASSERTS doc 50 with a
    // DIFFERENT value (9999 vs the build's 150): until compaction the
    // stale row sits beside the new one; after it, latest-txId must
    // keep 9999. A same-value re-assert (q170's shape) collapses to
    // the same output whichever row wins, so only a different-value
    // re-assert can catch a broken tx stamp (the v4→v5 TableSource
    // lesson: the batch source emitted tx-0 triples that TIED the
    // build rows).
    Files.writeString(Paths.get(dir + "/batch.json"),
      ((51L to 60L).map(i => s"""{"doc_id": $i, "n": ${i * 30}}""") :+
        s"""{"doc_id": 50, "n": 9999}""")
        .mkString("", "\n", "\n"))
    Cli.run(spark, Array("vidxappend", "-i", dir + "/batch.json",
      "--table", "cli_vidx", "-o", dir + "/ra"))
    assert(spark.read.json(dir + "/ra").select($"attr", $"n_facts")
      .as[(String, Long)].head() === (("cli_vidx:n", 61L)))
    // post-append: extra manifest rows on the touched buckets (frag >
    // 1.0 — the compaction-cadence signal) and the batch's tx stamp
    val (fA, bA, mA, fragA, txA) = stats("1")
    assert(fA === 61L && mA > bA && fragA > 1.0 && txA === 1L)
    Cli.run(spark, Array("vidxcompact", "--table", "cli_vidx",
      "--index-path", dir + "/vidx2", "--buckets", "4", "--vacuum",
      "-o", dir + "/r1"))
    val r1 = spark.read.json(dir + "/r1")
      .select($"n_facts", $"n_manifest_rows").as[(Long, Long)].head()
    assert(r1._1 === 60L)
    assert(r1._2 <= 4L)
    // post-compact: back to tight — one row per bucket, tx preserved,
    // duplicates collapsed (61 → 60)
    val (fC, bC, mC, fragC, txC) = stats("2")
    assert(fC === 60L && mC === bC && fragC === 1.0 && txC === 1L)
    // latest-txId won: doc 50 holds ONE row and it is the re-asserted
    // 9999, which is also the new global top-1
    val eid50 = org.apache.commons.codec.digest.DigestUtils
      .md5Hex("cli_vidx:50")
    val d50 = spark.table("cli_vidx")
      .where($"e" === eid50)
      .select($"vlong").as[Long].collect().toList
    assert(d50 === List(9999L))
    val top1 = graft.ValueIndex.topKEids(spark, "cli_vidx",
      "cli_vidx:n", "vlong", None, 1)
    assert(top1.isDefined)
    val topVal = spark.table("cli_vidx")
      .join(top1.get, Seq("e"), "left_semi")
      .select($"vlong").as[Long].head()
    assert(topVal === 9999L)
    // vacuum removed the superseded copies; the swapped index answers
    assert(!new java.io.File(dir + "/vidx").exists)
    assert(!new java.io.File(dir + "/vidx_manifest").exists)
    assert(spark.table("cli_vidx").count() === 60L)
  }

  test("CLI vidxbuild indexes a TIMESTAMP column; vidxmigrate converts " +
      "a legacy plain-TABLE registration") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_vts").toString
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    (1 to 40).map(i => (i.toLong, t0.plusHours(i.toLong * 7)))
      .toDF("doc_id", "at")
      .write.parquet(dir + "/docs.parquet")
    Cli.run(spark, Array("vidxbuild", "-i", dir + "/docs.parquet",
      "--format", "parquet", "--table", "cli_vts",
      "--index-path", dir + "/v", "--cols", "at", "--buckets", "4",
      "-o", dir + "/r0"))
    assert(spark.read.json(dir + "/r0").select($"attr", $"n_facts")
      .as[(String, Long)].head() === (("cli_vts:at", 40L)))
    // desc probe through the micros shadow: the top-5 vts in the index
    // must be the 5 latest timestamps
    val top = graft.ValueIndex.topKEids(spark, "cli_vts", "cli_vts:at",
      "vts", None, 5)
    assert(top.isDefined)
    val got = spark.table("cli_vts")
      .join(top.get, Seq("e"), "left_semi")
      .select($"vts").collect()
      .map(_.getAs[java.time.LocalDateTime](0)).toSet
    val want = (36 to 40).map(i => t0.plusHours(i.toLong * 7)).toSet
    assert(got === want)
    // vidxmigrate: plain-TABLE registration (pre-v3 shape) → views
    Seq(("e1", 1L)).toDF("e", "vlong").write.parquet(dir + "/leg")
    Seq((0.0, 1.0, 1L)).toDF("minv", "maxv", "cnt")
      .write.parquet(dir + "/leg_manifest")
    spark.sql(
      s"CREATE TABLE cli_vleg USING parquet LOCATION '$dir/leg'")
    spark.sql(s"CREATE TABLE cli_vleg_manifest USING parquet " +
      s"LOCATION '$dir/leg_manifest'")
    Cli.run(spark, Array("vidxmigrate", "--table", "cli_vleg",
      "-o", dir + "/rm"))
    assert(spark.read.json(dir + "/rm").select($"registered_as")
      .as[String].head() === "view")
    assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cli_vleg"))
      .tableType ===
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW)
    assert(spark.table("cli_vleg").count() === 1L)
  }

  test("CLI score verb: inline lexicon, signed points, zero-hit docs kept") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_score").toString
    Files.writeString(Paths.get(dir + "/docs.json"),
      """{"doc_id": 1, "text": "spark the spark engine"}
        |{"doc_id": 2, "text": "nothing matches here"}
        |""".stripMargin)
    Cli.run(spark, Array("score", "-i", dir + "/docs.json",
      "--lexicon", "spark:5,the:-1", "-o", dir + "/sc"))
    val sc = spark.read.json(dir + "/sc")
      .select($"doc_id", $"points").as[(Long, Long)].collect().toMap
    assert(sc === Map(1L -> 9L, 2L -> 0L))
    // a lexicon FILE whose path contains ':' (any URI scheme) must route
    // to the file reader, not the inline parser — file: works in-test
    Seq(("spark", 5L), ("the", -1L)).toDF("term", "weight")
      .write.parquet(dir + "/lex.parquet")
    Cli.run(spark, Array("score", "-i", dir + "/docs.json",
      "--lexicon", "file://" + dir + "/lex.parquet", "-o", dir + "/sc2"))
    val sc2 = spark.read.json(dir + "/sc2")
      .select($"doc_id", $"points").as[(Long, Long)].collect().toMap
    assert(sc2 === Map(1L -> 9L, 2L -> 0L))
  }

  test("CLI spandedup / shuffle / semdedup verbs end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_r8").toString
    Files.writeString(Paths.get(dir + "/docs.json"),
      """{"doc_id": 1, "text": "a b c d e f g h"}
        |{"doc_id": 2, "text": "x y a b c d e z"}
        |{"doc_id": 3, "text": "u v w"}
        |""".stripMargin)
    Cli.run(spark, Array("spandedup", "-i", dir + "/docs.json",
      "--ngram", "3", "-o", dir + "/clean"))
    val clean = spark.read.json(dir + "/clean")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(clean === Map(1L -> "f g h", 2L -> "x y z", 3L -> "u v w"))
    Cli.run(spark, Array("spandedup", "-i", dir + "/docs.json",
      "--ngram", "3", "--spans-only", "-o", dir + "/spans"))
    assert(spark.read.json(dir + "/spans").count() === 2)
    // gramfrac: docs 1 and 2 share grams "a b c","b c d","c d e" — 3 of
    // each doc's 6 windows duplicated (0.5); doc 3's lone window unique
    Cli.run(spark, Array("gramfrac", "-i", dir + "/docs.json",
      "--ngram", "3", "-o", dir + "/gf"))
    val gf = spark.read.json(dir + "/gf")
      .select($"doc_id", $"dup_frac").as[(Long, Double)].collect().toMap
    assert(gf === Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.0))
    // the CURATION RECIPE: gramfrac --keep (docs + metric) → funnel
    // with the generic colmax gate (report first, then --keep) →
    // spandedup over the survivors. Docs 1/2 sit at dup_frac 0.5, so
    // colmax:dup_frac:0.4 drops both and keeps only doc 3.
    Cli.run(spark, Array("gramfrac", "-i", dir + "/docs.json",
      "--ngram", "3", "--keep", "-o", dir + "/gfk"))
    assert(spark.read.json(dir + "/gfk").columns.toSet ===
      Set("doc_id", "text", "n_windows", "n_dup_windows", "dup_frac"))
    Cli.run(spark, Array("funnel", "-i", dir + "/gfk",
      "--gates", "tokens:2:100,colmax:dup_frac:0.4", "-o", dir + "/fr"))
    val fr = spark.read.json(dir + "/fr")
      .select($"stage", $"dropped", $"remaining")
      .as[(String, Long, Long)].collect()
      .map { case (k, d, r) => k -> ((d, r)) }.toMap
    assert(fr("ingest") === ((0L, 3L)))
    assert(fr("colmax_dup_frac") === ((2L, 1L)))
    Cli.run(spark, Array("funnel", "-i", dir + "/gfk",
      "--gates", "colmax:dup_frac:0.4", "--keep", "-o", dir + "/fk"))
    Cli.run(spark, Array("spandedup", "-i", dir + "/fk",
      "--ngram", "3", "-o", dir + "/fclean"))
    val fclean = spark.read.json(dir + "/fclean")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(fclean === Map(3L -> "u v w"))
    Cli.run(spark, Array("shuffle", "-i", dir + "/docs.json",
      "--seed", "7", "-o", dir + "/shuf"))
    val pos = spark.read.json(dir + "/shuf")
      .select($"shuffle_pos").as[Long].collect().sorted
    assert(pos === Seq(0L, 1L, 2L))
    // decontam: only the test-overlapping run is cut from doc 1
    Files.writeString(Paths.get(dir + "/test.json"),
      """{"doc_id": 90, "text": "q q a b c d e w"}
        |""".stripMargin)
    Cli.run(spark, Array("decontam", "-i", dir + "/docs.json",
      "--test", dir + "/test.json", "--ngram", "3", "-o", dir + "/dc"))
    val dc = spark.read.json(dir + "/dc")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // docs 1 AND 2 carry the test run "a b c d e"; doc 3 is clean
    assert(dc === Map(1L -> "f g h", 2L -> "x y z", 3L -> "u v w"))
    // semdedup over a tiny embedding table: twin of id 1 drops
    Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(0.999f, 0.01f)))
      .toDF("vec_id", "embedding").write.parquet(dir + "/embs.parquet")
    Cli.run(spark, Array("semdedup", "-i", dir + "/embs.parquet",
      "--id", "vec_id", "--clusters", "2", "--threshold", "0.9",
      "--iters", "0", "-o", dir + "/sem"))
    val kept = spark.read.json(dir + "/sem").where($"kept")
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("CLI range bounds on a TIMESTAMP attr: ISO-8601 strings coerce " +
      "against the store schema (date-time and date-only forms); " +
      "malformed strings fail loud; non-VTs attrs pass through") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val df = (1 to 48).map(i => (i.toLong, t0.plusHours(i.toLong)))
      .toDF("doc_id", "at")
    val sp = graft.sources.RowIngest.specFor(df, "tsr", Seq("doc_id"),
      Nil, None)
    val ts = new graft.TripleStore(spark,
      graft.sources.RowIngest.tableToTriples(df, sp), sp.attrSchemas)
    val pat = Cli.parsePattern(
      """{"tsr:at": {"$gte": "2024-01-01T10:00:00", "$lt": "2024-01-02"}}""")
    val coerced = Cli.coerceRangeBounds(ts, pat)
    coerced match {
      case Seq((a, r: query.MRange)) =>
        assert(a === "tsr:at")
        assert(r.lo === Some(java.time.LocalDateTime.of(2024, 1, 1, 10, 0)))
        assert(r.hi === Some(java.time.LocalDateTime.of(2024, 1, 2, 0, 0)))
        assert(!r.loStrict && r.hiStrict)
      case other => fail(s"unexpected coercion result $other")
    }
    // hours 10..23 satisfy [10:00, midnight) → 14 entities
    assert(ts.matchEntities(coerced).as[String].collect().length === 14)
    // a non-VTs attr's bounds pass through untouched
    assert(Cli.coerceRangeBounds(ts,
      Cli.parsePattern("""{"tsr:doc_id": {"$gt": 5}}""")) ===
      Seq("tsr:doc_id" -> query.MRange(lo = Some(5L), loStrict = true)))
    // a malformed timestamp string fails LOUD, never a silent
    // cast-to-null 0-row match
    intercept[java.time.format.DateTimeParseException] {
      Cli.coerceRangeBounds(ts,
        Cli.parsePattern("""{"tsr:at": {"$gte": "not-a-time"}}"""))
    }
    // the datalog side: coerced() resolves clause-object bounds too
    val dq = Cli.parseDatalogQuery(
      """{"find": ["?d"],
        | "where": [["?d", "tsr:at", {"$gte": "2024-01-01T10:00:00"}]]}"""
        .stripMargin).coerced(ts)
    dq.where.head._3 match {
      case r: query.MRange =>
        assert(r.lo === Some(java.time.LocalDateTime.of(2024, 1, 1, 10, 0)))
      case other => fail(s"unexpected clause object $other")
    }
  }

  test("CLI count/sum verbs: match-pattern entity counts and long-attr " +
      "sums, range patterns, --table engaging the zone-map pushdowns") {
    val dir = Files.createTempDirectory("graft_cli_cnt").toString
    val in = dir + "/docs.json"
    Files.writeString(Paths.get(in),
      (1 to 30).map(i => s"""{"d:id": "x$i", "d:n": $i}""")
        .mkString("", "\n", "\n"))
    import spark.implicits._
    val sch = """{"d:n": {"db:cardinality": "db.cardinality:one",
                |         "db:valueType": "db.type:long"}}""".stripMargin
    def counted(out: String): Long =
      spark.read.json(out).select($"count").as[Long].collect().head
    // range pattern through the exact fallback (no index attached)
    Cli.run(spark, Array("count", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": {"$gt": 20}}""", "-o", dir + "/c1"))
    assert(counted(dir + "/c1") === 10L)
    // equality + conjunction shapes count entities, not rows
    Cli.run(spark, Array("count", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": 25}""", "-o", dir + "/c2"))
    assert(counted(dir + "/c2") === 1L)
    Cli.run(spark, Array("count", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": {"$gte": 5, "$lt": 8}, "d:id": ["x5", "x6", "x99"]}""",
      "-o", dir + "/c3"))
    assert(counted(dir + "/c3") === 2L)
    // --table: a registered ValueIndex over the SAME ingest serves the
    // single-range count from its manifest (TripleStore.countMatch);
    // the answer must be identical to the fallback's
    val store = graft.TripleStore.bootstrap(spark,
      graft.sources.JsonSource.loadFacts(spark, "tripl", Seq("d:id"), in),
      schema = Cli.parseSchema(sch))
    graft.ValueIndex.build(store, "clicnt_vidx", dir + "/v", Seq("d:n"),
      nBuckets = 4)
    assert(graft.ValueIndex.countRange(spark, "clicnt_vidx", "d:n",
      "vlong", graft.model.Triples.VLong,
      query.MRange(lo = Some(20L), loStrict = true)) === Some(10L))
    Cli.run(spark, Array("count", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": {"$gt": 20}}""", "--table", "clicnt_vidx",
      "-o", dir + "/c4"))
    assert(counted(dir + "/c4") === 10L)
    // no -e → loud usage error
    intercept[RuntimeException] {
      Cli.run(spark, Array("count", "-i", in, "-I", "d:id",
        "-o", dir + "/c5"))
    }
    // the sum sibling: --cols names the summed LONG attr; the indexed
    // single-range shape reads the manifest's materialized sums
    def summed(out: String): Long =
      spark.read.json(out).select($"sum").as[Long].collect().head
    Cli.run(spark, Array("sum", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": {"$gt": 20}}""", "--cols", "d:n",
      "-o", dir + "/s1"))
    assert(summed(dir + "/s1") === (21 to 30).sum.toLong)
    Cli.run(spark, Array("sum", "-i", in, "-I", "d:id", "-s", sch,
      "-e", """{"d:n": {"$gt": 20}}""", "--cols", "d:n",
      "--table", "clicnt_vidx", "-o", dir + "/s2"))
    assert(summed(dir + "/s2") === (21 to 30).sum.toLong)
    intercept[RuntimeException] {
      Cli.run(spark, Array("sum", "-i", in, "-I", "d:id", "-s", sch,
        "-e", """{"d:n": {"$gt": 20}}""", "-o", dir + "/s3"))
    }
    // percentile sibling: exact nearest-rank values per --qs (values
    // 1..30 → p50 = 15th smallest = 15, p90 = 27th = 27), indexed or not
    for ((out, extra) <- Seq(
        (dir + "/p1", Array.empty[String]),
        (dir + "/p2", Array("--table", "clicnt_vidx")))) {
      Cli.run(spark, Array("percentile", "-i", in, "-I", "d:id",
        "-s", sch, "--cols", "d:n", "--qs", "0.5,0.9", "-o", out) ++ extra)
      val pv = spark.read.json(out).select($"q", $"value")
        .as[(Double, String)].collect().toMap
      assert(pv(0.5) === "15" && pv(0.9) === "27", out)
    }
    // CONDITIONAL percentile: -e restricts the ranks to the matched
    // window (values 21..30 → p50 = 5th smallest = 25), indexed or not
    for ((out, extra) <- Seq(
        (dir + "/p3", Array.empty[String]),
        (dir + "/p4", Array("--table", "clicnt_vidx")))) {
      Cli.run(spark, Array("percentile", "-i", in, "-I", "d:id",
        "-s", sch, "--cols", "d:n", "--qs", "0.5",
        "-e", """{"d:n": {"$gt": 20}}""", "-o", out) ++ extra)
      val pv = spark.read.json(out).select($"q", $"value")
        .as[(Double, String)].collect().toMap
      assert(pv(0.5) === "25", out)
    }
    // min/max/avg verbs over the same window (values 21..30), served
    // by the zone map with --table and by the exact scan without
    for (extra <- Seq(Array.empty[String],
        Array("--table", "clicnt_vidx"))) {
      Cli.run(spark, Array("min", "-i", in, "-I", "d:id", "-s", sch,
        "-e", """{"d:n": {"$gt": 20}}""", "--cols", "d:n",
        "-o", dir + "/mn") ++ extra)
      assert(spark.read.json(dir + "/mn").select($"min")
        .as[String].collect().head === "21")
      Cli.run(spark, Array("max", "-i", in, "-I", "d:id", "-s", sch,
        "-e", """{"d:n": {"$gt": 20}}""", "--cols", "d:n",
        "-o", dir + "/mx") ++ extra)
      assert(spark.read.json(dir + "/mx").select($"max")
        .as[String].collect().head === "30")
      Cli.run(spark, Array("avg", "-i", in, "-I", "d:id", "-s", sch,
        "-e", """{"d:n": {"$gt": 20}}""", "--cols", "d:n",
        "-o", dir + "/av") ++ extra)
      assert(spark.read.json(dir + "/av").select($"avg")
        .as[Double].collect().head === 25.5)
    }
  }

  test("CLI pull-expr / pattern / schema JSON parsers") {
    assert(Cli.parsePullExpr("""["a:x", "*", "ns:_rev", {"a:sub": ["a:y"]},
      {"a:rec": "..."}]""") ===
      Seq(query.PAttr("a:x"), query.PWild, query.PRevIds("ns:rev"),
        query.PNest("a:sub", Seq(query.PAttr("a:y"))), query.PRec("a:rec")))
    assert(Cli.parsePattern("""{"a:x": 3, "a:y": ["p", "q"],
      "a:z": {"b:w": true}}""") ===
      Seq("a:x" -> query.MEq(3L), "a:y" -> query.MIn(Seq("p", "q")),
        "a:z" -> query.MSub(Seq("b:w" -> query.MEq(true)))))
    val sch = Cli.parseSchema(
      """{"a:r": {"db:cardinality": "db.cardinality:one",
                  "db:valueType": "db.type:ref"}}""")
    assert(sch("a:r").cardOne && sch("a:r").isRef)
    // range objects: $-keys denote MRange, everything else stays MSub;
    // conflicting strict+inclusive bounds on one side are rejected
    assert(Cli.parsePattern("""{"a:n": {"$gt": 5, "$lte": 9.5}}""") ===
      Seq("a:n" -> query.MRange(lo = Some(5L), hi = Some(9.5),
        loStrict = true, hiStrict = false)))
    assert(Cli.parsePattern("""{"a:n": {"$gte": "m"}}""") ===
      Seq("a:n" -> query.MRange(lo = Some("m"))))
    intercept[IllegalArgumentException] {
      Cli.parsePattern("""{"a:n": {"$gt": 1, "$gte": 2}}""") }
    // an object with a non-$ key is a sub-pattern even beside $-look-alikes
    assert(Cli.parsePattern("""{"a:z": {"b:w": 1}}""") ===
      Seq("a:z" -> query.MSub(Seq("b:w" -> query.MEq(1L)))))
    // an object MIXING $-operator keys with anything else is a typo,
    // not a sub-pattern over an attribute literally named "$gt" —
    // rejected loudly, mirroring the -q clause-object rejection (a
    // silent MSub would match 0 rows with no error)
    intercept[IllegalArgumentException] {
      Cli.parsePattern("""{"a:n": {"$gt": 450, "$bogus": 1}}""") }
    intercept[IllegalArgumentException] {
      Cli.parsePattern("""{"a:n": {"$gt": 450, "b:w": 1}}""") }
    intercept[IllegalArgumentException] {
      Cli.parsePattern("""{"a:n": {"$between": [1, 2]}}""") }
    // datalog -q clauses: a $-key object in o position parses to MRange;
    // anything else in an object there is rejected loudly
    val dq = Cli.parseDatalogQuery("""{"find": ["?d"],
      "where": [["?d", "a:n", {"$gte": 10, "$lt": 20}]]}""")
    assert(dq.where === Seq(("?d", "a:n",
      query.MRange(lo = Some(10L), hi = Some(20L), hiStrict = true))))
    intercept[IllegalArgumentException] {
      Cli.parseDatalogQuery("""{"find": ["?d"],
        "where": [["?d", "a:n", {"eq": 1}]]}""") }
  }
}
