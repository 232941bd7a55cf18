package graft

import graft.model.{AttrSchema, Triples}
import graft.query._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entity lazy view (Q4-Q6) + in-band schema (W7/Q9). */
class EntitySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def store(): TripleStore = {
    // two people in a city; p1 knows p2
    val rows = Seq(
      ("p1", "p:name", Triples.VStr, Some("ada"), None),
      ("p1", "p:city", Triples.VRef, None, Some("c1")),
      ("p1", "p:knows", Triples.VRef, None, Some("p2")),
      ("p2", "p:name", Triples.VStr, Some("bob"), None),
      ("p2", "p:city", Triples.VRef, None, Some("c1")),
      ("c1", "c:name", Triples.VStr, Some("london"), None))
    val df = rows.toDF("e", "a", "vtype", "vs", "vr")
      .select($"e", $"a", $"vtype",
        $"vs".as("vstr"), lit(null).cast("long").as("vlong"),
        lit(null).cast("double").as("vdbl"),
        lit(null).cast("boolean").as("vbool"),
        lit(null).cast("timestamp_ntz").as("vts"),
        $"vr".as("vref"), lit(null).cast("binary").as("vbin"),
        lit(0L).as("txId"))
    val schemas = Map(
      "p:name" -> AttrSchema("p:name", cardOne = true, isRef = false, Triples.VStr),
      "p:city" -> AttrSchema("p:city", cardOne = true, isRef = true, Triples.VRef),
      "p:knows" -> AttrSchema("p:knows", cardOne = false, isRef = true, Triples.VRef),
      "c:name" -> AttrSchema("c:name", cardOne = true, isRef = false, Triples.VStr))
    new TripleStore(spark, df, schemas, preResolved = true)
  }

  test("entity attribute access with namespace completion (Q5)") {
    val ts = store()
    val e = new Entity(ts, "p1", namespace = Some("p"))
    assert(e.one("name") === Some("ada"))
    assert(e("name") === Seq("ada"))
  }

  test("reverse lookup 'ns:_attr' (Q5, tripl.py:274-278)") {
    val ts = store()
    val city = new Entity(ts, "c1")
    assert(city("p:_city") === Seq("p1", "p2"))
  }

  test("multi-hop getIn flattens intermediate refs (Q6)") {
    val ts = store()
    val e = new Entity(ts, "p1", namespace = Some("p"))
    assert(e.getIn(Seq("city", "c:name")) === Seq("london"))
    assert(e.getIn(Seq("knows", "p:name")) === Seq("bob"))
    // knows → city → name: two hops through refs
    assert(e.getIn(Seq("knows", "p:city", "c:name")) === Seq("london"))
    assert(e.someIn(Seq("city", "c:name")) === Some("london"))
  }

  test("prefetch: N attribute accesses after ONE pull run zero further " +
      "jobs and return the live-path answers") {
    val ts = store()
    val live = new Entity(ts, "p1", namespace = Some("p"))
    val expected = Seq("name", "city", "knows").map(k => k -> live(k))
    val expectedRev = live("p:_knows")
    val e = new Entity(ts, "p1", namespace = Some("p"))
      .prefetch(Seq("name", "city", "knows", "p:absent", "p:_knows"))
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = Seq("name", "city", "knows").map(k => k -> e(k))
      assert(e.one("name") === Some("ada"))
      assert(e("p:absent") === Seq(), "prefetched miss must cache as empty")
      // reverse attrs prefetch through their own access path and then
      // serve from the same cache — zero further jobs here too
      assert(e("p:_knows") === expectedRev)
      // declared-ref attrs serve refs() from the same cache: the cached
      // values ARE the child eids — still zero jobs
      assert(e.refs("knows").map(_.eid) === Seq("p2"))
      // the bus is async but FIFO: run one FENCE job — once its start
      // event is visible, every job the accesses might have run would
      // already have been counted, so the total must be exactly 1
      spark.sparkContext.parallelize(1 to 1).count()
      val deadline = System.currentTimeMillis + 10000
      while (jobs.get() < 1 && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(jobs.get() === 1L,
        s"prefetched accesses ran ${jobs.get() - 1} jobs, want 0")
      assert(got === expected)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("findAll bulk prefetch: past 1k matched eids the scans JOIN a " +
      "broadcast eid frame instead of inlining a literal IN list") {
    // plan shape, directly on the gate: >IsinMax eids → left-semi join
    // (constant-size plan), ≤IsinMax → isin (parquet-pushable)
    val eids = (0 until 1500).map(i => f"e$i%05d")
    val probe = eids.toDF("e").withColumn("x", lit(1))
    assert(Entity.whereEidIn(probe, "e", eids)
      .queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    assert(!Entity.whereEidIn(probe, "e", eids.take(10))
      .queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    // end-to-end at width: 2400 matched cities, forward + reverse
    // prefetch — both access paths cross the join threshold and must
    // cache the same values the point lookups would
    val nC = 2400
    val rows =
      (0 until nC).map(i => (f"c$i%05d", "c:name", Triples.VStr,
        Some(s"city$i"), None)) ++
      (0 until 2 * nC).map(i => (f"p$i%05d", "p:city", Triples.VRef,
        None, Some(f"c${i / 2}%05d")))
    val df = rows.toDF("e", "a", "vtype", "vs", "vr")
      .select($"e", $"a", $"vtype",
        $"vs".as("vstr"), lit(null).cast("long").as("vlong"),
        lit(null).cast("double").as("vdbl"),
        lit(null).cast("boolean").as("vbool"),
        lit(null).cast("timestamp_ntz").as("vts"),
        $"vr".as("vref"), lit(null).cast("binary").as("vbin"),
        lit(0L).as("txId"))
    val schemas = Map(
      "c:name" -> AttrSchema("c:name", cardOne = true, isRef = false,
        Triples.VStr),
      "p:city" -> AttrSchema("p:city", cardOne = true, isRef = true,
        Triples.VRef))
    val ts = new TripleStore(spark, df, schemas, preResolved = true)
    val ents = Entity.findAll(ts, Seq("c:name" -> MAny),
      namespace = Some("c"), prefetch = Seq("name", "p:_city"))
    assert(ents.size === nC)
    val e7 = ents.find(_.eid == "c00007").get
    assert(e7.one("name") === Some("city7"))
    assert(e7("p:_city") === Seq("p00014", "p00015"))
    assert(ents.last.one("name") === Some(s"city${nC - 1}"))
  }

  test("Entity.find takes first match of a pattern (Q4)") {
    val ts = store()
    val e = Entity.find(ts, Seq("p:city" -> MEq("c1")))
    assert(e.map(_.eid) === Some("p1")) // deterministic: sorted first
  }

  test("in-band schema triples round-trip through datalog (W7/Q9)") {
    val ts = store().withSchemaAsserted
    val out = ts.datalog(Seq("?attr", "?vt"), Seq(
      ("?a", "db:ident", "?attr"),
      ("?a", "db:valueType", "?vt")))
      .as[(String, String)].collect().toMap
    assert(out("p:city") === "db.type:ref")
    assert(out("p:name") === "db.type:str")
    assert(out.size === 4)
  }
}
