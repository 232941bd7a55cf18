package graft

import graft.query._
import graft.sources.DocIngest
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring the reference's hypothesis test
  * (tests/test_tripl.py:25-27 — arbitrary subject entities asserted with
  * id_attrs must not crash and must converge) plus the engine-level
  * invariants from SURVEY.md §5: idempotent re-assert (set semantics),
  * upsert-by-id convergence, and flatten∘pull round-trip.
  *
  * Raw ScalaCheck generators with FIXED seeds (the scalatest bridge
  * artifact is not available offline): deterministic, few cases per
  * property — each case is a Spark job. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val idGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
  private val docGen = for {
    id <- idGen
    name <- Gen.alphaStr.map(_.take(20))
    n <- Gen.choose(0L, 1000L)
  } yield (id, name, n)
  private val batchGen = Gen.nonEmptyListOf(docGen).map(_.take(8))

  private def cases(k: Int): Seq[Seq[(String, String, Long)]] =
    (0 until k).map(i =>
      batchGen.pureApply(Gen.Parameters.default.withSize(8), Seed(42L + i)))

  private def storeOf(docs: Seq[(String, String, Long)]): TripleStore = {
    val df = docs.toDF("cft.subject:id", "cft.subject:name", "cft.subject:n")
    new TripleStore(spark,
      DocIngest.flatten(df, "cft", Seq("cft.subject:id")),
      DocIngest.schemasFor(df, "cft"))
  }

  test("property: re-asserting a batch is a no-op (set semantics)") {
    cases(3).foreach { docs =>
      val once = storeOf(docs).resolved.count()
      val twice = storeOf(docs ++ docs).resolved.count()
      assert(once === twice, s"docs=$docs")
    }
  }

  test("property: same id value ⇒ same entity (upsert convergence, issue 14)") {
    cases(3).foreach { docs =>
      val ts = storeOf(docs)
      val distinctIds = docs.map(_._1).distinct.size
      val entities = ts.matchEntities(Seq("cft.subject:id" -> MAny)).count()
      assert(entities === distinctIds, s"docs=$docs")
    }
  }

  test("property: flatten ∘ pull round-trips scalar values") {
    cases(3).foreach { docs =>
      // same-batch conflicting values for one id have no defined winner;
      // restrict to unique-id batches (dupes are covered above)
      val uniq = docs.groupBy(_._1).map(_._2.head).toSeq
      val ts = storeOf(uniq)
      val out = ts.pullMany(Seq("cft.subject:id" -> MAny),
          Seq(PAttr("cft.subject:id"), PAttr("cft.subject:n")))
        .select(col("id"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(out === uniq.map(d => d._1 -> d._3).toMap)
    }
  }
}
