package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface (GraftFunctions / GraftExtensions): every registered
  * function must be callable from pure SQL and agree exactly with its
  * DataFrame wrapper — same Catalyst expression, so equality here means
  * the SQL user runs the identical codegen'd kernel. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("GraftFunctions.register: SQL calls equal the DataFrame wrappers " +
      "on a fresh session (shared session's registry untouched)") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    import s2.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, -0.5f), Seq(0.5f, 0.25f, 4.0f),
        Seq("a", "b", "b", "c"), Seq("b", "c", "d")))
      .toDF("va", "vb", "sa", "sb")
    df.createOrReplaceTempView("graft_ext_t")
    val viaSql = s2.sql(
      """SELECT graft_dot(va, vb) AS d, graft_cosine(va, vb) AS c,
        |       graft_sorted_intersect_size(sa, sb) AS isz,
        |       graft_simhash64(sa) AS sh,
        |       graft_max_run_length(sa) AS mrl,
        |       graft_minhash_sigs(sa, 4) AS mh,
        |       graft_hyperplane_sign_bits(va, 8) AS hp
        |FROM graft_ext_t""".stripMargin).head()
    val va = col("va").cast("array<double>")
    val vb = col("vb").cast("array<double>")
    val viaDf = df.select(
      VectorFunctions.dotNative(va, vb).as("d"),
      VectorFunctions.cosineNative(va, vb).as("c"),
      VectorFunctions.sortedIntersectSize(col("sa"), col("sb")).as("isz"),
      VectorFunctions.simhash64(col("sa")).as("sh"),
      VectorFunctions.maxRunLength(col("sa")).as("mrl"),
      VectorFunctions.minhashSigs(col("sa"), 4).as("mh"),
      VectorFunctions.hyperplaneSignBits(va, 8).as("hp")).head()
    assert(viaSql === viaDf)
    // hand-checks pin the semantics, not just the equality
    assert(viaSql.getDouble(0) === 1.0 * 0.5 + 2.0 * 0.25 + -0.5 * 4.0)
    assert(viaSql.getInt(4) === 2) // "b" runs twice in the sorted array
    // parameter validation is loud
    val e = intercept[Exception] {
      s2.sql("SELECT graft_minhash_sigs(sa, sa) FROM graft_ext_t").head()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
    // the shared fixture session never saw the registration
    assertThrows[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d), array(1.0d))").head()
    }
  }

  test("dual-type kernels reject mismatched/unsupported element types " +
      "at analysis (never read garbage at runtime)") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    import s2.implicits._
    Seq((Seq(1L, 2L), Seq("a", "b"), Seq(1, 2)))
      .toDF("la", "sa", "ia").createOrReplaceTempView("graft_dt_t")
    // long ∩ long and string ∩ string both work...
    assert(s2.sql("SELECT graft_sorted_intersect_size(la, la) FROM graft_dt_t")
      .head().getInt(0) === 2)
    // ...but long ∩ string and array<int> fail at analysis
    for (bad <- Seq(
        "SELECT graft_sorted_intersect_size(la, sa) FROM graft_dt_t",
        "SELECT graft_sorted_intersect_size(ia, ia) FROM graft_dt_t",
        "SELECT graft_minhash_sigs(ia, 4) FROM graft_dt_t")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql(bad).head()
      }
      assert(e.getMessage.contains("array<long>"), bad)
    }
  }

  test("GraftExtensions delegates the same registrations (the " +
      "spark.sql.extensions entry point)") {
    // apply() must inject every function without throwing; the builders
    // themselves are the register()-tested ones (shared `registrations`)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.registrations.map(_._1).distinct.size ===
      GraftFunctions.registrations.size)
  }
}
