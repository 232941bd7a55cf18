package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** SQL surface for the engine's codegen'd Catalyst expressions — the
  * `SparkSessionExtensions` integration, so a pure-SQL user (spark-sql,
  * Thrift server, notebook `%sql`) reaches the same native kernels the
  * DataFrame API uses, with identical codegen:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions   // at session build
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * or imperatively on a live session:
  * [[GraftFunctions.register]](spark).
  *
  * Builders insert the same casts the DataFrame wrappers
  * ([[graft.functions.VectorFunctions]]) require at call sites
  * (array&lt;double&gt; vectors, array&lt;string&gt; token/shingle
  * arrays), so `float[]` embedding columns work directly from SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.size == n,
      s"$name expects $n arguments, got ${args.size}")

  private def vec(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def strs(e: Expression): Expression = Cast(e, ArrayType(StringType))

  private def intLit(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: parameter must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: parameter must be a literal integer, got $other")
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** (name, info, builder) for every exposed function. */
  val registrations: Seq[
      (String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - codegen'd dot product of two vectors"),
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProduct(vec(args(0)), vec(args(1)))
      }),
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - codegen'd cosine similarity"),
      (args: Seq[Expression]) => {
        arity("graft_cosine", args, 2); CosineSim(vec(args(0)), vec(args(1)))
      }),
    ("graft_sorted_intersect_size",
      info("graft_sorted_intersect_size",
        "graft_sorted_intersect_size(a, b) - merge-intersection size of two SORTED arrays (both array<string> or both array<long>)"),
      (args: Seq[Expression]) => {
        arity("graft_sorted_intersect_size", args, 2)
        // NO blanket string cast: a long array cast to strings sorts
        // DIFFERENTLY ("-5" < "3" lexically, -5 < 3 numerically), so a
        // silent cast would quietly break the sorted-merge contract.
        // The expression's checkInputDataTypes rejects anything that is
        // not two equal-typed long/string arrays at analysis.
        SortedIntersectSize(args(0), args(1))
      }),
    ("graft_hyperplane_sign_bits",
      info("graft_hyperplane_sign_bits",
        "graft_hyperplane_sign_bits(vec, planes[, firstPlane]) - LSH sign bits (<= 64 planes)"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          s"graft_hyperplane_sign_bits expects 2 or 3 arguments, got ${args.size}")
        HyperplaneSignBits(vec(args(0)),
          intLit("graft_hyperplane_sign_bits", args(1)),
          if (args.size > 2) intLit("graft_hyperplane_sign_bits", args(2))
          else 0)
      }),
    ("graft_minhash_sigs",
      info("graft_minhash_sigs",
        "graft_minhash_sigs(shingles, k) - all-k MinHash signature array over array<string> or pre-hashed array<long> shingles"),
      (args: Seq[Expression]) => {
        arity("graft_minhash_sigs", args, 2)
        // no blanket cast (see graft_sorted_intersect_size): the string
        // and long arms produce DIFFERENT signature families by design,
        // so the caller must say which one they mean
        MinHashSigs(args(0), intLit("graft_minhash_sigs", args(1)))
      }),
    ("graft_simhash64",
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => {
        arity("graft_simhash64", args, 1); SimHash64(strs(args(0)))
      }),
    ("graft_max_run_length",
      info("graft_max_run_length",
        "graft_max_run_length(sorted) - longest equal run in a SORTED string array"),
      (args: Seq[Expression]) => {
        arity("graft_max_run_length", args, 1); MaxRunLength(strs(args(0)))
      }))

  /** Register every function on a LIVE session (the imperative twin of
    * the `spark.sql.extensions` path — same builders, same names). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), fnInfo, builder)
    }
}
