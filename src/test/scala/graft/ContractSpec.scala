package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the correctness gate hashes each query
  * against its SQL oracle BY NAME — a key present on one side only
  * silently weakens the gate (query without oracle → rows-only check;
  * oracle without query → dead SQL nobody runs). Locked here so a
  * rename or a forgotten oracle fails the build, not the round. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
  }

  test("query names are well-formed and unique across the section maps") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")),
      s"malformed: ${names.filterNot(_.matches("q\\d+_[a-z0-9_]+"))}")
    val nums = names.map(_.drop(1).takeWhile(_.isDigit))
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct).distinct}")
  }
}
