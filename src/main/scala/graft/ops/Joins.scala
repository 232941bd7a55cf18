package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Join-side pruning for joins whose dim side is too big to broadcast.
  *
  * A fact ⋉ dim semi-join where dim has 10⁸ keys broadcasts nothing
  * (the key set is GBs) and so shuffles the ENTIRE fact side — at
  * 100 TB that shuffle is the job. But a Bloom filter over those keys
  * is a few hundred MB at most (1.2 bytes/key at 1% fpp), rides a
  * broadcast fine, and eliminates non-matching fact rows AT THE SCAN,
  * before they ever enter the exchange. False positives (~fpp of
  * non-matching rows) survive the prefilter and are removed by the
  * exact semi-join that follows — the result is exactly fact ⋉ dim;
  * the bloom only shrinks the shuffle.
  *
  * This is the same mechanism Spark's adaptive runtime row-level
  * filtering injects (InjectRuntimeFilter, Spark ≥ 3.3) when its
  * heuristics fire; exposing it as an operator makes the pruning a
  * guarantee instead of a heuristic, and lets pipelines reuse one
  * built filter across several fact scans. Build and probe are the
  * engine's own codegen'd expressions (BloomFilterAggregate /
  * BloomFilterMightContain over xxhash64), not a Scala UDF — the
  * probe stays inside whole-stage codegen.
  */
object Joins {

  /** Serialized Bloom filter over `xxhash64(keyCols)` of `keys`,
    * built DISTRIBUTED (partial filters merged by OR — no key set ever
    * reaches one node); only the final bitmap (size set by
    * `expectedKeys`/`fpp`, independent of the true key count) is
    * collected. Pair with [[prefilter]] on any fact frame. */
  def keyBloom(keys: DataFrame, keyCols: Seq[String],
      expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(expectedKeys > 0, s"expectedKeys must be positive: $expectedKeys")
    require(0 < fpp && fpp < 1, s"fpp must be in (0, 1): $fpp")
    // numBits per the standard sizing m = -n ln(p) / (ln 2)^2
    val bits = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(keyCols.map(col): _*)),
      Literal(expectedKeys), Literal(bits)).toAggregateExpression()
    keys.select(ColumnBridge.column(agg).as("bloom"))
      .head.getAs[Array[Byte]](0)
  }

  /** Fact rows whose `keyCols` hash might be in `bloom` — a narrow,
    * codegen'd scan filter (plus definite nulls dropped: a null key
    * never equi-joins). ~fpp false positives remain; follow with the
    * exact join. */
  def prefilter(fact: DataFrame, keyCols: Seq[String],
      bloom: Array[Byte]): DataFrame = {
    val probe = ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(keyCols.map(col): _*))))
    fact.where(keyCols.map(col(_).isNotNull).reduce(_ && _) && probe)
  }

  /** Bloom-pruned semi-join: exactly `fact ⋉ keys` on
    * `factKeys = keyCols`, with the fact-side shuffle fed only by rows
    * passing the broadcast Bloom probe. `expectedKeys` sizes the
    * filter — overestimating costs memory, underestimating costs fpp
    * (never correctness). */
  def bloomSemiJoin(fact: DataFrame, factKeys: Seq[String],
      keys: DataFrame, keyCols: Seq[String],
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(factKeys.size == keyCols.size && factKeys.nonEmpty,
      "factKeys and keyCols must align")
    val bloom = keyBloom(keys, keyCols, expectedKeys, fpp)
    val dim = keys.select(keyCols.zip(factKeys)
      .map { case (k, f) => col(k).as(f) }: _*)
    prefilter(fact, factKeys, bloom).join(dim, factKeys, "left_semi")
  }
}
