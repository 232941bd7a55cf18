package graft.graph

import graft.TripleStore
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX projection of the store's implicit ref graph — the "triple
  * analytics" surface (SURVEY.md §1.5: graphs arise implicitly because a
  * value may be another entity's id, README.md:25-36).
  *
  * String entity ids are dictionary-encoded to Long VertexIds with
  * xxhash64 — computed LOCALLY on each executor (no broadcast dictionary,
  * no id-assignment shuffle; collision odds n²/2⁶⁴ ≈ 3e-11 even at a
  * billion entities). The reverse mapping (hash → eid) rides along as a
  * vertex-attribute DataFrame for joining analytics results back to
  * entities.
  */
object RefGraph {

  /** Vertex dictionary (vid, e) for all entities appearing in ref edges. */
  def vertexDict(ts: TripleStore): DataFrame =
    ts.edges.select(col("e")).union(ts.edges.select(col("vref").as("e")))
      .distinct()
      .select(xxhash64(col("e")).as("vid"), col("e"))

  /** Build the GraphX graph over ref edges (optionally only `attrs`). */
  def build(ts: TripleStore, attrs: Option[Seq[String]] = None): Graph[Unit, String] = {
    val es = attrs.map(as => ts.edges.where(col("a").isInCollection(as)))
      .getOrElse(ts.edges)
    val edgeRdd = es
      .select(xxhash64(col("e")).as("src"), xxhash64(col("vref")).as("dst"),
        col("a"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    Graph.fromEdges(edgeRdd, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components over the ref graph → (e, component) with the
    * component id remapped to the member entities' MIN eid-hash (stable,
    * content-derived — safe to compare across runs). */
  def connectedComponents(ts: TripleStore,
      attrs: Option[Seq[String]] = None): DataFrame = {
    val spark = ts.spark
    import spark.implicits._
    val cc = build(ts, attrs).connectedComponents()
    val compDf = cc.vertices.toDF("vid", "component")
    compDf.join(vertexDict(ts), Seq("vid")).select($"e", $"component")
  }

  /** PageRank over the ref graph → (e, rank). */
  def pageRank(ts: TripleStore, tol: Double = 1e-4,
      attrs: Option[Seq[String]] = None): DataFrame = {
    val spark = ts.spark
    import spark.implicits._
    val pr = build(ts, attrs).pageRank(tol)
    pr.vertices.toDF("vid", "rank")
      .join(vertexDict(ts), Seq("vid")).select($"e", $"rank")
  }
}
