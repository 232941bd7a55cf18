package graft

import graft.model.Triples
import graft.query._
import org.apache.spark.sql.functions._

/** Driver-side lazy entity view — the engine's analogue of the
  * reference's `Entity` dict-like wrapper (tripl/tripl.py:141-271).
  *
  * This is a CONVENIENCE for interactive exploration of small result
  * sets, exactly as in the reference — it issues point-lookup jobs and
  * collects to the driver. It is NOT an engine primitive: bulk access
  * goes through `pull` (set-at-a-time). Namespace completion
  * (`e("id")` → `ns:id`, tripl.py:164-201), reverse lookups
  * (`ns:_attr`, tripl.py:274-278), multi-hop `getIn` with list
  * flattening (tripl.py:203-241) and take-first `some` (tripl.py:44-56)
  * all match the reference's observable behavior.
  */
class Entity(val store: TripleStore, val eid: String,
    val namespace: Option[String] = None) {
  import store.spark.implicits._

  /** Namespace completion: bare key → 'ns:key' (tripl.py:168-169). */
  def attrOf(key: String): String = namespace match {
    case Some(ns) if !key.contains(":") => s"$ns:$key"
    case _ => key
  }

  private def isReverse(key: String): Boolean = {
    val i = key.indexOf(':')
    i >= 0 && key.length > i + 1 && key.charAt(i + 1) == '_'
  }
  private def forwardAttr(key: String): String = {
    val i = key.indexOf(':')
    key.substring(0, i + 1) + key.substring(i + 2)
  }

  /** One-shot attribute PREFETCH — the N+1 fix for scripted access:
    * without it every [[apply]] is one point-lookup job, so a few dozen
    * accesses become a few dozen scans; with it the given forward
    * attrs load in ONE job (+ one job per reverse attr — a different
    * access path) and subsequent [[apply]]/[[one]] calls for them are
    * served from the driver-side cache (EntitySpec asserts zero
    * further jobs). Attrs with NO values cache as empty, so a
    * prefetched miss never falls through to a live scan. Returns
    * `this` for chaining. The cache is a snapshot, exactly like the
    * Entity itself (the reference's Entity wraps an immutable store
    * too, tripl.py:141-271). */
  def prefetch(keys: Seq[String]): this.type = {
    keys.map(attrOf).filter(isReverse).distinct.foreach { a =>
      cache = cache + (a ->
        store.refEdges(forwardAttr(a)).where($"vref" === eid)
          .select($"e").as[String].collect().toSeq.sorted)
    }
    val attrs = keys.map(attrOf).filterNot(isReverse).distinct
    if (attrs.nonEmpty) {
      val valColOf = attrs.map(at => at -> Triples.valueColFor(
        store.schemas.get(at).map(_.vtype).getOrElse(Triples.VStr))).toMap
      val valCols = valColOf.values.toSeq.distinct
      // attribute-pruned scan (TripleStore.scanFor): only the tables and
      // columns owning these attrs generate triples for the lookup
      val rows = store.scanFor(attrs)
        .where($"e" === eid && $"a".isin(attrs.map(x => x: Any): _*))
        .select(($"a" +: valCols.map(col)): _*).collect().toSeq
      cache = cache ++ attrs.map { at =>
        at -> rows.filter(_.getString(0) == at)
          .map(_.getAs[Any](valColOf(at))).filter(_ != null)
      }.toMap
    }
    this
  }

  @volatile private var cache: Map[String, Seq[Any]] = Map.empty

  /** All values for an attribute (strings for refs = child eids);
    * reverse attrs 'ns:_attr' give the eids pointing at me. Served from
    * the [[prefetch]] cache when present, else one point-lookup job. */
  def apply(key: String): Seq[Any] = {
    val a = attrOf(key)
    cache.get(a) match {
      case Some(vs) => vs
      case None =>
        if (isReverse(a))
          // refEdges: declared-ref VAE probe, or the lazy AEV scan for
          // undeclared attrs (tripl.py:175-181)
          store.refEdges(forwardAttr(a)).where($"vref" === eid)
            .select($"e").as[String].collect().toSeq.sorted
        else {
          val rows = store.scanFor(Seq(a)).where($"e" === eid && $"a" === a)
            .select(col(Triples.valueColFor(
              store.schemas.get(a).map(_.vtype).getOrElse(Triples.VStr))))
            .collect().toSeq.map(_.get(0)).filter(_ != null)
          rows
        }
    }
  }

  /** Cardinality-aware single value (`some`, tripl.py:44-56): card-one
    * attrs unwrap; card-many takes the first (sorted for determinism). */
  def one(key: String): Option[Any] = apply(key).headOption

  /** Referenced child entities through a (declared or lazy) ref attr
    * (tripl.py:184-188). For a DECLARED ref attr the [[prefetch]] cache
    * serves here too (the cached values ARE the child eids); lazy-ref
    * attrs always query live — whether their string values are eids is
    * refEdges' heuristic to decide, not the cache's. */
  def refs(key: String): Seq[Entity] = {
    val a = attrOf(key)
    cache.get(a).filter(_ => store.schemas.get(a).exists(_.isRef)) match {
      case Some(vs) => vs.map(_.toString).sorted
        .map(new Entity(store, _, namespace))
      case None =>
        store.refEdges(a).where($"e" === eid)
          .select($"vref").as[String].collect().toSeq.sorted
          .map(new Entity(store, _, namespace))
    }
  }

  /** Multi-hop walk (`get_in`, tripl.py:203-241): follow ref attrs for
    * all but the last key, flattening intermediate multi-values
    * (monadic bind), then read the last key's values.
    *
    * BATCHED: the whole path resolves in ONE Spark job — edge joins for
    * the hops plus the final value read — instead of one point-lookup
    * job per intermediate entity (the recursive spec's N+1 shape).
    * Result order matches the recursive definition: depth-first over
    * per-parent sorted children, i.e. lexicographic on the eid chain
    * (values under one final entity additionally sort for determinism —
    * the recursive form's within-entity order was collect-arbitrary). */
  def getIn(path: Seq[String]): Seq[Any] = path match {
    case Seq() => Seq(this)
    case Seq(last) => apply(last)
    case _ =>
      import store.spark.implicits._
      val hops = path.init.map(attrOf)
      val lastA = attrOf(path.last)
      // first hop from the prefetch cache when possible (same condition
      // as [[refs]]): a LocalRelation frontier broadcasts without the
      // extra exchange job a scan-backed frontier would need
      var frontier = cache.get(hops.head)
          .filter(_ => store.schemas.get(hops.head).exists(_.isRef)) match {
        case Some(vs) =>
          store.spark.createDataset(vs.map(_.toString).sorted.toList)
            .toDF("e").select($"e", array($"e").as("_chain"))
        case None =>
          store.refEdges(hops.head).where($"e" === eid)
            .select($"vref".as("e"), array($"vref").as("_chain"))
      }
      // the frontier fans out from ONE eid — always broadcast-size, so
      // every hop is a shuffle-free broadcast join over the edge scan
      hops.tail.foreach { a =>
        val edge = store.refEdges(a).select($"e", $"vref")
        frontier = broadcast(frontier).join(edge, "e")
          .select($"vref".as("e"),
            concat($"_chain", array($"vref")).as("_chain"))
      }
      val rows =
        if (isReverse(lastA)) {
          val rev = store.refEdges(forwardAttr(lastA))
            .select($"vref".as("e"), $"e".as("_v"))
          broadcast(frontier).join(rev, "e")
            .select($"_chain", $"_v").collect()
        } else {
          val vc = Triples.valueColFor(
            store.schemas.get(lastA).map(_.vtype).getOrElse(Triples.VStr))
          val vals = store.scanFor(Seq(lastA)).where($"a" === lastA)
            .select($"e", col(vc).as("_v")).where($"_v".isNotNull)
          broadcast(frontier).join(vals, "e")
            .select($"_chain", $"_v").collect()
        }
      // tiny driver-side sort instead of a range-partitioned orderBy
      // (which would add a sampling job + shuffle to every walk)
      rows.toSeq
        .map(r => (r.getSeq[String](0), r.get(1)))
        .sortBy { case (chain, v) => (chain.mkString("\u0000"),
          String.valueOf(v)) }
        .map(_._2)
  }

  /** Take-first variant of getIn (`some_in`, tripl.py:233-241). */
  def someIn(path: Seq[String]): Option[Any] = getIn(path).headOption

  override def toString: String = s"Entity($eid)"
}

object Entity {
  /** Above this many matched eids the prefetch scans JOIN against a
    * broadcast local frame of the eids instead of `isin`: a 100k-eid
    * literal IN list is quadratic to analyze and pushes a giant filter
    * string into the scan, where a broadcast semi-join ships the same
    * set once and keeps the plan constant-size. Below it, `isin` stays
    * — a short IN list folds into the parquet pushdown. */
  private[graft] val IsinMax = 1000

  /** `df` rows whose `colName` is one of `eids` — `isin` for small
    * sets, broadcast left-semi join past [[IsinMax]] (same semantics:
    * eids are distinct, so the semi-join neither dedups nor
    * multiplies). */
  private[graft] def whereEidIn(df: org.apache.spark.sql.DataFrame,
      colName: String, eids: Seq[String]): org.apache.spark.sql.DataFrame =
    if (eids.size <= IsinMax)
      df.where(col(colName).isin(eids.map(x => x: Any): _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(eids.toDF(colName)), Seq(colName), "left_semi")
    }

  /** Entities for ALL matches of a pattern (`entities`,
    * tripl.py:624-625), eid-sorted, with an optional BULK prefetch: the
    * given attrs load for EVERY matched entity in one job per access
    * path (one for all forward attrs, one per reverse attr) instead of
    * one point-lookup job per entity per attr — the set-at-a-time fix
    * for scripted walks over a result set; subsequent apply/one calls
    * for those attrs run zero jobs. Reverse attrs (`ns:_attr`) cache
    * the sorted pointing-eid list, exactly what a live [[Entity.apply]]
    * would return. */
  def findAll(store: TripleStore, pattern: Seq[(String, MVal)],
      namespace: Option[String] = None,
      prefetch: Seq[String] = Nil): Seq[Entity] = {
    import store.spark.implicits._
    val ents = store.matchEntities(pattern).orderBy("e")
      .as[String].collect().toSeq.map(new Entity(store, _, namespace))
    if (ents.nonEmpty && prefetch.nonEmpty) {
      val h = ents.head // all ents share the namespace completion
      val keys = prefetch.map(h.attrOf).distinct
      val attrs = keys.filterNot(h.isReverse)
      if (attrs.nonEmpty) {
        val valColOf = attrs.map(at => at -> Triples.valueColFor(
          store.schemas.get(at).map(_.vtype).getOrElse(Triples.VStr))).toMap
        val valCols = valColOf.values.toSeq.distinct
        val rows = whereEidIn(store.scanFor(attrs), "e", ents.map(_.eid))
          .where($"a".isin(attrs.map(x => x: Any): _*))
          .select(($"e" +: $"a" +: valCols.map(col)): _*).collect().toSeq
        val byE = rows.groupBy(_.getString(0))
        ents.foreach { e =>
          val mine = byE.getOrElse(e.eid, Seq.empty)
          e.cache = e.cache ++ attrs.map { at =>
            at -> mine.filter(_.getString(1) == at)
              .map(_.getAs[Any](valColOf(at))).filter(_ != null)
          }.toMap
        }
      }
      keys.filter(h.isReverse).foreach { at =>
        val srcByDst = whereEidIn(store.refEdges(h.forwardAttr(at)),
            "vref", ents.map(_.eid))
          .select($"vref", $"e").as[(String, String)].collect().toSeq
          .groupBy(_._1)
        ents.foreach { e =>
          e.cache = e.cache +
            (at -> srcByDst.getOrElse(e.eid, Seq.empty).map(_._2).sorted)
        }
      }
    }
    ents
  }

  /** Entity for the first match of a pattern (tripl.py:616-621). */
  def find(store: TripleStore, pattern: Seq[(String, MVal)],
      namespace: Option[String] = None): Option[Entity] = {
    import store.spark.implicits._
    store.matchEntities(pattern).orderBy("e").limit(1)
      .as[String].collect().headOption.map(new Entity(store, _, namespace))
  }
}
