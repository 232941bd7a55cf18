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
    * accesses become a few dozen scans; with it the given attrs load in
    * ONE job and subsequent [[apply]]/[[one]] calls for them are served
    * from the driver-side cache (EntitySpec asserts zero further jobs).
    * Forward attrs only (reverse lookups stay live — they scan a
    * different access path); attrs with NO values cache as empty, so a
    * prefetched miss never falls through to a live scan. Returns `this`
    * for chaining. The cache is a snapshot, exactly like the Entity
    * itself (the reference's Entity wraps an immutable store too,
    * tripl.py:141-271). */
  def prefetch(keys: Seq[String]): this.type = {
    val attrs = keys.map(attrOf).filterNot(isReverse).distinct
    if (attrs.nonEmpty) {
      val valColOf = attrs.map(at => at -> Triples.valueColFor(
        store.schemas.get(at).map(_.vtype).getOrElse(Triples.VStr))).toMap
      val valCols = valColOf.values.toSeq.distinct
      val rows = store.resolved
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
          val rows = store.resolved.where($"e" === eid && $"a" === a)
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
    * (monadic bind), then read the last key's values. */
  def getIn(path: Seq[String]): Seq[Any] = path match {
    case Seq() => Seq(this)
    case Seq(last) => apply(last)
    case head +: rest => refs(head).flatMap(_.getIn(rest))
  }

  /** Take-first variant of getIn (`some_in`, tripl.py:233-241). */
  def someIn(path: Seq[String]): Option[Any] = getIn(path).headOption

  override def toString: String = s"Entity($eid)"
}

object Entity {
  /** Entity for the first match of a pattern (tripl.py:616-621). */
  def find(store: TripleStore, pattern: Seq[(String, MVal)],
      namespace: Option[String] = None): Option[Entity] = {
    import store.spark.implicits._
    store.matchEntities(pattern).orderBy("e").limit(1)
      .as[String].collect().headOption.map(new Entity(store, _, namespace))
  }
}
