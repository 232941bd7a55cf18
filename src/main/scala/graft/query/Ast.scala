package graft.query

/** Query ASTs for the match / pull surfaces of the reference engine.
  *
  * `match` patterns (tripl/tripl.py:604-609) are CONJUNCTIVE-only: a map of
  * attribute → value, where a value may be a scalar (equality), a
  * collection (IN semantics, tripl.py:596-602), or a nested sub-pattern
  * (graph semi-join through a ref attribute, tripl.py:591-592).
  *
  * `pull` expressions (tripl.py:627-727) are lists of: attribute names,
  * the wildcard '*', reverse-lookup attributes 'ns:_attr'
  * (tripl.py:274-278), and {ref_attr: sub_expr} maps for nested descent.
  */
sealed trait MVal
/** Scalar equality (string / long / double / boolean / timestamp / eid). */
final case class MEq(v: Any) extends MVal
/** IN-list: entity matches if any of its values for the attr is in vs. */
final case class MIn(vs: Seq[Any]) extends MVal
/** Nested sub-pattern through a ref attribute (semi-join). */
final case class MSub(pattern: Seq[(String, MVal)]) extends MVal
/** Attribute presence: entity has ANY value for the attr. */
case object MAny extends MVal
/** Value-range comparison (engine extension; the reference's match is
  * equality/IN-only, tripl.py:596-602): entity matches if any of its
  * values for the attr falls inside [lo, hi] (either bound optional;
  * `loStrict`/`hiStrict` make the bound exclusive). `attr > v` is
  * `MRange(lo = Some(v), loStrict = true)`. On a store carrying a
  * [[graft.ValueIndex]] over the attr, a single-clause range match
  * partition-prunes to the buckets whose [min, max] intersect the
  * range instead of scanning the attr's full fact slice — the
  * "documents longer than N" curation filter goes sub-linear in the
  * corpus (see ValueIndex.rangeEids). */
final case class MRange(lo: Option[Any] = None, hi: Option[Any] = None,
    loStrict: Boolean = false, hiStrict: Boolean = false) extends MVal

sealed trait PullSpec {
  def name: String
}
/** Plain attribute projection; output column named `as` or the attr suffix
  * after ':' (cardinality-one unwraps to scalar, tripl.py:724-726). */
final case class PAttr(attr: String, as: Option[String] = None) extends PullSpec {
  def name: String = as.getOrElse(PullSpec.suffix(attr))
}
/** Wildcard '*': all attrs of the entity as a map attr → [values]
  * (tripl.py:684-687); dynamic schema → string-rendered values. */
case object PWild extends PullSpec { def name: String = "attrs" }
/** Bare reverse lookup 'ns:_attr' → array of eids pointing at this entity
  * through attr (tripl.py:680-682). */
final case class PRevIds(attr: String, as: Option[String] = None) extends PullSpec {
  def name: String = as.getOrElse(PullSpec.suffix(attr) + "_rev")
}
/** Nested descent {attr: sub_expr}; `reverse=true` descends the edge
  * backwards (who-points-at-me, tripl.py:694-706). Output column is an
  * array of structs of the sub-pull's columns. */
final case class PNest(attr: String, sub: Seq[PullSpec],
    reverse: Boolean = false, as: Option[String] = None) extends PullSpec {
  def name: String = as.getOrElse(PullSpec.suffix(attr) + (if (reverse) "_rev" else ""))
}
/** Q7e — recursive descent {attr: '...'}: re-apply the WHOLE enclosing
  * pull expression through `attr`, transitively (tripl.py:637-650, impl
  * 652-669, 708-721). Compiled by probing the ACTUAL recursion depth of
  * the entity set with a BFS fixpoint, then unrolling to that many PNest
  * levels — DataFrames need a static schema, so depth is resolved from
  * the data at plan time rather than row-by-row. When the probe is cut
  * short by a cycle (or by `maxDepth`), the innermost level renders the
  * repeated entity as an ident-only doc {'db:ident': eid} — the
  * reference's cycle short-circuit (tripl.py:663-665). The probe is
  * keyed per root (entity, root), mirroring the reference's per-root
  * `_seen_entities`, so DAGs that share entities across roots at
  * different depths still unroll each root's full chain. */
final case class PRec(attr: String, maxDepth: Int = 20,
    reverse: Boolean = false, as: Option[String] = None) extends PullSpec {
  def name: String = as.getOrElse(PullSpec.suffix(attr) + (if (reverse) "_rev" else ""))
}

/** A Datalog rule: `head` = (varX, idbPredicate, varY) derived from the
  * conjunction of `body` clauses (each over a stored attribute or another
  * IDB predicate; variables start with '?'). The reference's PLANNED
  * `rules` grammar (tripl.py:571-584).
  *
  * `negBody` clauses are NEGATED literals (NOT EXISTS): a binding
  * survives only if no matching fact exists. A negated IDB predicate
  * forces the rule into a HIGHER STRATUM than that predicate (standard
  * stratified semantics — the negated relation is complete before this
  * rule ever fires); cycles through negation are rejected at
  * stratification time. Each negated clause must share at least one
  * variable with the positive body (safety). */
final case class DatalogRule(
    head: (String, String, String),
    body: Seq[(String, String, Any)],
    negBody: Seq[(String, String, Any)] = Nil)

/** A Datalog OR group (Datomic's `or` / `or-join`): a DISJUNCTION of
  * branches, each branch a conjunction of clauses. Every branch must
  * bind the SAME non-empty variable set (Datomic's or-clause rule —
  * anything else would make the group's relation schema depend on which
  * branch matched); a mismatch is rejected at compile time. Compiled to
  * a UNION of the per-branch clause joins projected onto the common
  * variables, de-duplicated (set semantics, like every relation here),
  * then joined into the positive body on shared variables — one extra
  * union + distinct, no driver-side evaluation. */
final case class DatalogOr(branches: Seq[Seq[(String, String, Any)]])

/** A Datalog find-aggregate (Datomic-style `(count ?x)` forms): apply
  * `fn` (count | sum | min | max | avg) to variable `v`, output column
  * `as`. With aggregates present, the query's plain `find` variables
  * become the group keys. Aggregation is over the SET of bindings
  * projected onto (find vars + aggregated vars) — set semantics first,
  * then aggregate — so `count` counts DISTINCT partner values, never
  * join multiplicities (which are an artifact of clause order). */
final case class DatalogAgg(fn: String, v: String, as: String)

object PullSpec {
  def suffix(attr: String): String = {
    val i = attr.indexOf(':')
    if (i >= 0) attr.substring(i + 1) else attr
  }
}
