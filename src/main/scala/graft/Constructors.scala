package graft

/** W9 — pure entity-constructor helpers (entity_cons / namespaced,
  * tripl.py:745-759): build namespaced attribute maps for doc ingest.
  * No engine involvement — convenience for assembling fact docs.
  */
object Constructors {

  /** Prefix every bare key with the namespace (`namespaced`,
    * tripl.py:756-759). Keys already containing ':' pass through. */
  def namespaced(ns: String, avs: (String, Any)*): Map[String, Any] =
    avs.map { case (k, v) =>
      (if (k.contains(":")) k else s"$ns:$k") -> v
    }.toMap

  /** Typed constructor (`entity_cons`, tripl.py:745-753): prefixes kwargs
    * with the attribute base and stamps `<ns>:type`. */
  def entityCons(typeName: String, attrBase: String)(
      avs: (String, Any)*): Map[String, Any] = {
    val ns = attrBase.split("\\.").head
    namespaced(attrBase, avs: _*) + (s"$ns:type" -> typeName)
  }
}
