package graft.ops

import org.apache.spark.sql.DataFrame

/** Persist-lifecycle scoping for operators that cache shared intermediates.
  *
  * A `df.persist()` entry lives in the session's CacheManager until an
  * explicit `unpersist()` — there is no GC hook. An operator that persists
  * an intermediate and returns a LAZY result can therefore never release
  * it: the caller's terminal action happens after the operator returned.
  * In a long multi-query session those MEMORY_AND_DISK blocks accumulate
  * and squeeze execution memory for every later query.
  *
  * [[releasing]] closes the scope: it materializes the result eagerly via
  * `localCheckpoint` (distributed — blocks stay on executors, no driver
  * collect) while the intermediates are still cached, then unpersists
  * them. Checkpoint blocks are lineage-truncated RDD blocks owned by the
  * ContextCleaner: they are freed automatically once the returned frame
  * becomes unreachable, unlike CacheManager entries.
  *
  * Trade-off (documented, deliberate): lineage truncation means the
  * result cannot be recomputed if an executor holding its blocks dies —
  * acceptable when the checkpointed frame is a SMALL verified result
  * (near-dup pairs) whose recompute would anyway replay the whole
  * pipeline. Callers are responsible for scoping so that what gets
  * checkpointed IS small: verify candidates before the releasing scope
  * closes (see Dedup.ppJoin vs Dedup.ppJoinCandidates — the latter
  * checkpoints an unverified candidate set and documents that trade-off
  * at its own call site).
  */
object CacheScope {

  /** Materialize `result` eagerly while `intermediates` are still cached,
    * then unpersist them — also on failure (an aborted materialization
    * must not leave the intermediates pinned, or every error path
    * reintroduces the leak this exists to fix). Returns the checkpointed
    * result. */
  def releasing(intermediates: DataFrame*)(result: DataFrame): DataFrame =
    try result.localCheckpoint(eager = true)
    finally intermediates.foreach(_.unpersist(blocking = false))

  /** Unpersist `intermediates` after `body` completes — for bodies that
    * ALREADY return an eagerly-materialized frame (e.g. one produced by a
    * nested [[releasing]]). Avoids the double checkpoint that nesting two
    * `releasing` scopes would create. */
  def around(intermediates: DataFrame*)(body: => DataFrame): DataFrame =
    try body
    finally intermediates.foreach(_.unpersist(blocking = false))
}
