package graft

/** Single cache-hygiene entry point for embedders. The query objects keep
  * session-lifetime caches of shared intermediates (hierarchy nodes, shingles/bands/
  * simhash frames) keyed by (SparkSession, dir) with a documented staleness contract:
  * results reflect the parquet contents at first touch. A long-lived session that
  * rewrites its inputs — or a harness between measurement phases — calls
  * [[clearAll]] to unpersist and drop every cached frame at once instead of hunting
  * per-object `clearCaches()` hooks.
  */
object Caches {
  def clearAll(): Unit = {
    graft.queries.Hierarchy.clearCaches()
    graft.queries.TextOps.clearCaches()
    graft.queries.VectorOps.clearCaches()
    graft.queries.Sizing.clearCache()
  }
}
