package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext

/** Deterministic dead-object cleanup between same-JVM measurement reps.
  *
  * Why (r17 SCALECHECK §6, r17 VERDICT task #6): a finished rep's shuffle
  * files are deleted only when its ShuffleDependency is garbage-collected AND
  * Spark's ContextCleaner drains the resulting reference-queue entries — both
  * asynchronous, both GC-timing-dependent. The sf150 scratch sweep measured
  * the consequence directly: b18's two-rep live peak held ~2× rep-1's files
  * where the sf100 decade held ~1.5×, so the repeated-rep spill RATIO the
  * preflight tables pin (SizingSpec) moved with GC weather, not with the
  * data (1.17 → 1.42 across decades, the fatal direction). Forcing a GC and
  * then waiting for the cleaner to go quiet between reps makes rep N+1 start
  * from the same reclaimed-scratch state every run — the pattern Spark's own
  * ContextCleanerSuite uses (gc + listener-confirmed cleanup), reached here
  * via a dynamic proxy because `CleanerListener` is `private[spark]` (same
  * no-internal-package rule as [[StageMetrics.drain]]'s reflection).
  *
  * Bounded, never precise: the wait ends when `quietMs` pass with no cleanup
  * event (or at `maxWaitMs`). A GC that finds nothing returns after one quiet
  * window; a GC that frees a dead rep's worth of shuffles extends the wait
  * until the deletions stop arriving. Failure of any reflective step falls
  * back to gc + a fixed sleep — a measurement helper must degrade, not crash
  * the sweep.
  */
object CleanerDrain {

  /** Nanotime of the most recent cleanup event, shared by the one listener
    * this JVM attaches (attachListener has no detach; attaching per-call
    * would accumulate proxies on the cleaner's listener queue).
    */
  private val lastEvent = new AtomicLong(0L)

  /** Per-context attach outcome, tri-state (r19, the r18 ADVICE item): TRUE =
    * listener attached (take the listener-wait path), FALSE = this context
    * provably has no cleaner (referenceTracking disabled — every later drain
    * takes the cheap blind fallback instead of two empty quiet-window waits),
    * absent = never tried, or the reflective attach threw (retry next call —
    * a transient failure must not permanently demote the context). WEAK keys:
    * the registry must not hold stopped SparkContexts live for the JVM
    * lifetime (same leak class the ADVICE named).
    */
  private val attachState = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())

  private def attach(sc: SparkContext): Boolean = attachState.synchronized {
    // the whole lookup-and-attach runs under the map's own lock (r20, the
    // r19 ADVICE item): a non-atomic get-then-put let two threads draining
    // the same new context BOTH perform the reflective attach, accumulating
    // listener proxies that can never detach — exactly the leak the
    // lastEvent scaladoc warns about. Contention is nil (drains are
    // measurement-boundary events), so one coarse lock is the right size.
    val known = attachState.get(sc)
    if (known != null) known.booleanValue()
    else
      try {
        val cleanerOpt = sc.getClass.getMethod("cleaner").invoke(sc)
          .asInstanceOf[Option[AnyRef]]
        val ok = cleanerOpt match {
          case Some(cleaner) =>
            val cls = Class.forName("org.apache.spark.CleanerListener")
            val proxy = java.lang.reflect.Proxy.newProxyInstance(
              cleaner.getClass.getClassLoader, Array(cls),
              (p: Any, m: java.lang.reflect.Method, args: Array[AnyRef]) =>
                m.getName match {
                  // Object methods must return real values (a null unboxes to NPE)
                  case "hashCode" => Int.box(System.identityHashCode(p))
                  case "equals" => Boolean.box(args != null && args.nonEmpty &&
                    (p.asInstanceOf[AnyRef] eq args(0)))
                  case "toString" => "graft.CleanerDrain.listener"
                  case _ => lastEvent.set(System.nanoTime()); null
                })
            cleaner.getClass.getMethod("attachListener", cls).invoke(cleaner, proxy)
            true
          case None =>
            // spark.cleaner.referenceTracking=false: nothing to drain, ever
            false
        }
        attachState.put(sc, java.lang.Boolean.valueOf(ok))
        ok
      } catch {
        case scala.util.control.NonFatal(_) => false
      }
  }

  /** Force a GC and wait (bounded) until the ContextCleaner reports no new
    * cleanup for `quietMs`. Two gc rounds: the first collection can promote
    * rather than reclaim the dependency graph of a just-dead rep.
    */
  def drain(sc: SparkContext, maxWaitMs: Long = 15000, quietMs: Long = 500): Unit =
    if (!attach(sc)) {
      // reflective path unavailable — degrade to the blind form
      System.gc(); Thread.sleep(quietMs)
    } else {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var round = 0
      while (round < 2 && System.nanoTime() < deadline) {
        System.gc()
        lastEvent.set(System.nanoTime())
        while (System.nanoTime() < deadline &&
            System.nanoTime() - lastEvent.get() < quietMs * 1000000L)
          Thread.sleep(50)
        round += 1
      }
    }
}
