package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Accumulates executor spill and shuffle-write bytes across completed stages,
  * so the measurement harnesses can attribute MEMORY-PRESSURE cost per query.
  *
  * Motivation (round 14): three zero-code-delta sf100 sweep rows spiked ~2×
  * vs their standalone probes with every CPU mini-calibration sample quiet —
  * sweep rows cohabit with the warm cache pool, and execution-memory-hungry
  * sort/window shapes pay storage-vs-execution eviction churn a ~50 ms CPU
  * probe cannot see. Spill bytes are the direct signal for that class: a row
  * whose wall doubles while its spill delta explodes is memory-pool
  * contention, not a plan regression.
  *
  * Deltas are read by snapshotting [[snapshot]] around a query. The listener
  * bus posts stage events ASYNCHRONOUSLY, so a stage finishing exactly at a
  * query boundary can attribute to the neighbor — millisecond-scale lag
  * against multi-second queries, fine for a diagnostic signal, not an exact
  * accounting.
  */
final class StageMetrics extends SparkListener {
  private val spilledB = new AtomicLong
  private val shuffleB = new AtomicLong

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val tm = ev.stageInfo.taskMetrics
    if (tm != null) {
      spilledB.addAndGet(tm.memoryBytesSpilled + tm.diskBytesSpilled)
      shuffleB.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
      ()
    }
  }

  /** (spilledBytes, shuffleWriteBytes) accumulated since attach. */
  def snapshot: (Long, Long) = (spilledB.get, shuffleB.get)
}

object StageMetrics {
  /** Best-effort flush of the async listener bus before reading [[snapshot]]
    * at a measurement boundary: without it a heavy final stage completing
    * exactly at the boundary attributes multi-GB spill to the NEIGHBORING
    * row, and under bus pressure dropped events silently undercount. Calls
    * `LiveListenerBus.waitUntilEmpty()` (a `private[spark]` member — public
    * in bytecode, reached via reflection so this file needs no spark-internal
    * package) and falls back to a 50 ms sleep if the internal API moved.
    * The numbers stay APPROXIMATE either way — the bus can drop events when
    * saturated — so consumers read spill_mb/shuffle_mb as attribution, not
    * accounting.
    */
  def drain(s: SparkSession): Unit =
    try {
      val sc = s.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    } catch {
      case _: InterruptedException =>
        // restore the flag and return: sleeping inside an interrupt would
        // throw unhandled from the fallback itself (r15 ADVICE)
        Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => Thread.sleep(50)
    }
}
