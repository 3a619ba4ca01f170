package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-gate task-metrics rollup for Bench (and the plan-regression spec):
  * a SparkListener that charges every finished task's shuffle/spill/memory
  * metrics to whichever gate is CURRENTLY running ([[setGate]] — gates
  * execute strictly sequentially in Bench, so submit-time attribution is
  * exact up to listener-bus lag, which [[quiesce]] drains).
  *
  * Why bytes and not wall time: the bench box has ~1.9× wall-time spread
  * between idle and loaded runs, so a ≤2× plan regression (a silently
  * added Exchange, a broadcast that fell to sort-merge) hides inside the
  * noise — while shuffle READ/WRITE bytes are deterministic properties of
  * the executed plan at a fixed scale factor. Publishing them per gate
  * beside the per-query times makes plan regressions mechanically
  * visible, the runtime twin of PlanGuardSpec's static cartesian ban.
  *
  * Accumulation is lock-free (ConcurrentHashMap + per-gate synchronized
  * cells are overkill at task granularity — tasks end at most a few
  * thousand times per gate; a synchronized mutable cell is fine and
  * simpler to reason about than striped adders).
  */
final class GateTaskMetrics extends SparkListener {

  /** One gate's rollup: shuffle read/write and spill SUM over tasks,
    * peak execution memory MAX over tasks (a per-task high-water mark —
    * summing it would double-count concurrently-held memory). */
  final class Cell {
    var shuffleRead: Long = 0L
    var shuffleWrite: Long = 0L
    var spillMem: Long = 0L
    var spillDisk: Long = 0L
    var peakExecMem: Long = 0L
    var tasks: Long = 0L
  }

  @volatile private var gate: String = "_untracked"
  private val cells = new ConcurrentHashMap[String, Cell]()

  def setGate(name: String): Unit = { gate = name }

  def clear(): Unit = cells.clear()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val c = cells.computeIfAbsent(gate, _ => new Cell)
      c.synchronized {
        c.shuffleRead += m.shuffleReadMetrics.totalBytesRead
        c.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        c.spillMem += m.memoryBytesSpilled
        c.spillDisk += m.diskBytesSpilled
        c.peakExecMem = math.max(c.peakExecMem, m.peakExecutionMemory)
        c.tasks += 1
      }
    }
  }

  /** Immutable view: gate → (shuffle_read, shuffle_write, spill_mem,
    * spill_disk, peak_exec_mem, tasks). */
  def snapshot: Map[String, (Long, Long, Long, Long, Long, Long)] = {
    val b = Map.newBuilder[String, (Long, Long, Long, Long, Long, Long)]
    cells.forEach { (k, c) =>
      val t = c.synchronized {
        (c.shuffleRead, c.shuffleWrite, c.spillMem, c.spillDisk,
          c.peakExecMem, c.tasks)
      }
      b += k -> t
    }
    b.result()
  }

  /** Wait (bounded) for the async listener bus to drain: task-end events
    * for a gate can trail the driver-side count() return by a few bus
    * ticks; sampling until two consecutive snapshots agree keeps the last
    * gate's rollup from being clipped. */
  def quiesce(maxWaitMs: Long = 3000L): Unit = {
    var prev = snapshot
    var waited = 0L
    while (waited < maxWaitMs) {
      Thread.sleep(100L)
      waited += 100L
      val cur = snapshot
      if (cur == prev) return
      prev = cur
    }
  }
}
