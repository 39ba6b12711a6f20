package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Accumulates task-metric totals between `reset()` calls — shared by
  * the bench (per-query stage/shuffle census) and the soak
  * (scale-slope measurement). Listener events are delivered async;
  * `quiesce()` waits until every started job has ended and no stage
  * completion arrived in the last poll, so callers snapshot OUTSIDE
  * their timed windows. */
final class TaskMetricsListener extends SparkListener {
  val shuffleWrite = new AtomicLong(0)
  val shuffleRead = new AtomicLong(0)
  val spill = new AtomicLong(0)
  val stages = new AtomicInteger(0)
  val maxStageShuffleWrite = new AtomicLong(0)
  val jobsStarted = new AtomicInteger(0)
  val jobsEnded = new AtomicInteger(0)

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      val w = m.shuffleWriteMetrics.bytesWritten
      shuffleWrite.addAndGet(w)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spill.addAndGet(m.diskBytesSpilled)
      maxStageShuffleWrite.updateAndGet(math.max(_, w))
      stages.incrementAndGet()
    }
  }
  override def onJobStart(j: SparkListenerJobStart): Unit =
    jobsStarted.incrementAndGet()
  override def onJobEnd(j: SparkListenerJobEnd): Unit =
    jobsEnded.incrementAndGet()

  def reset(): Unit = {
    shuffleWrite.set(0); shuffleRead.set(0); spill.set(0)
    stages.set(0); maxStageShuffleWrite.set(0)
    jobsStarted.set(0); jobsEnded.set(0)
  }

  /** Waits (≤5 s) until every started job has ended and no stage
    * completion arrived in the last poll. Returns whether quiescence
    * was actually reached — a `false` means listener events were still
    * in flight at the deadline and this window's census UNDERCOUNTS;
    * callers must flag the entry rather than report it as a clean
    * measurement. */
  def quiesce(): Boolean = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var lastStages = -1
    while (System.nanoTime() < deadline &&
      (jobsStarted.get() != jobsEnded.get() || stages.get() != lastStages)) {
      lastStages = stages.get()
      Thread.sleep(100)
    }
    jobsStarted.get() == jobsEnded.get() && stages.get() == lastStages
  }
}
