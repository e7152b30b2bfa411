package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Live job-progress reporting — the Spark analog of the reference's
  * `Progress` callback (psi/utils/progress.h:26-60, percent + sub-stage
  * description polled by the launcher): a `SparkListener` accumulates
  * task/stage/record counts for everything the session runs while attached,
  * and emits a throttled one-line report to stderr on each task completion
  * (at most one line per `intervalMs`). Detach returns the final snapshot.
  *
  * This is DRIVER-side observability over executor-side accumulators — the
  * per-partition lineage manifests remain the durable record; this is the
  * interactive view (`Main build --progress true`).
  */
class ProgressReporter(label: String, intervalMs: Long) extends SparkListener {
  private val tasksDone = new AtomicLong(0)
  private val stagesDone = new AtomicLong(0)
  private val stagesSubmitted = new AtomicLong(0)
  private val recordsRead = new AtomicLong(0)
  private val recordsWritten = new AtomicLong(0)
  private val lastEmit = new AtomicLong(0)
  private val currentStage = new AtomicReference[String]("")
  private val t0 = System.nanoTime()

  case class Snapshot(tasksCompleted: Long, stagesCompleted: Long,
                      stagesSubmitted: Long, recordsRead: Long,
                      recordsWritten: Long, elapsedSec: Double)

  def snapshot(): Snapshot = Snapshot(tasksDone.get(), stagesDone.get(),
    stagesSubmitted.get(), recordsRead.get(), recordsWritten.get(),
    (System.nanoTime() - t0) / 1e9)

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    stagesSubmitted.incrementAndGet()
    currentStage.set(s"stage ${e.stageInfo.stageId} (${e.stageInfo.numTasks} tasks)")
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    stagesDone.incrementAndGet()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasksDone.incrementAndGet()
    val m = e.taskMetrics
    if (m != null) {
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
    }
    val now = System.currentTimeMillis()
    val last = lastEmit.get()
    if (now - last >= intervalMs && lastEmit.compareAndSet(last, now)) {
      val s = snapshot()
      System.err.println(
        f"[progress] $label: ${s.stagesCompleted}/${s.stagesSubmitted} stages, " +
          f"${s.tasksCompleted} tasks, ${s.recordsRead} read / " +
          f"${s.recordsWritten} written, ${s.elapsedSec}%.1f s " +
          s"(${currentStage.get()})")
    }
  }
}

object ProgressReporter {

  /** Attach a reporter to the session's scheduler; returns it for
    * `detach`. Reports everything the session runs while attached.
    */
  def attach(spark: SparkSession, label: String,
             intervalMs: Long = 2000): ProgressReporter = {
    val r = new ProgressReporter(label, intervalMs)
    spark.sparkContext.addSparkListener(r)
    r
  }

  /** Remove the listener and emit + return the final snapshot. */
  def detach(spark: SparkSession, r: ProgressReporter): r.Snapshot = {
    spark.sparkContext.removeSparkListener(r)
    val s = r.snapshot()
    System.err.println(
      f"[progress] final: ${s.stagesCompleted} stages, ${s.tasksCompleted} " +
        f"tasks, ${s.recordsRead} read / ${s.recordsWritten} written in " +
        f"${s.elapsedSec}%.1f s")
    s
  }
}
