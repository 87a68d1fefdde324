package graft.run

/** Pipeline progress events (reference: aqueducts/schemas/src/progress.rs:8-43)
  * + tracker trait with debug-output channel
  * (aqueducts/core/src/progress_tracker.rs:69-104).
  */
sealed trait ProgressEvent
object ProgressEvent {
  case object Started extends ProgressEvent
  final case class SourceRegistered(name: String) extends ProgressEvent
  final case class StageStarted(name: String, group: Int) extends ProgressEvent
  final case class StageCompleted(name: String, group: Int, durationMs: Long) extends ProgressEvent
  final case class DestinationCompleted(name: String) extends ProgressEvent
  final case class Completed(durationMs: Long) extends ProgressEvent
}

sealed trait OutputType
object OutputType {
  case object Show extends OutputType
  case object Explain extends OutputType
  case object ExplainAnalyze extends OutputType
  case object PrintSchema extends OutputType
}

trait ProgressTracker {
  def onProgress(event: ProgressEvent): Unit
  def onOutput(stageName: String, outputType: OutputType, body: String): Unit
}

/** Default tracker: plain stdout/stderr logging, like the reference's
  * LoggingProgressTracker (progress_tracker.rs:133-205).
  */
final class LoggingTracker extends ProgressTracker {
  override def onProgress(event: ProgressEvent): Unit =
    System.err.println(s"[aqueduct] $event")
  override def onOutput(stageName: String, outputType: OutputType, body: String): Unit =
    println(s"--- $stageName ($outputType) ---\n$body")
}

/** Percent-progress decorator: mirrors the reference executor's step
  * accounting — `total_steps = sources + 2·stages + destination`, a step per
  * SourceRegistered / StageStarted / StageCompleted / DestinationCompleted
  * (aqueducts-executor/src/executor/mod.rs:78-89).
  */
final class PercentTracker(inner: ProgressTracker, pipeline: graft.config.Aqueduct)
  extends ProgressTracker {
  private val total = math.max(1,
    pipeline.sources.size + 2 * pipeline.stages.map(_.size).sum +
      pipeline.destination.size)
  private val done = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Last observed progress, 0-100. */
  def percent: Int = math.min(100, done.get() * 100 / total)

  override def onProgress(event: ProgressEvent): Unit = {
    event match {
      case _: ProgressEvent.SourceRegistered | _: ProgressEvent.StageStarted |
           _: ProgressEvent.StageCompleted | _: ProgressEvent.DestinationCompleted =>
        done.incrementAndGet()
      case _ => ()
    }
    inner.onProgress(event)
  }
  override def onOutput(stageName: String, outputType: OutputType, body: String): Unit =
    inner.onOutput(stageName, outputType, body)
}

/** Test tracker: records everything, thread-safe (stages run concurrently). */
final class CollectingTracker extends ProgressTracker {
  private val evts = new java.util.concurrent.ConcurrentLinkedQueue[ProgressEvent]()
  private val outs = new java.util.concurrent.ConcurrentLinkedQueue[(String, OutputType, String)]()
  override def onProgress(event: ProgressEvent): Unit = evts.add(event)
  override def onOutput(stageName: String, outputType: OutputType, body: String): Unit =
    outs.add((stageName, outputType, body))
  def events: Seq[ProgressEvent] = { import scala.jdk.CollectionConverters._; evts.asScala.toSeq }
  def outputs: Seq[(String, OutputType, String)] = { import scala.jdk.CollectionConverters._; outs.asScala.toSeq }
}
