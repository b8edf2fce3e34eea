package graft.ingest

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.internal.Logging
import org.apache.spark.sql.streaming.StreamingQueryListener

/** I-15 / Q-24: structured ingest telemetry — the reference's
  * per-cycle `tracing` spans and blocks-per-cycle counters
  * (`src/main.rs:116-119,313-335`) re-expressed as a
  * StreamingQueryListener. Batch progress (rows, duration, per-source
  * offsets) is captured for programmatic assertion and logged. */
class IngestTelemetry extends StreamingQueryListener with Logging {

  case class BatchStats(batchId: Long, numInputRows: Long, durationMs: Long)

  val batches = new ConcurrentLinkedQueue[BatchStats]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    logInfo(s"ingest query started: ${e.id}")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    batches.add(BatchStats(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)))
    logInfo(s"ingest cycle ${p.batchId}: ${p.numInputRows} blocks in " +
      s"${p.durationMs.get("triggerExecution")} ms")
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    logInfo(s"ingest query terminated: ${e.id}")

  def rowsPerBatch: Seq[Long] = {
    val it = batches.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (it.hasNext) buf += it.next().numInputRows
    buf.toSeq
  }
}
