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

  /** Per-batch counters; `stateRowsTotal` / `stateMemoryUsedBytes`
    * sum the batch's stateful operators (0 for a stateless ingest) —
    * the state-store SIZE signal an operator watches to know when a
    * streaming job's state outgrows the in-memory provider and wants
    * the RocksDB tier (provider-matrix parity is spec-pinned in
    * `StreamAnalyticsSpec`). */
  case class BatchStats(batchId: Long, numInputRows: Long, durationMs: Long,
                        stateRowsTotal: Long = 0L, stateMemoryUsedBytes: Long = 0L)

  val batches = new ConcurrentLinkedQueue[BatchStats]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    logInfo(s"ingest query started: ${e.id}")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
    batches.add(BatchStats(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
      stateRows, stateBytes))
    logInfo(s"ingest cycle ${p.batchId}: ${p.numInputRows} blocks in " +
      s"${p.durationMs.get("triggerExecution")} ms" +
      (if (p.stateOperators.nonEmpty)
        s"; state $stateRows rows / $stateBytes bytes" else ""))
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
