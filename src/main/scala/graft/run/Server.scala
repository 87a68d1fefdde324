package graft.run

import graft.config.ConfigParser
import org.apache.spark.sql.SparkSession
import scala.concurrent.ExecutionContext
import scala.util.{Failure, Success}

/** NDJSON-over-TCP remote-execution server: the transport that binds
  * [[PipelineService]] (FIFO manager) and [[Protocol]] (wire contract)
  * together — the runnable counterpart of the reference executor's WebSocket
  * endpoint (aqueducts-executor/src/api/mod.rs:78-160, main.rs:1-199).
  *
  * Connection contract, one JSON message per line:
  *   - client → server: `execution_request` (rendered pipeline config),
  *     `cancellation_request`
  *   - server → client: `queue_position` updates while queued,
  *     `progress_update` (+ percent) and `stage_output_chunk` (32k-chunked
  *     show/explain/schema output) during the run, then a terminal
  *     `execution_succeeded` / `execution_error`
  *
  * Auth mirrors the reference's API-key middleware (api/auth.rs): when
  * constructed with an `apiKey`, the first non-HEALTH line of a connection
  * must be `AUTH <key>` (compared constant-time) or the connection is
  * refused. The literal line `HEALTH` answers `{"status":"OK"}` before or
  * after auth — the reference's /api/health is likewise unauthenticated
  * (api/mod.rs:43-49).
  *
  * Plain `java.net` sockets — zero dependencies, embeddable anywhere a
  * SparkSession lives. Like the reference (which recommends fronting the
  * executor with TLS-terminating infrastructure), transport encryption is an
  * deployment concern layered outside the process.
  */
final class Server(
    spark: SparkSession,
    port: Int = 0,
    apiKey: Option[String] = None,
    maxQueue: Int = 16) {

  private val service = new PipelineService(spark, maxQueue)
  private val server = new java.net.ServerSocket(port)
  // requestId → service handle, server-wide: a cancel may arrive on a
  // different connection than the one that submitted
  private val handles = new java.util.concurrent.ConcurrentHashMap[String, service.Handle]()
  @volatile private var closed = false

  private implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-server")
      t.setDaemon(true)
      t
    }))

  /** The actual bound port (useful with port = 0 for tests). */
  def boundPort: Int = server.getLocalPort

  private val acceptThread = new Thread("graft-server-accept") {
    override def run(): Unit =
      while (!closed) {
        try {
          val socket = server.accept()
          ec.execute(() => handle(socket))
        } catch {
          case _: java.net.SocketException if closed => () // normal shutdown
          case _: java.io.IOException => ()
        }
      }
  }
  acceptThread.setDaemon(true)
  acceptThread.start()

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: java.io.IOException => () }
    service.close()
  }

  // ------------------------------------------------------------ connection

  private def handle(socket: java.net.Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
    val writeLock = new Object
    def sendRaw(line: String): Unit = writeLock.synchronized {
      try { out.write(line); out.write("\n"); out.flush() }
      catch { case _: java.io.IOException => () } // client gone: drop output
    }
    def send(m: AnyRef): Unit = sendRaw(Protocol.write(m))

    try {
      apiKey.foreach { key =>
        // HEALTH stays reachable without credentials, matching the
        // reference's unauthenticated /api/health (api/mod.rs:43-49)
        var first = in.readLine()
        while (first != null && first.trim == "HEALTH") {
          sendRaw("""{"status":"OK"}""")
          first = in.readLine()
        }
        // constant-time comparison: this is an unauthenticated TCP endpoint,
        // so a bytewise-early-exit == would leak key prefixes via timing.
        // Trimmed like every other line (HEALTH, dispatch): a CRLF client's
        // trailing \r must not fail an otherwise-correct key.
        val ok = first != null && java.security.MessageDigest.isEqual(
          s"AUTH $key".getBytes("UTF-8"), first.trim.getBytes("UTF-8"))
        if (!ok) {
          sendRaw("""{"type":"execution_error","request_id":"","message":"unauthorized"}""")
          socket.close()
          return
        }
      }
      var line = in.readLine()
      while (line != null && !closed) {
        line.trim match {
          case "" => ()
          case "HEALTH" => sendRaw("""{"status":"OK"}""")
          case text => dispatch(text, send)
        }
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => () // disconnect: running pipelines proceed
    } finally {
      try socket.close() catch { case _: java.io.IOException => () }
    }
  }

  private def dispatch(text: String, send: AnyRef => Unit): Unit = {
    val msg =
      try Protocol.read(text)
      catch {
        case e: Exception =>
          send(Protocol.ExecutionError("", s"malformed message: ${e.getMessage}")); return
      }
    msg match {
      case Protocol.ExecutionRequest(requestId, pipelineYaml) =>
        submit(requestId, pipelineYaml, send)
      case Protocol.CancellationRequest(requestId) =>
        // terminal outcome reaches the client through the submission's own
        // completion forwarder (CancellationException → execution_error)
        Option(handles.get(requestId)).foreach(h => service.cancel(h.id))
      case other =>
        send(Protocol.ExecutionError("", s"unexpected client message: ${other.getClass.getSimpleName}"))
    }
  }

  private def submit(requestId: String, pipelineYaml: String, send: AnyRef => Unit): Unit = {
    // the request carries the fully-rendered config (templating happens
    // client-side, like the reference ships the rendered Aqueduct struct);
    // YAML parse accepts JSON documents too (YAML superset)
    val pipeline =
      try ConfigParser.fromYaml(pipelineYaml)
      catch { case e: Exception => send(Protocol.ExecutionError(requestId, e.getMessage)); return }

    val handle =
      try service.submit(pipeline, new WireTracker(requestId, pipeline, send))
      catch { case e: IllegalStateException => send(Protocol.ExecutionError(requestId, e.getMessage)); return }
    handles.put(requestId, handle)

    // queue-position forwarder: report the initial position and every change
    // until the pipeline starts running (reference api/mod.rs:110-131)
    ec.execute { () =>
      var last = Int.MinValue
      var pos = handle.queuePosition
      while (pos > 0 && !closed) {
        if (pos != last) { send(Protocol.QueuePosition(requestId, pos)); last = pos }
        Thread.sleep(50)
        pos = handle.queuePosition
      }
      if (pos == 0) send(Protocol.QueuePosition(requestId, 0))
    }

    handle.result.onComplete { r =>
      handles.remove(requestId)
      r match {
        case Success(_) => send(Protocol.ExecutionSucceeded(requestId))
        case Failure(e) => send(Protocol.ExecutionError(requestId, String.valueOf(e.getMessage)))
      }
    }
  }

  /** Tracker → wire messages. Mirrors the executor's percent accounting
    * (total = sources + 2·stages + destination) so `progress_update.progress`
    * is the same 0-100 scale the reference reports.
    */
  private final class WireTracker(
      requestId: String, pipeline: graft.config.Aqueduct, send: AnyRef => Unit)
    extends ProgressTracker {
    private val total = math.max(1,
      pipeline.sources.size + 2 * pipeline.stages.map(_.size).sum + pipeline.destination.size)
    private val done = new java.util.concurrent.atomic.AtomicInteger(0)

    override def onProgress(event: ProgressEvent): Unit = {
      event match {
        case _: ProgressEvent.SourceRegistered | _: ProgressEvent.StageStarted |
             _: ProgressEvent.StageCompleted | _: ProgressEvent.DestinationCompleted =>
          done.incrementAndGet()
        case _ => ()
      }
      val pct = event match {
        case _: ProgressEvent.Completed => 100
        case _ => math.min(100, done.get() * 100 / total)
      }
      send(Protocol.ProgressUpdate(requestId, pct, event.toString))
    }

    override def onOutput(stageName: String, outputType: OutputType, body: String): Unit =
      Protocol.chunked(requestId, stageName, outputType.toString, body).foreach(send)
  }
}
