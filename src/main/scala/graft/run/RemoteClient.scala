package graft.run

/** Client side of the remote-execution wire: submit a rendered pipeline to a
  * [[Server]], stream progress/output, return the terminal outcome — the
  * counterpart of the reference CLI's remote mode
  * (aqueducts-cli/src/remote_exec.rs:15-140).
  *
  * Blocking and dependency-free; the CLI wires Ctrl+C to [[Handle.cancel]]
  * just as the reference races ctrl_c against the message loop.
  */
object RemoteClient {

  /** One remote submission. `result` blocks until the terminal message. */
  final class Handle private[RemoteClient] (
      val requestId: String,
      socket: java.net.Socket,
      out: java.io.BufferedWriter) {
    private[RemoteClient] val done =
      new java.util.concurrent.LinkedBlockingQueue[Either[String, Unit]](1)

    /** Ask the executor to cancel this submission (queued or running). */
    def cancel(): Unit = send(out, Protocol.write(Protocol.CancellationRequest(requestId)))

    /** Await the terminal message: Right(()) on success, Left(message) on
      * error (including cancellation).
      */
    def result(timeoutSeconds: Long = 3600): Either[String, Unit] = {
      val r = done.poll(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
      if (r == null) Left(s"no terminal message within ${timeoutSeconds}s") else r
    }

    def close(): Unit = try socket.close() catch { case _: java.io.IOException => () }
  }

  private def send(out: java.io.BufferedWriter, line: String): Unit =
    out.synchronized { out.write(line); out.write("\n"); out.flush() }

  /** Connect, authenticate, submit, and stream messages to `onMessage`
    * (progress updates, queue positions, output chunks) on a daemon thread.
    */
  def submit(
      host: String,
      port: Int,
      pipelineYaml: String,
      apiKey: Option[String] = None,
      onMessage: Protocol.ExecutorMessage => Unit = _ => ()): Handle = {
    val socket = new java.net.Socket(host, port)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
    apiKey.foreach(k => send(out, s"AUTH $k"))
    val requestId = s"req-${java.util.UUID.randomUUID()}"
    val handle = new Handle(requestId, socket, out)
    send(out, Protocol.write(Protocol.ExecutionRequest(requestId, pipelineYaml)))

    val reader = new Thread(s"graft-remote-$requestId") {
      override def run(): Unit = {
        try {
          var line = in.readLine()
          while (line != null) {
            Protocol.read(line) match {
              case m: Protocol.ExecutorMessage =>
                m match {
                  case Protocol.ExecutionSucceeded(id) if id == requestId =>
                    handle.done.offer(Right(())); return
                  case Protocol.ExecutionError(id, msg) if id == requestId || id.isEmpty =>
                    handle.done.offer(Left(msg)); return
                  case other => onMessage(other)
                }
              case _ => () // client messages echoed back: ignore
            }
            line = in.readLine()
          }
          handle.done.offer(Left("connection closed by executor"))
        } catch {
          case e: Exception => handle.done.offer(Left(s"connection failed: ${e.getMessage}"))
        }
      }
    }
    reader.setDaemon(true)
    reader.start()
    handle
  }

  /** Full CLI-shaped run: render the file client-side (templating), submit,
    * log progress to stderr and stage output to stdout, cancel on Ctrl+C.
    * Returns true on success.
    */
  def runRemote(
      file: java.nio.file.Path,
      params: Map[String, String],
      host: String,
      port: Int,
      apiKey: Option[String]): Boolean = {
    val raw = java.nio.file.Files.readString(file)
    // validate + render locally, ship the rendered document (the reference
    // ships the rendered Aqueduct struct, remote_exec.rs:21-23)
    graft.config.ConfigParser.fromFile(file, params)
    val rendered = graft.config.ConfigParser.substitute(raw, params)
    val handle = submit(host, port, rendered, apiKey, {
      case Protocol.QueuePosition(_, pos) =>
        System.err.println(s"[graft] queue position: $pos")
      case Protocol.ProgressUpdate(_, pct, event) =>
        System.err.println(s"[graft] $pct% $event")
      case c: Protocol.StageOutputChunk =>
        print(c.body)
        if (c.last) println()
      case _ => ()
    })
    val hook = new Thread(() => handle.cancel())
    Runtime.getRuntime.addShutdownHook(hook)
    try handle.result() match {
      case Right(()) => System.err.println("[graft] execution succeeded"); true
      case Left(msg) => System.err.println(s"[graft] execution failed: $msg"); false
    } finally {
      try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: IllegalStateException => () }
      handle.close()
    }
  }
}
