package graft.run

import graft.SparkSpec

/** End-to-end wire tests: a real socket client drives pipelines through
  * [[Server]] → [[PipelineService]] → [[Runner]], observing queue positions,
  * progress, chunked stage output, terminal messages, and cancellation —
  * the integration surface of the reference executor's WebSocket endpoint.
  */
class ServerSpec extends SparkSpec {

  private def connect(port: Int) = {
    val s = new java.net.Socket("127.0.0.1", port)
    s.setSoTimeout(120000)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
    (s, in, out)
  }

  private def sendLine(out: java.io.BufferedWriter, line: String): Unit = {
    out.write(line); out.write("\n"); out.flush()
  }

  private def yamlOf(csv: java.nio.file.Path, prefix: String, query: String, show: Int = 0): String =
    s"""version: "v2"
       |sources:
       |  - type: file
       |    name: ${prefix}_src
       |    format:
       |      type: csv
       |      options: { has_header: true }
       |    location: $csv
       |stages:
       |  - - name: ${prefix}_stage
       |      query: "$query"
       |${if (show > 0) s"      show: $show" else ""}
       |""".stripMargin

  /** Read server messages for `requestId` until a terminal one arrives. */
  private def drain(in: java.io.BufferedReader, requestId: String): Seq[AnyRef] = {
    val seen = Seq.newBuilder[AnyRef]
    var done = false
    while (!done) {
      val line = in.readLine()
      assert(line != null, s"connection closed before terminal message for $requestId")
      val m = Protocol.read(line)
      seen += m
      m match {
        case Protocol.ExecutionSucceeded(id) if id == requestId => done = true
        case Protocol.ExecutionError(id, _) if id == requestId => done = true
        case _ => ()
      }
    }
    seen.result()
  }

  test("execution over the wire: queue position, progress to 100, chunked show output, succeeded") {
    val server = new Server(spark)
    try {
      val csv = writeFixtureCsv(tmpDir("srv-e2e"))
      val (sock, in, out) = connect(server.boundPort)
      try {
        sendLine(out, "HEALTH")
        assert(in.readLine().contains("\"OK\""))

        val yaml = yamlOf(csv, "srv1", "SELECT active, count(*) AS n FROM srv1_src GROUP BY active ORDER BY active", show = 5)
        sendLine(out, Protocol.write(Protocol.ExecutionRequest("req-1", yaml)))
        val msgs = drain(in, "req-1")

        assert(msgs.exists { case Protocol.QueuePosition("req-1", p) => p >= 0; case _ => false })
        val progress = msgs.collect { case Protocol.ProgressUpdate("req-1", pct, _) => pct }
        assert(progress.nonEmpty && progress.last == 100, progress)
        val chunks = msgs.collect { case c: Protocol.StageOutputChunk => c }
        assert(chunks.nonEmpty && chunks.head.outputType == "Show")
        assert(chunks.map(_.body).mkString.contains("true")) // the shown rows
        assert(msgs.last == Protocol.ExecutionSucceeded("req-1"))
      } finally sock.close()
    } finally server.close()
  }

  test("queued request reports its position and can be cancelled over the wire") {
    spark.udf.register("graft_srv_sleep", (x: Long) => { Thread.sleep(8); x })
    val server = new Server(spark)
    try {
      val csv = writeFixtureCsv(tmpDir("srv-cancel"))
      val (sock, in, out) = connect(server.boundPort)
      try {
        // head-of-queue: ~8ms × 200 evaluations keeps the worker busy
        val slow = yamlOf(csv, "srvslow",
          "SELECT sum(graft_srv_sleep(CAST(id AS BIGINT) + s)) AS n FROM srvslow_src LATERAL VIEW explode(sequence(1, 40)) t AS s")
        val quick = yamlOf(csv, "srvq", "SELECT count(*) AS n FROM srvq_src")
        sendLine(out, Protocol.write(Protocol.ExecutionRequest("req-slow", slow)))
        sendLine(out, Protocol.write(Protocol.ExecutionRequest("req-b", quick)))
        sendLine(out, Protocol.write(Protocol.CancellationRequest("req-b")))

        val msgs = drain(in, "req-b")
        // the queued request observed a position behind the running head
        assert(msgs.exists { case Protocol.QueuePosition("req-b", p) => p >= 1; case _ => false },
          msgs.mkString("\n"))
        val terminal = msgs.collect { case Protocol.ExecutionError("req-b", m) => m }
        assert(terminal.nonEmpty && terminal.head.contains("cancelled"), msgs.mkString("\n"))
        // the head of the queue is unaffected
        val rest = drain(in, "req-slow")
        assert(rest.exists { case Protocol.ExecutionSucceeded("req-slow") => true; case _ => false })
      } finally sock.close()
    } finally server.close()
  }

  test("API key: wrong key refused, correct key accepted") {
    val server = new Server(spark, apiKey = Some("sekrit"))
    try {
      val csv = writeFixtureCsv(tmpDir("srv-auth"))
      val (bad, badIn, badOut) = connect(server.boundPort)
      try {
        sendLine(badOut, "AUTH wrong")
        val resp = badIn.readLine()
        assert(resp != null && resp.contains("unauthorized"))
        assert(badIn.readLine() == null) // server closed the connection
      } finally bad.close()

      val (ok, okIn, okOut) = connect(server.boundPort)
      try {
        sendLine(okOut, "AUTH sekrit")
        sendLine(okOut, Protocol.write(Protocol.ExecutionRequest("req-auth",
          yamlOf(csv, "srva", "SELECT count(*) AS n FROM srva_src"))))
        val msgs = drain(okIn, "req-auth")
        assert(msgs.last == Protocol.ExecutionSucceeded("req-auth"))
      } finally ok.close()
    } finally server.close()
  }

  test("RemoteClient round trip: submit, stream progress, succeed; cancel path errors") {
    spark.udf.register("graft_rc_sleep", (x: Long) => { Thread.sleep(8); x })
    val server = new Server(spark, apiKey = Some("rckey"))
    try {
      val csv = writeFixtureCsv(tmpDir("srv-client"))
      val progress = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val h1 = RemoteClient.submit("127.0.0.1", server.boundPort,
        yamlOf(csv, "rc1", "SELECT count(*) AS n FROM rc1_src"), Some("rckey"), {
          case Protocol.ProgressUpdate(_, pct, _) => progress.add(pct)
          case _ => ()
        })
      assert(h1.result(120) == Right(()))
      assert(!progress.isEmpty && progress.toArray.last == 100)
      h1.close()

      // occupy the worker, then cancel a queued submission from the client
      val slow = RemoteClient.submit("127.0.0.1", server.boundPort,
        yamlOf(csv, "rcslow",
          "SELECT sum(graft_rc_sleep(CAST(id AS BIGINT) + s)) AS n FROM rcslow_src LATERAL VIEW explode(sequence(1, 40)) t AS s"),
        Some("rckey"))
      val queued = RemoteClient.submit("127.0.0.1", server.boundPort,
        yamlOf(csv, "rcq", "SELECT count(*) AS n FROM rcq_src"), Some("rckey"))
      queued.cancel()
      val cancelled = queued.result(120)
      assert(cancelled.isLeft && cancelled.left.exists(_.contains("cancelled")), cancelled)
      assert(slow.result(120) == Right(()))
      slow.close(); queued.close()
    } finally server.close()
  }

  test("malformed pipeline and malformed message produce execution_error, server keeps serving") {
    val server = new Server(spark)
    try {
      val (sock, in, out) = connect(server.boundPort)
      try {
        sendLine(out, Protocol.write(Protocol.ExecutionRequest("req-bad", "stages: [[{]]")))
        val m1 = drain(in, "req-bad")
        assert(m1.exists { case Protocol.ExecutionError("req-bad", _) => true; case _ => false })

        sendLine(out, """{"type":"mystery"}""")
        val err = Protocol.read(in.readLine())
        assert(err.isInstanceOf[Protocol.ExecutionError])

        // still alive afterwards
        sendLine(out, "HEALTH")
        assert(in.readLine().contains("\"OK\""))
      } finally sock.close()
    } finally server.close()
  }
}
