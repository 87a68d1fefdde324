package graft.run

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.config.Aqueduct

/** Typed remote-execution protocol — the wire contract between a client and
  * a pipeline-executor service (reference:
  * aqueducts/schemas/src/protocol.rs:32-95; chunked outputs
  * aqueducts-executor/src/executor/progress_tracker.rs:131-162).
  *
  * Transport-agnostic: messages serialize to single-line JSON; pair with
  * any socket/HTTP layer around [[PipelineService]]. The fully-rendered
  * pipeline travels as its config document, exactly like the reference
  * ships the rendered `Aqueduct` struct.
  */
object Protocol {

  sealed trait ClientMessage
  final case class ExecutionRequest(requestId: String, pipelineYaml: String) extends ClientMessage
  final case class CancellationRequest(requestId: String) extends ClientMessage

  sealed trait ExecutorMessage
  final case class QueuePosition(requestId: String, position: Int) extends ExecutorMessage
  final case class ProgressUpdate(requestId: String, progress: Int, event: String) extends ExecutorMessage
  /** show/explain/schema output, chunked to `MaxChunkChars`. */
  final case class StageOutputChunk(requestId: String, stage: String, outputType: String,
      seq: Int, last: Boolean, body: String) extends ExecutorMessage
  final case class ExecutionSucceeded(requestId: String) extends ExecutorMessage
  final case class ExecutionError(requestId: String, message: String) extends ExecutorMessage

  val MaxChunkChars = 32 * 1024 // reference chunk cap (progress_tracker.rs:9)

  def chunked(requestId: String, stage: String, outputType: String, body: String): Seq[StageOutputChunk] = {
    val parts = body.grouped(MaxChunkChars).toSeq match {
      case Seq() => Seq("")
      case ps => ps
    }
    parts.zipWithIndex.map { case (p, i) =>
      StageOutputChunk(requestId, stage, outputType, i, i == parts.size - 1, p)
    }
  }

  // ------------------------------------------------------------------ serde

  private val mapper = new ObjectMapper()

  def write(m: AnyRef): String = {
    val node = mapper.createObjectNode()
    node.put("type", typeTag(m))
    m match {
      case ExecutionRequest(id, yaml) => node.put("request_id", id).put("pipeline", yaml)
      case CancellationRequest(id) => node.put("request_id", id)
      case QueuePosition(id, pos) => node.put("request_id", id).put("position", pos)
      case ProgressUpdate(id, p, e) => node.put("request_id", id).put("progress", p).put("event", e)
      case c: StageOutputChunk =>
        node.put("request_id", c.requestId).put("stage", c.stage)
          .put("output_type", c.outputType).put("seq", c.seq)
          .put("last", c.last).put("body", c.body)
      case ExecutionSucceeded(id) => node.put("request_id", id)
      case ExecutionError(id, msg) => node.put("request_id", id).put("message", msg)
    }
    mapper.writeValueAsString(node)
  }

  def read(json: String): AnyRef = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    def s(f: String) = n.get(f).asText()
    n.get("type").asText() match {
      case "execution_request" => ExecutionRequest(s("request_id"), s("pipeline"))
      case "cancellation_request" => CancellationRequest(s("request_id"))
      case "queue_position" => QueuePosition(s("request_id"), n.get("position").asInt())
      case "progress_update" => ProgressUpdate(s("request_id"), n.get("progress").asInt(), s("event"))
      case "stage_output_chunk" => StageOutputChunk(s("request_id"), s("stage"),
        s("output_type"), n.get("seq").asInt(), n.get("last").asBoolean(), s("body"))
      case "execution_succeeded" => ExecutionSucceeded(s("request_id"))
      case "execution_error" => ExecutionError(s("request_id"), s("message"))
      case other => throw new IllegalArgumentException(s"Unknown message type: $other")
    }
  }

  private def typeTag(m: AnyRef): String = m match {
    case _: ExecutionRequest => "execution_request"
    case _: CancellationRequest => "cancellation_request"
    case _: QueuePosition => "queue_position"
    case _: ProgressUpdate => "progress_update"
    case _: StageOutputChunk => "stage_output_chunk"
    case _: ExecutionSucceeded => "execution_succeeded"
    case _: ExecutionError => "execution_error"
    case other => throw new IllegalArgumentException(s"Not a protocol message: $other")
  }
}
