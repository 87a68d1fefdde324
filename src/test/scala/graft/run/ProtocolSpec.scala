package graft.run

import org.scalatest.funsuite.AnyFunSuite

class ProtocolSpec extends AnyFunSuite {
  import Protocol._

  test("all message types round-trip through JSON") {
    val msgs: Seq[AnyRef] = Seq(
      ExecutionRequest("r1", "version: v2\nsources: []\nstages: []"),
      CancellationRequest("r1"),
      QueuePosition("r1", 3),
      ProgressUpdate("r1", 57, "StageCompleted(agg,0,120)"),
      StageOutputChunk("r1", "agg", "show", 0, last = true, "body\nlines"),
      ExecutionSucceeded("r1"),
      ExecutionError("r1", "boom: \"quoted\""))
    msgs.foreach { m =>
      val json = write(m)
      assert(!json.contains("\n"), "wire format must be single-line")
      assert(read(json) == m, s"round-trip failed for $m")
    }
    assertThrows[IllegalArgumentException](read("""{"type": "bogus"}"""))
  }

  test("oversized outputs chunk at the 32k cap and reassemble") {
    val body = "x" * (MaxChunkChars * 2 + 17)
    val chunks = chunked("r1", "s", "show", body)
    assert(chunks.length == 3)
    assert(chunks.init.forall(!_.last) && chunks.last.last)
    assert(chunks.map(_.body).mkString == body)
    assert(chunks.map(_.seq) == Seq(0, 1, 2))
    assert(chunked("r1", "s", "show", "").length == 1) // empty output still signals end
  }
}
