package graft.run

/** Minimal server-side RFC 6455 framing — just enough for a
  * reference-shaped client (JSON text messages over WebSocket,
  * aqueducts/schemas/src/protocol.rs:32-95 flow) to speak to [[Server]]
  * without any dependency beyond `java.*`.
  *
  * Scope (server role only): handshake accept-key computation, reading
  * client frames (which RFC 6455 §5.1 requires to be MASKED — unmasked
  * frames are a protocol error), writing unmasked server frames, text +
  * continuation reassembly, ping/pong and close handled by the caller via
  * opcodes. Extensions (compression) are never negotiated, so RSV bits are
  * rejected.
  */
private[run] object WebSocket {

  /** RFC 6455 §1.3 handshake GUID. */
  private val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  val OpContinuation = 0x0
  val OpText = 0x1
  val OpBinary = 0x2
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xa

  /** Frames above this are a client error, not a workload: execution
    * requests are rendered YAML configs (KBs), never tens of MBs.
    */
  val MaxFrameBytes: Int = 1 << 26

  final case class Frame(fin: Boolean, opcode: Int, payload: Array[Byte])

  /** `Sec-WebSocket-Accept` for a client's `Sec-WebSocket-Key` (§4.2.2). */
  def acceptKey(secWebSocketKey: String): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((secWebSocketKey.trim + Guid).getBytes("UTF-8")))

  /** Read one frame; None on clean EOF at a frame boundary.
    * @throws java.io.IOException on truncated/malformed/oversized frames
    */
  def readFrame(in: java.io.InputStream): Option[Frame] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val b1 = readByte(in)
    if ((b0 & 0x70) != 0)
      throw new java.io.IOException("RSV bits set without negotiated extension")
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    if (!masked)
      throw new java.io.IOException("client frames must be masked (RFC 6455 §5.1)")
    val len7 = b1 & 0x7f
    val len: Long =
      if (len7 < 126) len7
      else if (len7 == 126) ((readByte(in) & 0xffL) << 8) | (readByte(in) & 0xffL)
      else (0 until 8).foldLeft(0L)((acc, _) => (acc << 8) | (readByte(in) & 0xffL))
    if (len < 0 || len > MaxFrameBytes)
      throw new java.io.IOException(s"frame of $len bytes exceeds cap $MaxFrameBytes")
    val mask = Array.fill(4)(readByte(in).toByte)
    val payload = readFully(in, len.toInt)
    var i = 0
    while (i < payload.length) { payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1 }
    Some(Frame(fin, opcode, payload))
  }

  /** Write one unmasked server frame (§5.2, server-to-client). */
  def writeFrame(out: java.io.OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    out.write(0x80 | (opcode & 0x0f))
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < 65536) { out.write(126); out.write(n >> 8); out.write(n & 0xff) }
    else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  private def readByte(in: java.io.InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new java.io.IOException("truncated frame")
    b
  }

  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.IOException("truncated frame payload")
      off += r
    }
    buf
  }
}
