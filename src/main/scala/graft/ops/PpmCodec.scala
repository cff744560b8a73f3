package graft.ops

import java.nio.charset.StandardCharsets.US_ASCII

/** A real, pure-JVM binary image codec for the multimodal pipeline: PPM
  * (portable pixmap, `P6`) — the simplest standard raster format with a
  * textual header and a raw pixel plane. The container ships no native
  * image libraries, so this is the honest way to make the media path
  * decode REAL bytes end-to-end: the encoder below emits spec-conformant
  * P6 files (any external PPM viewer opens them), and the decoder is a
  * from-scratch header parser + pixel-plane reader that works on any P6
  * input, not just our own.
  *
  * Frame count rides in a standard PPM comment line (`# frames=N`) — PPM
  * has no multi-frame notion, so a video payload is modeled as frame 0's
  * pixmap plus the declared frame count, the thumbnail-plus-manifest
  * shape a real sampling pipeline ships between stages.
  */
object PpmCodec {

  /** What a decode yields: geometry, declared frame count, and a pixel
    * statistic (sum of all pixel-plane bytes) computed from the actual
    * raster — proof the decoder read the plane, not just the header. */
  final case class Decoded(width: Long, height: Long, nFrames: Long, pxSum: Long)

  /** Encode a P6 pixmap. The pixel plane is the rolling byte ramp
    * `(fill + i) mod 256` over plane offset `i` — deterministic,
    * non-constant, and its sum has a closed form the SQL oracle can
    * recompute (see [[pxSumClosedForm]]).
    */
  def encode(width: Int, height: Int, nFrames: Int, fill: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 1 && fill >= 0 && fill < 256,
      s"bad image spec: ${width}x$height frames=$nFrames fill=$fill")
    val header = s"P6\n# frames=$nFrames\n$width $height\n255\n".getBytes(US_ASCII)
    val n = width * height * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = ((fill + i) % 256).toByte
      i += 1
    }
    out
  }

  /** Parse a P6 payload: magic, header tokens with PPM comment handling
    * (`#` to end-of-line anywhere in the header), dimensions, maxval, then
    * the raw pixel plane, whose length is validated against the header and
    * summed. Throws on anything malformed — a corrupt payload must fail
    * loudly, not yield garbage features.
    */
  def decode(payload: Array[Byte]): Decoded = {
    var pos = 0
    var frames = 1L

    def fail(msg: String) =
      throw new IllegalArgumentException(s"not a valid P6 PPM: $msg (at byte $pos)")

    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'

    // skip whitespace and comment lines; comments declaring frames=N are
    // the (optional) multi-frame manifest
    def skipSeparators(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < payload.length && isWs(payload(pos))) { pos += 1; moved = true }
        if (pos < payload.length && payload(pos) == '#') {
          val start = pos
          while (pos < payload.length && payload(pos) != '\n') pos += 1
          val comment = new String(payload, start, pos - start, US_ASCII)
          val m = comment.trim.stripPrefix("#").trim
          if (m.startsWith("frames=")) frames = m.stripPrefix("frames=").toLong
          moved = true
        }
      }
    }

    def readInt(what: String): Long = {
      skipSeparators()
      val start = pos
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') pos += 1
      if (pos == start) fail(s"expected integer $what")
      new String(payload, start, pos - start, US_ASCII).toLong
    }

    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') fail("bad magic")
    pos = 2
    val w = readInt("width")
    val h = readInt("height")
    val maxval = readInt("maxval")
    if (w < 1 || h < 1) fail(s"bad dimensions ${w}x$h")
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    if (frames < 1) fail(s"bad frame count $frames")
    // exactly ONE whitespace byte separates maxval from the pixel plane
    if (pos >= payload.length || !isWs(payload(pos))) fail("missing plane separator")
    pos += 1
    val n = w * h * 3
    if (payload.length - pos != n)
      fail(s"pixel plane is ${payload.length - pos} bytes, header declares $n")
    var sum = 0L
    var i = pos
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    Decoded(w, h, frames, sum)
  }

  /** Closed form of the encoder's pixel-plane sum: Σ_{i<n} (fill+i) mod 256
    * = ⌊n/256⌋·32640 + T where T is the partial-cycle sum. The SQL oracle
    * emits this same arithmetic (see Multimodal.pxSumSql); this JVM twin
    * exists so a spec can pin encoder ⇒ decoder ⇒ closed form agreement.
    */
  def pxSumClosedForm(n: Long, fill: Long): Long = {
    val full = n / 256 * 32640L
    val r = n % 256
    val t =
      if (fill + r <= 256) r * fill + r * (r - 1) / 2
      else {
        val a = 256 - fill // bytes before the ramp wraps to 0
        a * fill + a * (a - 1) / 2 + (r - a) * (r - a - 1) / 2
      }
    full + t
  }
}
