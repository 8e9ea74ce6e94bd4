package graft.ops

/** Pure-JVM media codecs for the multimodal column pipeline: a real 24-bit
  * BMP writer/parser, a real RIFF/WAVE PCM16 writer/parser (with proper
  * chunk walking), and a minimal raw-frame video container. No Spark
  * dependency — these run inside `mapPartitions` decode seams
  * ([[Multimodal]]), one codec instance per partition.
  *
  * Why hand-rolled: the container has no image/audio libraries, and the
  * formats themselves are tiny public specs (BITMAPFILEHEADER +
  * BITMAPINFOHEADER; RIFF chunks). Decoding REAL bytes — padding rows,
  * bottom-up scanline order, little-endian chunk sizes, unknown-chunk
  * skipping — is exactly the work a production decode kernel does before
  * feature extraction, so the oracle gate exercises a genuine parse path:
  * the encoder generates pixels/samples from a closed-form integer formula
  * the DuckDB oracle can replay, and the Spark side recomputes every
  * feature FROM THE DECODED BYTES — any flip/padding/endianness bug in
  * either direction breaks the hash match.
  */
object MediaCodec {

  // ------------------------------------------------------------------ BMP

  /** Encode a top-down BGR pixel array (len = w*h*3) as a standard 24-bit
    * uncompressed BMP: 14-byte file header, 40-byte info header, bottom-up
    * scanlines padded to 4-byte boundaries. */
  def encodeBmp(w: Int, h: Int, bgr: Array[Byte]): Array[Byte] = {
    require(bgr.length == w * h * 3, s"need ${w * h * 3} bytes, got ${bgr.length}")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * h
    val fileSize = 54 + imageSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(fileSize).putShort(0).putShort(0).putInt(54) // file header
    out.putInt(40).putInt(w).putInt(h)                      // info header
    out.putShort(1).putShort(24).putInt(0).putInt(imageSize)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up
    while (y >= 0) {
      out.put(bgr, y * rowBytes, rowBytes)
      var p = 0
      while (p < pad) { out.put(0.toByte); p += 1 }
      y -= 1
    }
    out.array()
  }

  /** Parse a 24-bit uncompressed BMP back to (w, h, top-down BGR). Validates
    * magic, bit depth and compression; handles scanline padding and the
    * bottom-up row order. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val in = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(in.get() == 'B'.toByte && in.get() == 'M'.toByte, "not a BMP")
    in.getInt(); in.getShort(); in.getShort()
    val dataOffset = in.getInt()
    val hdrSize = in.getInt()
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val w = in.getInt()
    val h = in.getInt()
    require(h > 0, "top-down BMPs (negative height) unsupported")
    in.getShort()
    val bpp = in.getShort()
    require(bpp == 24, s"unsupported bit depth $bpp")
    val compression = in.getInt()
    require(compression == 0, s"unsupported compression $compression")
    val rowBytes = w * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    val bgr = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // scanline y from the top was written at bottom-up position h-1-y
      System.arraycopy(bytes, dataOffset + (h - 1 - y) * stride,
        bgr, y * rowBytes, rowBytes)
      y += 1
    }
    (w, h, bgr)
  }

  // ------------------------------------------------------------------ WAV

  /** Encode mono PCM16 samples as RIFF/WAVE. A vendor-style junk chunk
    * ("jnk ") is deliberately written between fmt and data so decoders that
    * assume data follows fmt directly break loudly — real WAV files carry
    * LIST/INFO chunks there, and [[decodeWav]] must walk past them. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val junk = 6 // even-sized junk payload
    val riffSize = 4 + (8 + 16) + (8 + junk) + (8 + dataBytes)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1)               // PCM
    out.putShort(1)               // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2)    // byte rate
    out.putShort(2)               // block align
    out.putShort(16)              // bits per sample
    out.put("jnk ".getBytes("US-ASCII")).putInt(junk)
    out.put(new Array[Byte](junk))
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Walk the RIFF chunk list (skipping unknown chunks, honoring the spec's
    * even-byte chunk alignment) to the fmt and data chunks; validate
    * PCM/mono/16-bit; return (sampleRate, samples). */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val in = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); in.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    in.getInt()
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (in.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val size = in.getInt()
      id match {
        case "fmt " =>
          val fmtEnd = in.position() + size
          val audioFormat = in.getShort()
          val channels = in.getShort()
          sampleRate = in.getInt()
          in.getInt(); in.getShort()
          val bits = in.getShort()
          require(audioFormat == 1, s"unsupported WAV format $audioFormat")
          require(channels == 1, s"unsupported channel count $channels")
          require(bits == 16, s"unsupported bit depth $bits")
          in.position(fmtEnd + (size & 1))
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = in.getShort(); i += 1 }
          in.position(in.position() + (size & 1))
        case _ => // skip unknown chunk (word-aligned)
          in.position(in.position() + size + (size & 1))
      }
    }
    require(sampleRate >= 0 && samples != null, "missing fmt or data chunk")
    (sampleRate, samples)
  }

  // ---------------------------------------------------------------- video

  /** Minimal raw-frame video container: "GVF1" magic, frame count, width,
    * height, then nFrames top-down BGR frames back to back. Stands in for
    * a real container the way the BMP/WAV stand in for real codecs: the
    * decoder validates the magic and geometry and slices frames by
    * offset — the shape a frame-sampling kernel needs. */
  def encodeVideo(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    frames.foreach(f => require(f.length == w * h * 3, "bad frame size"))
    val out = java.nio.ByteBuffer
      .allocate(16 + frames.length * w * h * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GVF1".getBytes("US-ASCII"))
    out.putInt(frames.length).putInt(w).putInt(h)
    frames.foreach(out.put)
    out.array()
  }

  /** Parse the container header; return (w, h, nFrames) plus a frame
    * accessor that slices lazily — a frame-SAMPLING reader touches only
    * the sampled frames' byte ranges. */
  def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, Int => Array[Byte]) = {
    val in = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); in.get(magic)
    require(new String(magic, "US-ASCII") == "GVF1", "not a GVF1 container")
    val nFrames = in.getInt()
    val w = in.getInt()
    val h = in.getInt()
    val frameBytes = w * h * 3
    require(bytes.length == 16 + nFrames * frameBytes, "truncated container")
    (w, h, nFrames,
      f => java.util.Arrays.copyOfRange(bytes,
        16 + f * frameBytes, 16 + (f + 1) * frameBytes))
  }

  // -------------------------------------------------- synthetic generators

  /** Deterministic pixel generator — the formula BOTH the encode seam and
    * the DuckDB oracle evaluate: channel c (0=B,1=G,2=R) of pixel (x, y)
    * of doc d is `(7d + 5x + 3y + 11c + xy·((d mod 13)+1)) mod 256`.
    * The xy mixing term varies the PATTERN per doc (a pure linear
    * gradient thresholds into near-identical aHashes corpus-wide, which
    * would make every image a near-dup of every other); (d mod 13) is
    * invariant under the +13f frame shift, so video frames share their
    * doc's mixing coefficient. Integer-only, so every downstream feature
    * (channel sums, aHash bands, frame signatures) is exact in both
    * engines. */
  def pixel(d: Long, x: Int, y: Int, c: Int): Int =
    (((d * 7 + x * 5 + y * 3 + c * 11 +
      x.toLong * y * ((d % 13) + 1)) % 256) + 256).toInt % 256

  /** Deterministic PCM sample generator: sample i of doc d is
    * `((31d + 17i) mod 2048) − 1024` — int16-ranged, sign-alternating
    * enough to give every doc real zero crossings. */
  def sample(d: Long, i: Int): Short =
    ((((d * 31 + i * 17) % 2048) + 2048) % 2048 - 1024).toShort

  /** Render one doc's synthetic image as top-down BGR bytes. */
  def renderFrame(d: Long, w: Int, h: Int, frameShift: Int = 0): Array[Byte] = {
    val bgr = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          bgr((y * w + x) * 3 + c) =
            pixel(d + frameShift.toLong * 13, x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    bgr
  }
}
