package graft.core

import org.apache.spark.sql.SparkSession

/** Binary protobuf quad stream — the analog of the reference's `pq` dump
  * format (`cayley conv -i data.nq.gz -o data.pq.gz`,
  * /root/reference/docs/usage/advanced-use.md:36; the format itself lives
  * in the external cayleygraph/quad module, not vendored in the
  * reference). This implements the protobuf WIRE format from the public
  * spec rather than linking a proto library:
  *
  *   file   := magic frame*            magic = 0x00 'p' 'q' 0x30 ("\0pq0")
  *   frame  := varint(len) message[len]
  *   message:= (field-tag term)*       tags 1..4 = s/p/o/label,
  *                                     wire type 2 (length-delimited)
  *   term   := varint(len) utf8[len]   N-Quads term syntax, so every value
  *                                     kind round-trips exactly
  *
  * Gzip wraps the whole stream when the path ends `.gz`, mirroring the
  * reference's `.pq.gz` convention. Like the reference's, the stream is
  * not splittable — the READ side repartitions after parse (same policy as
  * the gz N-Quads reader); the write side serializes through the driver in
  * one pass (a dump/interchange format, not the working store — the
  * working store is the bucketed Parquet layout).
  */
object Pquads {
  private val Magic: Array[Byte] = Array(0x00, 'p'.toByte, 'q'.toByte, '0'.toByte)

  private def writeVarint(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarint(in: java.io.InputStream): Long = {
    var shift = 0
    var result = 0L
    var b = in.read()
    if (b < 0) return -1L // clean EOF at a frame boundary
    while (true) {
      result |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("pq: varint overflow")
      b = in.read()
      if (b < 0) throw new IllegalArgumentException("pq: truncated varint")
    }
    result
  }

  private def frameOf(terms: Seq[(Int, String)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    terms.foreach { case (field, term) =>
      val bytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      body.write((field << 3) | 2) // wire type 2: length-delimited
      writeVarint(body, bytes.length.toLong)
      body.write(bytes)
    }
    body.toByteArray
  }

  /** Serialize the graph as a pq stream. Quad rows stream from the
    * cluster (term rendering is distributed); only the framing runs on
    * the driver.
    */
  def write(g: Graph, out0: java.io.OutputStream): Unit = {
    out0.write(Magic)
    Formats.quadTerms(g).toLocalIterator().forEachRemaining { r =>
      val terms = Seq(1 -> r.getString(0), 2 -> r.getString(1),
        3 -> r.getString(2)) ++
        (if (r.isNullAt(3)) Nil else Seq(4 -> r.getString(3)))
      val frame = frameOf(terms)
      writeVarint(out0, frame.length.toLong)
      out0.write(frame)
    }
    out0.flush()
  }

  /** Write to a file path; gzip when the path ends `.gz`. */
  def writeFile(g: Graph, path: String): Unit = {
    val raw = java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))
    val out = if (path.endsWith(".gz"))
      new java.util.zip.GZIPOutputStream(raw, 1 << 16) else raw
    try write(g, out) finally out.close()
  }

  /** Parse one pq stream into quads (driver-side framing; the graph build
    * distributes from the parsed rows as usual).
    */
  def read(in0: java.io.InputStream): Seq[NQuads.ParsedQuad] = {
    val in = new java.io.BufferedInputStream(in0, 1 << 16)
    val magic = in.readNBytes(4)
    require(java.util.Arrays.equals(magic, Magic),
      "pq: bad magic (not a pq stream)")
    val quads = Vector.newBuilder[NQuads.ParsedQuad]
    var done = false
    while (!done) {
      val len = readVarint(in)
      if (len < 0) done = true
      else {
        val frame = in.readNBytes(len.toInt)
        require(frame.length == len.toInt, "pq: truncated frame")
        var pos = 0
        val fields = scala.collection.mutable.Map.empty[Int, String]
        while (pos < frame.length) {
          val tag = frame(pos) & 0xFF
          pos += 1
          require((tag & 7) == 2, s"pq: unsupported wire type ${tag & 7}")
          // inline varint over the byte array
          var shift = 0; var flen = 0L
          var b = frame(pos) & 0xFF; pos += 1
          while ({ flen |= (b & 0x7FL) << shift; (b & 0x80) != 0 }) {
            shift += 7; b = frame(pos) & 0xFF; pos += 1
          }
          fields(tag >> 3) = new String(frame, pos, flen.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          pos += flen.toInt
        }
        for (s <- fields.get(1); p <- fields.get(2); o <- fields.get(3))
          quads += NQuads.ParsedQuad(
            NQuads.parseTermOrString(s), NQuads.parseTermOrString(p),
            NQuads.parseTermOrString(o),
            fields.get(4).map(NQuads.parseTermOrString))
      }
    }
    quads.result()
  }

  /** Read a pq file (gunzip when the path ends `.gz`) into a Graph. */
  def readFile(spark: SparkSession, path: String): Graph = {
    val raw = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    val in = if (path.endsWith(".gz"))
      new java.util.zip.GZIPInputStream(raw, 1 << 16) else raw
    try Graph.fromQuads(spark, read(in)) finally in.close()
  }
}
