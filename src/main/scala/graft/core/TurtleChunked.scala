package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Chunked, fully-parallel parse of ONE large Turtle/TriG file.
  *
  * Turtle is not line-splittable (statements span lines; strings and
  * comments can contain fake terminators), so the naive distributed unit
  * is the whole file — a one-task bottleneck for a multi-GB dump. This
  * reader splits a single file into byte ranges and parses them in
  * parallel without ever scanning the file sequentially on one machine,
  * using the classic parallel-lexing trick: compose per-chunk automaton
  * state summaries on the driver.
  *
  * Four distributed passes, each over the chunk ranges:
  *
  *  1. SUMMARIZE — each chunk computes, for every possible starting
  *     lexical state (inside a comment / short or long string of either
  *     quote / IRI / escape-pending / quote-run, 21 states total), the
  *     ending state and the bracket-depth delta. Runs of "ordinary"
  *     bytes collapse to one transition (all states are fixed points
  *     under non-structural bytes), so the scan is a table-driven skip.
  *     The driver folds the summaries left-to-right: chunk i's TRUE
  *     starting state and depth.
  *  2. BOUNDARIES — knowing its true start, each chunk finds its first
  *     statement boundary: a '.' followed by whitespace/'#'/EOF at
  *     bracket depth 0 in normal state, or a '}' closing a TriG graph
  *     block to depth 0. Both are unambiguous statement ends in Turtle
  *     ('.' in decimals and prefixed-name locals is never followed by
  *     whitespace; '.' in strings/comments/IRIs is shielded by the
  *     automaton). The check is CONSERVATIVE — missing an exotic
  *     boundary only makes a parse range larger, never wrong. The
  *     driver turns the first-boundary offsets into statement-aligned
  *     parse ranges covering the file.
  *  3. DIRECTIVES — each range (now starting at a statement boundary,
  *     i.e. automaton state normal/depth 0) scans itself for
  *     `@prefix`/`@base`/`PREFIX`/`BASE` directives with their absolute
  *     offsets. The driver folds them in offset order into a per-range
  *     PREAMBLE (every directive declared before the range starts).
  *  4. PARSE — each range decodes its bytes (boundaries are ASCII, so
  *     never mid-UTF-8-char), prepends its preamble, and runs the
  *     ordinary [[Turtle.parse]]: labeled bnodes salt with the FILE
  *     salt (labels are document-scoped and unify across chunks),
  *     generated bnodes with a per-range salt (never collide).
  *
  * Malformed nesting (bracket depth going negative) or a directive
  * larger than a chunk makes the scan throw [[TtlChunkFallback]]; the
  * caller degrades to the whole-file parse, so chunking can never
  * change the accepted language — only the parallelism.
  */
object TurtleChunked {
  /** Signals that a file cannot be safely chunked; callers fall back to
    * the single-task wholetext parse.
    */
  final class TtlChunkFallback(msg: String) extends Exception(msg)

  // ------------------------------------------------ lexical automaton

  private[core] object TtlScan {
    // Normal / comment / IRI
    final val N = 0; final val C = 1; final val IRI = 2
    // single-quote family: 1 or 2 quotes seen from N, short string,
    // escape, long string, its escape, 1/2/3+ closing-quote run
    final val S1 = 3; final val S2 = 4; final val SQ = 5; final val SQe = 6
    final val LSQ = 7; final val LSQe = 8
    final val LS1 = 9; final val LS2 = 10; final val LS3 = 11
    // double-quote family, mirrored
    final val D1 = 12; final val D2 = 13; final val DQ = 14; final val DQe = 15
    final val LDQ = 16; final val LDQe = 17
    final val LD1 = 18; final val LD2 = 19; final val LD3 = 20
    // PN_LOCAL escape pending: '\' seen in N consumes the next byte
    // (the parser accepts backslash escapes in prefixed-name locals,
    // Turtle.scala prefixedName() — `ex:o\. .` must not read the
    // escaped dot as a statement terminator)
    final val NE = 21
    final val NStates = 22

    /** Bytes that can change ANY state or the bracket depth; runs of
      * everything else are skipped in one step.
      */
    private val interesting: Array[Boolean] = {
      val a = new Array[Boolean](256)
      "#<>\"'\\\n[](){}".foreach(c => a(c) = true)
      a
    }

    /** One byte, one transition. Quote-run states make the step
      * lookahead-free so chunk edges compose exactly: a long string's
      * closing run follows the parser's "the LAST three quotes close"
      * rule (Turtle.scala literal()), and `""`/`''` is an empty short
      * string whose follower re-processes in N.
      */
    def stepChar(st: Int, b: Int): Int = st match {
      case N => b match {
        case '#'  => C
        case '<'  => IRI
        case '"'  => D1
        case '\'' => S1
        case '\\' => NE
        case _    => N
      }
      case NE  => N // escaped byte consumed, whatever it was
      case C   => if (b == '\n') N else C
      case IRI => if (b == '>') N else IRI
      // double-quote family
      case D1 => b match {
        case '"' => D2; case '\\' => DQe; case _ => DQ
      }
      case D2  => if (b == '"') LDQ else stepChar(N, b) // "" closed
      case DQ  => b match { case '"' => N; case '\\' => DQe; case _ => DQ }
      case DQe => DQ
      case LDQ => b match {
        case '"' => LD1; case '\\' => LDQe; case _ => LDQ
      }
      case LD1 => b match {
        case '"' => LD2; case '\\' => LDQe; case _ => LDQ
      }
      case LD2 => b match {
        case '"' => LD3; case '\\' => LDQe; case _ => LDQ
      }
      case LD3  => if (b == '"') LD3 else stepChar(N, b) // closed, reprocess
      case LDQe => LDQ
      // single-quote family (mirror)
      case S1 => b match {
        case '\'' => S2; case '\\' => SQe; case _ => SQ
      }
      case S2  => if (b == '\'') LSQ else stepChar(N, b)
      case SQ  => b match { case '\'' => N; case '\\' => SQe; case _ => SQ }
      case SQe => SQ
      case LSQ => b match {
        case '\'' => LS1; case '\\' => LSQe; case _ => LSQ
      }
      case LS1 => b match {
        case '\'' => LS2; case '\\' => LSQe; case _ => LSQ
      }
      case LS2 => b match {
        case '\'' => LS3; case '\\' => LSQe; case _ => LSQ
      }
      case LS3  => if (b == '\'') LS3 else stepChar(N, b)
      case LSQe => LSQ
    }

    private val ordinaryMap: Array[Int] =
      Array.tabulate(NStates)(st => stepChar(st, 'a'))

    /** Pass-1 chunk summary: for each start state, the end state and
      * the bracket-depth delta accumulated while that state path was in
      * N. One scan, all 21 hypotheses tracked together.
      */
    def summarize(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
      val cur = Array.tabulate(NStates)(identity)
      val depth = new Array[Int](NStates)
      var i = 0
      val end = bytes.length
      while (i < end) {
        val b = bytes(i) & 0xFF
        if (interesting(b)) {
          var s = 0
          while (s < NStates) {
            val c0 = cur(s)
            if (c0 == N) {
              if (b == '[' || b == '(' || b == '{') depth(s) += 1
              else if (b == ']' || b == ')' || b == '}') depth(s) -= 1
            }
            cur(s) = stepChar(c0, b)
            s += 1
          }
          i += 1
        } else {
          var s = 0
          while (s < NStates) { cur(s) = ordinaryMap(cur(s)); s += 1 }
          i += 1
          while (i < end && !interesting(bytes(i) & 0xFF)) i += 1
        }
      }
      (cur, depth)
    }

    /** Is byte `i` a statement-terminating '.'? True when the next byte
      * is whitespace or a comment start — or the file ends there.
      */
    private def dotTerminates(bytes: Array[Byte], i: Int,
                              atFileEnd: Boolean): Boolean = {
      if (i + 1 >= bytes.length) return atFileEnd
      val n = bytes(i + 1) & 0xFF
      n == ' ' || n == '\t' || n == '\n' || n == '\r' || n == '#'
    }

    /** Pass 2: from the TRUE (state, depth) at this chunk's first byte,
      * the absolute offset of the first statement start inside
      * [0, coreLen) — or -1 if the chunk contains none. `bytes` carries
      * lookahead past coreLen for the terminator peek.
      */
    def firstBoundary(bytes: Array[Byte], coreLen: Int, startState: Int,
                      startDepth: Int, baseOffset: Long,
                      lastChunk: Boolean): Long = {
      var st = startState; var depth = startDepth
      var i = 0
      while (i < coreLen) {
        val b = bytes(i) & 0xFF
        if (st == N) {
          b match {
            case '.' =>
              if (depth == 0 && dotTerminates(bytes, i, lastChunk))
                return baseOffset + i + 1
            case '[' | '(' | '{' => depth += 1
            case ']' | ')' => depth -= 1
              if (depth < 0) throw new TtlChunkFallback(
                s"unbalanced bracket at ${baseOffset + i}")
            case '}' => depth -= 1
              if (depth < 0) throw new TtlChunkFallback(
                s"unbalanced '}' at ${baseOffset + i}")
              if (depth == 0) return baseOffset + i + 1 // graph block end
            case _ => st = stepChar(N, b)
          }
        } else st = stepChar(st, b)
        i += 1
      }
      -1L
    }

    /** Directive matcher at a statement start: returns the end offset
      * (exclusive) of an `@prefix`/`@base`/`PREFIX`/`BASE` directive
      * beginning at `p`, or -1 if the statement is not a directive.
      * Throws [[TtlChunkFallback]] if a directive runs past the buffer.
      */
    private def matchDirective(bytes: Array[Byte], p: Int): Int = {
      def at(i: Int, s: String, ci: Boolean): Boolean =
        i + s.length <= bytes.length && s.indices.forall { k =>
          val b = bytes(i + k) & 0xFF
          if (ci) Character.toUpperCase(b) == Character.toUpperCase(s(k))
          else b == s(k)
        }
      def isWs(b: Int) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      def need(i: Int): Int =
        if (i < bytes.length) bytes(i) & 0xFF
        else throw new TtlChunkFallback("directive runs past chunk buffer")
      def skipWs(i0: Int): Int = {
        var i = i0
        while (isWs(need(i))) i += 1
        i
      }
      def iriEnd(i0: Int): Int = { // i0 at '<'; returns index after '>'
        if (need(i0) != '<') return -1
        var i = i0 + 1
        while (need(i) != '>') i += 1
        i + 1
      }
      // @prefix name: <iri> .   |   @base <iri> .
      if (at(p, "@prefix", ci = false) || at(p, "@base", ci = false)) {
        val kw = if (bytes(p + 1) == 'p') 7 else 5
        var i = skipWs(p + kw)
        if (kw == 7) { // name:
          while (need(i) != ':') i += 1
          i = skipWs(i + 1)
        }
        i = iriEnd(i)
        if (i < 0) return -1
        i = skipWs(i)
        if (need(i) != '.') return -1
        i + 1
      } else if (at(p, "PREFIX", ci = true) && isWs(need(p + 6))) {
        var i = skipWs(p + 6)
        while (need(i) != ':') i += 1
        i = skipWs(i + 1)
        iriEnd(i)
      } else if (at(p, "BASE", ci = true) && isWs(need(p + 4))) {
        iriEnd(skipWs(p + 4))
      } else -1
    }

    /** Pass 3: directives of one statement-aligned range (state N,
      * depth 0 at offset 0 by construction). Tracks statement starts
      * with the same boundary rules as [[firstBoundary]] and captures
      * directive texts with their absolute offsets.
      */
    def scanDirectives(bytes: Array[Byte], baseOffset: Long,
                       lastChunk: Boolean): Seq[(Long, String)] = {
      val out = mutable.ArrayBuffer.empty[(Long, String)]
      var st = N; var depth = 0
      var i = 0
      var atStart = true
      while (i < bytes.length) {
        if (atStart && st == N && depth == 0) {
          // skip whitespace and comments to the statement's first token
          var p = i
          var skipping = true
          while (skipping && p < bytes.length) {
            val b = bytes(p) & 0xFF
            if (b == ' ' || b == '\t' || b == '\n' || b == '\r') p += 1
            else if (b == '#') {
              while (p < bytes.length && bytes(p) != '\n') p += 1
            } else skipping = false
          }
          if (p >= bytes.length) return out.toSeq
          val end = matchDirective(bytes, p)
          if (end > 0) {
            out += ((baseOffset + p,
              new String(bytes, p, end - p, "UTF-8")))
            i = end // stay atStart: directives may chain
          } else { atStart = false; i = p }
        } else {
          val b = bytes(i) & 0xFF
          if (st == N) {
            b match {
              case '.' =>
                if (depth == 0 && dotTerminates(bytes, i, lastChunk))
                  atStart = true
              case '[' | '(' | '{' => depth += 1
              case ']' | ')' | '}' => depth -= 1
                if (depth < 0) throw new TtlChunkFallback(
                  s"unbalanced bracket at ${baseOffset + i}")
                if (b == '}' && depth == 0) atStart = true
              case _ => st = stepChar(N, b)
            }
          } else st = stepChar(st, b)
          i += 1
        }
      }
      out.toSeq
    }
  }

  // ---------------------------------------------------- hadoop access

  /** Minimal serializable Hadoop Configuration carrier (the stock one
    * is private[spark]) — standard public pattern: write/readFields
    * through Java serialization.
    */
  private final class SerializableHadoopConf(
      @transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  private def readRange(conf: org.apache.hadoop.conf.Configuration,
                        file: String, from: Long, len: Int): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len)
      in.readFully(from, buf, 0, len)
      buf
    } finally in.close()
  }

  // --------------------------------------------------------- pipeline

  /** Lookahead past a chunk for terminator peeks and straddling
    * directives; a directive longer than this falls back to wholetext.
    */
  private val Lookahead = 64 * 1024

  /** Parse one large Turtle/TriG file into QuadRow rows, chunked.
    * `labelSalt` scopes the file's labeled bnodes (same contract as
    * [[Turtle.read]]'s per-file salt).
    */
  private[core] def chunkRows(spark: SparkSession, file: String, fileLen: Long,
                              chunkBytes: Long, labelSalt: String)
      : DataFrame = {
    import spark.implicits._
    import TtlScan._
    val sc = spark.sparkContext
    val conf = new SerializableHadoopConf(sc.hadoopConfiguration)
    val nChunks = ((fileLen + chunkBytes - 1) / chunkBytes).toInt
    val chunkStarts = (0 until nChunks).map(_.toLong * chunkBytes)

    // pass 1: per-chunk state summaries, composed on the driver
    val summaries = sc.parallelize(chunkStarts.zipWithIndex, nChunks)
      .map { case (s, idx) =>
        val len = (math.min(s + chunkBytes, fileLen) - s).toInt
        idx -> summarize(readRange(conf.conf, file, s, len))
      }.collect().sortBy(_._1).map(_._2)
    val startStates = new Array[Int](nChunks)
    val startDepths = new Array[Int](nChunks)
    var st = N; var d = 0
    for (i <- 0 until nChunks) {
      startStates(i) = st; startDepths(i) = d
      val (endSt, delta) = summaries(i)
      d += delta(st); st = endSt(st)
      if (d < 0) throw new TtlChunkFallback(s"depth negative after chunk $i")
    }

    // pass 2: first statement start per chunk (chunk 0 starts a range
    // at offset 0 by definition)
    val bounds = sc.parallelize((1 until nChunks).toSeq, math.max(nChunks - 1, 1))
      .map { idx =>
        val s = chunkStarts(idx)
        val core = (math.min(s + chunkBytes, fileLen) - s).toInt
        val len = (math.min(s + chunkBytes + Lookahead, fileLen) - s).toInt
        val last = s + len >= fileLen
        idx -> firstBoundary(readRange(conf.conf, file, s, len), core,
          startStates(idx), startDepths(idx), s, last)
      }.collect().sortBy(_._1).map(_._2).filter(_ >= 0)
    val rangeStarts = (0L +: bounds).distinct
    val ranges = rangeStarts.zip(rangeStarts.drop(1) :+ fileLen)
      .filter { case (a, b) => b > a }

    // pass 3: directives per statement-aligned range, folded in offset
    // order into per-range preambles
    val directives = sc.parallelize(ranges.zipWithIndex, ranges.size)
      .flatMap { case ((from, to), _) =>
        val last = to >= fileLen
        scanDirectives(readRange(conf.conf, file, from, (to - from).toInt),
          from, last)
      }.collect().sortBy(_._1)
    val preambles: Seq[String] = ranges.map { case (from, _) =>
      directives.takeWhile(_._1 < from).map(_._2).mkString("", "\n", "\n")
    }

    // pass 4: parse each range with its preamble; labeled bnodes share
    // the file salt, generated ones get a per-range salt
    sc.parallelize(ranges.zip(preambles).zipWithIndex, ranges.size)
      .flatMap { case (((from, to), preamble), idx) =>
        val text = new String(
          readRange(conf.conf, file, from, (to - from).toInt), "UTF-8")
        Turtle.parse(preamble + text, bnodeSalt = labelSalt,
          genSalt = s"${labelSalt}c$idx").map(Graph.QuadRow(_))
      }.toDF()
  }

  private def isChunkFallback(e: Throwable): Boolean =
    e != null && (e.isInstanceOf[TtlChunkFallback] ||
      isChunkFallback(e.getCause))

  /** Chunk-parse `file` if possible, falling back to the single-task
    * wholetext parse when the scanner reports the file unsafe to split
    * (the fallback may surface from an executor wrapped in a
    * SparkException — unwrap through the cause chain).
    */
  private[core] def readFileChunked(spark: SparkSession, file: String,
                                    fileLen: Long, chunkBytes: Long,
                                    labelSalt: String): DataFrame = {
    import spark.implicits._
    try chunkRows(spark, file, fileLen, chunkBytes, labelSalt)
    catch {
      case e: Throwable if isChunkFallback(e) =>
        spark.read.option("wholetext", "true").text(file)
          .as[String].flatMap(doc =>
            Turtle.parse(doc, labelSalt).map(Graph.QuadRow(_)))
          .toDF()
    }
  }
}
