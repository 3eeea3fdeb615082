package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Formats, Graph, Inference, NQuads}
import graft.lang.QuerySession
import graft.lang.QuerySession.{Collation, Options}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP /api/v2 façade (/root/reference/server/http/api_v2.go:120-144):
  * query, write, delete, node/delete, read, formats — on the JDK's
  * built-in HttpServer, no extra dependency. The store is a snapshot
  * `Graph` reference; writes swap the snapshot (the engine's ApplyDeltas
  * semantics), reads/queries run against whatever snapshot they start
  * with.
  *
  * Response shapes mirror the reference: `{"result": ...}` on success,
  * `{"error": msg}` with a 4xx/5xx status on failure; write/delete report
  * `"Successfully wrote/deleted N quads."` with a count.
  */
final class HttpApi(initial: Graph) {
  @volatile private var g: Graph = initial
  private var server: HttpServer = _
  private val reqCounter = new java.util.concurrent.atomic.AtomicLong(0)

  def graph: Graph = g

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/api/v2/query", handler(serveQuery))
    server.createContext("/api/v2/write", handler(serveWrite))
    server.createContext("/api/v2/delete", handler(serveDelete))
    server.createContext("/api/v2/node/delete", handler(serveNodeDelete))
    server.createContext("/api/v2/read", streamHandler(serveRead))
    server.createContext("/api/v2/formats", handler(serveFormats))
    server.createContext("/gephi/gs", handler(serveGephi))
    // query sandbox (reference serves its SPA at "/"; ours is one
    // self-contained page — see WebUi). "/" is the catch-all context, so
    // anything unmatched 404s there instead of silently serving HTML.
    server.createContext("/ui", handler(_ => (200, "text/html", WebUi.html)))
    server.createContext("/", handler { ex =>
      if (ex.getRequestURI.getPath == "/") (200, "text/html", WebUi.html)
      else (404, "application/json",
        QuerySession.toJson(Map("error" -> "not found")))
    })
    server.setExecutor(null) // default single-thread executor
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------ plumbing
  private def handler(f: HttpExchange => (Int, String, String))
      : com.sun.net.httpserver.HttpHandler = { ex =>
    val (status, contentType, body) =
      try f(ex)
      catch {
        case e: Throwable =>
          (400, "application/json",
            QuerySession.toJson(Map("error" ->
              (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)))))
      }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Like `handler`, but the route may answer with a chunked body: it
    * returns either a buffered error triple or (contentType, writeFn);
    * writeFn streams into the response writer while Spark's
    * toLocalIterator pulls partitions, so an export of the whole store
    * never materializes in driver memory (reference api_v2.go streams
    * quad-by-quad the same way). A length of 0 in sendResponseHeaders
    * selects chunked transfer encoding.
    */
  private def streamHandler(
      f: HttpExchange => Either[(Int, String, String), (String, java.io.Writer => Unit)])
      : com.sun.net.httpserver.HttpHandler = { ex =>
    (try f(ex)
    catch {
      case e: Throwable =>
        Left((400, "application/json",
          QuerySession.toJson(Map("error" ->
            (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))))))
    }) match {
      case Left((status, contentType, body)) =>
        val bytes = body.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      case Right((contentType, writeFn)) =>
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(200, 0L) // 0 = chunked
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(ex.getResponseBody, UTF_8), 1 << 16)
        // past this point the status line is gone — a mid-stream failure
        // can only truncate the body (inherent to chunked transfer)
        try writeFn(w) finally {
          try w.flush() catch { case _: Throwable => () }
          ex.close()
        }
    }
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split('&').filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k ->
          java.net.URLDecoder.decode(v, UTF_8))
        case Array(k) => Some(k -> "")
        case _        => None
      }
    }.toMap
  }

  private def ok(result: Any): (Int, String, String) =
    (200, "application/json", QuerySession.toJson(Map("result" -> result)))

  // ------------------------------------------------------------ handlers
  /** POST/GET /api/v2/query?lang=gizmo[&limit=N] — body is the query. */
  private def serveQuery(ex: HttpExchange): (Int, String, String) = {
    val ps = params(ex)
    val lang = ps.getOrElse("lang", "gizmo")
    val query =
      if (ex.getRequestMethod == "GET") ps.getOrElse("qu", "")
      else body(ex)
    val limit = ps.get("limit").map(_.toInt).getOrElse(-1)
    val res = QuerySession.execute(g, lang, query,
      Options(limit = limit, collation = Collation.JSON))
    ok(res)
  }

  /** POST /api/v2/write — quads appended to the store. N-Quads by
    * default; `Content-Type: application/json` (or a JSON body) parses
    * the JSON quad-lines format; `application/ld+json` parses a JSON-LD
    * document.
    */
  private def serveWrite(ex: HttpExchange): (Int, String, String) = {
    val b = body(ex)
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    val quads: Seq[NQuads.ParsedQuad] =
      if (ct.contains("ld+json"))
        return { // JSON-LD: parse document, merge as a graph
          val root = org.json4s.jackson.JsonMethods.parse(b).values
            .asInstanceOf[Map[String, Any]]
          val delta = Formats.readJsonLdRoot(g.spark, root)
          val n = delta.stats._2
          g = g.addQuads(delta)
          (200, "application/json",
            s"""{"result": "Successfully wrote $n quads.", "count": $n}""")
        }
      else if (ct.contains("text/turtle") || ct.contains("application/trig"))
        // per-request bnode salt: _:b0 in two POST bodies are distinct
        // documents per RDF scoping, matching Turtle.read's per-file salt
        graft.core.Turtle.parse(b, bnodeSalt = java.lang.Long.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(b).toLong & 0xFFFFFFFFL) +
          "r" + reqCounter.incrementAndGet())
      else if (ct.contains("application/json") || b.trim.headOption.contains('{'))
        b.linesIterator.map(_.trim).filter(_.nonEmpty).flatMap { line =>
          val m = org.json4s.jackson.JsonMethods.parse(line).values
            .asInstanceOf[Map[String, Any]]
          def term(k: String) = m.get(k)
            .map(v => NQuads.parseTermOrString(String.valueOf(v)))
          for (s <- term("subject"); p <- term("predicate"); o <- term("object"))
            yield NQuads.ParsedQuad(s, p, o, term("label"))
        }.toSeq
      else b.linesIterator.flatMap(NQuads.parseLine).toSeq
    g = g.addQuads(Graph.fromQuads(g.spark, quads))
    (200, "application/json",
      s"""{"result": "Successfully wrote ${quads.size} quads.", "count": ${quads.size}}""")
  }

  /** POST /api/v2/delete — N-Quads body removed from the store. */
  private def serveDelete(ex: HttpExchange): (Int, String, String) = {
    val quads = body(ex).linesIterator.flatMap(NQuads.parseLine).toSeq
    g = g.deleteQuads(Graph.fromQuads(g.spark, quads))
    (200, "application/json",
      s"""{"result": "Successfully deleted ${quads.size} quads.", "count": ${quads.size}}""")
  }

  /** POST /api/v2/node/delete — one N-Quads term; removes the node and
    * every quad touching it (writer/single.go RemoveNode).
    */
  private def serveNodeDelete(ex: HttpExchange): (Int, String, String) = {
    val v = NQuads.parseTermOrString(body(ex).trim)
    g = Inference.removeNode(g, v)
    (200, "application/json",
      """{"result": "Successfully deleted 1 nodes.", "count": 1}""")
  }

  /** GET/POST /api/v2/read[?sub=&pred=&obj=&label=][&format=nquads|json|
    * jsonld|graphml|gml] — serialized stream of the (optionally filtered)
    * store. Serialization is distributed; the driver streams lines out as
    * a chunked response, never holding the whole export in memory.
    */
  private def serveRead(ex: HttpExchange)
      : Either[(Int, String, String), (String, java.io.Writer => Unit)] = {
    import graft.core.QValue
    import org.apache.spark.sql.functions.col
    val ps = params(ex)
    var sub = g
    def term(s: String): QValue = NQuads.parseTermOrString(s)
    def filter(param: String, c: String): Unit = ps.get(param).filter(_.nonEmpty)
      .foreach { s =>
        sub = sub.copy(quads =
          sub.quads.where(col(c) === QValue.id(term(s))))
      }
    filter("sub", "s"); filter("pred", "p"); filter("obj", "o")
    filter("label", "l")
    val format = ps.getOrElse("format", "nquads")
    val fmt = Formats.byName(format).filter(_.write).getOrElse(
      return Left((400, "application/json",
        s"""{"error": "format is not supported for reading data: $format"}""")))
    def lineStream(df: org.apache.spark.sql.DataFrame)(w: java.io.Writer): Unit =
      df.toLocalIterator().forEachRemaining { r =>
        w.write(r.getString(0)); w.write('\n')
      }
    format match {
      case "nquads"   => Right((fmt.mime.head, lineStream(Formats.nquadLines(sub))))
      case "ntriples" => Right((fmt.mime.head, lineStream(Formats.ntripleLines(sub))))
      case "turtle"   => Right((fmt.mime.head, lineStream(Formats.ntripleLines(sub))))
      case "trig"     => Right((fmt.mime.head, lineStream(Formats.trigLines(sub))))
      case "json"   => Right((fmt.mime.head, lineStream(Formats.jsonQuadLines(sub))))
      case "jsonld" => Right((fmt.mime.head, w => Formats.writeJsonLd(sub, w)))
      case "graphml" => Right((fmt.mime.head, w => Formats.writeGraphml(sub, w)))
      case "gml"     => Right((fmt.mime.head, w => Formats.writeGml(sub, w)))
      case "dot"     => Right((fmt.mime.head, w => Formats.writeDot(sub, w)))
      case other =>
        Left((400, "application/json",
          s"""{"error": "format is not servable over HTTP: $other"}"""))
    }
  }

  /** GET /gephi/gs[?limit=N] — Gephi GraphStream events
    * (/root/reference/internal/gephi/stream.go): one JSON event per line,
    * `an` (add node) for every value then `ae` (add edge) per quad.
    * Node positions are hash-derived (deterministic), like the reference's
    * random layout seeds.
    */
  private def serveGephi(ex: HttpExchange): (Int, String, String) = {
    import org.apache.spark.sql.functions.col
    val limit = params(ex).get("limit").map(_.toInt).getOrElse(10000)
    val sb = new StringBuilder
    def esc(s: String) = QuerySession.toJson(s)
    graft.core.Formats.nodeTerms(g).limit(limit).toLocalIterator()
      .forEachRemaining { r =>
        val id = r.getLong(0)
        val x = (id % 1000L) / 5.0 - 100.0
        val y = ((id >> 10) % 1000L) / 5.0 - 100.0
        sb.append(s"""{"an":{"n$id":{"label":${esc(r.getString(1))},"size":20,"x":$x,"y":$y}}}""")
          .append("\r\n")
      }
    var i = 0
    g.quads.select(col("s"), col("p"), col("o")).limit(limit)
      .toLocalIterator().forEachRemaining { r =>
        sb.append(s"""{"ae":{"e$i":{"source":"n${r.getLong(0)}","target":"n${r.getLong(2)}","pred":"p${r.getLong(1)}","directed":true}}}""")
          .append("\r\n")
        i += 1
      }
    (200, "application/stream+json", sb.toString)
  }

  /** GET /api/v2/formats — the format registry. */
  private def serveFormats(ex: HttpExchange): (Int, String, String) =
    (200, "application/json", QuerySession.toJson(Formats.registry.map(f =>
      Map("id" -> f.id, "read" -> f.read, "write" -> f.write,
        "mime" -> f.mime))))
}
