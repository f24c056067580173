package nelspark.serving

import org.apache.spark.sql.DataFrame
import nelspark.expr.Kernels
import nelspark.pipeline.Linker

/**
 * SNK3: the serving surface (the reference exposes a flask endpoint —
 * doc in → linked doc out — via its service harness, nel/harness.py;
 * reference absent at survey time, SURVEY.md §0/§2.1).
 *
 * Spark-native shape: serving does NOT run Spark jobs per request.
 * The model tables are exactly the small derived statistics a serving
 * tier would broadcast (the same tables `Linker.link` joins against),
 * so the service collects them ONCE into driver-resident hash maps and
 * answers each request with the same kernels the batch path uses
 * (`Kernels.normalizeName`, prior/name-prob/context-cosine features,
 * the same weighted combine and NIL threshold). The HTTP layer is the
 * JDK's built-in `com.sun.net.httpserver` — zero added dependencies.
 */
object LinkService {

  /** One linking decision (the per-chain fields of nel's linked Doc). */
  final case class Resolution(name: String, nameNorm: String,
      entityId: Option[Long], score: Double, isNil: Boolean)

  /**
   * Driver-resident serving model. Collect guards: serving models are
   * the SMALL derived tables (aliases/priors are O(|entities|), context
   * vectors top-K-truncated); `maxRows` fails loud rather than OOM the
   * driver if someone points this at a corpus-scale table.
   */
  final class LinkModel(
      nameProb: Map[String, Array[(Long, Double)]],
      prior: Map[Long, Double],
      tfidf: Map[Long, Map[String, Double]],
      w: Linker.Weights) {

    /** Same feature/score shape as Linker.link, one mention at a time:
      * candidates from the alias store, prior + P(e|name) + context
      * cosine features, weighted combine, argmax with min-id tie-break,
      * NIL below tauNil. */
    def link(name: String, contextText: String): Resolution = {
      val nameNorm = Kernels.normalizeName(name)
      val cands = nameProb.getOrElse(nameNorm, Array.empty[(Long, Double)])
      if (cands.isEmpty) return Resolution(name, nameNorm, None, 0.0, isNil = true)
      // L2-normalized term-frequency context vector of the request doc
      val tf = contextText.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.length.toDouble }
      val nrm = math.sqrt(tf.values.map(x => x * x).sum)
      val best = cands
        .map { case (ent, pName) =>
          val pPrior = prior.getOrElse(ent, 0.0)
          val ev = tfidf.getOrElse(ent, Map.empty)
          val ctx = if (nrm == 0.0) 0.0
            else tf.iterator.map { case (t, x) => x / nrm * ev.getOrElse(t, 0.0) }.sum
          val score = w.prior * pPrior + w.nameProb * pName + w.ctx * ctx
          (ent, score)
        }
        // deterministic: max score, ties toward the smaller entity id
        .maxBy { case (ent, score) => (score, -ent) }
      val (ent, score) = best
      if (score < w.tauNil) Resolution(name, nameNorm, None, score, isNil = true)
      else Resolution(name, nameNorm, Some(ent), score, isNil = false)
    }
  }

  /** Collect the model tables into a serving model (bounded collects). */
  def buildModel(nameProb: DataFrame, entityPrior: DataFrame,
      entityTfidf: DataFrame, w: Linker.Weights = Linker.Weights(),
      maxRows: Long = 5000000L): LinkModel = {
    def guard(df: DataFrame, what: String): DataFrame = {
      val n = df.count()
      require(n <= maxRows,
        s"$what has $n rows > maxRows=$maxRows — not a serving-size table")
      df
    }
    val np = guard(nameProb, "name_prob").collect()
      .map(r => (r.getAs[String]("name_norm"), r.getAs[Long]("entity_id"),
        r.getAs[Double]("p")))
      .groupBy(_._1).map { case (k, xs) =>
        k -> xs.map(x => (x._2, x._3)).sortBy(x => (-x._2, x._1)) }
    val pr = guard(entityPrior, "entity_prior").collect()
      .map(r => r.getAs[Long]("entity_id") -> r.getAs[Double]("p")).toMap
    val tf = guard(entityTfidf, "entity_tfidf").collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("term"),
        r.getAs[Double]("w")))
      .groupBy(_._1).map { case (k, xs) =>
        k -> xs.map(x => (x._2, x._3)).toMap }
    new LinkModel(np, pr, tf, w)
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /**
   * Start the HTTP service on `port` (0 = ephemeral; read the bound
   * port from the returned server). Endpoints:
   *   GET /health                  → {"status":"ok"}
   *   GET /link?name=..&text=..    → one Resolution as JSON
   * Query params are URL-decoded; responses are UTF-8 JSON.
   */
  def serve(model: LinkModel, port: Int = 0): com.sun.net.httpserver.HttpServer = {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    def params(ex: HttpExchange): Map[String, String] = {
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      q.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    }
    server.createContext("/health", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 200, """{"status":"ok"}""")
    })
    server.createContext("/link", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val p = params(ex)
        p.get("name") match {
          case None => respond(ex, 400, """{"error":"missing name param"}""")
          case Some(name) =>
            val r = model.link(name, p.getOrElse("text", ""))
            val ent = r.entityId.map(_.toString).getOrElse("null")
            respond(ex, 200,
              s"""{"name":${jstr(r.name)},"name_norm":${jstr(r.nameNorm)},""" +
                f""""entity_id":$ent,"score":${r.score}%.6f,"is_nil":${r.isNil}}""")
        }
      }
    })
    server.setExecutor(null) // single-threaded: deterministic, demo-scale
    server.start()
    server
  }
}
