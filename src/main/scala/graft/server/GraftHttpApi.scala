package graft.server

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}

/** The reference's OTHER remote surface: a plain HTTP + JSON endpoint
  * (alongside the Arrow-native wire served by [[GraftServer]] /
  * Spark Connect — /root/reference/README.adoc:14 names the remote
  * driver direction; the upstream 2.x line serves submit-tx/query over
  * HTTP+JSON as its mainstream connector). Zero new dependencies: the
  * JDK's built-in `com.sun.net.httpserver` + Spark's own JSON codec.
  *
  *   - `POST /query`  body = SQL text → `{"columns":[…],"rows":[{…}…],
  *     "rowCount":n}`. The full graft SQL surface applies (temporal
  *     clauses, period predicates, DML, WITH RECURSIVE … UNION) because
  *     execution goes through `spark.sql` and the session carries
  *     [[GraftSqlParser]]. `?limit=N` caps the result server-side.
  *     `Accept: application/vnd.apache.arrow.stream` switches the body
  *     to Arrow IPC stream format (record batches, same bounded-memory
  *     streaming) for Arrow-native clients.
  *   - `POST /tx`     body = DML text (`;`-batch = one atomic tx) →
  *     `{"txId":n}`. Rejects non-DML loudly rather than returning rows.
  *   - `GET  /status` → engine + registered tables (table names are
  *     withheld from unauthenticated callers when auth is on — /status
  *     stays a health check, not an inventory leak).
  *
  * Authentication: the same password file pgwire's SCRAM uses
  * (`user:secret` lines, secrets stored as SCRAM-SHA-256 verifiers —
  * [[PgAuth.fromPasswordFile]]), enforced as HTTP Basic on POST
  * /query and /tx: the presented password re-derives the stored key
  * (RFC 5802 §3) and a wrong or missing credential gets 401 +
  * `WWW-Authenticate` BEFORE the body reaches the SQL layer. Enabled
  * via the `auth` parameter or `-Dgraft.http.passwordFile=<path>`;
  * default stays trust-on-loopback (see the bind note below). Basic
  * sends the password per request — front with TLS termination when
  * the port leaves the host, exactly like the Postgres `password` vs
  * `scram` tradeoff this door's wire sibling avoids natively.
  *
  * Scale posture: results STREAM — rows are encoded by Spark's
  * `to_json` (codegen'd, executor-side) and written chunked via
  * `toLocalIterator`, so driver + handler memory is bounded by one
  * partition regardless of result size; there is no collect. The first
  * partition is forced BEFORE headers go out, so planning/analysis and
  * first-wave runtime errors still surface as HTTP 4xx/5xx rather than
  * a truncated 200.
  *
  * Binds 127.0.0.1 by default — exposing the port beyond the host is a
  * deployment decision (reverse proxy / service mesh), not a library
  * default. */
object GraftHttpApi {

  private def defaultAuth(): PgAuth =
    sys.props.get("graft.http.passwordFile")
      .map(PgAuth.fromPasswordFile).getOrElse(PgAuth.Trust)

  /** Start the endpoint; `port` 0 picks an ephemeral port (read it off
    * the returned server's address). Stop with `server.stop(0)`. */
  def start(spark: SparkSession, port: Int,
            bindHost: String = "127.0.0.1", poolSize: Int = 8,
            auth: PgAuth = defaultAuth()): HttpServer = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress(bindHost, port), 0)
    // bounded pool: each in-flight request holds one thread while its
    // partitions stream; excess requests queue in the server backlog
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      poolSize,
      (r: Runnable) => {
        val t = new Thread(r, "graft-http"); t.setDaemon(true); t
      })
    server.setExecutor(pool)
    server.createContext("/status", handler(spark, statusHandler(auth)))
    server.createContext("/query", handler(spark, guarded(auth, queryHandler)))
    server.createContext("/tx", handler(spark, guarded(auth, txHandler)))
    server.createContext("/", handler(spark, (ex, _) =>
      respond(ex, 404, s"""{"error":${jstr("not found: " + ex.getRequestURI.getPath)}}""")))
    server.start()
    server
  }

  // ---- auth ----------------------------------------------------------

  // decoy verifier for unknown usernames: the 401 must cost the same
  // PBKDF2 derivation either way, or response latency becomes a
  // username oracle over pgwire's shared credential file
  private lazy val decoyVerifier =
    PgScram.verifier(java.util.UUID.randomUUID().toString,
      Array.tabulate[Byte](16)(_.toByte))

  /** `Authorization: Basic …` (scheme case-insensitive per RFC 7235
    * §2.1) against the SCRAM verifier map; Some(user) on success.
    * Never logs or stores the cleartext. */
  private def basicUser(ex: HttpExchange,
                        users: Map[String, PgScram.Verifier]): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.toLowerCase.startsWith("basic "))
      .flatMap { h =>
        try {
          val dec = new String(java.util.Base64.getDecoder
            .decode(h.substring("basic ".length).trim), UTF_8)
          val i = dec.indexOf(':')
          if (i < 0) None
          else {
            val (user, pass) = (dec.substring(0, i), dec.substring(i + 1))
            users.get(user) match {
              case Some(v) =>
                if (PgScram.verifyPassword(pass, v)) Some(user) else None
              case None => // unknown user: same derivation cost, then no
                PgScram.verifyPassword(pass, decoyVerifier)
                None
            }
          }
        } catch { case _: IllegalArgumentException => None } // bad base64
      }

  /** Enforce auth BEFORE the wrapped handler touches the body or the
    * SQL layer: a wrong password costs one PBKDF2 derivation and a 401,
    * never a parse. */
  private def guarded(auth: PgAuth,
                      f: (HttpExchange, SparkSession) => Unit)
      : (HttpExchange, SparkSession) => Unit = auth match {
    case PgAuth.Trust => f
    case PgAuth.Scram(users) => (ex, spark) =>
      if (basicUser(ex, users).isDefined) f(ex, spark)
      else {
        ex.getResponseHeaders.set("WWW-Authenticate",
          "Basic realm=\"graft\", charset=\"UTF-8\"")
        respond(ex, 401, s"""{"error":"authentication required"}""")
      }
  }

  // ---- handlers ------------------------------------------------------

  private def statusHandler(auth: PgAuth)(
      ex: HttpExchange, spark: SparkSession): Unit = {
    if (ex.getRequestMethod != "GET") return respond(ex, 405, methodErr(ex))
    // the health probe stays open; the table INVENTORY is for
    // authenticated callers only once auth is on
    val showTables = auth match {
      case PgAuth.Trust => true
      case PgAuth.Scram(users) => basicUser(ex, users).isDefined
    }
    val tables =
      if (showTables) GraftServer.registered.keys.toSeq.sorted else Nil
    respond(ex, 200,
      s"""{"ok":true,"engine":"graft","sparkVersion":${jstr(spark.version)},""" +
        s""""tables":[${tables.map(jstr).mkString(",")}]}""")
  }

  private def queryHandler(ex: HttpExchange, spark: SparkSession): Unit = {
    if (ex.getRequestMethod != "POST") return respond(ex, 405, methodErr(ex))
    val sql = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    if (sql.trim.isEmpty)
      return respond(ex, 400, s"""{"error":"empty SQL body"}""")
    val limit = Option(ex.getRequestURI.getQuery).flatMap(q =>
      q.split('&').collectFirst {
        case kv if kv.startsWith("limit=") => kv.stripPrefix("limit=").toInt
      })
    val df0 = spark.sql(sql)
    val df = limit.fold(df0)(df0.limit)
    val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
    if (accept.contains("arrow")) streamArrow(ex, df)
    else streamResult(ex, df)
  }

  private def txHandler(ex: HttpExchange, spark: SparkSession): Unit = {
    if (ex.getRequestMethod != "POST") return respond(ex, 405, methodErr(ex))
    val sql = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    // DML executes AT PARSE TIME inside spark.sql (like DDL) and yields
    // a one-row (tx_id) relation — anything else is a misuse of /tx
    val df = spark.sql(sql)
    if (df.columns.toSeq != Seq("tx_id"))
      return respond(ex, 400,
        s"""{"error":"POST /tx expects graft DML (INSERT/UPDATE/DELETE/ERASE """ +
          s"""on a registered table); got a result of ${df.columns.mkString(", ")} — use /query"}""")
    val txId = df.collect()(0).getLong(0)
    respond(ex, 200, s"""{"txId":$txId}""")
  }

  /** Stream `df` as one JSON document without materializing it: rows
    * are rendered executor-side by `to_json` (explicit nulls — field
    * presence shouldn't depend on the value) and pulled one PARTITION
    * at a time. */
  private def streamResult(ex: HttpExchange, df: DataFrame): Unit = {
    val names = df.columns
    val rows = df.select(to_json(
      struct(names.map(n => col(s"`$n`")): _*),
      Map("ignoreNullFields" -> "false")).as("j"))
    val it = rows.toLocalIterator()
    val nonEmpty = it.hasNext // forces partition 1 BEFORE headers commit
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, 0) // length 0 = chunked
    val out = ex.getResponseBody
    out.write(
      s"""{"columns":[${names.map(jstr).mkString(",")}],"rows":["""
        .getBytes(UTF_8))
    var n = 0L
    while (it.hasNext) {
      if (n > 0) out.write(','.toInt)
      out.write(it.next().getString(0).getBytes(UTF_8))
      n += 1
    }
    val _ = nonEmpty
    out.write(s"""],"rowCount":$n}""".getBytes(UTF_8))
    out.close()
  }

  /** `Accept: application/vnd.apache.arrow.stream` — the Arrow-native
    * answer (the reference is Arrow-everywhere; its remote driver
    * direction is Flight SQL): same bounded-memory streaming as the
    * JSON path, record batches instead of JSON rows. Schema validation
    * and the first partition are forced BEFORE headers commit. */
  private def streamArrow(ex: HttpExchange, df: DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    graft.sources.ArrowSource.validateSchema(df.schema)
    val it = df.toLocalIterator()
    val nonEmpty = it.hasNext // force partition 1 before headers
    val _ = nonEmpty
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.apache.arrow.stream")
    ex.sendResponseHeaders(200, 0)
    val out = ex.getResponseBody
    graft.sources.ArrowSource.writeIpcStream(df.schema, it.asScala, out)
    out.close()
  }

  // ---- plumbing ------------------------------------------------------

  private def handler(spark: SparkSession,
                      f: (HttpExchange, SparkSession) => Unit): HttpHandler =
    (ex: HttpExchange) =>
      try {
        // handler threads carry no active-session thread-local;
        // SQLConf.get during planning would fall back to defaults
        SparkSession.setActiveSession(spark)
        f(ex, spark)
      } catch {
        case e: Throwable =>
          val code = e match {
            case _: AnalysisException => 400 // incl. ParseException
            case _: IllegalArgumentException => 400 // graft DML batch errors
            case _ => 500
          }
          val msg = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(2000)
          // best-effort: if the response already started streaming the
          // connection just drops (client sees truncated chunked body)
          try respond(ex, code, s"""{"error":${jstr(msg)}}""")
          catch { case _: Throwable => }
      } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val out = ex.getResponseBody
    out.write(bytes)
    out.close()
  }

  private def methodErr(ex: HttpExchange): String =
    s"""{"error":${jstr(s"method ${ex.getRequestMethod} not allowed on ${ex.getRequestURI.getPath}")}}"""

  private def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
