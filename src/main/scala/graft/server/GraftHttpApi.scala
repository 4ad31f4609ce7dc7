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
  * Verification verdicts are cached for a short TTL
  * (`-Dgraft.http.authCacheTtlMs`, default 60 s; 0 disables) keyed by
  * a process-salted digest of (username, verifier, password), so repeating one
  * credential costs one PBKDF2 derivation per TTL instead of one per
  * request; a flood that VARIES passwords still pays a full derivation
  * per distinct guess — when the port leaves the host, put a rate
  * limiter in front alongside the TLS terminator.
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
    * the returned server's address). Stop with `server.stop(0)`.
    * When `-Dgraft.tls.keyStore` is configured ([[GraftTls]]) the
    * endpoint serves HTTPS from that certificate — same JDK server, a
    * `HttpsConfigurator` on top; unconfigured it stays plain HTTP. */
  def start(spark: SparkSession, port: Int,
            bindHost: String = "127.0.0.1", poolSize: Int = 8,
            auth: PgAuth = defaultAuth()): HttpServer = {
    val addr = new java.net.InetSocketAddress(bindHost, port)
    val server = GraftTls.serverContext() match {
      case Some(ctx) =>
        val https = com.sun.net.httpserver.HttpsServer.create(addr, 0)
        https.setHttpsConfigurator(
          new com.sun.net.httpserver.HttpsConfigurator(ctx))
        https
      case None => HttpServer.create(addr, 0)
    }
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

  // ---- verification cache --------------------------------------------
  // Basic sends the password per request, and re-deriving the full
  // PBKDF2 (verifier iteration count, typically 4096) per request made
  // an unauthenticated flood a cheap CPU amplifier on the bounded
  // handler pool. Cache the VERDICT for a short TTL, keyed by a salted
  // SHA-256 of (username, verifier, password) — never the cleartext, and the
  // per-process random salt makes the stored digests useless offline.
  // verifyPassword is a pure function of exactly that pair, so the
  // cache is sound memoization: rotating the password file swaps the
  // verifier (fresh PBKDF2 salt) and misses the cache — no stale
  // accept/deny window, including across server instances with
  // different password files. Failures are cached too: replaying one
  // wrong credential costs one derivation per TTL, not one per request
  // (an attacker VARYING passwords still pays full price per distinct
  // guess — that part is inherent to password auth; front with TLS + a
  // rate limiter when the port leaves the host, per the class doc).
  // loud parse (IllegalStateException, NOT IllegalArgumentException):
  // basicUser's bad-base64 catch swallows IAEs, and a malformed conf
  // must surface as a named 500, never as a silent 401 lockout
  private def authCacheTtlMs: Long =
    sys.props.get("graft.http.authCacheTtlMs").map(s =>
      try s.toLong
      catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"graft.http.authCacheTtlMs must be millis, got '$s'")
      }).getOrElse(60000L)
  // cap override is tests-only (shrinks the flood needed to exercise
  // overflow eviction); production default stays 4096. Loud parse like
  // authCacheTtlMs: a bare toInt's NumberFormatException (an
  // IllegalArgumentException) would be swallowed by basicUser's
  // bad-base64 catch and turn a typo'd conf into silent 401s.
  private def authCacheMax: Int =
    sys.props.get("graft.http.authCacheMax").map { s =>
      val n =
        try s.toInt
        catch {
          case _: NumberFormatException => throw new IllegalStateException(
            s"graft.http.authCacheMax must be an integer, got '$s'")
        }
      // a cap < 1 would enter the eviction branch with an EMPTY cache
      // and index a zero-length seq array — auth would hard-fail on
      // every request instead of just running uncached. Disable the
      // cache via authCacheTtlMs <= 0 instead.
      if (n < 1) throw new IllegalStateException(
        s"graft.http.authCacheMax must be >= 1, got $n (to disable " +
          "the cache set graft.http.authCacheTtlMs to 0)")
      n
    }.getOrElse(4096)
  /** key → (verdict, verdict-expiry-ms, last-access seq). The expiry
    * is pinned at INSERT (a revoked password re-derives once per TTL —
    * hits must never extend it); the seq is a monotonic counter bumped
    * on every hit, giving eviction a strict LRU order that same-ms
    * floods can't blur. */
  private val authCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Boolean, Long, Long)]
  private val authAccessSeq = new java.util.concurrent.atomic.AtomicLong
  private val authSalt = {
    val b = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(b)
    b
  }

  private def credKey(user: String, v: PgScram.Verifier,
                      pass: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(authSalt)
    // the USERNAME is part of the key even though verifyPassword never
    // reads it: all unknown users share ONE decoy verifier, and a
    // shared cache entry would make a warmed decoy verdict answer in
    // ~0ms while a real user's first probe pays the derivation —
    // response latency would become the username oracle the decoy
    // exists to close. Per-username keying keeps first-probe cost
    // identical for existing and non-existing names.
    md.update(user.getBytes(UTF_8))
    md.update(0.toByte)
    md.update(java.nio.ByteBuffer.allocate(4).putInt(v.iterations).array())
    md.update(v.salt)
    md.update(v.storedKey)
    md.update(0.toByte)
    md.update(pass.getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** Derivation-or-cache: one PBKDF2 per distinct credential per TTL.
    * The map is bounded — on overflow, expired entries are purged and,
    * if a flood of distinct creds keeps it over the cap, only the
    * LEAST-RECENTLY-USED quarter is evicted — never a wholesale
    * clear(), which would let an attacker flooding >cap distinct
    * credentials per TTL keep flushing legitimate users' warm verdicts
    * and restore the per-request PBKDF2 amplification the cache exists
    * to prevent. Recency is a monotonic access counter (bumped on
    * every hit), so an in-use legit credential outranks one-shot flood
    * entries regardless of insert order, and a same-millisecond flood
    * can't blur the quartile cutoff into a full clear. The VERDICT
    * expiry stays pinned at insert — hits never extend it, so a
    * revoked password still re-derives once per TTL. Correctness never
    * depends on the cache. */
  private[server] def verifyCached(user: String, pass: String,
                           v: PgScram.Verifier): Boolean = {
    val ttl = authCacheTtlMs
    if (ttl <= 0) {
      derivationCount.incrementAndGet(): Unit
      return PgScram.verifyPassword(pass, v)
    }
    val k = credKey(user, v, pass)
    val now = System.currentTimeMillis()
    val cached = authCache.get(k)
    if (cached != null && cached._2 > now) {
      // refresh LRU position; expiry untouched. Plain put: a racing
      // refresh of the same key writes an equivalent tuple.
      authCache.put(k, (cached._1, cached._2, authAccessSeq.incrementAndGet()))
      return cached._1
    }
    derivationCount.incrementAndGet(): Unit
    val ok = PgScram.verifyPassword(pass, v)
    if (authCache.size >= authCacheMax) {
      authCache.entrySet.removeIf(e => e.getValue._2 <= now)
      if (authCache.size >= authCacheMax) {
        // still over cap with nothing expired: evict the LRU quarter.
        // The cutoff is computed from a snapshot; concurrent
        // hits/inserts carry newer seqs and survive.
        val seqs = new Array[Long](authCache.size)
        var i = 0
        val it = authCache.values.iterator()
        while (it.hasNext && i < seqs.length) { seqs(i) = it.next()._3; i += 1 }
        java.util.Arrays.sort(seqs, 0, i)
        val cutoff = seqs(i / 4)
        authCache.entrySet.removeIf(e => e.getValue._3 <= cutoff)
      }
    }
    authCache.put(k, (ok, now + ttl, authAccessSeq.incrementAndGet()))
    ok
  }

  /** Tests only: drop every cached verdict (e.g. after rewriting the
    * password file). */
  private[server] def clearAuthCache(): Unit = authCache.clear()

  /** Tests only: PBKDF2 derivations actually performed (cache misses). */
  private[server] val derivationCount =
    new java.util.concurrent.atomic.AtomicLong

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
                if (verifyCached(user, pass, v)) Some(user) else None
              case None => // unknown user: same derivation cost, then no
                verifyCached(user, pass, decoyVerifier): Unit
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
