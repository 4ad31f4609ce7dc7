package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end over HTTP: a plain `java.net.http.HttpClient` drives the
  * JSON front door — transactions, current reads, time travel, period
  * predicates, recursion, errors — mirroring GraftConnectServerSpec's
  * wire journey on the second connector surface. Responses are parsed
  * with jackson (shipped inside Spark), not string-matched.
  *
  * Needs its own SparkContext (extensions bind at session creation),
  * same pattern as GraftConnectServerSpec. */
class GraftHttpApiSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  test("HTTP front door: status, wire tx, query, time travel, errors") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-http-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_http").toString
    val table = new graft.GraftTable(spark, dir, Seq("bal"))
    GraftServer.register("accts", table)
    val server = GraftHttpApi.start(spark, port = 0)
    val port = server.getAddress.getPort
    val client = HttpClient.newHttpClient()

    def send(method: String, path: String, body: String): (Int, String) = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      val req = (if (method == "GET") b.GET()
                 else b.POST(HttpRequest.BodyPublishers.ofString(body))).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    def post(path: String, body: String) = send("POST", path, body)
    def get(path: String) = send("GET", path, "")
    /** rows of a 200 /query response as (column → text) maps. */
    def rows(body: String): Seq[Map[String, String]] = {
      val root = om.readTree(body)
      assert(root.get("rowCount").asLong ==
        root.get("rows").size.toLong)
      (0 until root.get("rows").size).map { i =>
        val r = root.get("rows").get(i)
        import scala.jdk.CollectionConverters._
        r.properties().asScala.map(e =>
          e.getKey -> e.getValue.asText(null)).toMap
      }
    }

    try {
      // status: engine + registry visible
      val (sc, sb) = get("/status")
      assert(sc == 200, sb)
      val st = om.readTree(sb)
      assert(st.get("ok").asBoolean)
      assert((0 until st.get("tables").size)
        .map(st.get("tables").get(_).asText).contains("accts"))

      // submit txs over HTTP; basis captured between them
      val (c1, b1) = post("/tx",
        "INSERT INTO accts (_id, bal) VALUES (1, 100.0D), (2, 200.0D)")
      assert(c1 == 200, b1)
      assert(om.readTree(b1).get("txId").asLong == 0L)
      Thread.sleep(1100)
      val between = java.time.LocalDateTime.now()
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      Thread.sleep(1100)
      assert(om.readTree(post("/tx",
        "UPDATE accts SET bal = 150.0D WHERE _id = 1")._2)
        .get("txId").asLong == 1L)

      // current read: columns + typed rows + explicit row count
      val (c2, b2) = post("/query", "SELECT _id, bal FROM accts ORDER BY _id")
      assert(c2 == 200, b2)
      val doc = om.readTree(b2)
      assert((0 until doc.get("columns").size)
        .map(doc.get("columns").get(_).asText) == Seq("_id", "bal"))
      assert(rows(b2) == Seq(
        Map("_id" -> "1", "bal" -> "150.0"),
        Map("_id" -> "2", "bal" -> "200.0")))

      // time travel: AS OF the inter-tx basis = the original belief
      assert(rows(post("/query", "SELECT _id, bal FROM accts " +
        s"FOR SYSTEM_TIME AS OF '$between' ORDER BY _id")._2) == Seq(
        Map("_id" -> "1", "bal" -> "100.0"),
        Map("_id" -> "2", "bal" -> "200.0")))

      // period predicate as text, expanded server-side
      assert(rows(post("/query", "SELECT _id, bal FROM accts " +
        "FOR ALL SYSTEM_TIME FOR ALL APPLICATION_TIME " +
        s"WHERE accts.SYSTEM_TIME CONTAINS TIMESTAMP '$between' " +
        "ORDER BY _id")._2).map(_("bal")) == Seq("100.0", "200.0"))

      // server-side limit cap
      assert(rows(post("/query?limit=1",
        "SELECT _id FROM accts ORDER BY _id")._2).size == 1)

      // nulls are EXPLICIT fields, not omitted
      val nb = post("/query", "SELECT CAST(NULL AS INT) AS v, 7 AS w")._2
      val nrow = om.readTree(nb).get("rows").get(0)
      assert(nrow.has("v") && nrow.get("v").isNull && nrow.get("w").asInt == 7)

      // recursion (UNION-distinct spelling) through the same endpoint
      assert(post("/query", "CREATE OR REPLACE TEMPORARY VIEW http_edges AS " +
        "SELECT * FROM VALUES (0, 5), (5, 10), (10, 0) AS t(src, dst)")._1 == 200)
      assert(rows(post("/query",
        """WITH RECURSIVE reach(node) AS (
            SELECT 0
            UNION
            SELECT e.dst FROM reach r JOIN http_edges e ON e.src = r.node)
          SELECT node FROM reach ORDER BY node""")._2).map(_("node")) ==
        Seq("0", "5", "10"))

      // the r10 SQL-text surface rides the same endpoint: a table-valued
      // procedure, matview DDL, and a maintenance statement — all plain
      // POST /query text through the session parser
      assert(post("/query", "CREATE OR REPLACE TEMPORARY VIEW http_docs AS " +
        "SELECT * FROM VALUES (1, 'a b c'), (2, 'a b c'), (3, 'x y z') " +
        "AS t(doc_id, text)")._1 == 200)
      val dd = rows(post("/query",
        "SELECT keep_id, n_copies FROM graft_exact_dedup('http_docs', " +
          "'doc_id', 'text') ORDER BY keep_id")._2)
      assert(dd.map(m => (m("keep_id"), m("n_copies"))) ==
        Seq(("1", "2"), ("3", "1")))
      val (mc, mb) = post("/query",
        "CREATE MATERIALIZED VIEW http_bal WITH (valid_at = '2030-01-01 " +
          "00:00:00') AS SELECT bal, COUNT(*) AS n FROM accts GROUP BY bal")
      assert(mc == 200, mb)
      assert(rows(post("/query",
        "SELECT count(*) AS c FROM http_bal")._2).head("c").toLong >= 1)
      assert(post("/query", "DROP MATERIALIZED VIEW http_bal")._1 == 200)
      val (vc, vb) = post("/query", "COMPACT accts")
      assert(vc == 200, vb)
      assert(rows(vb).head("action") == "COMPACT")

      // Arrow-native answer: the Accept header switches the body to
      // Arrow IPC stream format, decoded here with the arrow-java reader
      val areq = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
        .header("Accept", "application/vnd.apache.arrow.stream")
        .POST(HttpRequest.BodyPublishers.ofString(
          "SELECT _id, bal FROM accts ORDER BY _id")).build()
      val aresp = client.send(areq, HttpResponse.BodyHandlers.ofByteArray())
      assert(aresp.statusCode() == 200)
      assert(aresp.headers().firstValue("Content-Type").orElse("")
        .contains("arrow"))
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(aresp.body()), alloc)
      try {
        val got = Seq.newBuilder[(Long, Double)]
        val root = rdr.getVectorSchemaRoot
        while (rdr.loadNextBatch()) {
          val ids = root.getVector("_id")
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          val bals = root.getVector("bal")
            .asInstanceOf[org.apache.arrow.vector.Float8Vector]
          (0 until root.getRowCount).foreach(r =>
            got += ((ids.get(r), bals.get(r))))
        }
        assert(got.result() == Seq((1L, 150.0), (2L, 200.0)))
      } finally { rdr.close(); alloc.close() }

      // errors: bad SQL → 400 with a message, not a 200 or a 500
      val (e1, eb1) = post("/query", "SELEC nope FROM nowhere")
      assert(e1 == 400, s"$e1 $eb1")
      assert(om.readTree(eb1).get("error").asText.nonEmpty)
      // graft DML batch errors surface OUR diagnostics over HTTP
      val (e2, eb2) = post("/tx",
        "UPDATE accts SET bal = 1.0D WHERE _id = 1; UPDATE accts")
      assert(e2 == 400 && om.readTree(eb2).get("error").asText
        .contains("not valid graft DML"), s"$e2 $eb2")
      // /tx refuses non-DML instead of silently returning rows
      val (e3, eb3) = post("/tx", "SELECT 1 AS x")
      assert(e3 == 400 && om.readTree(eb3).get("error").asText
        .contains("/query"), s"$e3 $eb3")
      // wrong method / unknown path
      assert(get("/query")._1 == 405)
      assert(get("/nope")._1 == 404)
    } finally {
      server.stop(0)
      GraftServer.unregister("accts")
    }
  }

  test("HTTP Basic auth against the SCRAM verifier file: 401 before " +
      "the SQL layer, shared password file with pgwire") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-http-auth-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_httpa").toString
    val table = new graft.GraftTable(spark, dir, Seq("bal"))
    GraftServer.register("authaccts", table)
    // the SAME file format pgwire's SCRAM loads: cleartext converts to
    // a verifier at load, a pre-derived Postgres verifier stores as-is
    val salt = Array.tabulate[Byte](16)(i => (i * 13).toByte)
    val bobVer = {
      val v = graft.server.PgScram.verifier("hunter2", salt)
      val b64 = java.util.Base64.getEncoder
      s"SCRAM-SHA-256$$${v.iterations}:${b64.encodeToString(v.salt)}" +
        s"$$${b64.encodeToString(v.storedKey)}:${b64.encodeToString(v.serverKey)}"
    }
    val pwFile = java.nio.file.Files.createTempFile("graft_http_pw", ".conf")
    java.nio.file.Files.write(pwFile,
      s"# graft http users\nalice:wonderland\nbob:$bobVer\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val server = GraftHttpApi.start(spark, port = 0,
      auth = PgAuth.fromPasswordFile(pwFile.toString))
    val port = server.getAddress.getPort
    val client = HttpClient.newHttpClient()

    def send(method: String, path: String, body: String,
             basic: Option[String]): (Int, String, java.net.http.HttpHeaders) = {
      var b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      basic.foreach(cred => b = b.header("Authorization",
        "Basic " + java.util.Base64.getEncoder
          .encodeToString(cred.getBytes("UTF-8"))))
      val req = (if (method == "GET") b.GET()
                 else b.POST(HttpRequest.BodyPublishers.ofString(body))).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body(), resp.headers())
    }

    try {
      // no credential → 401 with the challenge header
      val (c1, b1, h1) = send("POST", "/query", "SELECT 1 AS x", None)
      assert(c1 == 401, s"$c1 $b1")
      assert(h1.firstValue("WWW-Authenticate").orElse("").contains("Basic"))
      // wrong password → 401; MALFORMED SQL + wrong password is still
      // 401, never 400 — the guard runs before anything is parsed
      assert(send("POST", "/query", "SELECT 1", Some("alice:nope"))._1 == 401)
      assert(send("POST", "/query", "SELEC nope FROM nowhere",
        Some("alice:nope"))._1 == 401)
      // unknown user / garbage header → 401
      assert(send("POST", "/query", "SELECT 1", Some("mallory:x"))._1 == 401)
      assert(send("POST", "/tx", "INSERT INTO authaccts (_id, bal) " +
        "VALUES (9, 1.0D)", None)._1 == 401)

      // correct credentials work on both endpoints — cleartext-loaded
      // alice AND verifier-loaded bob (same derived keys as pgwire) —
      // and the 401'd insert of _id 9 above never reached the SQL
      // layer: the authorized read sees ONLY the authorized row
      assert(om.readTree(send("POST", "/tx",
        "INSERT INTO authaccts (_id, bal) VALUES (1, 10.0D)",
        Some("alice:wonderland"))._2).get("txId").asLong == 0L)
      val ids = om.readTree(send("POST", "/query",
        "SELECT _id FROM authaccts ORDER BY _id",
        Some("bob:hunter2"))._2).get("rows")
      assert(ids.size == 1 && ids.get(0).get("_id").asLong == 1L, ids)

      // RFC 7235 §2.1: the auth-scheme token is case-insensitive — a
      // client normalizing to lowercase must still authenticate
      val lcReq = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/query"))
        .header("Authorization", "basic " + java.util.Base64.getEncoder
          .encodeToString("alice:wonderland".getBytes("UTF-8")))
        .POST(HttpRequest.BodyPublishers.ofString("SELECT 1 AS x")).build()
      assert(client.send(lcReq,
        HttpResponse.BodyHandlers.ofString()).statusCode() == 200)

      // verification cache: repeating ONE credential (right or wrong)
      // costs one PBKDF2 derivation per TTL, not one per request — the
      // unauthenticated-flood CPU amplifier on the bounded pool is
      // capped at one derivation per DISTINCT credential
      GraftHttpApi.clearAuthCache()
      val d0 = GraftHttpApi.derivationCount.get()
      (1 to 3).foreach(_ => assert(send("POST", "/query",
        "SELECT 1 AS x", Some("alice:wonderland"))._1 == 200))
      assert(GraftHttpApi.derivationCount.get() == d0 + 1,
        "3 identical good credentials must derive once")
      (1 to 3).foreach(_ => assert(send("POST", "/query",
        "SELECT 1", Some("alice:stillwrong"))._1 == 401))
      assert(GraftHttpApi.derivationCount.get() == d0 + 2,
        "3 identical wrong credentials must derive once")
      // a VARIED guess always pays the full derivation
      assert(send("POST", "/query", "SELECT 1",
        Some("alice:varied-guess"))._1 == 401)
      assert(GraftHttpApi.derivationCount.get() == d0 + 3)

      // per-USERNAME decoy keying: warming the cache with one unknown
      // user must not make a different unknown user's first probe
      // free — shared decoy verdicts would turn response latency into
      // the username oracle the decoy exists to close
      GraftHttpApi.clearAuthCache()
      val e1 = GraftHttpApi.derivationCount.get()
      assert(send("POST", "/query", "SELECT 1", Some("ghost1:guess"))._1 == 401)
      assert(send("POST", "/query", "SELECT 1", Some("ghost1:guess"))._1 == 401)
      assert(GraftHttpApi.derivationCount.get() == e1 + 1,
        "repeated unknown-user probe is cached")
      assert(send("POST", "/query", "SELECT 1", Some("ghost2:guess"))._1 == 401)
      assert(GraftHttpApi.derivationCount.get() == e1 + 2,
        "a different unknown username must pay its own derivation")

      // a malformed cache-TTL conf surfaces as a NAMED 500, never a
      // silent 401 lockout (the parse must not be swallowed by the
      // bad-base64 catch)
      val prevTtl = sys.props.get("graft.http.authCacheTtlMs")
      sys.props("graft.http.authCacheTtlMs") = "60s"
      try {
        val (mc, mb, _) = send("POST", "/query", "SELECT 1 AS x",
          Some("alice:wonderland"))
        assert(mc == 500 && mb.contains("authCacheTtlMs"), s"$mc $mb")
      } finally prevTtl match {
        case Some(v) => sys.props("graft.http.authCacheTtlMs") = v
        case None => sys.props.remove("graft.http.authCacheTtlMs"): Unit
      }

      // /status stays a health probe but withholds the inventory from
      // unauthenticated callers
      val (sc, sb, _) = send("GET", "/status", "", None)
      assert(sc == 200 && om.readTree(sb).get("ok").asBoolean)
      assert(om.readTree(sb).get("tables").size == 0, sb)
      val (sc2, sb2, _) = send("GET", "/status", "", Some("bob:hunter2"))
      assert(sc2 == 200 && (0 until om.readTree(sb2).get("tables").size)
        .map(om.readTree(sb2).get("tables").get(_).asText)
        .contains("authaccts"))
    } finally {
      server.stop(0)
      GraftServer.unregister("authaccts")
      java.nio.file.Files.deleteIfExists(pwFile)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("auth-cache overflow evicts the LRU quarter, never wholesale: " +
      "an in-use credential survives a distinct-credential flood") {
    // unit-level (no HTTP server): verifyCached IS the cache
    val salt = Array.tabulate(16)(_.toByte)
    val v = PgScram.verifier("pw", salt, 64) // low iters: eviction test
    val prevMax = sys.props.get("graft.http.authCacheMax")
    sys.props("graft.http.authCacheMax") = "32"
    GraftHttpApi.clearAuthCache()
    try {
      // fill to cap with one-shot flood creds, then warm the legit one
      (1 to 32).foreach(i =>
        GraftHttpApi.verifyCached(s"flood$i", "x", v): Unit)
      assert(GraftHttpApi.verifyCached("alice", "pw", v))
      val d0 = GraftHttpApi.derivationCount.get()
      // sustained flood, 96 more distinct creds — many eviction rounds.
      // alice is HIT between rounds (the legit-user pattern), so her
      // LRU position keeps outranking the one-shot flood entries; the
      // old clear()-on-overflow dropped her on the first round.
      (1 to 12).foreach { round =>
        (1 to 8).foreach(i =>
          GraftHttpApi.verifyCached(s"flood_r${round}_$i", "x", v): Unit)
        assert(GraftHttpApi.verifyCached("alice", "pw", v))
      }
      assert(GraftHttpApi.derivationCount.get() == d0 + 96,
        "the flood derived once per distinct cred; alice stayed cached " +
          "through every eviction round")
    } finally {
      prevMax match {
        case Some(x) => sys.props("graft.http.authCacheMax") = x
        case None => sys.props.remove("graft.http.authCacheMax"): Unit
      }
      GraftHttpApi.clearAuthCache()
    }
  }

  test("authCacheMax < 1 refuses loudly instead of hard-failing every " +
      "authenticated request from inside the eviction branch") {
    // pre-guard, a zero cap entered eviction with an EMPTY cache and
    // indexed a zero-length seq array — ArrayIndexOutOfBoundsException
    // on every auth attempt (a conf typo becoming a total lockout)
    val salt = Array.tabulate(16)(_.toByte)
    val v = PgScram.verifier("pw", salt, 64)
    val prevMax = sys.props.get("graft.http.authCacheMax")
    GraftHttpApi.clearAuthCache()
    try {
      Seq("0", "-5").foreach { bad =>
        sys.props("graft.http.authCacheMax") = bad
        val e = intercept[IllegalStateException] {
          GraftHttpApi.verifyCached("alice", "pw", v)
        }
        assert(e.getMessage.contains("authCacheMax"), e.getMessage)
      }
    } finally {
      prevMax match {
        case Some(x) => sys.props("graft.http.authCacheMax") = x
        case None => sys.props.remove("graft.http.authCacheMax"): Unit
      }
      GraftHttpApi.clearAuthCache()
    }
  }

  test("auth-cache hits never extend the verdict expiry: a revoked " +
      "password re-derives after the TTL even when used continuously") {
    val salt = Array.tabulate(16)(_.toByte)
    val v = PgScram.verifier("pw", salt, 64)
    val prevTtl = sys.props.get("graft.http.authCacheTtlMs")
    sys.props("graft.http.authCacheTtlMs") = "150"
    GraftHttpApi.clearAuthCache()
    try {
      assert(GraftHttpApi.verifyCached("bob", "pw", v))
      val d0 = GraftHttpApi.derivationCount.get()
      // continuous use inside the TTL: all hits, zero derivations
      (1 to 5).foreach { _ =>
        assert(GraftHttpApi.verifyCached("bob", "pw", v))
        Thread.sleep(10)
      }
      assert(GraftHttpApi.derivationCount.get() == d0)
      Thread.sleep(200) // past the insert-pinned expiry
      assert(GraftHttpApi.verifyCached("bob", "pw", v))
      assert(GraftHttpApi.derivationCount.get() == d0 + 1,
        "expiry is pinned at insert — LRU refreshes must not extend it")
    } finally {
      prevTtl match {
        case Some(x) => sys.props("graft.http.authCacheTtlMs") = x
        case None => sys.props.remove("graft.http.authCacheTtlMs"): Unit
      }
      GraftHttpApi.clearAuthCache()
    }
  }
}
