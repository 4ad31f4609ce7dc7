package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Front-door TLS over REAL sockets: a keystore is generated with the
  * JDK's own keytool (no fixture binaries in the repo), pgwire's
  * SSLRequest upgrades to a JSSE session (handshake, SCRAM-less startup,
  * a query, clean close), the HTTP endpoint serves HTTPS from the same
  * certificate, plaintext-after-probe behavior survives unconfigured,
  * and a configured-but-unloadable keystore refuses loudly instead of
  * silently serving plaintext. */
class GraftTlsSpec extends AnyFunSuite {

  private def genKeystore(): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft_tls", ".p12")
    java.nio.file.Files.delete(p)
    // the SAN matters: java.net.http.HttpClient verifies hostname
    // identity independently of the trust manager, and an IP peer
    // needs an ip: SAN entry
    val cmd = Seq("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-storetype", "PKCS12", "-keystore", p.toString,
      "-storepass", "changeit", "-dname", "CN=localhost",
      "-ext", "san=ip:127.0.0.1,dns:localhost")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8)
    assert(proc.waitFor() == 0, s"keytool failed:\n$out")
    p
  }

  /** Trust-all client context — the server cert is self-signed. */
  private def trustAll(): javax.net.ssl.SSLContext = {
    val tm: javax.net.ssl.TrustManager = new javax.net.ssl.X509TrustManager {
      def checkClientTrusted(c: Array[java.security.cert.X509Certificate],
                             a: String): Unit = ()
      def checkServerTrusted(c: Array[java.security.cert.X509Certificate],
                             a: String): Unit = ()
      def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
        Array.empty
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), new java.security.SecureRandom())
    ctx
  }

  private def withProps(ks: Option[java.nio.file.Path])(f: => Unit): Unit = {
    val prevKs = sys.props.get("graft.tls.keyStore")
    val prevPw = sys.props.get("graft.tls.keyStorePassword")
    try {
      ks match {
        case Some(p) =>
          sys.props("graft.tls.keyStore") = p.toString
          sys.props("graft.tls.keyStorePassword") = "changeit"
        case None =>
          sys.props.remove("graft.tls.keyStore"): Unit
          sys.props.remove("graft.tls.keyStorePassword"): Unit
      }
      GraftTls.reset()
      f
    } finally {
      prevKs match {
        case Some(v) => sys.props("graft.tls.keyStore") = v
        case None => sys.props.remove("graft.tls.keyStore"): Unit
      }
      prevPw match {
        case Some(v) => sys.props("graft.tls.keyStorePassword") = v
        case None => sys.props.remove("graft.tls.keyStorePassword"): Unit
      }
      GraftTls.reset()
    }
  }

  /** pg v3 frames over arbitrary streams (clear or TLS). */
  private def startupAndQuery(in: DataInputStream, out: DataOutputStream,
                              sql: String): Seq[String] = {
    val payload = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(payload)
    d.writeInt(196608)
    Seq("user" -> "tester", "database" -> "graft").foreach { case (k, v) =>
      d.write(k.getBytes(UTF_8)); d.writeByte(0)
      d.write(v.getBytes(UTF_8)); d.writeByte(0)
    }
    d.writeByte(0)
    out.writeInt(4 + payload.size()); payload.writeTo(out); out.flush()
    def readMsg(): (Char, Array[Byte]) = {
      val t = in.read().toChar
      val len = in.readInt()
      val b = new Array[Byte](len - 4); in.readFully(b); (t, b)
    }
    // drain startup response to ReadyForQuery
    var m = readMsg()
    assert(m._1 == 'R', s"expected AuthenticationOk, got ${m._1}")
    while (m._1 != 'Z') m = readMsg()
    // simple query
    val q = sql.getBytes(UTF_8)
    out.writeByte('Q'); out.writeInt(4 + q.length + 1)
    out.write(q); out.writeByte(0); out.flush()
    val rows = Seq.newBuilder[String]
    m = readMsg()
    while (m._1 != 'Z') {
      if (m._1 == 'D') {
        val din = new DataInputStream(new java.io.ByteArrayInputStream(m._2))
        val nCols = din.readShort()
        val cols = (0 until nCols).map { _ =>
          val n = din.readInt()
          if (n < 0) "NULL"
          else { val b = new Array[Byte](n); din.readFully(b)
            new String(b, UTF_8) }
        }
        rows += cols.mkString("|")
      }
      assert(m._1 != 'E', s"server error: ${new String(m._2, UTF_8)}")
      m = readMsg()
    }
    out.writeByte('X'); out.writeInt(4); out.flush() // Terminate
    rows.result()
  }

  test("pgwire SSLRequest upgrades to TLS when a keystore is " +
      "configured; plaintext-after-probe survives unconfigured; HTTPS " +
      "serves from the same certificate; bad keystores refuse loudly") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tls-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val ks = genKeystore()
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      // 1. TLS configured: probe answered 'S', JSSE session carries the
      //    whole startup + query + clean close
      withProps(Some(ks)) {
        val raw = new Socket("127.0.0.1", handle.port)
        raw.setTcpNoDelay(true)
        val rout = new DataOutputStream(raw.getOutputStream)
        val rin = new DataInputStream(raw.getInputStream)
        rout.writeInt(8); rout.writeInt(80877103); rout.flush()
        assert(rin.read().toChar == 'S',
          "a configured keystore must accept the SSL probe")
        val ssl = trustAll().getSocketFactory
          .createSocket(raw, "127.0.0.1", handle.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.startHandshake()
        assert(ssl.getSession.getProtocol.startsWith("TLS"))
        val in = new DataInputStream(
          new BufferedInputStream(ssl.getInputStream))
        val out = new DataOutputStream(
          new BufferedOutputStream(ssl.getOutputStream))
        val rows = startupAndQuery(in, out,
          "SELECT 1 AS a, 'enc' AS b")
        assert(rows == Seq("1|enc"), rows.toString)
        ssl.close()
      }

      // 2. unconfigured: probe declined with 'N', clear session works
      withProps(None) {
        val raw = new Socket("127.0.0.1", handle.port)
        raw.setTcpNoDelay(true)
        val out = new DataOutputStream(
          new BufferedOutputStream(raw.getOutputStream))
        val in = new DataInputStream(
          new BufferedInputStream(raw.getInputStream))
        out.writeInt(8); out.writeInt(80877103); out.flush()
        assert(in.read().toChar == 'N',
          "no keystore -> the documented plaintext-after-probe")
        val rows = startupAndQuery(in, out, "SELECT 2 AS a")
        assert(rows == Seq("2"), rows.toString)
        raw.close()
      }

      // 3. HTTPS on the HTTP API from the same keystore
      withProps(Some(ks)) {
        val server = GraftHttpApi.start(spark, port = 0)
        try {
          val port = server.getAddress.getPort
          val client = java.net.http.HttpClient.newBuilder()
            .sslContext(trustAll()).build()
          val res = client.send(
            java.net.http.HttpRequest.newBuilder(
                java.net.URI.create(s"https://127.0.0.1:$port/query"))
              .POST(java.net.http.HttpRequest.BodyPublishers
                .ofString("SELECT 3 AS x")).build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          assert(res.statusCode() == 200, res.body())
          assert(res.body().contains("\"x\":3"), res.body())
        } finally server.stop(0)
      }

      // 3b. SCRAM over TLS — the production pairing: credentials only
      //     ever cross the wire inside the JSSE session, and the full
      //     RFC 5802 exchange + an authenticated query run over the
      //     upgraded socket
      withProps(Some(ks)) {
        val salt = Array.tabulate[Byte](16)(_.toByte)
        val ver = PgScram.verifier("hunter2", salt, 4096)
        val b64 = java.util.Base64.getEncoder
        val pwFile = java.nio.file.Files.createTempFile("graft_tlspw", ".conf")
        java.nio.file.Files.writeString(pwFile,
          s"alice:SCRAM-SHA-256$$4096:${b64.encodeToString(salt)}$$" +
            s"${b64.encodeToString(ver.storedKey)}:" +
            s"${b64.encodeToString(ver.serverKey)}\n")
        val scramHandle = GraftPgWire.start(spark, port = 0,
          auth = PgAuth.fromPasswordFile(pwFile.toString))
        try {
          val raw = new Socket("127.0.0.1", scramHandle.port)
          val rout = new DataOutputStream(raw.getOutputStream)
          val rin = new DataInputStream(raw.getInputStream)
          rout.writeInt(8); rout.writeInt(80877103); rout.flush()
          assert(rin.read().toChar == 'S')
          val ssl = trustAll().getSocketFactory
            .createSocket(raw, "127.0.0.1", scramHandle.port, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          ssl.startHandshake()
          val in = new DataInputStream(
            new BufferedInputStream(ssl.getInputStream))
          val out = new DataOutputStream(
            new BufferedOutputStream(ssl.getOutputStream))
          def readMsg(): (Char, Array[Byte]) = {
            val t = in.read().toChar; val len = in.readInt()
            val b = new Array[Byte](len - 4); in.readFully(b); (t, b)
          }
          def sendP(payload: Array[Byte]): Unit = {
            out.writeByte('p'); out.writeInt(4 + payload.length)
            out.write(payload); out.flush()
          }
          // startup
          val pay = new java.io.ByteArrayOutputStream()
          val d = new DataOutputStream(pay)
          d.writeInt(196608)
          d.write("user".getBytes(UTF_8)); d.writeByte(0)
          d.write("alice".getBytes(UTF_8)); d.writeByte(0); d.writeByte(0)
          out.writeInt(4 + pay.size()); pay.writeTo(out); out.flush()
          var m = readMsg()
          assert(m._1 == 'R' && new DataInputStream(
            new java.io.ByteArrayInputStream(m._2)).readInt() == 10,
            "expected AuthenticationSASL over TLS")
          // RFC 5802 client, inside the TLS session
          import javax.crypto.Mac
          import javax.crypto.spec.SecretKeySpec
          def hmac(k: Array[Byte], msg: String): Array[Byte] = {
            val mac = Mac.getInstance("HmacSHA256")
            mac.init(new SecretKeySpec(k, "HmacSHA256"))
            mac.doFinal(msg.getBytes(UTF_8))
          }
          def sha(b: Array[Byte]) = java.security.MessageDigest
            .getInstance("SHA-256").digest(b)
          val cnonce = "tlsnonce1"
          val bare = s"n=,r=$cnonce"
          val init = new java.io.ByteArrayOutputStream()
          val di = new DataOutputStream(init)
          di.write("SCRAM-SHA-256".getBytes(UTF_8)); di.writeByte(0)
          val first = s"n,,$bare".getBytes(UTF_8)
          di.writeInt(first.length); di.write(first)
          sendP(init.toByteArray)
          m = readMsg()
          assert(m._1 == 'R', new String(m._2, UTF_8))
          val sf = new String(m._2.drop(4), UTF_8)
          val attrs = sf.split(",").map(kv =>
            kv.substring(0, 1) -> kv.substring(2)).toMap
          val sp = PgScram.saltedPassword("hunter2",
            java.util.Base64.getDecoder.decode(attrs("s")),
            attrs("i").toInt)
          val ck = hmac(sp, "Client Key")
          val woProof = s"c=biws,r=${attrs("r")}"
          val authMsg = s"$bare,$sf,$woProof"
          val sig = hmac(sha(ck), authMsg)
          val proof = ck.zip(sig).map { case (a, x) => (a ^ x).toByte }
          sendP((woProof + ",p=" +
            b64.encodeToString(proof)).getBytes(UTF_8))
          m = readMsg()
          assert(m._1 == 'R', s"SASL final failed over TLS: " +
            new String(m._2, UTF_8))
          // drain to ReadyForQuery, then the authenticated query
          while (m._1 != 'Z') m = readMsg()
          val q = "SELECT 21 * 2 AS x".getBytes(UTF_8)
          out.writeByte('Q'); out.writeInt(4 + q.length + 1)
          out.write(q); out.writeByte(0); out.flush()
          var got = ""
          m = readMsg()
          while (m._1 != 'Z') {
            if (m._1 == 'D') {
              val din = new DataInputStream(
                new java.io.ByteArrayInputStream(m._2))
              din.readShort(); val n = din.readInt()
              val b = new Array[Byte](n); din.readFully(b)
              got = new String(b, UTF_8)
            }
            m = readMsg()
          }
          assert(got == "42")
          ssl.close()
        } finally {
          scramHandle.stop()
          java.nio.file.Files.deleteIfExists(pwFile): Unit
        }
      }

      // 4. graft.tls.required: a startup that never probed is refused
      //    with the story instead of proceeding in clear
      withProps(Some(ks)) {
        sys.props("graft.tls.required") = "true"
        try {
          val raw = new Socket("127.0.0.1", handle.port)
          val out = new DataOutputStream(
            new BufferedOutputStream(raw.getOutputStream))
          val in = new DataInputStream(
            new BufferedInputStream(raw.getInputStream))
          // plain startup, no SSLRequest
          val payload = new java.io.ByteArrayOutputStream()
          val d = new DataOutputStream(payload)
          d.writeInt(196608)
          d.write("user".getBytes(UTF_8)); d.writeByte(0)
          d.write("t".getBytes(UTF_8)); d.writeByte(0); d.writeByte(0)
          out.writeInt(4 + payload.size()); payload.writeTo(out); out.flush()
          val t = in.read().toChar
          assert(t == 'E', s"expected ErrorResponse, got '$t'")
          val len = in.readInt()
          val b = new Array[Byte](len - 4); in.readFully(b)
          assert(new String(b, UTF_8).contains("requires TLS"))
          raw.close()
        } finally { sys.props.remove("graft.tls.required"): Unit }
      }

      // 5. configured-but-unloadable keystore: LOUD refusal at server
      //    start on BOTH doors — never a silent fallback to plaintext
      //    (pgwire used to defer to the per-connection probe, where the
      //    catch-all swallowed it and every client just dropped)
      val bogus = java.nio.file.Files.createTempFile("graft_tls_bad", ".p12")
      java.nio.file.Files.write(bogus, "not a keystore".getBytes(UTF_8))
      withProps(Some(bogus)) {
        val e = intercept[IllegalStateException](
          GraftHttpApi.start(spark, port = 0))
        assert(e.getMessage.contains("refusing to serve plaintext"),
          e.getMessage)
        val e2 = intercept[IllegalStateException](
          GraftPgWire.start(spark, port = 0))
        assert(e2.getMessage.contains("refusing to serve plaintext"),
          e2.getMessage)
      }
    } finally {
      handle.stop()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("certificate ROTATION behind an unchanged keystore path takes " +
      "effect on the next connection — no JVM restart, no reset") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tls-rotate-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val ksA = genKeystore()
    val ksB = genKeystore()
    val handle = GraftPgWire.start(spark, port = 0)
    def serverCertSerial(port: Int): java.math.BigInteger = {
      val raw = new Socket("127.0.0.1", port)
      raw.setTcpNoDelay(true)
      val rout = new DataOutputStream(raw.getOutputStream)
      val rin = new DataInputStream(raw.getInputStream)
      rout.writeInt(8); rout.writeInt(80877103); rout.flush()
      assert(rin.read().toChar == 'S')
      val ssl = trustAll().getSocketFactory
        .createSocket(raw, "127.0.0.1", port, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.startHandshake()
      val serial = ssl.getSession.getPeerCertificates.head
        .asInstanceOf[java.security.cert.X509Certificate].getSerialNumber
      ssl.close()
      serial
    }
    try {
      withProps(Some(ksA)) {
        val before = serverCertSerial(handle.port)
        // rotate: keystore B's bytes land behind keystore A's PATH.
        // The mtime is bumped explicitly — coarse-granularity file
        // systems could otherwise stamp both writes in the same tick
        // (size alone already differs in practice, but the test must
        // not depend on that)
        java.nio.file.Files.copy(ksB, ksA,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(ksA,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + 5000))
        val after = serverCertSerial(handle.port)
        assert(after != before,
          "the rotated certificate must serve on the next connection")
        // stability: a third connection reuses the rebuilt context
        assert(serverCertSerial(handle.port) == after)
      }
    } finally {
      handle.stop()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
