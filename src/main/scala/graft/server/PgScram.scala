package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 server-side authentication (RFC 5802 mechanics, RFC
  * 7677 hash, the exact exchange Postgres 10+ speaks) — pure JDK
  * crypto, no password ever crosses the wire or rests in cleartext
  * verifier form.
  *
  * The server stores only `(salt, iterations, StoredKey, ServerKey)`
  * per user (Postgres's `SCRAM-SHA-256$iter:salt$stored:server`
  * verifier format is parsed directly, so a pg_authid dump works as a
  * password file). A successful exchange proves the client knows the
  * password WITHOUT revealing it, and the final `v=` server signature
  * proves to the client the server held the real verifier — mutual.
  *
  * Downgrade posture: the ONLY mechanism advertised or accepted is
  * `SCRAM-SHA-256`. A client selecting anything else (PLAIN,
  * SCRAM-SHA-256-PLUS, md5 …) is refused before any secret-derived
  * byte is sent; a gs2 header claiming channel binding (`p=…`) is
  * likewise refused since the server never advertised -PLUS.
  */
object PgScram {

  final case class Verifier(iterations: Int, salt: Array[Byte],
                            storedKey: Array[Byte], serverKey: Array[Byte])

  val Mechanism = "SCRAM-SHA-256"
  val DefaultIterations = 4096

  private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  private def h(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Hi(password, salt, i) — PBKDF2-HMAC-SHA-256 (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int)
      : Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** Derive the stored verifier from a cleartext password. */
  def verifier(password: String, salt: Array[Byte],
               iterations: Int = DefaultIterations): Verifier = {
    val sp = saltedPassword(password, salt, iterations)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8))
    Verifier(iterations, salt, h(clientKey), serverKey)
  }

  /** Verify a CLEARTEXT password against a stored verifier — the HTTP
    * Basic path, sharing pgwire's password file and derived keys: RFC
    * 5802 §3, StoredKey = H(HMAC(SaltedPassword, "Client Key")), so a
    * presented password proves itself by re-deriving the stored key.
    * Constant-time compare; the cleartext never persists. */
  def verifyPassword(password: String, v: Verifier): Boolean = {
    val sp = saltedPassword(password, v.salt, v.iterations)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    MessageDigest.isEqual(h(clientKey), v.storedKey)
  }

  /** Parse Postgres's verifier text form:
    * `SCRAM-SHA-256$<iter>:<b64 salt>$<b64 StoredKey>:<b64 ServerKey>`. */
  def parseVerifier(s: String): Verifier = {
    val parts = s.split("\\$")
    require(parts.length == 3 && parts(0) == Mechanism,
      s"not a $Mechanism verifier")
    val Array(iter, salt) = parts(1).split(":", 2)
    val Array(stored, server) = parts(2).split(":", 2)
    val dec = Base64.getDecoder
    Verifier(iter.toInt, dec.decode(salt), dec.decode(stored),
      dec.decode(server))
  }

  /** One in-flight exchange. Construct per connection AFTER the client
    * picks the mechanism; drive with [[serverFirst]] then
    * [[verifyClientFinal]]. */
  final class Exchange(user: String, verifierOf: String => Option[Verifier],
                       serverNonce: String) {

    // An unknown user runs the SAME exchange against a deterministic
    // decoy verifier (salt = H(user) — stable across attempts, so the
    // failure is indistinguishable from a wrong password), then always
    // fails. The decoy KDF runs UNCONDITIONALLY — if only unknown users
    // paid the 4096-iteration PBKDF2, its several-ms cost would be a
    // timing oracle leaking exactly the existence signal the decoy
    // exists to hide.
    private val known = verifierOf(user)
    private val decoy =
      verifier("", h(("graft-decoy:" + user).getBytes(UTF_8)).take(16))
    private val ver = known.getOrElse(decoy)

    private var clientFirstBare: String = _
    private var serverFirstMsg: String = _
    private var fullNonce: String = _
    private var gs2Header: String = _

    /** Consume client-first-message, produce server-first-message. */
    def serverFirst(clientFirst: String): String = {
      // gs2 header: 'n' (no binding) or 'y' (client doesn't think we
      // support it) are acceptable; 'p=…' means the client negotiated
      // channel binding we never advertised — refuse.
      val gs2End =
        if (clientFirst.startsWith("n,") || clientFirst.startsWith("y,")) {
          val second = clientFirst.indexOf(',', 2)
          require(second >= 0, "malformed SCRAM client-first message")
          second + 1
        } else if (clientFirst.startsWith("p="))
          throw new IllegalArgumentException(
            "channel binding not offered (SCRAM-SHA-256-PLUS was not " +
              "advertised); refusing the binding downgrade")
        else throw new IllegalArgumentException(
          "malformed SCRAM gs2 header")
      gs2Header = clientFirst.substring(0, gs2End)
      clientFirstBare = clientFirst.substring(gs2End)
      val attrs = attrMap(clientFirstBare)
      // RFC 5802 §5.1: m= announces a mandatory extension; a server
      // that doesn't support it MUST fail the exchange (we support none)
      if (attrs.contains("m"))
        throw new IllegalArgumentException(
          "SCRAM mandatory extension (m=) is not supported")
      val clientNonce = attrs.getOrElse("r",
        throw new IllegalArgumentException("SCRAM client-first lacks r="))
      fullNonce = clientNonce + serverNonce
      serverFirstMsg = s"r=$fullNonce," +
        s"s=${Base64.getEncoder.encodeToString(ver.salt)},i=${ver.iterations}"
      serverFirstMsg
    }

    /** Verify client-final-message; Some(serverFinal) on success, None
      * on any failure (wrong proof, unknown user, nonce mismatch). */
    def verifyClientFinal(clientFinal: String): Option[String] = {
      val attrs = attrMap(clientFinal)
      val proofIdx = clientFinal.lastIndexOf(",p=")
      if (proofIdx < 0 || clientFirstBare == null) return None
      val withoutProof = clientFinal.substring(0, proofIdx)
      if (!attrs.get("r").contains(fullNonce)) return None
      // RFC 5802 §5.1: c= MUST be the base64 of the gs2 header the
      // client sent in client-first (channel-binding replay guard; the
      // signature covers c=, but the server-side equality check is
      // still required — Postgres enforces it too)
      if (!attrs.get("c").contains(
          Base64.getEncoder.encodeToString(gs2Header.getBytes(UTF_8))))
        return None
      val authMessage =
        s"$clientFirstBare,$serverFirstMsg,$withoutProof".getBytes(UTF_8)
      val proof = try Base64.getDecoder.decode(attrs.getOrElse("p", ""))
        catch { case _: IllegalArgumentException => return None }
      val clientSig = hmac(ver.storedKey, authMessage)
      if (proof.length != clientSig.length) return None
      val clientKey = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
      val ok = MessageDigest.isEqual(h(clientKey), ver.storedKey) &&
        known.isDefined
      if (!ok) None
      else Some("v=" + Base64.getEncoder.encodeToString(
        hmac(ver.serverKey, authMessage)))
    }

    private def attrMap(msg: String): Map[String, String] =
      msg.split(",").iterator.filter(_.length >= 2).filter(_.charAt(1) == '=')
        .map(kv => kv.substring(0, 1) -> kv.substring(2)).toMap
  }

  def newNonce(): String = {
    val b = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(b)
    Base64.getEncoder.encodeToString(b)
  }
}

/** pgwire authentication policy. */
sealed trait PgAuth
object PgAuth {
  /** AuthenticationOk to any startup (the default — loopback dev). */
  case object Trust extends PgAuth
  /** SCRAM-SHA-256 against per-user verifiers. */
  final case class Scram(users: Map[String, PgScram.Verifier]) extends PgAuth

  /** Load a password file: one `user:secret` per line (# comments).
    * `secret` is either a Postgres SCRAM verifier string (stored
    * as-is) or a cleartext password (converted to a verifier with a
    * per-user random salt at load — the cleartext never leaves this
    * call). */
  def fromPasswordFile(path: String): Scram = {
    val rng = new java.security.SecureRandom()
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val users = lines.iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val i = line.indexOf(':')
        require(i > 0, s"password file line is not user:secret")
        val (user, secret) = (line.substring(0, i), line.substring(i + 1))
        val ver =
          if (secret.startsWith(PgScram.Mechanism + "$"))
            PgScram.parseVerifier(secret)
          else {
            val salt = new Array[Byte](16); rng.nextBytes(salt)
            PgScram.verifier(secret, salt)
          }
        user -> ver
      }.toMap
    Scram(users)
  }
}
