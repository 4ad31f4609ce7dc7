package graft.server

import java.nio.file.{Files, Paths}
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** Front-door TLS — zero new jars, pure JSSE: both wire servers
  * (pgwire's SSLRequest upgrade, the HTTP API's HTTPS listener) pull
  * their server certificate from ONE keystore configuration:
  *
  *   -Dgraft.tls.keyStore=<path to a PKCS12/JKS keystore>
  *   -Dgraft.tls.keyStorePassword=<password>       (default empty)
  *   -Dgraft.tls.keyStoreType=<PKCS12|JKS>          (default PKCS12)
  *
  * Unconfigured (no `graft.tls.keyStore`) both doors keep their
  * documented plaintext behavior — pgwire answers the SSL probe with
  * 'N' and proceeds in clear, HTTP serves http:// — so TLS is strictly
  * opt-in and a missing keystore can never lock anyone out. A
  * CONFIGURED-but-unloadable keystore fails loudly at server start
  * (wrong password, bad path): silently serving plaintext when the
  * operator asked for TLS is the one wrong default.
  *
  * The context is built once and shared; the keystore file's
  * mtime+size are watched (one stat per connection), so ROTATING the
  * certificate behind the unchanged path takes effect on the next
  * connection — no JVM restart. Client-side trust (CA bundles,
  * pinning) stays the client's business, exactly as with Postgres'
  * own sslmode handling. */
object GraftTls {

  @volatile private var cached
      : Option[((String, String, String,
          java.nio.file.attribute.FileTime, Long, Any), SSLContext)] = None

  /** `-Dgraft.tls.required=true` refuses PLAINTEXT sessions on doors
    * that support an in-band upgrade (pgwire's SSLRequest): with just
    * the keystore set, pgwire accepts both probe-upgraded TLS and
    * plain startups (Postgres-without-hostssl parity); with this flag
    * it rejects a startup that never probed. The HTTP door needs no
    * flag — a configured keystore switches it to HTTPS-only. */
  def required: Boolean =
    sys.props.get("graft.tls.required").exists(_.equalsIgnoreCase("true"))

  /** The server SSLContext, when `-Dgraft.tls.keyStore` is set; None
    * otherwise. Throws (IllegalStateException with the story) when the
    * configured keystore cannot be loaded. Cached per (path, password,
    * type, file mtime, file size) — a changed prop OR a ROTATED
    * keystore file behind the unchanged path rebuilds on the next
    * connection (the stat is one syscall per accept; certificate
    * rotation needs no JVM restart). Each prop is read ONCE and the
    * captured values feed `load` — a prop flipped mid-call can never
    * cache a context under a mismatched key. */
  def serverContext(): Option[SSLContext] =
    sys.props.get("graft.tls.keyStore").map { path =>
      val pw = sys.props.getOrElse("graft.tls.keyStorePassword", "")
      val typ = sys.props.getOrElse("graft.tls.keyStoreType", "PKCS12")
      // mtime + size + fileKey (inode): mtime granularity can be
      // coarse and a renewed keystore of the same key size often has
      // the same byte length, but an atomic-rename rotation always
      // changes the inode — the triple together makes a missed
      // rotation require deliberate in-place overwrite with preserved
      // mtime (fileKey may be null on exotic file systems; it then
      // simply drops out of the comparison)
      val (mtime, size, fkey) =
        try {
          val p = Paths.get(path)
          val attrs = Files.readAttributes(p,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          (attrs.lastModifiedTime(), attrs.size(), attrs.fileKey(): Any)
        } catch {
          case e: Exception => throw new IllegalStateException(
            s"graft.tls.keyStore is set to '$path' but the keystore " +
              "could not be read — refusing to serve plaintext when " +
              s"TLS was asked for: ${e.getMessage}", e)
        }
      val key = (path, pw, typ, mtime, size, fkey)
      cached match {
        case Some((k, ctx)) if k == key => ctx
        case _ =>
          val ctx = load(path, pw, typ)
          cached = Some((key, ctx))
          ctx
      }
    }

  private def load(path: String, pwStr: String, typ: String): SSLContext =
    try {
      val pw = pwStr.toCharArray
      val ks = KeyStore.getInstance(typ)
      val in = Files.newInputStream(Paths.get(path))
      try ks.load(in, pw) finally in.close()
      val kmf = KeyManagerFactory.getInstance(
        KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, pw)
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, null, null)
      ctx
    } catch {
      case e: Exception => throw new IllegalStateException(
        s"graft.tls.keyStore is set to '$path' but the keystore could " +
          "not be loaded — refusing to serve plaintext when TLS was " +
          s"asked for: ${e.getMessage}", e)
    }

  /** Tests only: drop the cached context (e.g. after swapping the
    * keystore file behind the same path). */
  private[server] def reset(): Unit = cached = None
}
