package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level golden test: a hand-rolled Postgres v3 client drives the
  * pgwire front door over a real socket — SSL probe, startup, simple
  * queries, the graft temporal SQL surface, DML, multi-statement
  * batches, empty queries, errors, and extended-protocol rejection.
  * No Postgres client library exists in this environment, which makes
  * the test STRONGER: every byte of the protocol is asserted against
  * the published message formats rather than whatever a driver
  * tolerates.
  *
  * Needs its own SparkContext (extensions bind at session creation),
  * same pattern as GraftHttpApiSpec. */
class GraftPgWireSpec extends AnyFunSuite {

  /** Minimal protocol-v3 client. */
  private final class PgClient(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream))

    final case class Msg(tpe: Char, body: Array[Byte])

    def sslProbe(): Char = {
      out.writeInt(8); out.writeInt(80877103); out.flush()
      in.read().toChar
    }

    def startup(params: (String, String)*): Seq[Msg] = {
      val payload = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(payload)
      d.writeInt(196608)
      params.foreach { case (k, v) =>
        d.write(k.getBytes(UTF_8)); d.writeByte(0)
        d.write(v.getBytes(UTF_8)); d.writeByte(0)
      }
      d.writeByte(0)
      out.writeInt(4 + payload.size())
      payload.writeTo(out)
      out.flush()
      readUntilReady()
    }

    def query(sql: String): Seq[Msg] = {
      val bytes = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + bytes.length + 1)
      out.write(bytes); out.writeByte(0)
      out.flush()
      readUntilReady()
    }

    // ---- extended protocol client ----

    private def cstr(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8); java.util.Arrays.copyOf(b, b.length + 1)
    }
    private def msg(tpe: Char, payload: Array[Byte]): Unit = {
      out.writeByte(tpe); out.writeInt(4 + payload.length); out.write(payload)
    }
    def parseMsg(name: String, sql: String): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(name)); d.write(cstr(sql)); d.writeShort(0)
      msg('P', b.toByteArray)
    }
    def bindMsg(portal: String, stmt: String,
                params: Seq[Option[String]],
                resFormats: Seq[Short] = Nil): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(portal)); d.write(cstr(stmt))
      d.writeShort(0) // param format codes: default text
      d.writeShort(params.size)
      params.foreach {
        case None => d.writeInt(-1)
        case Some(v) =>
          val vb = v.getBytes(UTF_8); d.writeInt(vb.length); d.write(vb)
      }
      d.writeShort(resFormats.size) // result formats (empty = all text)
      resFormats.foreach(d.writeShort(_))
      msg('B', b.toByteArray)
    }
    def parseMsgTyped(name: String, sql: String, oids: Seq[Int]): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(name)); d.write(cstr(sql))
      d.writeShort(oids.size); oids.foreach(d.writeInt(_))
      msg('P', b.toByteArray)
    }
    /** Bind with explicit per-parameter format codes and raw bytes —
      * the binaryTransfer shape pgjdbc emits. */
    def bindMsgRaw(portal: String, stmt: String, paramFormats: Seq[Short],
                   params: Seq[Option[Array[Byte]]],
                   resFormats: Seq[Short] = Nil): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(portal)); d.write(cstr(stmt))
      d.writeShort(paramFormats.size); paramFormats.foreach(d.writeShort(_))
      d.writeShort(params.size)
      params.foreach {
        case None => d.writeInt(-1)
        case Some(vb) => d.writeInt(vb.length); d.write(vb)
      }
      d.writeShort(resFormats.size)
      resFormats.foreach(d.writeShort(_))
      msg('B', b.toByteArray)
    }
    def describeMsg(kind: Char, name: String): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(kind); b.write(cstr(name), 0, name.getBytes(UTF_8).length + 1)
      msg('D', b.toByteArray)
    }
    def executeMsg(portal: String, maxRows: Int): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(portal)); d.writeInt(maxRows)
      msg('E', b.toByteArray)
    }
    def closeStmtMsg(name: String): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write('S'); b.write(cstr(name), 0, name.getBytes(UTF_8).length + 1)
      msg('C', b.toByteArray)
    }
    def sync(): Seq[Msg] = {
      msg('S', Array.emptyByteArray); out.flush(); readUntilReady()
    }

    def terminate(): Unit = {
      out.writeByte('X'); out.writeInt(4); out.flush()
      sock.close()
    }

    // ---- SASL (SCRAM) client ----

    /** Send startup and read ONE message (the auth request). */
    def startupOnly(params: (String, String)*): Msg = {
      val payload = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(payload)
      d.writeInt(196608)
      params.foreach { case (k, v) =>
        d.write(k.getBytes(UTF_8)); d.writeByte(0)
        d.write(v.getBytes(UTF_8)); d.writeByte(0)
      }
      d.writeByte(0)
      out.writeInt(4 + payload.size())
      payload.writeTo(out)
      out.flush()
      readMsg()
    }
    def saslInitial(mech: String, resp: Array[Byte]): Msg = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(mech)); d.writeInt(resp.length); d.write(resp)
      msg('p', b.toByteArray); out.flush(); readMsg()
    }
    def saslResponse(resp: Array[Byte]): Msg = {
      msg('p', resp); out.flush(); readMsg()
    }
    def readOne(): Msg = readMsg()
    def readReady(): Seq[Msg] = readUntilReady()

    // ---- COPY sub-protocol client ----

    /** Send the COPY query; return the FIRST response message —
      * CopyInResponse ('G') on success, ErrorResponse ('E') otherwise
      * (caller then drains to ReadyForQuery). */
    def copyStart(sql: String): Msg = {
      val bytes = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + bytes.length + 1)
      out.write(bytes); out.writeByte(0)
      out.flush()
      readMsg()
    }
    def copyData(chunk: Array[Byte]): Unit = {
      out.writeByte('d'); out.writeInt(4 + chunk.length); out.write(chunk)
    }
    def copyDone(): Seq[Msg] = {
      out.writeByte('c'); out.writeInt(4); out.flush()
      readUntilReady()
    }
    def copyFail(reason: String): Seq[Msg] = {
      val b = reason.getBytes(UTF_8)
      out.writeByte('f'); out.writeInt(4 + b.length + 1)
      out.write(b); out.writeByte(0); out.flush()
      readUntilReady()
    }
    def drainUntilReady(): Seq[Msg] = readUntilReady()

    private def readMsg(): Msg = {
      val tpe = in.read()
      assert(tpe >= 0, "server closed connection unexpectedly")
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      Msg(tpe.toChar, body)
    }

    private def readUntilReady(): Seq[Msg] = {
      val msgs = Seq.newBuilder[Msg]
      var done = false
      while (!done) {
        val m = readMsg()
        msgs += m
        if (m.tpe == 'Z') done = true
      }
      msgs.result()
    }
  }

  private object Wire {
    /** Parse a RowDescription body → (name, oid) per field. */
    def rowDesc(body: Array[Byte]): Seq[(String, Int)] = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
      val n = in.readShort()
      (0 until n.toInt).map { _ =>
        val name = cstr(in)
        in.readInt() // table oid
        in.readShort() // attr
        val oid = in.readInt()
        in.readShort(); in.readInt(); in.readShort() // typlen, typmod, fmt
        (name, oid)
      }
    }

    /** Parse a DataRow body → column text values (None = NULL). */
    def dataRow(body: Array[Byte]): Seq[Option[String]] = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
      val n = in.readShort()
      (0 until n.toInt).map { _ =>
        val len = in.readInt()
        if (len == -1) None
        else {
          val b = new Array[Byte](len); in.readFully(b)
          Some(new String(b, UTF_8))
        }
      }
    }

    /** Parse a DataRow body → RAW column bytes (None = NULL). */
    def dataRowRaw(body: Array[Byte]): Seq[Option[Array[Byte]]] = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
      val n = in.readShort()
      (0 until n.toInt).map { _ =>
        val len = in.readInt()
        if (len == -1) None
        else { val b = new Array[Byte](len); in.readFully(b); Some(b) }
      }
    }

    /** Parse a RowDescription body → per-field format codes. */
    def rowDescFormats(body: Array[Byte]): Seq[Short] = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
      val n = in.readShort()
      (0 until n.toInt).map { _ =>
        cstr(in); in.readInt(); in.readShort(); in.readInt()
        in.readShort(); in.readInt()
        in.readShort()
      }
    }

    /** Parse an ErrorResponse body → field-code → value. */
    def errFields(body: Array[Byte]): Map[Char, String] = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
      val m = Map.newBuilder[Char, String]
      var done = false
      while (!done) {
        val code = in.read()
        if (code <= 0) done = true
        else m += (code.toChar -> cstr(in))
      }
      m.result()
    }

    def cstr(in: DataInputStream): String = {
      val buf = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b > 0) { buf.write(b); b = in.read() }
      new String(buf.toByteArray, UTF_8)
    }
  }

  test("pgwire: startup, queries, temporal SQL, DML, batches, errors") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_pgw").toString
    val table = new graft.GraftTable(spark, dir, Seq("bal"))
    GraftServer.register("pgaccts", table)
    val handle = GraftPgWire.start(spark, port = 0)

    try {
      val c = new PgClient(handle.port)

      // SSL probe declined with 'N', connection continues in clear
      assert(c.sslProbe() == 'N')

      // startup → AuthenticationOk, ParameterStatus*, BackendKeyData, RFQ
      val hello = c.startup("user" -> "tester", "database" -> "graft")
      assert(hello.head.tpe == 'R')
      assert(new DataInputStream(new java.io.ByteArrayInputStream(
        hello.head.body)).readInt() == 0) // AuthenticationOk
      val params = hello.filter(_.tpe == 'S').map(m => {
        val in = new DataInputStream(new java.io.ByteArrayInputStream(m.body))
        (Wire.cstr(in), Wire.cstr(in))
      }).toMap
      assert(params("server_encoding") == "UTF8")
      assert(params.contains("server_version"))
      assert(hello.exists(_.tpe == 'K'))
      assert(hello.last.tpe == 'Z' && hello.last.body.head == 'I'.toByte)

      // plain SELECT: typed RowDescription + text DataRows + tag
      val r1 = c.query(
        "SELECT 1 AS a, 2.5D AS b, 'x' AS c, true AS d, " +
          "CAST(NULL AS INT) AS e, ARRAY(1, 2) AS f")
      val desc = Wire.rowDesc(r1.find(_.tpe == 'T').get.body)
      assert(desc.map(_._1) == Seq("a", "b", "c", "d", "e", "f"))
      assert(desc.map(_._2) == Seq(23, 701, 25, 16, 23, 1007)) // _int4
      val row = Wire.dataRow(r1.find(_.tpe == 'D').get.body)
      assert(row == Seq(Some("1"), Some("2.5"), Some("x"), Some("t"),
        None, Some("{1,2}")))
      val tag = r1.find(_.tpe == 'C').get
      assert(Wire.cstr(new DataInputStream(
        new java.io.ByteArrayInputStream(tag.body))) == "SELECT 1")

      // graft DML over the wire: INSERT returns the tx id as a row
      val ins = c.query(
        "INSERT INTO pgaccts (_id, bal) VALUES (1, 100.0D), (2, 200.0D)")
      assert(Wire.rowDesc(ins.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("tx_id"))
      assert(Wire.dataRow(ins.find(_.tpe == 'D').get.body) ==
        Seq(Some("0")))
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        ins.find(_.tpe == 'C').get.body))) == "INSERT 0 1")

      Thread.sleep(1100)
      val between = java.time.LocalDateTime.now()
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      Thread.sleep(1100)
      val up = c.query("UPDATE pgaccts SET bal = 150.0D WHERE _id = 1")
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        up.find(_.tpe == 'C').get.body))) == "UPDATE 1")

      // current read sees the update
      val cur = c.query(
        "SELECT _id, bal FROM pgaccts WHERE _id = 1")
      assert(Wire.dataRow(cur.find(_.tpe == 'D').get.body) ==
        Seq(Some("1"), Some("150.0")))

      // graft temporal SQL through the same socket: time travel
      val asOf = c.query(
        s"SELECT _id, bal FROM pgaccts FOR SYSTEM_TIME AS OF " +
          s"TIMESTAMP '$between' WHERE _id = 1")
      assert(Wire.dataRow(asOf.find(_.tpe == 'D').get.body) ==
        Seq(Some("1"), Some("100.0")))

      // multi-statement batch: two result cycles, one ReadyForQuery
      val batch = c.query(
        "SELECT 'a;b' AS s; SELECT 2 AS two")
      assert(batch.count(_.tpe == 'T') == 2)
      assert(batch.count(_.tpe == 'Z') == 1)
      val batchRows = batch.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(batchRows == Seq(Seq(Some("a;b")), Seq(Some("2"))))

      // empty query → EmptyQueryResponse
      val empty = c.query("   ")
      assert(empty.exists(_.tpe == 'I'))

      // syntax error → ErrorResponse with a syntax SQLSTATE; usable after
      val bad = c.query("SELEKT 1")
      val ef = Wire.errFields(bad.find(_.tpe == 'E').get.body)
      assert(ef('C') == "42601", ef)
      assert(ef('S') == "ERROR")
      val after = c.query("SELECT 7 AS ok")
      assert(Wire.dataRow(after.find(_.tpe == 'D').get.body) ==
        Seq(Some("7")))

      // error mid-batch aborts the remainder
      val aborted = c.query("SELECT 1 AS a; SELEKT nope; SELECT 3 AS c")
      assert(aborted.count(_.tpe == 'T') == 1)
      assert(aborted.exists(_.tpe == 'E'))

      // ---- extended protocol: the standard JDBC flow ----
      // Parse named stmt + Describe(S) + Bind + Describe(P) + Execute
      c.parseMsg("s1", "SELECT _id, bal FROM pgaccts WHERE _id = $1")
      c.describeMsg('S', "s1")
      c.bindMsg("", "s1", Seq(Some("1")))
      c.describeMsg('P', "")
      c.executeMsg("", 0)
      val ext = c.sync()
      assert(ext.exists(_.tpe == '1'), "ParseComplete") // 1
      assert(ext.exists(_.tpe == '2'), "BindComplete") // 2
      val pd = ext.find(_.tpe == 't').get // ParameterDescription
      assert(new DataInputStream(
        new java.io.ByteArrayInputStream(pd.body)).readShort() == 1)
      assert(ext.count(_.tpe == 'T') == 2) // Describe S and P
      assert(Wire.dataRow(ext.find(_.tpe == 'D').get.body) ==
        Seq(Some("1"), Some("150.0")))
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        ext.find(_.tpe == 'C').get.body))) == "SELECT 1")

      // DML through the extended protocol: described WITHOUT executing
      // (tx_id synthesized), executed EXACTLY ONCE at Execute
      c.parseMsg("", "UPDATE pgaccts SET bal = bal + 1.0D WHERE _id = 2")
      c.bindMsg("", "", Nil)
      c.describeMsg('P', "")
      c.executeMsg("", 0)
      val dml = c.sync()
      assert(Wire.rowDesc(dml.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("tx_id"))
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        dml.find(_.tpe == 'C').get.body))) == "UPDATE 1")
      val after2 = c.query("SELECT bal FROM pgaccts WHERE _id = 2")
      assert(Wire.dataRow(after2.find(_.tpe == 'D').get.body) ==
        Seq(Some("201.0"))) // exactly +1.0 — described, not double-run

      // fetchSize flow: Execute(maxRows=1) SUSPENDS the portal over a
      // live iterator; the next Execute RESUMES (no re-run), then
      // CommandComplete counts every row served across both fetches
      c.parseMsg("", "SELECT _id FROM pgaccts ORDER BY _id")
      c.bindMsg("", "", Nil)
      c.executeMsg("", 1)
      c.executeMsg("", 0)
      val lim = c.sync()
      assert(lim.count(_.tpe == 'D') == 2) // 1 + the remaining 1
      assert(lim.exists(_.tpe == 's'), "PortalSuspended after maxRows")
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        lim.find(_.tpe == 'C').get.body))) == "SELECT 2")
      val fetched = lim.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(fetched == Seq(Seq(Some("1")), Seq(Some("2"))))

      // DML behind a leading comment still classifies as DML: Describe
      // synthesizes tx_id WITHOUT executing; the value moves exactly once
      c.parseMsg("", "/* retry */ UPDATE pgaccts SET bal = bal + 1.0D " +
        "WHERE _id = 2")
      c.bindMsg("", "", Nil)
      c.describeMsg('P', "")
      c.executeMsg("", 0)
      val cdml = c.sync()
      assert(Wire.rowDesc(cdml.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("tx_id"))
      val after2b = c.query("SELECT bal FROM pgaccts WHERE _id = 2")
      assert(Wire.dataRow(after2b.find(_.tpe == 'D').get.body) ==
        Seq(Some("202.0"))) // 201 + exactly 1

      // backslash-bearing parameter survives splicing intact (the
      // injection vector: Spark's lexer honors \' inside literals)
      c.parseMsg("", "SELECT $1 AS p")
      c.bindMsg("", "", Seq(Some("""C:\dir\""")))
      c.executeMsg("", 0)
      val bs = c.sync()
      assert(Wire.dataRow(bs.find(_.tpe == 'D').get.body) ==
        Seq(Some("""C:\dir\""")))

      // multi-statement DML batch over simple protocol = ONE atomic tx
      // (the parser's ;-batch path): one result cycle, one tx id
      val txb = c.query(
        "INSERT INTO pgaccts (_id, bal) VALUES (10, 1.0D); " +
          "INSERT INTO pgaccts (_id, bal) VALUES (11, 2.0D)")
      assert(txb.count(_.tpe == 'T') == 1, "unsplit atomic DML batch")
      val txn = c.query("SELECT count(*) AS n FROM pgaccts")
      assert(Wire.dataRow(txn.find(_.tpe == 'D').get.body) ==
        Seq(Some("4")))

      // NULL parameter and masked-$ safety in one statement
      c.parseMsg("", "SELECT $1 AS a, '$2 not a param' AS b")
      c.bindMsg("", "", Seq(None))
      c.describeMsg('P', "")
      c.executeMsg("", 0)
      val nul = c.sync()
      assert(Wire.dataRow(nul.find(_.tpe == 'D').get.body) ==
        Seq(None, Some("$2 not a param")))

      // extended-protocol error: unknown portal -> ErrorResponse, then
      // everything until Sync is skipped and the connection recovers
      c.executeMsg("no_such_portal", 0)
      c.parseMsg("", "SELECT 1") // must be ignored (error state)
      val err = c.sync()
      assert(err.exists(_.tpe == 'E'))
      assert(!err.exists(_.tpe == '1'), "post-error Parse must be skipped")
      assert(err.last.tpe == 'Z')

      // Close a named statement
      c.parseMsg("s2", "SELECT 5 AS five")
      c.closeStmtMsg("s2")
      val closed = c.sync()
      assert(closed.exists(_.tpe == '3'), "CloseComplete")

      val stillUp = c.query("SELECT 9 AS ok")
      assert(Wire.dataRow(stillUp.find(_.tpe == 'D').get.body) ==
        Seq(Some("9")))

      c.terminate()

      // a second, concurrent-style connection works after the first died
      val c2 = new PgClient(handle.port)
      assert(c2.sslProbe() == 'N')
      c2.startup("user" -> "other")
      val again = c2.query("SELECT count(*) AS n FROM pgaccts")
      assert(Wire.dataRow(again.find(_.tpe == 'D').get.body) ==
        Seq(Some("4"))) // 1, 2 + the atomic batch's 10, 11
      c2.terminate()
    } finally {
      handle.stop()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("pgwire COPY FROM STDIN: bulk load, nulls/escapes, fail, errors") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-copy-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_pgcopy").toString
    val table = new graft.GraftTable(spark, dir, Seq("bal", "note"))
    GraftServer.register("pgcopy", table)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pgfresh").toString
    GraftServer.register("pgfresh",
      new graft.GraftTable(spark, dir2, Seq("note")))
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      assert(c.sslProbe() == 'N')
      c.startup("user" -> "tester", "database" -> "graft")

      // seed types through DML so COPY text casts to double/string
      c.query("INSERT INTO pgcopy (_id, bal, note) VALUES (1, 1.5D, 'seed')")

      // explicit columns; CopyInResponse must declare text + 3 columns
      val g = c.copyStart("COPY pgcopy (_id, bal, note) FROM STDIN")
      assert(g.tpe == 'G', s"expected CopyInResponse, got ${g.tpe}")
      val gin = new DataInputStream(new java.io.ByteArrayInputStream(g.body))
      assert(gin.readByte() == 0) // overall format: text
      assert(gin.readShort() == 3)
      assert((0 until 3).forall(_ => gin.readShort() == 0))
      // two rows; the frame boundary splits row 2 mid-cell, row 2 has a
      // NULL bal and an escaped tab + backslash in note; \. terminates
      c.copyData("2\t200.5\thello\n3\t\\N\twor".getBytes(UTF_8))
      c.copyData("ld a\\tb c\\\\d\n\\.\n".getBytes(UTF_8))
      val doneMsgs = c.copyDone()
      val tag = Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        doneMsgs.find(_.tpe == 'C').get.body)))
      assert(tag == "COPY 2", tag)

      // rows landed typed: bal renders as a double (oid 701), the
      // escapes decoded, NULL preserved
      val sel = c.query(
        "SELECT _id, bal, note FROM pgcopy WHERE _id >= 2 ORDER BY _id")
      val desc = Wire.rowDesc(sel.find(_.tpe == 'T').get.body)
      // bal typed double (701), note text (25) — proves the COPY text
      // cells cast to the types the seed INSERT established
      assert(desc(1)._2 == 701 && desc(2)._2 == 25, desc)
      val rows = sel.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(rows == Seq(
        Seq(Some("2"), Some("200.5"), Some("hello")),
        Seq(Some("3"), None, Some("world a\tb c\\d"))), rows)

      // no column list → (_id ++ payloadColumns) order
      val g2 = c.copyStart("COPY pgcopy FROM STDIN")
      assert(g2.tpe == 'G')
      c.copyData("4\t4.25\tdefaults\n".getBytes(UTF_8))
      c.copyDone()
      val sel2 = c.query("SELECT bal, note FROM pgcopy WHERE _id = 4")
      assert(Wire.dataRow(sel2.find(_.tpe == 'D').get.body) ==
        Seq(Some("4.25"), Some("defaults")))

      // CopyFail: server answers 57014 and writes NOTHING
      val g3 = c.copyStart("COPY pgcopy (_id, bal, note) FROM STDIN")
      assert(g3.tpe == 'G')
      c.copyData("9\t9.0\tghost\n".getBytes(UTF_8))
      val failMsgs = c.copyFail("client changed its mind")
      val err = Wire.errFields(failMsgs.find(_.tpe == 'E').get.body)
      assert(err('C') == "57014", err)
      assert(err('M').contains("changed its mind"))
      val ghost = c.query("SELECT count(*) AS n FROM pgcopy WHERE _id = 9")
      assert(Wire.dataRow(ghost.find(_.tpe == 'D').get.body) == Seq(Some("0")))

      // fresh table, no prior types: payload ingests as text
      val g4 = c.copyStart("COPY pgfresh (_id, note) FROM STDIN")
      assert(g4.tpe == 'G')
      c.copyData("1\tplain text\n".getBytes(UTF_8))
      c.copyDone()
      val self = c.query("SELECT note FROM pgfresh WHERE _id = 1")
      assert(Wire.dataRow(self.find(_.tpe == 'D').get.body) ==
        Seq(Some("plain text")))

      // unknown table → 42P01 before any CopyInResponse
      val g5 = c.copyStart("COPY nosuch (_id) FROM STDIN")
      assert(g5.tpe == 'E')
      assert(Wire.errFields(g5.body)('C') == "42P01")
      c.drainUntilReady()

      // bad cast inside the data → error, connection stays usable
      val g6 = c.copyStart("COPY pgcopy (_id, bal, note) FROM STDIN")
      assert(g6.tpe == 'G')
      c.copyData("5\tnot_a_number\tx\n".getBytes(UTF_8))
      val badMsgs = c.copyDone()
      assert(badMsgs.exists(_.tpe == 'E'), badMsgs.map(_.tpe))
      val after = c.query("SELECT count(*) AS n FROM pgcopy WHERE _id = 5")
      assert(Wire.dataRow(after.find(_.tpe == 'D').get.body) == Seq(Some("0")))

      // COPY must be alone in a Query batch
      val mixed = c.query("SELECT 1; COPY pgcopy (_id) FROM STDIN")
      assert(Wire.errFields(mixed.find(_.tpe == 'E').get.body)('C') == "0A000")

      // a NULL _id cell must be rejected BEFORE the tx commits — a
      // committed null id would crash every later fold of the table
      val g7 = c.copyStart("COPY pgcopy (_id, bal, note) FROM STDIN")
      assert(g7.tpe == 'G')
      c.copyData("\\N\t1.0\toops\n".getBytes(UTF_8))
      val nullMsgs = c.copyDone()
      assert(nullMsgs.exists(_.tpe == 'E'), nullMsgs.map(_.tpe))
      val stillWorks = c.query("SELECT count(*) AS n FROM pgcopy")
      assert(stillWorks.exists(_.tpe == 'D'), "table must stay readable")

      // a bad column list fails BEFORE CopyInResponse (no upload
      // buffered for a statement that can never apply)
      val g8 = c.copyStart("COPY pgcopy (_id, nope) FROM STDIN")
      assert(g8.tpe == 'E', s"expected pre-G error, got ${g8.tpe}")
      assert(Wire.errFields(g8.body)('M').contains("unknown COPY columns"))
      c.drainUntilReady()

      // COPY TO STDOUT: CopyOutResponse + CopyData frames whose text is
      // byte-for-byte what COPY FROM accepts (escapes, \N) + CopyDone
      val exp = c.query("COPY (SELECT _id, bal, note FROM pgcopy " +
        "WHERE _id IN (2, 3) ORDER BY _id) TO STDOUT")
      val h = exp.find(_.tpe == 'H').get
      val hin = new DataInputStream(new java.io.ByteArrayInputStream(h.body))
      assert(hin.readByte() == 0 && hin.readShort() == 3)
      val text = exp.filter(_.tpe == 'd')
        .map(m => new String(m.body, UTF_8)).mkString
      assert(text == "2\t200.5\thello\n3\t\\N\tworld a\\tb c\\\\d\n", text)
      assert(exp.exists(_.tpe == 'c')) // CopyDone
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        exp.find(_.tpe == 'C').get.body))) == "COPY 2")
      // round-trip: the exported text parses back to the same cells
      assert(GraftPgWire.parseCopyText(text) == Seq(
        Seq("2", "200.5", "hello"),
        Seq("3", null, "world a\tb c\\d")))

      // table form exports the current state through the session parser
      val expT = c.query("COPY pgfresh TO STDOUT")
      assert(expT.exists(_.tpe == 'H') && expT.count(_.tpe == 'd') == 1)

      // aggregate upload cap: a COPY past graft.pgwire.copyMaxBytes is
      // rejected with an ErrorResponse (frames drained, nothing
      // written, connection stays protocol-synced and usable)
      System.setProperty("graft.pgwire.copyMaxBytes", "64")
      try {
        val g9 = c.copyStart("COPY pgcopy (_id, bal, note) FROM STDIN")
        assert(g9.tpe == 'G')
        (0 until 10).foreach(i =>
          c.copyData(s"${100 + i}\t1.0\t0123456789abcdef\n".getBytes(UTF_8)))
        val capMsgs = c.copyDone()
        val capErr = Wire.errFields(capMsgs.find(_.tpe == 'E').get.body)
        assert(capErr('M').contains("copyMaxBytes"), capErr)
        val none = c.query(
          "SELECT count(*) AS n FROM pgcopy WHERE _id >= 100")
        assert(Wire.dataRow(none.find(_.tpe == 'D').get.body) ==
          Seq(Some("0")))
      } finally System.clearProperty("graft.pgwire.copyMaxBytes")

      c.terminate()
    } finally {
      handle.stop()
      GraftServer.unregister("pgcopy")
      GraftServer.unregister("pgfresh")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("extended protocol: binary result format honors Bind's codes") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-binres-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      assert(c.sslProbe() == 'N')
      c.startup("user" -> "tester")
      val sql = "SELECT CAST(5 AS BIGINT) AS a, CAST(2.5 AS DOUBLE) AS b, " +
        "'héllo' AS c, CAST(NULL AS DOUBLE) AS d, " +
        "CAST(12.34 AS DECIMAL(10,2)) AS e"

      // all-binary (one format code covers every column)
      c.parseMsg("s1", sql)
      c.bindMsg("p1", "s1", Nil, resFormats = Seq(1))
      c.describeMsg('P', "p1")
      c.executeMsg("p1", 0)
      val m1 = c.sync()
      assert(Wire.rowDescFormats(m1.find(_.tpe == 'T').get.body) ==
        Seq[Short](1, 1, 1, 1, 1))
      val r1 = Wire.dataRowRaw(m1.find(_.tpe == 'D').get.body)
      assert(java.nio.ByteBuffer.wrap(r1(0).get).getLong == 5L)
      assert(java.nio.ByteBuffer.wrap(r1(1).get).getDouble == 2.5)
      assert(new String(r1(2).get, UTF_8) == "héllo")
      assert(r1(3).isEmpty)
      assert(PgBinary.decodeNumeric(r1(4).get).toPlainString == "12.34")

      // mixed per-column formats: text columns render as before
      c.parseMsg("s2", sql)
      c.bindMsg("p2", "s2", Nil, resFormats = Seq[Short](0, 1, 0, 1, 0))
      c.describeMsg('P', "p2")
      c.executeMsg("p2", 0)
      val m2 = c.sync()
      assert(Wire.rowDescFormats(m2.find(_.tpe == 'T').get.body) ==
        Seq[Short](0, 1, 0, 1, 0))
      val r2 = Wire.dataRowRaw(m2.find(_.tpe == 'D').get.body)
      assert(new String(r2(0).get, UTF_8) == "5")
      assert(java.nio.ByteBuffer.wrap(r2(1).get).getDouble == 2.5)
      assert(new String(r2(4).get, UTF_8) == "12.34")

      // unknown format code → error at Bind, session recovers
      c.parseMsg("s3", sql)
      c.bindMsg("p3", "s3", Nil, resFormats = Seq[Short](3))
      val m3 = c.sync()
      assert(m3.exists(_.tpe == 'E'), m3.map(_.tpe))
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))

      // per-column format count that doesn't match the width → the
      // Postgres wording, not an IndexOutOfBounds, and session recovers
      c.parseMsg("s4", sql)
      c.bindMsg("p4", "s4", Nil, resFormats = Seq[Short](0, 1))
      c.describeMsg('P', "p4")
      c.executeMsg("p4", 0)
      val m4 = c.sync()
      val e4 = Wire.errFields(m4.find(_.tpe == 'E').get.body)
      assert(e4('M').contains("result formats"), e4)
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))
      c.terminate()
    } finally {
      handle.stop()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("extended protocol: BINARY parameter format decodes through the " +
      "declared oids — result identical to the text twin; mixed-format " +
      "Bind; undeclared/unknown oids refuse with the story") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-binparam-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      import org.apache.spark.sql.types._
      val c = new PgClient(handle.port)
      assert(c.sslProbe() == 'N')
      c.startup("user" -> "tester")
      // every binary-decodable family: int8/int4/int2, float8/float4,
      // bool, text, numeric, date, timestamptz, plus a NULL
      val sql = "SELECT $1 AS a, $2 AS b, $3 AS c, $4 AS d, $5 AS e, " +
        "$6 AS f, $7 AS g, $8 AS h, $9 AS i, $10 AS t, $11 AS z"
      val oids = Seq(20, 23, 21, 701, 700, 16, 25, 1700, 1082, 1184, 701)
      val tsVal = java.sql.Timestamp.valueOf("2024-03-05 06:07:08.123456")
      val binParams: Seq[Option[Array[Byte]]] = Seq(
        Some(PgBinary.encodeValue(LongType, 41L)),
        Some(PgBinary.encodeValue(IntegerType, 7)),
        Some(PgBinary.encodeValue(ShortType, 3.toShort)),
        Some(PgBinary.encodeValue(DoubleType, 2.25)),
        Some(PgBinary.encodeValue(FloatType, 1.5f)),
        Some(PgBinary.encodeValue(BooleanType, true)),
        Some(PgBinary.encodeValue(StringType, "héllo")),
        Some(PgBinary.encodeValue(DecimalType(10, 2),
          new java.math.BigDecimal("12.34"))),
        Some(PgBinary.encodeValue(DateType,
          java.sql.Date.valueOf("2024-03-05"))),
        Some(PgBinary.encodeValue(TimestampType, tsVal)),
        None)
      val txtParams: Seq[Option[String]] = Seq(
        Some("41"), Some("7"), Some("3"), Some("2.25"), Some("1.5"),
        Some("true"), Some("héllo"), Some("12.34"), Some("2024-03-05"),
        Some("2024-03-05 06:07:08.123456"), None)

      c.parseMsg("st", sql)
      c.bindMsg("pt", "st", txtParams)
      c.executeMsg("pt", 0)
      val mt = c.sync()
      val textRow = Wire.dataRow(mt.find(_.tpe == 'D').get.body)

      c.parseMsgTyped("sb", sql, oids)
      c.bindMsgRaw("pb", "sb", Seq.fill[Short](11)(1), binParams)
      c.executeMsg("pb", 0)
      val mb = c.sync()
      val binRow = Wire.dataRow(mb.find(_.tpe == 'D').get.body)
      assert(binRow == textRow, s"binary $binRow vs text $textRow")

      // the single-format-code-covers-all spelling
      c.bindMsgRaw("pb1", "sb", Seq[Short](1), binParams)
      c.executeMsg("pb1", 0)
      assert(Wire.dataRow(c.sync().find(_.tpe == 'D').get.body) == textRow)

      // MIXED formats in one Bind: odd params text, even binary
      val mixedFmts = (0 until 11).map(i => (i % 2).toShort)
      val mixed = (0 until 11).map(i =>
        if (i % 2 == 0) txtParams(i).map(_.getBytes(UTF_8))
        else binParams(i))
      c.bindMsgRaw("pm", "sb", mixedFmts, mixed)
      c.executeMsg("pm", 0)
      val mm = c.sync()
      assert(Wire.dataRow(mm.find(_.tpe == 'D').get.body) == textRow)

      // Describe echoes the DECLARED oids back (clients key their
      // binary-send decision off ParameterDescription)
      c.describeMsg('S', "sb")
      val md = c.sync()
      val pd = md.find(_.tpe == 't').get.body
      val pdIn = new DataInputStream(new java.io.ByteArrayInputStream(pd))
      assert(pdIn.readShort() == 11)
      assert((0 until 11).map(_ => pdIn.readInt()) == oids)

      // a binary param with NO declared oid refuses with the story
      c.parseMsg("su", sql) // zero declared oids
      c.bindMsgRaw("pu", "su", Seq[Short](1),
        Seq(Some(PgBinary.encodeValue(LongType, 1L))) ++
          txtParams.drop(1).map(_.map(_.getBytes(UTF_8))))
      val mu = c.sync()
      val eu = Wire.errFields(mu.find(_.tpe == 'E').get.body)
      assert(eu('M').contains("declared type oid"), eu)
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))

      // an oid with no binary decode refuses with the story
      c.parseMsgTyped("sj", "SELECT $1 AS j", Seq(114)) // json
      c.bindMsgRaw("pj", "sj", Seq[Short](1),
        Seq(Some("{}".getBytes(UTF_8))))
      val mj = c.sync()
      val ej = Wire.errFields(mj.find(_.tpe == 'E').get.body)
      assert(ej('M').contains("no binary decode"), ej)
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))

      // an unknown parameter format code refuses, session recovers
      c.parseMsgTyped("sf", "SELECT $1 AS k", Seq(20))
      c.bindMsgRaw("pf", "sf", Seq[Short](3),
        Seq(Some(PgBinary.encodeValue(LongType, 1L))))
      val mf = c.sync()
      val ef = Wire.errFields(mf.find(_.tpe == 'E').get.body)
      assert(ef('M').contains("parameter format code"), ef)
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))
      c.terminate()
    } finally {
      handle.stop()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("pgwire SCRAM-SHA-256: full exchange, wrong password, downgrade refusal") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-scram-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // password file: one cleartext entry, one pre-derived PG verifier
    val salt = Array.tabulate[Byte](16)(_.toByte)
    val ver = PgScram.verifier("s3cret2", salt, 4096)
    val b64 = java.util.Base64.getEncoder
    val pwFile = java.nio.file.Files.createTempFile("graft_pw", ".conf")
    java.nio.file.Files.writeString(pwFile,
      "# users\nalice:hunter2\n" +
        s"bob:SCRAM-SHA-256$$4096:${b64.encodeToString(salt)}$$" +
        s"${b64.encodeToString(ver.storedKey)}:" +
        s"${b64.encodeToString(ver.serverKey)}\n")
    val auth = PgAuth.fromPasswordFile(pwFile.toString)
    val handle = GraftPgWire.start(spark, port = 0, auth = auth)

    import javax.crypto.Mac
    import javax.crypto.spec.SecretKeySpec
    def hmac(k: Array[Byte], m: String): Array[Byte] = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(k, "HmacSHA256")); mac.doFinal(m.getBytes(UTF_8))
    }
    def sha(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)

    /** RFC 5802 client; returns (messages seen, server v= verified?). */
    def login(user: String, password: String): (Seq[Char], Boolean) = {
      val c = new PgClient(handle.port)
      try {
        val authReq = c.startupOnly("user" -> user, "database" -> "graft")
        assert(authReq.tpe == 'R')
        val code = new DataInputStream(
          new java.io.ByteArrayInputStream(authReq.body)).readInt()
        assert(code == 10, s"expected AuthenticationSASL, got $code")
        assert(new String(authReq.body.drop(4), UTF_8).startsWith("SCRAM-SHA-256"))
        val cnonce = "clientnonce" + user.hashCode.abs
        val bare = s"n=,r=$cnonce"
        val cont = c.saslInitial("SCRAM-SHA-256", s"n,,$bare".getBytes(UTF_8))
        if (cont.tpe == 'E') return (Seq('E'), false)
        val sf = new String(cont.body.drop(4), UTF_8)
        val attrs = sf.split(",").map(kv => kv.substring(0, 1) -> kv.substring(2)).toMap
        val nonce = attrs("r"); val it = attrs("i").toInt
        assert(nonce.startsWith(cnonce) && nonce.length > cnonce.length,
          "server must extend the client nonce")
        val sp = PgScram.saltedPassword(password,
          java.util.Base64.getDecoder.decode(attrs("s")), it)
        val ck = hmac(sp, "Client Key")
        val sk = sha(ck)
        val woProof = s"c=biws,r=$nonce"
        val authMsg = s"$bare,$sf,$woProof"
        val sig = hmac(sk, authMsg)
        val proof = ck.zip(sig).map { case (a, x) => (a ^ x).toByte }
        val fin = c.saslResponse(
          (woProof + ",p=" + b64.encodeToString(proof)).getBytes(UTF_8))
        if (fin.tpe == 'E') return (Seq('E'), false)
        // AuthenticationSASLFinal carries v=<b64 HMAC(ServerKey, authMsg)>
        assert(new DataInputStream(new java.io.ByteArrayInputStream(
          fin.body)).readInt() == 12)
        val v = new String(fin.body.drop(4), UTF_8).stripPrefix("v=")
        val serverOk = java.util.Arrays.equals(
          java.util.Base64.getDecoder.decode(v),
          hmac(hmac(sp, "Server Key"), authMsg))
        val ok = c.readOne() // AuthenticationOk
        assert(ok.tpe == 'R')
        c.readReady() // params + RFQ
        // the authenticated session actually serves queries
        val q = c.query("SELECT 21 * 2 AS x")
        assert(Wire.dataRow(q.find(_.tpe == 'D').get.body) == Seq(Some("42")))
        c.terminate()
        (Seq('R'), serverOk)
      } finally try c.terminate() catch { case _: Throwable => }
    }

    try {
      // happy paths: cleartext-derived and verifier-form entries
      assert(login("alice", "hunter2") == (Seq('R'), true))
      assert(login("bob", "s3cret2") == (Seq('R'), true))
      // wrong password / unknown user → 28P01 after the full exchange
      assert(login("alice", "wrong")._1 == Seq('E'))
      assert(login("mallory", "hunter2")._1 == Seq('E'))

      // downgrade refusal: PLAIN mechanism is rejected outright
      val c1 = new PgClient(handle.port)
      c1.startupOnly("user" -> "alice")
      val plain = c1.saslInitial("PLAIN", " alice hunter2".getBytes(UTF_8))
      assert(plain.tpe == 'E')
      assert(Wire.errFields(plain.body)('M').contains("downgrade refused"))
      c1.terminate()

      // channel-binding downgrade: p=… gs2 header refused (no -PLUS)
      val c2 = new PgClient(handle.port)
      c2.startupOnly("user" -> "alice")
      val cb = c2.saslInitial("SCRAM-SHA-256",
        "p=tls-server-end-point,,n=,r=abc".getBytes(UTF_8))
      assert(cb.tpe == 'E')
      assert(Wire.errFields(cb.body)('M').contains("channel binding"))
      c2.terminate()
    } finally {
      handle.stop()
      java.nio.file.Files.deleteIfExists(pwFile)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("pgwire EXPLAIN: temporal pushdown inspectable over the wire") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-explain-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pgexp").toString
    val table = new graft.GraftTable(spark, dir, Seq("bal"))
    GraftServer.register("pgexp", table)
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      c.startup("user" -> "tester", "database" -> "graft")
      c.query("INSERT INTO pgexp (_id, bal) VALUES (1, 10.0D), (2, 20.0D)")
      table.compact() // parquet base → footer-stat pushdown is visible

      val ex = c.query("EXPLAIN SELECT _id, bal FROM pgexp " +
        "FOR SYSTEM_TIME AS OF TIMESTAMP '2030-01-01 00:00:00'")
      assert(Wire.rowDesc(ex.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("plan"))
      val plan = Wire.dataRow(ex.find(_.tpe == 'D').get.body).head.get
      assert(plan.contains("PushedFilters"), plan)
      assert(plan.contains("_system_from") || plan.contains("_system_to"),
        plan.take(2000))
      // the formatted physical rendering, not a logical echo
      assert(plan.contains("(1) Scan") || plan.contains("Physical Plan"), plan.take(500))

      // plain Spark statements explain too, and modes are honored
      val simple = c.query("EXPLAIN SIMPLE SELECT 1 AS one")
      val sPlan = Wire.dataRow(simple.find(_.tpe == 'D').get.body).head.get
      assert(sPlan.contains("Physical Plan"), sPlan)

      // refusals: ANALYZE (would execute), DML (executes at submit)
      val an = c.query("EXPLAIN ANALYZE SELECT 1")
      assert(Wire.errFields(an.find(_.tpe == 'E').get.body)('M')
        .contains("EXPLAIN ANALYZE"))
      val dml = c.query("EXPLAIN INSERT INTO pgexp (_id, bal) VALUES (3, 1.0D)")
      assert(Wire.errFields(dml.find(_.tpe == 'E').get.body)('M')
        .contains("cannot EXPLAIN"))
      // procedure statements EXPLAIN too (r12): substitution runs in
      // plans-only mode — the physical plan of the substituted pipeline
      // comes back over the wire, no jobs
      val proc = c.query("EXPLAIN SELECT * FROM " +
        "graft_exact_dedup('pgexp', '_id', 'bal')")
      val pPlan = Wire.dataRow(proc.find(_.tpe == 'D').get.body).head.get
      assert(pPlan.contains("Physical Plan") || pPlan.contains("(1) "),
        pPlan.take(300))
      assert(pPlan.toLowerCase.contains("hashaggregate") ||
        pPlan.toLowerCase.contains("exchange"), pPlan.take(2000))
      // and the refused DML did NOT run
      val n = c.query("SELECT count(*) AS n FROM pgexp")
      assert(Wire.dataRow(n.find(_.tpe == 'D').get.body) == Seq(Some("2")))

      // EXPLAIN REWRITE (r16): the aggregate-navigation decision over
      // the wire — a HIT names the view and carries the rewritten
      // text; plain EXPLAIN renders the NAVIGATED plan (explain/
      // execution parity); a tx past the watermark flips the decision
      // and the trace names the freshness gate
      c.query("CREATE MATERIALIZED VIEW pgexp_mv WITH " +
        "(valid_at = '2030-01-01 00:00:00', buckets = 4, " +
        "rewrite = 'trusted') AS SELECT bal, COUNT(*) AS n " +
        "FROM pgexp GROUP BY bal")
      val navQ = "SELECT bal, COUNT(*) AS n FROM pgexp GROUP BY bal"
      val er = c.query(s"EXPLAIN REWRITE $navQ")
      assert(Wire.rowDesc(er.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("navigated", "rewritten", "trace"))
      val erRow = Wire.dataRow(er.find(_.tpe == 'D').get.body)
      assert(Seq("t", "true").contains(erRow.head.get.toLowerCase),
        erRow.toString)
      assert(erRow(1).get.contains("FROM pgexp_mv"), erRow(1).get)
      assert(erRow(2).get.contains("navigated onto pgexp_mv"),
        erRow(2).get)
      val exn = c.query(s"EXPLAIN $navQ")
      val nPlan = Wire.dataRow(exn.find(_.tpe == 'D').get.body).head.get
      assert(nPlan.contains("matview"),
        s"EXPLAIN must render the navigated plan:\n${nPlan.take(1500)}")
      c.query("INSERT INTO pgexp (_id, bal) VALUES (3, 10.0D)")
      val er2 = c.query(s"EXPLAIN REWRITE $navQ")
      val er2Row = Wire.dataRow(er2.find(_.tpe == 'D').get.body)
      assert(Seq("f", "false").contains(er2Row.head.get.toLowerCase),
        er2Row.toString)
      assert(er2Row(2).get.contains("stale"), er2Row(2).get)
      c.query("DROP MATERIALIZED VIEW pgexp_mv")
      c.terminate()
    } finally {
      handle.stop()
      GraftServer.unregister("pgexp")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("PgScram verifier: derive == parse(render) round trip") {
    val salt = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val v = PgScram.verifier("pw", salt, 4096)
    val b64 = java.util.Base64.getEncoder
    val rendered = s"SCRAM-SHA-256$$4096:${b64.encodeToString(salt)}$$" +
      s"${b64.encodeToString(v.storedKey)}:${b64.encodeToString(v.serverKey)}"
    val parsed = PgScram.parseVerifier(rendered)
    assert(parsed.iterations == 4096)
    assert(java.util.Arrays.equals(parsed.salt, salt))
    assert(java.util.Arrays.equals(parsed.storedKey, v.storedKey))
    assert(java.util.Arrays.equals(parsed.serverKey, v.serverKey))
    assert(intercept[IllegalArgumentException](
      PgScram.parseVerifier("md5abc")).getMessage.contains("not a"))
  }

  test("PgScram exchange: m= mandatory extension and wrong c= are refused") {
    val salt = Array.tabulate[Byte](16)(i => (i * 3).toByte)
    val ver = PgScram.verifier("pw", salt, 4096)
    val b64 = java.util.Base64.getEncoder
    def hmac(k: Array[Byte], m: String): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256"))
      mac.doFinal(m.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    def sha(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
    // RFC 5802 §5.1: m= in client-first announces a mandatory extension
    // the server doesn't know — the exchange MUST fail, before any
    // secret-derived byte is produced
    val exM = new PgScram.Exchange("u", _ => Some(ver), "SNONCE")
    assert(intercept[IllegalArgumentException](
      exM.serverFirst("n,,m=ext,n=,r=cn")).getMessage
      .contains("mandatory extension"))
    // c= in client-final MUST equal base64(gs2 header from client-first):
    // run one valid-proof exchange per c= candidate and flip only c=
    def attempt(cAttr: String): Option[String] = {
      val ex = new PgScram.Exchange("u", _ => Some(ver), "SNONCE")
      val bare = "n=,r=cn"
      val sf = ex.serverFirst(s"n,,$bare")
      val nonce = sf.split(",").find(_.startsWith("r=")).get.substring(2)
      val sp = PgScram.saltedPassword("pw", salt, 4096)
      val ck = hmac(sp, "Client Key")
      val woProof = s"c=$cAttr,r=$nonce"
      val sig = hmac(sha(ck), s"$bare,$sf,$woProof")
      val proof = ck.zip(sig).map { case (a, x) => (a ^ x).toByte }
      ex.verifyClientFinal(woProof + ",p=" + b64.encodeToString(proof))
    }
    assert(attempt("biws").isDefined) // biws = b64("n,,") — the real header
    assert(attempt("eSws").isEmpty) // eSws = b64("y,,") — header mismatch
    assert(attempt("cD10bHMtdW5pcXVlLCws").isEmpty) // fabricated p=… header
  }

  test("pgwire: LLM procedures + matview DDL are plain SQL text") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-proc-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // corpus with exact dup + near-dup pairs, plus a vector table
    val texts = (0 until 20).map(i =>
      (i.toLong, (0 until 10).map(j => s"t${(i * 37 + j * 11) % 211}").mkString(" ")))
    val dups = Seq((100L, texts(0)._2), (101L, texts(1)._2 + " tX"))
    (texts ++ dups).toDF("doc_id", "text").createOrReplaceTempView("wdocs")
    (0 until 16).map(i => (i.toLong,
        (0 until 6).map(j => math.cos(i * 1.1 + j)).toArray))
      .toDF("vec_id", "v").createOrReplaceTempView("wembs")
    val dir = java.nio.file.Files.createTempDirectory("graft_pgmv").toString
    val table = new graft.GraftTable(spark, dir, Seq("grp", "bal"))
    GraftServer.register("wireaccts", table)
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      assert(c.sslProbe() == 'N')
      c.startup("user" -> "tester", "database" -> "graft")

      // dedup candidates as composable SQL text over the wire
      val dd = c.query(
        "SELECT id_a, id_b FROM graft_minhash_candidates(" +
          "'wdocs', 'doc_id', 'text', k => 16, bands => 8, " +
          "min_jaccard => 0.9) ORDER BY id_a, id_b")
      val ddRows = dd.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(ddRows.contains(Seq(Some("0"), Some("100"))),
        s"exact dup pair must surface: $ddRows errs=" +
          dd.filter(_.tpe == 'E').map(m => Wire.errFields(m.body)))

      // ANN top-k: the query vector's own id ranks first
      val ann = c.query(
        "SELECT vec_id FROM graft_ann_topk('wembs','vec_id','v', 7, 3)")
      val annIds = ann.filter(_.tpe == 'D')
        .map(m => Wire.dataRow(m.body).head.get)
      assert(annIds.length == 3 && annIds.head == "7", annIds)

      // procedures CHAIN in one statement (r12): an inner graft_* call
      // inside the outer call's inline-subquery table arg substitutes
      // recursively — the quantile gate OVER repetition metrics needs
      // one round trip, not an intermediate view
      val chain = c.query(
        "SELECT count(*) AS n FROM graft_quantile_keep(" +
          "'( SELECT ''all'' AS dom, doc_id, top2_frac FROM " +
          "graft_repetition(''wdocs'', ''doc_id'', ''text'') )', " +
          "'dom', 'top2_frac', 0.0)")
      assert(Wire.dataRow(chain.find(_.tpe == 'D').get.body)
        == Seq(Some("22")),
        chain.filter(_.tpe == 'E').map(m => Wire.errFields(m.body)))

      // mixture sample: exact count through the text path
      val mix = c.query(
        "SELECT count(*) AS n FROM graft_mixture_sample(" +
          "'(SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN ''e'' ELSE ''o'' " +
          "END AS dom FROM wdocs)', 'doc_id', 'dom', " +
          "map('e', 0.5, 'o', 0.5), 8)")
      assert(Wire.dataRow(mix.find(_.tpe == 'D').get.body) == Seq(Some("8")))

      // a strict-mode violation surfaces as a wire ERROR, not a hang
      val bad = c.query(
        "SELECT * FROM graft_mixture_sample('wdocs', 'doc_id', 'text', " +
          "map('nope', 1.0), 5)")
      assert(bad.exists(_.tpe == 'E'), bad.map(_.tpe))

      // matview DDL lifecycle over the wire
      c.query("INSERT INTO wireaccts (_id, grp, bal) VALUES " +
        "(1, 'a', 10), (2, 'a', 20), (3, 'b', 5)")
      val created = c.query(
        "CREATE MATERIALIZED VIEW wire_mv WITH (valid_at = " +
          "'2030-01-01 00:00:00', buckets = 4) AS SELECT grp, " +
          "COUNT(*) AS n, SUM(bal) AS total FROM wireaccts GROUP BY grp")
      assert(Wire.rowDesc(created.find(_.tpe == 'T').get.body).map(_._1) ==
        Seq("view", "fact_tx", "dim_tx"))
      val r1 = c.query("SELECT grp, n, total FROM wire_mv ORDER BY grp")
        .filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(r1 == Seq(Seq(Some("a"), Some("2"), Some("30")),
        Seq(Some("b"), Some("1"), Some("5"))))
      c.query("INSERT INTO wireaccts (_id, grp, bal) VALUES (4, 'b', 7)")
      c.query("REFRESH MATERIALIZED VIEW wire_mv")
      val r2 = c.query("SELECT n, total FROM wire_mv WHERE grp = 'b'")
        .filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(r2 == Seq(Seq(Some("2"), Some("12"))))
      val dropped = c.query("DROP MATERIALIZED VIEW wire_mv")
      assert(Wire.dataRow(dropped.find(_.tpe == 'D').get.body) ==
        Seq(Some("wire_mv"), Some("t")))

      // text-analysis procedure family over the wire
      val li = c.query("SELECT count(*) AS n FROM graft_lang_id(" +
        "'wdocs', 'doc_id', 'text')")
      assert(Wire.dataRow(li.find(_.tpe == 'D').get.body) == Seq(Some("22")))
      // maintenance statements: compact + vacuum the registered table
      val comp = c.query("OPTIMIZE wireaccts")
      assert(Wire.dataRow(comp.find(_.tpe == 'D').get.body) ==
        Seq(Some("wireaccts"), Some("COMPACT"), Some("t")))
      val vac = c.query("VACUUM wireaccts")
      assert(Wire.dataRow(vac.find(_.tpe == 'D').get.body) ==
        Seq(Some("wireaccts"), Some("VACUUM"), Some("t")))
      val after = c.query("SELECT count(*) AS n FROM wireaccts")
      assert(Wire.dataRow(after.find(_.tpe == 'D').get.body) ==
        Seq(Some("4")), "data survives the wire-driven lifecycle")

      c.terminate()
    } finally {
      handle.stop()
      GraftServer.unregister("wireaccts")
      GraftMatviews.reset()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("pgwire COPY BINARY arrays: float4[] embeddings round-trip byte-exact") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.lit
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-array-copy-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def mkTable(n: String): graft.GraftTable = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_$n").toString
      val t = new graft.GraftTable(spark, d, Seq("emb"))
      // pin the payload type the COPY decoder casts under
      t.put(Seq((0L, Seq(0.5f, -1.25f))).toDF("id", "e"), $"id",
        lit("2020-01-01").cast("timestamp"), None, Seq("emb" -> $"e"), ts0)
      GraftServer.register(n, t)
      t
    }
    mkTable("pgarr"); mkTable("pgarr2")
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      c.startup("user" -> "tester")
      val at = ArrayType(FloatType)
      def tuple(fields: Seq[Option[Array[Byte]]]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(bos)
        d.writeShort(fields.size)
        fields.foreach {
          case None => d.writeInt(-1)
          case Some(b) => d.writeInt(b.length); d.write(b)
        }
        bos.toByteArray
      }
      def enc(dt: DataType, v: Any) = Some(PgBinary.encodeValue(dt, v))

      // binary load: plain vector, null element, empty array, NULL array
      val g = c.copyStart("COPY pgarr (_id, emb) FROM STDIN BINARY")
      assert(g.tpe == 'G', s"${g.tpe}")
      val payload = PgBinary.Header ++
        tuple(Seq(enc(LongType, 1L), enc(at, Seq(1.0f, 2.5f)))) ++
        tuple(Seq(enc(LongType, 2L), enc(at, Seq[Any](null, 3.5f)))) ++
        tuple(Seq(enc(LongType, 3L), enc(at, Seq.empty[Float]))) ++
        tuple(Seq(enc(LongType, 4L), None)) ++
        Array[Byte](-1, -1)
      c.copyData(payload)
      val done = c.copyDone()
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        done.find(_.tpe == 'C').get.body))) == "COPY 4")

      // text rendering is now the PG array literal, oid the pg array oid
      val sel = c.query("SELECT _id, emb FROM pgarr WHERE _id >= 1 ORDER BY _id")
      assert(Wire.rowDesc(sel.find(_.tpe == 'T').get.body).map(_._2) ==
        Seq(20, 1021)) // int8, _float4
      val rows = sel.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(rows == Seq(
        Seq(Some("1"), Some("{1.0,2.5}")),
        Seq(Some("2"), Some("{null,3.5}")),
        Seq(Some("3"), Some("{}")),
        Seq(Some("4"), None)), rows)

      // binary export parses, re-imports, and re-exports byte-exact
      val exp = c.query("COPY (SELECT _id, emb FROM pgarr WHERE _id >= 1 " +
        "ORDER BY _id) TO STDOUT (FORMAT binary)")
      val exported = exp.filter(_.tpe == 'd').map(_.body)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      val parsed = PgBinary.parseCopyBinary(exported, Seq(LongType, at))
      assert(parsed == Seq(
        Seq("1", "[1.0,2.5]"),
        Seq("2", "[null,3.5]"),
        Seq("3", "[]"),
        Seq("4", null)), parsed)
      val g2 = c.copyStart(
        "COPY pgarr2 (_id, emb) FROM STDIN WITH (FORMAT binary)")
      assert(g2.tpe == 'G')
      c.copyData(exported)
      c.copyDone()
      val exp2 = c.query("COPY (SELECT _id, emb FROM pgarr2 WHERE _id >= 1 " +
        "ORDER BY _id) TO STDOUT (FORMAT binary)")
      val exported2 = exp2.filter(_.tpe == 'd').map(_.body)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      assert(java.util.Arrays.equals(exported, exported2),
        "export → import → export must be byte-exact")

      // text COPY accepts the PG literal (incl. pg's UPPERCASE NULL
      // elements) and JSON spellings
      val gt = c.copyStart("COPY pgarr (_id, emb) FROM STDIN")
      assert(gt.tpe == 'G')
      c.copyData("10\t{4.5,5.5}\n11\t[6.5]\n12\t{7.5,NULL}\n".getBytes(UTF_8))
      c.copyDone()
      val tsel = c.query("SELECT emb FROM pgarr WHERE _id IN (10, 11, 12) " +
        "ORDER BY _id")
      assert(tsel.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body)) ==
        Seq(Seq(Some("{4.5,5.5}")), Seq(Some("{6.5}")),
          Seq(Some("{7.5,null}"))))

      // malformed array text fails the COPY loudly (FAILFAST, not null)
      val gb = c.copyStart("COPY pgarr (_id, emb) FROM STDIN")
      assert(gb.tpe == 'G')
      c.copyData("12\t{not,a,number}\n".getBytes(UTF_8))
      val bad = c.copyDone()
      assert(bad.exists(_.tpe == 'E'), bad.map(_.tpe))
      c.terminate()
    } finally {
      handle.stop()
      GraftServer.unregister("pgarr")
      GraftServer.unregister("pgarr2")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("PgBinary array codec: encode → decode = canonical json (property)") {
    import org.apache.spark.sql.types._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 12)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.const(null),
        Gen.choose(-1e6, 1e6).map(d => java.lang.Double.valueOf(d))))
    } yield xs
    (0 until 300).foreach { i =>
      val xs = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val enc = PgBinary.encodeValue(ArrayType(DoubleType), xs)
      val dec = PgBinary.decodeValue(ArrayType(DoubleType), enc)
      val want =
        if (xs.isEmpty) "[]"
        else xs.map(x => if (x == null) "null" else x.toString)
          .mkString("[", ",", "]")
      assert(dec == want, s"seed $i: $dec != $want")
    }
    // long and decimal element types too
    assert(PgBinary.decodeValue(ArrayType(LongType),
      PgBinary.encodeValue(ArrayType(LongType), Seq(1L, -7L))) == "[1,-7]")
    assert(PgBinary.decodeValue(ArrayType(DecimalType(10, 2)),
      PgBinary.encodeValue(ArrayType(DecimalType(10, 2)),
        Seq(new java.math.BigDecimal("12.34")))) == "[12.34]")
    // string elements json-quote on decode (import-only path)
    assert(PgBinary.decodeValue(ArrayType(StringType),
      PgBinary.encodeValue(ArrayType(StringType), Seq("a\"b", "c"))) ==
      """["a\"b","c"]""")
    // refusals: element-oid reinterpretation, >1-D, truncation
    val f4 = PgBinary.encodeValue(ArrayType(FloatType), Seq(1.0f))
    val om = intercept[IllegalArgumentException](
      PgBinary.decodeValue(ArrayType(DoubleType), f4))
    assert(om.getMessage.contains("element oid"), om.getMessage)
    val twoD = java.nio.ByteBuffer.allocate(12).putInt(2).putInt(0)
      .putInt(700).array()
    assert(intercept[IllegalArgumentException](
      PgBinary.decodeValue(ArrayType(FloatType), twoD))
      .getMessage.contains("1-D"))
    assert(intercept[IllegalArgumentException](
      PgBinary.decodeValue(ArrayType(FloatType), f4.take(14)))
      .getMessage.contains("COPY BINARY"))
  }

  test("pgwire COPY BINARY: typed load, nulls, export, re-import parity") {
    import org.apache.spark.sql.types._
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-pgwire-binary-copy-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_pgbin").toString
    GraftServer.register("pgbin",
      new graft.GraftTable(spark, dir, Seq("bal", "d", "note")))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pgbin2").toString
    GraftServer.register("pgbin2",
      new graft.GraftTable(spark, dir2, Seq("bal", "d", "note")))
    val handle = GraftPgWire.start(spark, port = 0)
    try {
      val c = new PgClient(handle.port)
      assert(c.sslProbe() == 'N')
      c.startup("user" -> "tester")
      // pin the payload types both tables decode binary fields under
      Seq("pgbin", "pgbin2").foreach(t => c.query(
        s"INSERT INTO $t (_id, bal, d, note) " +
          "VALUES (1, 1.5D, CAST(9.75 AS DECIMAL(12,2)), 'seed')"))

      def tuple(fields: Seq[Option[Array[Byte]]]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(bos)
        d.writeShort(fields.size)
        fields.foreach {
          case None => d.writeInt(-1)
          case Some(b) => d.writeInt(b.length); d.write(b)
        }
        bos.toByteArray
      }
      def enc(dt: DataType, v: Any) = Some(PgBinary.encodeValue(dt, v))

      // binary load: two rows, one with a NULL decimal; frames split
      // MID-TUPLE (the parser must treat frames as a byte stream)
      val g = c.copyStart("COPY pgbin (_id, bal, d, note) FROM STDIN BINARY")
      assert(g.tpe == 'G', s"expected CopyInResponse, got ${g.tpe}")
      val gin = new DataInputStream(new java.io.ByteArrayInputStream(g.body))
      assert(gin.readByte() == 1, "overall format must be binary")
      assert(gin.readShort() == 4)
      assert((0 until 4).forall(_ => gin.readShort() == 1),
        "per-column formats must be binary")
      val payload = PgBinary.Header ++
        tuple(Seq(enc(LongType, 2L), enc(DoubleType, 200.5),
          enc(DecimalType(12, 2), new java.math.BigDecimal("12.34")),
          enc(StringType, "hello"))) ++
        tuple(Seq(enc(LongType, 3L), enc(DoubleType, -0.25), None,
          enc(StringType, "wörld\t\\x"))) ++
        tuple(Seq(enc(LongType, 4L), None,
          enc(DecimalType(12, 2), new java.math.BigDecimal("-99999999.99")),
          enc(StringType, ""))) ++
        Array[Byte](-1, -1) // trailer int16 -1
      val (h1, h2) = payload.splitAt(payload.length / 2 + 3)
      c.copyData(h1); c.copyData(h2)
      val doneMsgs = c.copyDone()
      val tag = Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        doneMsgs.find(_.tpe == 'C').get.body)))
      assert(tag == "COPY 3", tag)

      val sel = c.query(
        "SELECT _id, bal, d, note FROM pgbin WHERE _id >= 2 ORDER BY _id")
      val rows = sel.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body))
      assert(rows == Seq(
        Seq(Some("2"), Some("200.5"), Some("12.34"), Some("hello")),
        Seq(Some("3"), Some("-0.25"), None, Some("wörld\t\\x")),
        Seq(Some("4"), None, Some("-99999999.99"), Some(""))), rows)

      // binary export: header/trailer framing + parseable payload
      val exp = c.query("COPY (SELECT _id, bal, d, note FROM pgbin " +
        "WHERE _id >= 2 ORDER BY _id) TO STDOUT (FORMAT binary)")
      val h = exp.find(_.tpe == 'H').get
      val hin = new DataInputStream(new java.io.ByteArrayInputStream(h.body))
      assert(hin.readByte() == 1 && hin.readShort() == 4)
      val exported = exp.filter(_.tpe == 'd').map(_.body)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      assert(exported.take(11).sameElements(PgBinary.Header.take(11)))
      val parsed = PgBinary.parseCopyBinary(exported,
        Seq(LongType, DoubleType, DecimalType(12, 2), StringType))
      assert(parsed == Seq(
        Seq("2", "200.5", "12.34", "hello"),
        Seq("3", "-0.25", null, "wörld\t\\x"),
        Seq("4", null, "-99999999.99", "")), parsed)

      // byte-exact round trip: the exported payload re-imports into a
      // second table and lands on identical rows
      val g2 = c.copyStart(
        "COPY pgbin2 (_id, bal, d, note) FROM STDIN WITH (FORMAT binary)")
      assert(g2.tpe == 'G')
      c.copyData(exported)
      val done2 = c.copyDone()
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        done2.find(_.tpe == 'C').get.body))) == "COPY 3")
      val sel2 = c.query(
        "SELECT _id, bal, d, note FROM pgbin2 WHERE _id >= 2 ORDER BY _id")
      assert(sel2.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body)) == rows)

      // unsupported format word → clear error, connection stays usable
      val bad = c.copyStart("COPY pgbin (_id) FROM STDIN WITH (FORMAT avro)")
      assert(bad.tpe == 'E')
      assert(Wire.errFields(bad.body)('M').contains("avro"))
      c.drainUntilReady()
      assert(c.query("SELECT 1 AS x").exists(_.tpe == 'D'))

      // CSV both directions with HEADER: \copy csv's spreadsheet flow.
      // Load two rows (one NULL bal, one quoted cell with comma+quote+
      // newline), then export with header and assert the exact bytes
      val gc = c.copyStart(
        "COPY pgbin (_id, bal, note) FROM STDIN WITH (FORMAT csv, HEADER)")
      assert(gc.tpe == 'G')
      val gcin = new DataInputStream(new java.io.ByteArrayInputStream(gc.body))
      assert(gcin.readByte() == 0, "csv negotiates as a text-format mode")
      c.copyData(("_id,bal,note\n" +
        "20,7.5,\"a,b\"\"c\nd\"\n" +
        "21,,\"\"\n").getBytes(UTF_8))
      val cmsgs = c.copyDone()
      assert(Wire.cstr(new DataInputStream(new java.io.ByteArrayInputStream(
        cmsgs.find(_.tpe == 'C').get.body))) == "COPY 2")
      val csel = c.query(
        "SELECT _id, bal, note FROM pgbin WHERE _id IN (20, 21) ORDER BY _id")
      assert(csel.filter(_.tpe == 'D').map(m => Wire.dataRow(m.body)) == Seq(
        Seq(Some("20"), Some("7.5"), Some("a,b\"c\nd")),
        Seq(Some("21"), None, Some(""))), "csv load")
      val cexp = c.query("COPY (SELECT _id, bal, note FROM pgbin " +
        "WHERE _id IN (20, 21) ORDER BY _id) TO STDOUT (FORMAT csv, HEADER)")
      val ctext = cexp.filter(_.tpe == 'd')
        .map(m => new String(m.body, UTF_8)).mkString
      assert(ctext == "_id,bal,note\n" +
        "20,7.5,\"a,b\"\"c\nd\"\n" +
        "21,,\"\"\n", ctext)
      // and the exported csv parses back to the same cells
      assert(GraftPgWire.parseCopyCsv(ctext).drop(1) == Seq(
        Seq("20", "7.5", "a,b\"c\nd"),
        Seq("21", null, "")))
      // HEADER outside csv is PG's own restriction
      val gh = c.copyStart("COPY pgbin (_id) FROM STDIN (FORMAT text, HEADER)")
      assert(gh.tpe == 'E')
      assert(Wire.errFields(gh.body)('M').contains("CSV"))
      c.drainUntilReady()

      // a FRESH table has no type for its payload columns: binary COPY
      // must refuse loudly (decoding a float8 field as UTF-8 would pin
      // mojibake as the column's values) instead of replying COPY n
      val fdir = java.nio.file.Files.createTempDirectory("graft_pgbf").toString
      GraftServer.register("pgbfresh",
        new graft.GraftTable(spark, fdir, Seq("bal")))
      try {
        // the refusal lands BEFORE CopyInResponse — no doomed upload
        // gets streamed or buffered
        val gf = c.copyStart("COPY pgbfresh (_id, bal) FROM STDIN BINARY")
        assert(gf.tpe == 'E', s"expected pre-G error, got ${gf.tpe}")
        val ferr = Wire.errFields(gf.body)
        assert(ferr('M').contains("bal") &&
          ferr('M').toLowerCase.contains("type"), ferr)
        c.drainUntilReady()
        // the rejected upload wrote NOTHING: a text COPY then lands as
        // the table's only row (and proves the connection recovered)
        val gt = c.copyStart("COPY pgbfresh (_id, bal) FROM STDIN")
        assert(gt.tpe == 'G')
        c.copyData("7\t1.5\n".getBytes(UTF_8))
        c.copyDone()
        val chk = c.query("SELECT count(*) AS n FROM pgbfresh")
        assert(Wire.dataRow(chk.find(_.tpe == 'D').get.body) == Seq(Some("1")))
      } finally GraftServer.unregister("pgbfresh")

      c.terminate()
    } finally {
      handle.stop()
      GraftServer.unregister("pgbin")
      GraftServer.unregister("pgbin2")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("COPY text round-trip property: escape → parse = identity") {
    // adversarial cells: every escape-relevant char, the \N lookalike,
    // multi-byte text — encode rows the way COPY TO does and assert
    // COPY FROM's parser recovers the exact cells
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(3, Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        'a', 'ü', '\\', '\t', '\n', '\r', 'N', '.', ' ')).map(_.mkString)))
    (0 until 500).foreach { i =>
      val cells = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val encoded = cells.map(GraftPgWire.copyEscape).mkString("\t") + "\n"
      assert(GraftPgWire.parseCopyText(encoded) == Seq(cells),
        s"seed $i: $cells")
    }
  }

  test("PgBinary numeric codec: encode → decode = identity (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      unscaled <- Gen.choose(-1000000000000000L, 1000000000000000L)
      scale <- Gen.choose(-4, 9)
    } yield java.math.BigDecimal.valueOf(unscaled, scale)
    (0 until 500).foreach { i =>
      val bd = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val back = PgBinary.decodeNumeric(PgBinary.encodeNumeric(bd))
      assert(back.compareTo(bd) == 0, s"seed $i: $bd -> $back")
      // a non-negative scale survives exactly (dscale carries it)
      if (bd.scale >= 0)
        assert(back.toPlainString == bd.toPlainString, s"seed $i")
    }
    // edge cases the generator may miss
    Seq("0", "0.0000", "-0.5", "10000", "9999.9999", "0.00009999",
      "-123456789.00001", "1E+8").foreach { s =>
      val bd = new java.math.BigDecimal(s)
      assert(PgBinary.decodeNumeric(PgBinary.encodeNumeric(bd))
        .compareTo(bd) == 0, s)
    }
  }

  test("PgBinary numeric codec: truncated fields fail as COPY errors, " +
      "not raw buffer underflows") {
    // header shorter than the 4 int16s
    val short = intercept[IllegalArgumentException](
      PgBinary.decodeNumeric(Array[Byte](0, 2, 0, 0)))
    assert(short.getMessage.contains("COPY BINARY"))
    // header declares 3 digit groups but carries only 1
    val full = PgBinary.encodeNumeric(new java.math.BigDecimal("123456789"))
    val lying = full.take(10)
    val trunc = intercept[IllegalArgumentException](
      PgBinary.decodeNumeric(lying))
    assert(trunc.getMessage.contains("COPY BINARY"), trunc.getMessage)
    assert(trunc.getMessage.contains("digit groups"), trunc.getMessage)
  }

  test("PgBinary timestamp_ntz length error names the ntz wire type") {
    import org.apache.spark.sql.types._
    val e = intercept[IllegalArgumentException](
      PgBinary.decodeValue(TimestampNTZType, Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("timestamp_ntz"), e.getMessage)
  }

  test("PgBinary timestamptz: absolute micros render in the SESSION " +
      "zone, so a non-UTC session round-trips instants exactly") {
    import org.apache.spark.sql.types._
    // 2020-06-01T12:00:00Z == 08:00 in New York (EDT): the decoded text
    // must be the NY wall clock, because copyFrom will cast it back in
    // the session zone — UTC rendering would shift the instant by 4h
    val instant = java.time.Instant.parse("2020-06-01T12:00:00.250Z")
    val enc = PgBinary.encodeValue(TimestampType,
      java.sql.Timestamp.from(instant))
    val ny = java.time.ZoneId.of("America/New_York")
    assert(PgBinary.decodeValue(TimestampType, enc, ny) ==
      "2020-06-01 08:00:00.250000")
    assert(PgBinary.decodeValue(TimestampType, enc) ==
      "2020-06-01 12:00:00.250000") // UTC default unchanged
    // Instant values (spark.sql.datetime.java8API mode) encode too
    assert(PgBinary.encodeValue(TimestampType, instant).toSeq == enc.toSeq)
    // NTZ stays a zone-free wall clock whatever the session zone
    val ntz = PgBinary.encodeValue(TimestampNTZType,
      java.time.LocalDateTime.parse("2020-06-01T12:00:00.250"))
    assert(PgBinary.decodeValue(TimestampNTZType, ntz, ny) ==
      "2020-06-01 12:00:00.250000")
  }

  test("PgBinary value codec: every served type round-trips to its " +
      "canonical text cell") {
    import org.apache.spark.sql.types._
    def rt(dt: DataType, v: Any): String =
      PgBinary.decodeValue(dt, PgBinary.encodeValue(dt, v))
    assert(rt(LongType, 123456789012L) == "123456789012")
    assert(rt(IntegerType, -42) == "-42")
    assert(rt(ShortType, 7.toShort) == "7")
    assert(rt(DoubleType, 200.5) == "200.5")
    assert(rt(FloatType, 1.25f) == "1.25")
    assert(rt(BooleanType, true) == "true" && rt(BooleanType, false) == "false")
    assert(rt(StringType, "wörld\t\\x") == "wörld\t\\x")
    assert(rt(DateType, java.sql.Date.valueOf("1997-06-15")) == "1997-06-15")
    assert(rt(TimestampType,
      java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123456")) ==
      "2020-01-02 03:04:05.123456")
    assert(rt(TimestampType,
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")) ==
      "1969-12-31 23:59:59.500000") // pre-epoch floor division
    assert(rt(DecimalType(12, 2),
      new java.math.BigDecimal("-99.05")) == "-99.05")
    intercept[IllegalArgumentException] {
      PgBinary.decodeValue(BinaryType, Array[Byte](1))
    }
    // malformed field lengths fail as COPY errors, not buffer
    // underflows or silent prefix decodes
    Seq[(DataType, Int)](DateType -> 8, DateType -> 2,
      TimestampType -> 4, TimestampType -> 12,
      TimestampNTZType -> 4).foreach { case (dt, n) =>
      val e = intercept[IllegalArgumentException] {
        PgBinary.decodeValue(dt, Array.fill[Byte](n)(1))
      }
      assert(e.getMessage.contains("COPY BINARY"), s"$dt/$n: ${e.getMessage}")
    }
  }

  test("parseCopyCsv: quoting, embedded newlines, NULL vs empty, crlf") {
    assert(GraftPgWire.parseCopyCsv("a,b,c\n1,\"x,y\",\"q\"\"z\"\n") == Seq(
      Seq("a", "b", "c"), Seq("1", "x,y", "q\"z")))
    // unquoted empty = NULL; quoted empty = empty string
    assert(GraftPgWire.parseCopyCsv("1,,\"\"\n") == Seq(Seq("1", null, "")))
    // quoted cells span newlines; crlf row ends; missing final newline
    assert(GraftPgWire.parseCopyCsv("\"a\nb\",2\r\n3,4") == Seq(
      Seq("a\nb", "2"), Seq("3", "4")))
    assert(GraftPgWire.parseCopyCsv("").isEmpty)
    // a lone quoted empty cell is one row with one empty string
    assert(GraftPgWire.parseCopyCsv("\"\"\n") == Seq(Seq("")))
  }

  test("CSV round-trip property: escape → parse = identity") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(3, Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        'a', 'ü', '"', ',', '\n', '\r', ' ', '\\', 'N')).map(_.mkString)))
    (0 until 500).foreach { i =>
      val cells = gen.pureApply(Gen.Parameters.default, Seed(7000L + i))
      val encoded = cells.map(GraftPgWire.csvEscape).mkString(",") + "\n"
      // empty cells encode as "" (quoted) so they parse back as EMPTY
      // STRING, never NULL — identity holds for every non-null cell
      assert(GraftPgWire.parseCopyCsv(encoded) == Seq(cells),
        s"seed $i: $cells -> $encoded")
    }
  }

  test("parseCopyText: escapes, nulls, terminator, crlf") {
    val rows = GraftPgWire.parseCopyText(
      "1\ta\\tb\t\\N\r\n2\tc\\\\d\te\n\\.\nignored\n")
    assert(rows == Seq(
      Seq("1", "a\tb", null),
      Seq("2", "c\\d", "e")), rows)
    assert(GraftPgWire.parseCopyText("").isEmpty)
    assert(GraftPgWire.parseCopyText("\\.\n").isEmpty)
    // an INTERIOR empty line is a real one-empty-column row (what
    // COPY TO emits for an empty string) — only the artifact after
    // the final newline drops; the old filter silently lost the row
    assert(GraftPgWire.parseCopyText("\na\n") ==
      Seq(Seq(""), Seq("a")))
    assert(GraftPgWire.parseCopyText("a\n\nb\n") ==
      Seq(Seq("a"), Seq(""), Seq("b")))
  }

  test("substituteParams: escaping, NULL, masked spans, range check") {
    assert(GraftPgWire.substituteParams("SELECT $1, $2",
      Seq(Some("a'b"), None)) == "SELECT 'a''b', NULL")
    assert(GraftPgWire.substituteParams("SELECT $1",
      Seq(Some("""a\""" ))) == """SELECT 'a\\'""")
    assert(GraftPgWire.substituteParams("SELECT $1",
      Seq(Some("""\' OR 1=1 --"""))) == """SELECT '\\'' OR 1=1 --'""")
    assert(GraftPgWire.substituteParams("SELECT '$1' AS lit, $1",
      Seq(Some("x"))) == "SELECT '$1' AS lit, 'x'")
    assert(GraftPgWire.substituteParams("-- $1\nSELECT $1",
      Seq(Some("y"))) == "-- $1\nSELECT 'y'")
    assert(GraftPgWire.substituteParams("SELECT $1 + $1",
      Seq(Some("2"))) == "SELECT '2' + '2'")
    intercept[IllegalArgumentException] {
      GraftPgWire.substituteParams("SELECT $3", Seq(Some("x")))
    }
    // no params bound: text passes through untouched (cost-free path)
    assert(GraftPgWire.substituteParams("SELECT $tag", Nil) == "SELECT $tag")
  }

  test("splitStatements respects literals and comments") {
    assert(GraftPgWire.splitStatements("SELECT 1; SELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(GraftPgWire.splitStatements("SELECT ';' AS s") ==
      Seq("SELECT ';' AS s"))
    assert(GraftPgWire.splitStatements(
      "SELECT 1 -- trailing; not a split\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; not a split", "SELECT 2"))
    assert(GraftPgWire.splitStatements("/* a;b */ SELECT 1;") ==
      Seq("/* a;b */ SELECT 1"))
    assert(GraftPgWire.splitStatements(" ; ;") == Nil)
  }
}
