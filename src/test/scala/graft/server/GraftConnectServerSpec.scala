package graft.server

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end over the WIRE: a raw gRPC client (the Spark-shaded grpc +
  * generated Connect stubs — no client library on the classpath)
  * submits transactions and temporal reads as plain SQL text to a
  * [[GraftServer]]-fronted session, and decodes the Arrow result
  * batches. This is the reference's "remote driver" surface
  * (README.adoc:14 Flight SQL) on Spark's native wire protocol.
  *
  * Needs its own SparkContext (extensions bind at session creation),
  * same pattern as GraftExtensionsSpec. */
class GraftConnectServerSpec extends AnyFunSuite {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("Connect front door: wire DML tx, current read, AS OF time travel") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-connect-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft_connect").toString
    val table = new graft.GraftTable(spark, dir, Seq("price"))
    GraftServer.register("prices", table)
    val port = freePort()
    GraftServer.start(spark, port)

    val channel = org.sparkproject.connect.grpc.ManagedChannelBuilder
      .forAddress("localhost", port).usePlaintext().build()
    try {
      import org.apache.spark.connect.proto._
      val stub = SparkConnectServiceGrpc.newBlockingStub(channel)
      val sessionId = java.util.UUID.randomUUID().toString

      /** Execute SQL text remotely; rows decoded from the Arrow IPC
        * stream chunks of the response. */
      def run(q: String): Seq[Seq[Any]] = {
        val req = ExecutePlanRequest.newBuilder()
          .setSessionId(sessionId)
          .setUserContext(UserContext.newBuilder()
            .setUserId("graft").setUserName("graft"))
          .setOperationId(java.util.UUID.randomUUID().toString)
          .setPlan(Plan.newBuilder().setRoot(
            Relation.newBuilder().setSql(SQL.newBuilder().setQuery(q))))
          .build()
        val out = Seq.newBuilder[Seq[Any]]
        val responses = stub.executePlan(req)
        while (responses.hasNext) {
          val resp = responses.next()
          if (resp.hasArrowBatch) {
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
              new java.io.ByteArrayInputStream(
                resp.getArrowBatch.getData.toByteArray), alloc)
            try {
              val root = rdr.getVectorSchemaRoot
              while (rdr.loadNextBatch()) {
                val vs = root.getFieldVectors.asScala
                (0 until root.getRowCount).foreach(i =>
                  out += vs.map(v => v.getObject(i) match {
                    case t: org.apache.arrow.vector.util.Text => t.toString
                    case other => other
                  }).toSeq)
              }
            } finally { rdr.close(); alloc.close() }
          }
        }
        out.result()
      }

      // 1. submit transactions over the wire: DML returns (tx_id)
      assert(run(
        "INSERT INTO prices (_id, price) VALUES (1, 10.0D), (2, 20.0D)")
        == Seq(Seq(0L)))
      // capture a basis between the two transactions (system time is
      // wall-clock-stamped; the sleeps keep the three instants distinct)
      Thread.sleep(1100)
      val betweenTx = java.time.LocalDateTime.now()
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      Thread.sleep(1100)
      assert(run("UPDATE prices SET price = 11.0D WHERE _id = 1")
        == Seq(Seq(1L)))

      // 2. read the current state over the wire (bare table name)
      assert(run("SELECT _id, price FROM prices ORDER BY _id")
        == Seq(Seq[Any](1L, 11.0), Seq[Any](2L, 20.0)))

      // 3. time travel: AS OF the basis between the txs -> the original
      // belief, over the wire, through the stock Connect protocol
      assert(run("SELECT _id, price FROM prices " +
        s"FOR SYSTEM_TIME AS OF '$betweenTx' ORDER BY _id")
        == Seq(Seq[Any](1L, 10.0), Seq[Any](2L, 20.0)))

      // 4. the graft custom expressions resolve over the wire too
      assert(run("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        == Seq(Seq(11.0)))

      // 5. SQL:2011 period predicates arrive as plain text and expand
      // server-side: full history where the system period contains the
      // captured basis = the belief held between the txs
      assert(run("SELECT _id, price FROM prices " +
        "FOR ALL SYSTEM_TIME FOR ALL APPLICATION_TIME " +
        s"WHERE prices.SYSTEM_TIME CONTAINS TIMESTAMP '$betweenTx' " +
        "ORDER BY _id")
        == Seq(Seq[Any](1L, 10.0), Seq[Any](2L, 20.0)))

      // 6. a `;`-separated DML batch over the wire is ONE transaction
      // (the reference's submit-tx vector): one tx id comes back, both
      // effects land atomically
      assert(run("UPDATE prices SET price = 99.0D WHERE _id = 2; " +
        "INSERT INTO prices (_id, price) VALUES (3, 30.0D)")
        == Seq(Seq(2L)))
      assert(run("SELECT _id, price FROM prices ORDER BY _id")
        == Seq(Seq[Any](1L, 11.0), Seq[Any](2L, 99.0), Seq[Any](3L, 30.0)))

      // 6b. WITH RECURSIVE ... UNION (distinct) over the wire: the
      // spelling Spark's analyzer rejects compiles onto the fixpoint
      // bridge server-side — cyclic closure terminates
      run("CREATE OR REPLACE TEMPORARY VIEW wire_edges AS " +
        "SELECT * FROM VALUES (0, 5), (5, 10), (10, 0) AS t(src, dst)")
      assert(run("""WITH RECURSIVE reach(node) AS (
          SELECT 0
          UNION
          SELECT e.dst FROM reach r JOIN wire_edges e ON e.src = r.node)
        SELECT node FROM reach ORDER BY node""")
        == Seq(Seq(0), Seq(5), Seq(10)))

      // 6c. the r10 SQL-text surface over Connect: a table-valued
      // procedure, matview DDL lifecycle, and a maintenance statement —
      // the whole engine is reachable as SQL text on this front door too
      run("CREATE OR REPLACE TEMPORARY VIEW wire_docs AS " +
        "SELECT * FROM VALUES (1, 'p q r'), (2, 'p q r'), (3, 's t u') " +
        "AS t(doc_id, text)")
      assert(run("SELECT keep_id, n_copies FROM graft_exact_dedup(" +
        "'wire_docs', 'doc_id', 'text') ORDER BY keep_id")
        == Seq(Seq[Any](1L, 2L), Seq[Any](3L, 1L)))
      assert(run("CREATE MATERIALIZED VIEW wire_price_mv WITH (valid_at = " +
        "'2030-01-01 00:00:00') AS SELECT price, COUNT(*) AS n " +
        "FROM prices GROUP BY price").head.head == "wire_price_mv")
      assert(run("SELECT count(*) FROM wire_price_mv").head.head == 3L)
      assert(run("DROP MATERIALIZED VIEW wire_price_mv")
        .head == Seq("wire_price_mv", true))
      assert(run("COMPACT prices").head == Seq("prices", "COMPACT", true))
      assert(run("SELECT count(*) FROM prices").head.head == 3L)

      // 6c2. procedures CHAIN in one statement over the wire (r12): a
      // graft_* call inside another procedure's inline-subquery table
      // arg substitutes recursively — parity with the two-statement
      // form a client had to send before
      assert(run("SELECT count(*) FROM graft_quantile_keep(" +
        "'( SELECT ''all'' AS dom, doc_id, top2_frac FROM " +
        "graft_repetition(''wire_docs'', ''doc_id'', ''text'') )', " +
        "'dom', 'top2_frac', 0.0)").head.head == 3L)

      // 6d. a procedure whose table ARG is the GRAFT-REGISTERED table:
      // the substitution DataFrame must be built in the CLIENT's
      // isolated session (Connect clones session state) — a DataFrame
      // bound to the root session would register the _graft_p_* temp
      // view where this session's parse can never resolve it
      assert(run("SELECT keep_id, n_copies FROM graft_exact_dedup(" +
        "'prices', '_id', 'price') ORDER BY keep_id")
        == Seq(Seq[Any](1L, 1L), Seq[Any](2L, 1L), Seq[Any](3L, 1L)))

      // 7. a batch that targets the registered table but contains an
      // invalid statement surfaces the GRAFT parse error (statement
      // index + cause), not Spark's misleading TABLE_OR_VIEW_NOT_FOUND
      val badStmt = intercept[
        org.sparkproject.connect.grpc.StatusRuntimeException] {
        run("UPDATE prices SET price = 1.0D WHERE _id = 1; UPDATE prices")
      }
      assert(badStmt.getMessage.contains("not valid graft DML"),
        s"got: ${badStmt.getMessage}")

      // 8. a batch spanning two tables is rejected as a mixed tx (one
      // submit-tx = one table), again with OUR error
      val mixed = intercept[
        org.sparkproject.connect.grpc.StatusRuntimeException] {
        run("UPDATE prices SET price = 1.0D WHERE _id = 1; " +
          "UPDATE other_ledger SET price = 1.0D WHERE _id = 1")
      }
      assert(mixed.getMessage.contains("ONE table"),
        s"got: ${mixed.getMessage}")
    } finally {
      channel.shutdownNow()
      GraftServer.stop()
      GraftServer.unregister("prices")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
