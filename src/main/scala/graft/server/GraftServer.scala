package graft.server

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.GraftTable

/** The network front door (the reference ships a preliminary Flight SQL
  * driver — /root/reference/README.adoc:14; Spark's native equivalent
  * is Spark Connect, whose server ships in this distribution): expose
  * registered [[GraftTable]]s to REMOTE clients over the Spark Connect
  * gRPC protocol. Any Connect client — JVM, pyspark, Go, raw gRPC —
  * submits plain SQL text; [[GraftSqlParser]] (injected via
  * `spark.sql.extensions=graft.GraftExtensions`) resolves temporal
  * clauses and DML against the registry server-side, so the wire
  * protocol IS the stock Connect protocol: no custom client needed.
  *
  * Scale notes: the Connect service executes on the same cluster as the
  * session — query fan-out, shuffles and pruning are exactly the
  * in-process plans; the gRPC layer only streams Arrow result batches
  * (bounded by `spark.connect.grpc.arrow.maxBatchSize`), so a remote
  * reader never pulls more than a batch at a time onto the service
  * thread. */
object GraftServer {

  private val tables = TrieMap.empty[String, GraftTable]

  /** Register `table` under `name` for remote (and local `spark.sql`)
    * reference. Names are case-insensitive on lookup. */
  def register(name: String, table: GraftTable): Unit = tables.put(name, table)

  def unregister(name: String): Unit = tables.remove(name)

  private[server] def registered: Map[String, GraftTable] = tables.toMap

  /** Start the Spark Connect gRPC endpoint on `port` against this
    * session's context. Idempotent per JVM (the service is a
    * singleton); stop with [[stop]]. The session should carry
    * `spark.sql.extensions=graft.GraftExtensions` so remote SQL gets
    * the temporal front-end. */
  def start(spark: SparkSession, port: Int): Unit = {
    org.apache.spark.sql.graftbridge.ConfBridge.setContextConf(
      spark.sparkContext, "spark.connect.grpc.binding.port", port.toString)
    org.apache.spark.sql.connect.service.SparkConnectService
      .start(spark.sparkContext)
  }

  def stop(): Unit =
    org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
}
