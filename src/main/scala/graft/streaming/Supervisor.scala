package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Streaming-query supervisor — replaces the reference's self-healing
  * machinery (`/root/reference/src/Infrastructure/Ksql/UnifiedPipelineRunner.cs:113-152`:
  * DESCRIBE → TERMINATE → DROP → re-issue CTAS with bounded retries).
  * Spark checkpoints make the topic surgery unnecessary: healing a
  * failed query is restarting it from its checkpoint, which this
  * supervisor does with bounded retries + backoff (the reference's
  * `KsqlDdlRetryCount` / `KsqlDdlRetryInitialDelayMs` semantics).
  */
  /** Lifecycle events (`query.started` / `query.terminated` /
  * `query.failed` / `query.restarted` / `query.gave_up`) are emitted
  * through `onEvent` — default the process-wide [[RuntimeEventBus]] —
  * so callers observe the self-healing loop through their own sink
  * (the reference's `RuntimeEventBus`/`IncidentBus` surface) instead
  * of polling [[restartCount]].
  */
final class Supervisor(
    spark: SparkSession,
    maxRestarts: Int = 3,
    backoffMs: Long = 1000,
    onEvent: RuntimeEvent => Unit = RuntimeEventBus.publish
) extends AutoCloseable {

  final case class Managed(name: String, start: () => StreamingQuery)

  private val restarts = new ConcurrentHashMap[String, Integer]()
  private val managed = new ConcurrentHashMap[String, Managed]()
  private val active = new ConcurrentHashMap[String, StreamingQuery]()
  // backoff runs here, NOT on the shared listener bus thread — a sleep
  // in onQueryTerminated would stall termination-event delivery (and so
  // restarts) for every other supervised stage in the session
  private val scheduler = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-supervisor")
    t.setDaemon(true)
    t
  }
  @volatile private var closed = false

  // emission must never break supervision: a user callback that throws
  // on the listener/scheduler thread would kill the self-healing loop
  private def emit(e: RuntimeEvent): Unit =
    try onEvent(e)
    catch {
      case t: Throwable =>
        System.err.println(s"[graft-supervisor] onEvent threw: $t")
    }

  private def event(
      name: String,
      entity: String,
      queryId: Option[String] = None,
      success: Option[Boolean] = None,
      attempt: Option[Int] = None,
      message: Option[String] = None
  ): RuntimeEvent =
    RuntimeEvent(name, entity, System.currentTimeMillis(), queryId, success, attempt,
      batchId = None, message = message)

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      // exception => failed; self-heal by restarting from checkpoint
      if (e.exception.isDefined) {
        managed.asScala.values
          .find(m => Option(active.get(m.name)).exists(_.id == e.id))
          .foreach { m =>
            emit(event("query.failed", m.name, queryId = Some(e.id.toString),
              success = Some(false), message = e.exception))
            val n = restarts.merge(m.name, 1, (a, b) => a + b)
            if (n <= maxRestarts)
              scheduler.schedule(new Runnable {
                override def run(): Unit =
                  if (!closed) {
                    val q = m.start()
                    active.put(m.name, q)
                    emit(event("query.restarted", m.name,
                      queryId = Some(q.id.toString), attempt = Some(n)))
                  }
              }, backoffMs * n, TimeUnit.MILLISECONDS)
            else
              emit(event("query.gave_up", m.name, success = Some(false),
                attempt = Some(n - 1),
                message = Some(s"restarts exhausted (maxRestarts=$maxRestarts)")))
          }
      } else {
        // clean stop of a supervised query
        managed.asScala.values
          .find(m => Option(active.get(m.name)).exists(_.id == e.id))
          .foreach(m => emit(event("query.terminated", m.name,
            queryId = Some(e.id.toString), success = Some(true))))
      }
    }
  }
  spark.streams.addListener(listener)

  /** Register + start a named query; restarted automatically on failure. */
  def supervise(name: String)(start: () => StreamingQuery): StreamingQuery = {
    managed.put(name, Managed(name, start))
    val q = start()
    active.put(name, q)
    emit(event("query.started", name, queryId = Some(q.id.toString)))
    q
  }

  def restartCount(name: String): Int = Option(restarts.get(name)).fold(0)(_.intValue)
  def query(name: String): Option[StreamingQuery] = Option(active.get(name))

  override def close(): Unit = {
    closed = true
    spark.streams.removeListener(listener)
    scheduler.shutdown()
    scheduler.awaitTermination(5, TimeUnit.SECONDS)
    active.asScala.values.foreach(q => if (q.isActive) q.stop())
  }
}
