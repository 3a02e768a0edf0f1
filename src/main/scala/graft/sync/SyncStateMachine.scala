package graft.sync

/** Per-collection lifecycle (reference R7/R8): INITIALIZING →
  * INITIAL_SYNC ⇄ BACKOFF → STEADY_STATE ⇄ BACKOFF; invalidate ⇒ back to
  * INITIAL_SYNC. Pure driver-side logic, deliberately Spark-free so the
  * decision table is unit-testable.
  */
object SyncStateMachine {

  sealed trait Phase
  case object Initializing extends Phase
  case object InitialSyncPhase extends Phase
  case object SteadyStatePhase extends Phase

  /** Restart decision table (reference design "restart decision"):
    * where to resume given the persisted checkpoint.
    */
  def decideStart(checkpoint: Option[CheckpointRecord]): Phase = checkpoint match {
    case None => InitialSyncPhase // no checkpoint → full initial sync
    case Some(cp) if cp.state == SyncState.InitialSync => InitialSyncPhase // resume from hwm
    case Some(cp) if cp.state == SyncState.SteadyState && cp.resumeToken.isDefined =>
      SteadyStatePhase // resume change stream from token
    case Some(_) => SteadyStatePhase // steady state, stream starts from log head recorded in stream checkpoint
  }

  /** After a control event (drop/rename/invalidate): wipe forward. */
  def decideAfterInvalidate: Phase = InitialSyncPhase

  /** Resume-token expiration (reference decision table: "resume token
    * expired → fall back to full initial sync"). The engine's analog of
    * a capped oplog window: a token is expired when the change log no
    * longer retains the event right after it — i.e. the earliest
    * retained seq has moved past token+1, so events in
    * (token, earliest) are gone and tailing from the token would
    * silently lose them. An empty/unknown log can't prove expiry.
    */
  def tokenExpired(token: Option[Long], earliestRetainedSeq: Option[Long]): Boolean =
    (token, earliestRetainedSeq) match {
      case (Some(t), Some(e)) => t < e - 1
      case _ => false
    }

  /** Exponential backoff (reference: delay = min(1s × 2^attempt, 60s),
    * retry forever on transient errors).
    */
  def backoffMs(attempt: Int, baseMs: Long = 1000L, capMs: Long = 60000L): Long = {
    val exp = if (attempt >= 30) capMs else baseMs * (1L << math.max(0, attempt))
    math.min(exp, capMs)
  }

  /** Transient vs fatal classification (reference error-handling table:
    * config/validation errors fatal; IO/timeouts transient → retry).
    *
    * Walks the CAUSE CHAIN: streaming failures arrive wrapped (a fatal
    * error inside foreachBatch surfaces as StreamingQueryException →
    * SparkException → the real cause), and classifying the wrapper as
    * transient would retry a deterministic failure forever.
    */
  def isTransient(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 20) { // depth cap guards cause cycles
      t match {
        case _: graft.config.ConfigError => return false
        case _: IllegalArgumentException => return false
        case _: java.io.FileNotFoundException => return false
        case _ => ()
      }
      t = t.getCause
      depth += 1
    }
    true
  }

  /** Retry-forever-with-backoff wrapper for a sync phase; `sleep` is
    * injectable for tests, `maxAttempts` bounds runaway tests only,
    * `onError` feeds the `sync.errors` metric — including the TERMINAL
    * failure (fatal classification or attempts exhausted), which is
    * exactly the error an operator most needs counted.
    */
  def withRetry[A](
      maxAttempts: Int = Int.MaxValue,
      sleep: Long => Unit = Thread.sleep,
      onError: Throwable => Unit = _ => ())(
      body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if isTransient(e) && attempt < maxAttempts - 1 =>
          onError(e)
          sleep(backoffMs(attempt))
          attempt += 1
        case e: Throwable =>
          onError(e)
          throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
