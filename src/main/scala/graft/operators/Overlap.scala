package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.DataFrame

/** Overlap INDEPENDENT eager legs of one operator (r19 optimization;
  * guide §2.6): a leg that is a serial chain of driver-synchronous
  * eager checkpoints leaves most executor slots idle while its tiny
  * jobs round-trip the scheduler — when an operator has two or more
  * legs with NO data dependency between them, submitting the chains
  * from a small driver pool lets each leg's jobs back-fill the slots
  * the others leave free, and wall time approaches the slowest single
  * leg instead of the sum. Results are unchanged: every leg still
  * computes exactly its own deterministic relation; only the job
  * interleaving differs (Spark's scheduler is explicitly multi-job;
  * FIFO scheduling gives earlier legs priority and later legs the
  * leftovers, which is the back-fill behaviour wanted here).
  *
  * Scala note: each `() => DataFrame` thunk must be self-contained —
  * the caller guarantees independence; nothing here checks it. */
private[operators] object Overlap {

  /** Run the legs concurrently, return their results in order.
    * Exceptions from any leg propagate (first failure wins) after all
    * legs settle, so a failing leg can never leak a half-built
    * sibling into the caller. */
  def legs(thunks: Seq[() => DataFrame]): Seq[DataFrame] = {
    if (thunks.sizeIs <= 1) return thunks.map(_.apply())
    val pool = Executors.newFixedThreadPool(thunks.size)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val fs = thunks.map(t => Future(t()))
      // settle every leg before surfacing the first failure — an
      // in-flight sibling job must not outlive this call
      val settled = fs.map(f => Await.ready(f, Duration.Inf))
      settled.map(_.value.get.get)
    } finally pool.shutdown()
  }

  def legs2(a: () => DataFrame, b: () => DataFrame)
      : (DataFrame, DataFrame) = {
    val r = legs(Seq(a, b)); (r(0), r(1))
  }

  def legs3(a: () => DataFrame, b: () => DataFrame, c: () => DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val r = legs(Seq(a, b, c)); (r(0), r(1), r(2))
  }
}
