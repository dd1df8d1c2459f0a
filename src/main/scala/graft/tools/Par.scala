package graft.tools

/** Driver-side overlap of INDEPENDENT Spark jobs (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. A bundle commit writing four member tables, or a
  * query building its text index while the ANN quantizer trains, spends
  * most of its wall clock in per-job fixed overhead (planning, codegen,
  * task scheduling, output commit) whose stages leave almost every core
  * idle at sf-bench scale — and at cluster scale each job's straggler
  * tail does the same. Submitting the independent actions from a small
  * thread pool lets the next job's tasks back-fill the executors the
  * current one isn't using; FIFO scheduling (the default) keeps the
  * earlier job's resources first, which is exactly the back-fill
  * behaviour wanted.
  *
  * Semantics: `run` evaluates `f` over every item and returns results in
  * INPUT order (never completion order) — callers' manifests/result
  * tuples are deterministic regardless of scheduling. The first failing
  * item's exception propagates (same observable contract as the
  * sequential loop, except a later item may also have started — all
  * items are independent by the caller's contract, so that is safe).
  * Spark job submission is thread-safe; thread-local job properties are
  * inherited by pool threads from the submitting thread.
  *
  * Deliberately small: 1-item (and empty) input runs inline with zero
  * thread machinery, and the pool is bounded (2–4 in-flight jobs is
  * plenty — enough to fill the tail, not so many that they fight).
  */
object Par {

  /** Map `f` over `items` with up to `maxThreads` concurrent evaluations;
    * results in input order.
    */
  def run[A, B](items: Seq[A], maxThreads: Int = 4)(f: A => B): Seq[B] =
    if (items.lengthCompare(1) <= 0) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, maxThreads))
      try {
        val futures = items.map(a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = f(a)
          }))
        futures.map { fu =>
          try fu.get()
          catch { // surface the task's own exception, not the wrapper
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally { pool.shutdown(); () }
    }

  /** Two independent thunks, overlapped; both results. */
  def together[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = run[Int, Any](Seq(0, 1), 2) {
      case 0 => a()
      case 1 => b()
    }
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
