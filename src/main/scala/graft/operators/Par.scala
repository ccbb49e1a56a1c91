package graft.operators

/** Intra-key job overlap (r18 optimization, guide §2.6 "Overlap
  * independent jobs"): Spark's scheduler runs several jobs at once in
  * one application; a key whose eager stages are INDEPENDENT (commits
  * of different TxnTables, the forward and backward reachability of an
  * SCC round, the v0-build and O(new)-insert chains of an index
  * maintenance) serializes them only because the driver code calls
  * them sequentially. `Par.all` runs the thunks on daemon threads so
  * the later jobs' tasks back-fill executors freed by the earlier
  * jobs' stragglers.
  *
  * Results are unchanged by construction — each thunk is the same
  * deterministic computation, writes land at distinct paths, and
  * callers keep true dependencies (e.g. manifest installs chain on a
  * prior version) OUTSIDE the parallel region. Shared upstream frames
  * must be materialized (cut) BEFORE the fork, or both threads race to
  * compute the same persist — safe but duplicated work.
  *
  * Exceptions propagate: the first failure is rethrown after all
  * threads finish (never a silent drop). In plan-only mode callers
  * never reach these exec paths. */
object Par {
  def all[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val results = new Array[Any](thunks.size)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = thunks.zipWithIndex.map { case (f, i) =>
      val t = new Thread(() =>
        try results(i) = f()
        catch { case e: Throwable => errs.add(e) })
      t.setDaemon(true)
      t.setName(s"graft-par-$i")
      t.start()
      t
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
    results.toSeq.map(_.asInstanceOf[T])
  }

  /** Two-frame convenience: evaluate both eager builders in parallel. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val r = all(() => a.asInstanceOf[Any], () => b.asInstanceOf[Any])
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
