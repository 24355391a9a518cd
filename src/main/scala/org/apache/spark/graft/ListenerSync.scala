package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only accessor for the session's listener bus: task-count
  * bookkeeping (Bench's per-query `n_tasks` column) reads counters
  * incremented by an async `SparkListener`, so the bus must be drained
  * before a snapshot or the tail of one query's events lands in the next
  * query's count. `SparkContext.listenerBus` is `private[spark]` — this
  * object lives in the `org.apache.spark` package space for the same
  * reason the native expressions live in `org.apache.spark.sql.graft`
  * (access to spark-private API surface, no behavior patched). */
object ListenerSync {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
