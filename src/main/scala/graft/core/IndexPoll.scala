package graft.core

import graft.sinks.HostedTableSink

/** Client-side unique-index orchestration — the reference's
  * `set_unique_key_constraint` (`/root/reference/src/agol_pandas.py:253-312`):
  * probe for an existing unique index, register one if missing, then poll
  * until the service reports it visible, within a bounded budget (the
  * reference polls every 5 s up to 12 times).
  *
  * One deliberate deviation: the reference sleeps *before* each probe, so
  * even an instantly-created index costs 5 s; here the probe comes first
  * and the sleep only happens between failed probes — identical budget
  * semantics (`attempts` probes, `intervalMs` apart), zero cost when the
  * backend creates synchronously.
  */
object IndexPoll {

  def ensureUniqueIndex(
      sink: HostedTableSink,
      itemId: String,
      field: String,
      attempts: Int = 12,
      intervalMs: Long = 5000): Boolean = {
    if (sink.fieldHasUniqueIndex(itemId, field)) true
    else {
      sink.addUniqueIndex(itemId, field)
      Iterator.range(0, attempts).exists { i =>
        val visible = sink.fieldHasUniqueIndex(itemId, field)
        if (!visible && intervalMs > 0 && i < attempts - 1) Thread.sleep(intervalMs)
        visible
      }
    }
  }
}
