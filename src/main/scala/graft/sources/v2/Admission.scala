package graft.sources.v2

import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxRows, ReadMinRows}

/** Shared `ReadLimit` interpretation for the DSv2 offset-tracked sources.
  *
  * `SupportsAdmissionControl.latestOffset(start, limit)` must honor the
  * limit THE ENGINE passes, not the source's own default: `Trigger.Once`
  * passes `ReadAllAvailable`, and `Trigger.AvailableNow`'s wrapper
  * captures its drain target by asking for all-available up front — a
  * source that caps the answer at its per-trigger default silently
  * truncates those runs to one paced batch (data loss reported as a
  * clean stop). Continuous triggers pass the source's
  * `getDefaultReadLimit` and get the paced answer.
  */
object Admission {
  /** Next end-offset: `start` advanced per `limit`, bounded by `hi` (the
    * data actually available). `ReadMinRows` gates WHEN a batch runs
    * (engine-side timing), not how much may be admitted — all available
    * is the correct answer for it.
    */
  def admit(start: Long, hi: Long, limit: ReadLimit): Long = limit match {
    case _: ReadAllAvailable => hi
    case m: ReadMaxRows =>
      // overflow-safe advance: start + maxRows past Long.MaxValue must
      // saturate to hi, not wrap negative and drag the offset backwards
      val advanced = start + m.maxRows()
      if (advanced < start) hi else math.min(hi, advanced)
    case _: ReadMinRows => hi
    case c: CompositeReadLimit =>
      c.getReadLimits.map(l => admit(start, hi, l)).min
    case _ => hi
  }
}
