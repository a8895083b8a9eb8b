package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of `operators.Cdc`: maintain latest-wins current
  * state over an unbounded changelog with `mapGroupsWithState` —
  * O(1) state per live key (version + payload), emitted in update
  * mode whenever a batch touches the key. Out-of-order and replayed
  * changes resolve exactly like the batch operator: the (ts, seq)
  * max wins, a stale arrival updates nothing. Deletes stay in state
  * as tombstones (op = "D") so a late pre-delete change cannot
  * resurrect the key; downstream treats a "D" update as removal. */
object CdcStream {

  case class Change(key: Long, tsMicros: Long, seq: Long, op: String, value: Double)
  case class CurState(tsMicros: Long, seq: Long, op: String, value: Double)
  case class Current(key: Long, op: String, value: Double, tsMicros: Long, seq: Long)

  def cdcLatestStreaming(changes: Dataset[Change]): Dataset[Current] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .mapGroupsWithState[CurState, Current](GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[Change], state: GroupState[CurState]) =>
          var cur = state.getOption
          it.foreach { c =>
            val newer = cur.forall(s =>
              c.tsMicros > s.tsMicros || (c.tsMicros == s.tsMicros && c.seq > s.seq))
            if (newer) cur = Some(CurState(c.tsMicros, c.seq, c.op, c.value))
          }
          val s = cur.get
          state.update(s)
          Current(k, s.op, s.value, s.tsMicros, s.seq)
      }
  }
}
