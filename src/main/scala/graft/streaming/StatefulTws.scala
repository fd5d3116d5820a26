package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 `transformWithState` twin of [[Stateful.runningUserStats]]:
  * the current arbitrary-state API (typed `ValueState` handles, state
  * TTL, timers) replacing `flatMapGroupsWithState`. Same semantics —
  * per-key running stats emitted on every update — so it shares q33's
  * fold-order-independent oracle. Kept alongside the legacy form
  * deliberately: both APIs are part of the engine's streaming surface.
  *
  * Scale notes: state is one Stat per key (bounded by |keys|); TTL
  * (`TTLConfig`) is the production eviction story for key churn, NONE
  * here because the bounded smoke must keep exact totals.
  */
object StatefulTws {
  import Stateful.{Event, Stat}

  class UserStatsProcessor extends StatefulProcessor[Long, Event, Stat] {
    @transient private var state: ValueState[Stat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stat]("stat",
        Encoders.product[Stat], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Stat] = {
      val prev =
        if (state.exists()) state.get()
        else Stat(key, 0L, 0.0, Double.MinValue)
      val next = rows.foldLeft(prev) { (s, e) =>
        Stat(key, s.n_events + 1, s.total + e.value,
          math.max(s.max_value, e.value))
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Running per-user stats via transformWithState over a bounded
    * stream (update mode, no event-time semantics needed).
    */
  def runningUserStats(spark: SparkSession, events: Dataset[Event])
      : Dataset[Stat] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
