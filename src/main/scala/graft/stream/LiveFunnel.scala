package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live conversion funnel — batch `q21_funnel`'s streaming twin, closing
  * the last batch family with no live counterpart (burst, anomaly,
  * heavy-hitters, drift, near-dup and sessionize all have parity pairs).
  *
  * q21's per-user relation is three conditional MINS (earliest view /
  * click / purchase), and min is commutative and idempotent — so unlike
  * sessionization the live form needs NO event-time ordering, no
  * watermark and no timeout: each user's state is the running triple of
  * earliest stage times in exact integer microseconds (the repo-wide
  * convention), updated by fold over whatever order events arrive in,
  * late data included.  A state row is 4 longs per user, partitioned by
  * the grouping key — the same cardinality the batch query's one
  * user_id shuffle carries, horizontally scalable with the state store.
  *
  * Emission contract (Append mode): one [[FunnelUpdate]] per user per
  * batch IN WHICH THE USER'S RECORD CHANGED — the first event of ANY
  * type creates the record (q21 counts stage-less users in `n_users`,
  * so the live relation must carry them too), and a stage min can only
  * move backward in time.  `rev` increments per change so consumers
  * select each user's latest record with `max_by(..., rev)` instead of
  * trusting sink row order; a checkpoint replay re-derives identical
  * (rev, triple) pairs — the deterministic-state-transition idempotence
  * every stage here shares.
  *
  * The funnel STAGE arithmetic (strict `t_view < t_click < t_purchase`)
  * is deliberately NOT re-stated here: [[summaryOf]] applies q21's own
  * flag expressions over the latest-per-user relation, and
  * FunnelParitySpec pins replay ≡ the oracle-checked batch query,
  * restart included. */
object LiveFunnel {

  final case class FEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** Per-user running funnel record; times in µs since epoch. */
  final case class FunnelState(rev: Long, tView: Option[Long],
      tClick: Option[Long], tPurchase: Option[Long])

  final case class FunnelUpdate(user_id: Long, rev: Long,
      t_view: Option[Long], t_click: Option[Long], t_purchase: Option[Long])

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  def monitor(events: Dataset[FEv])(implicit spark: SparkSession): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FEv], state: GroupState[FunnelState]) =>
          val prev = state.getOption
          var tv = prev.flatMap(_.tView)
          var tc = prev.flatMap(_.tClick)
          var tp = prev.flatMap(_.tPurchase)
          def earliest(cur: Option[Long], t: Long): Option[Long] =
            Some(cur.fold(t)(math.min(_, t)))
          var sawAny = false
          batch.foreach { e =>
            sawAny = true
            // A null event time still establishes the user (q21's n_users
            // counts stage-less users) but folds no stage min — matching
            // batch q21's min(when(...)), where a null ts silently drops
            // out of the conditional min instead of NPE-ing the query.
            if (e.ts != null) {
              val t = micros(e.ts)
              e.event_type match {
                case "view"     => tv = earliest(tv, t)
                case "click"    => tc = earliest(tc, t)
                case "purchase" => tp = earliest(tp, t)
                case _          => () // non-stage events only establish the user
              }
            }
          }
          val changed = prev.isEmpty && sawAny ||
            prev.exists(p => (tv, tc, tp) != ((p.tView, p.tClick, p.tPurchase)))
          if (changed) {
            val next = FunnelState(prev.fold(1L)(_.rev + 1L), tv, tc, tp)
            state.update(next)
            Iterator(FunnelUpdate(user, next.rev, tv, tc, tp))
          } else Iterator.empty
      }
  }

  /** q21's summary flags over a funnel-update relation: reduce to each
    * user's LATEST record (max rev), then apply the batch query's own
    * conditional-count expressions — the single statement of the stage
    * rule on the live side, so live and batch can only disagree if the
    * per-user mins disagree (which FunnelParitySpec checks first). */
  def summaryOf(updates: DataFrame): DataFrame =
    updates
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("t_view"), col("t_click"), col("t_purchase")),
        col("rev")).as("u"))
      .select(col("u.t_view").as("t_view"), col("u.t_click").as("t_click"),
        col("u.t_purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
}
