package graft.operators

/** The ONE windowed-funnel fold shared by batch q44 and streaming st26
  * (ClickHouse `windowFunnel`'s semantics — see the q44 Scaladoc for the
  * max-first dominance argument that makes the 3-long greedy EXACT).
  *
  * The state per user is three longs: per level, the MAX first-event time
  * over chains reaching it (Long.MinValue = unreached). `step` advances
  * the state by ONE event; everything else is iteration order:
  *
  *  - batch q44 clusters events by user (repartition) and secondary-sorts
  *    (sortWithinPartitions), then [[levelsByUser]] streams the partition
  *    iterator — NO per-user buffering, so a hot user with 10^8 events
  *    costs three longs of state, never a multi-GB array (the round-9
  *    `sort_array(collect_list)` spelling OOMs exactly there);
  *  - streaming st26 receives each micro-batch's per-user group, sorts
  *    the BATCH slice (batch-bounded, not history-bounded) and folds it
  *    into the carried state via [[foldFunnel]].
  */
object Funnel {
  final case class FEv(user_id: Long, event_id: Long, ts_us: Long,
    y: String)
  final case class FunnelState(g1: Long, g2: Long, g3: Long)
  final case class UserFunnel(user_id: Long, funnel_level: Long)

  val unreached: FunnelState =
    FunnelState(Long.MinValue, Long.MinValue, Long.MinValue)

  /** One event against the greedy state: view raises g1; click/purchase
    * extend when inside the 24 h window measured from the chain's first
    * event. Events MUST arrive in (ts_us, event_id) order. */
  def step(wUs: Long, st: FunnelState, e: FEv): FunnelState = e.y match {
    case "view" => st.copy(g1 = math.max(st.g1, e.ts_us))
    case "click" if st.g1 != Long.MinValue && e.ts_us - st.g1 <= wUs =>
      st.copy(g2 = math.max(st.g2, st.g1))
    case "purchase" if st.g2 != Long.MinValue && e.ts_us - st.g2 <= wUs =>
      st.copy(g3 = math.max(st.g3, st.g2))
    case _ => st
  }

  /** Fold a PRE-SORTED event iterator — streaming, zero buffering. */
  def foldSorted(wUs: Long, init: FunnelState,
      evs: Iterator[FEv]): FunnelState =
    evs.foldLeft(init)(step(wUs, _, _))

  /** Fold an UNSORTED slice (a micro-batch's per-user group): sorts the
    * slice first. Bounded by one batch's events for one user — the
    * mapGroupsWithState contract — never by the user's history. */
  def foldFunnel(wUs: Long, init: FunnelState,
      evs: Iterator[FEv]): FunnelState =
    foldSorted(wUs, init,
      evs.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id)).iterator)

  def funnelLevel(st: FunnelState): Long =
    if (st.g3 != Long.MinValue) 3L
    else if (st.g2 != Long.MinValue) 2L
    else if (st.g1 != Long.MinValue) 1L else 0L

  /** The batch q44 kernel: one pass over a partition iterator that is
    * clustered by user_id and secondary-sorted by (ts_us, event_id)
    * within each user. Emits one (user, level) row per user, holding
    * only the CURRENT user's three-long state — the mapPartitions form
    * of a secondary-sort reduce, the scale-safe plan for hot users. */
  def levelsByUser(wUs: Long, rows: Iterator[FEv]): Iterator[UserFunnel] =
    new Iterator[UserFunnel] {
      private val it = rows.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): UserFunnel = {
        val uid = it.head.user_id
        var st = unreached
        while (it.hasNext && it.head.user_id == uid)
          st = step(wUs, st, it.next())
        UserFunnel(uid, funnelLevel(st))
      }
    }
}
