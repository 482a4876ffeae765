package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.model.Frame

/** Keyed streaming state (SURVEY.md §2.7 "stateful ops"): the
  * reference keeps unpartitioned in-process counters
  * (`self.num_frames`, `gst-detection-tf.py:127,410`); the engine
  * keys the same state by video so it scales horizontally — each
  * video's counter lives with its shuffle partition, checkpointed
  * with the query.
  */
object StatefulOps {

  final case class VideoProgress(video_id: String, frames_total: Long,
      max_frame_id: Long)

  /** Watermark-bounded streaming dedup via Spark's own
    * `dropDuplicatesWithinWatermark`: exactly-once per key within
    * the watermark horizon, with the dedup state EVICTED once the
    * watermark passes — the bounded-state contract StreamingDedup
    * implements by hand for near-dups, here for exact keys with
    * zero custom state code. The right default for at-least-once
    * upstreams (e.g. a redelivering frame source): duplicates
    * arrive close together, so state stays proportional to the
    * watermark window, not the stream's lifetime key count. */
  def dedupWithinWatermark(frames: Dataset[Frame],
      delay: String): Dataset[Frame] =
    frames.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("video_id", "frame_id")

  final case class EventChange(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, cents: Long)

  final case class CompactState(user_id: Long, last_ts_us: Long,
      last_event: Long, last_type: String, last_cents: Long,
      n_changes: Long)

  final case class QuotaEvent(user_id: Long, hb: Long)
  final case class QuotaState(user_id: Long, counts: Map[Long, Long])
  final case class QuotaSnap(user_id: Long, n_events: Long,
      n_accepted: Long, n_rejected: Long)

  /** r46's hourly rate limit as KEYED STREAMING STATE — the
    * admission-control counter a gateway runs continuously: per user
    * the state is one count per hour bucket; accepted = Σ min(N, c)
    * is recomputed from counts at each emit, so the snapshot is
    * ORDER-INDEPENDENT (a late event in an already-full hour lands
    * as rejected no matter when it arrives) and converges to the
    * batch `Relational3.r46RateLimit` rows exactly — the parity
    * spec's property; n_events grows monotonically so the final
    * snapshot per key is the emitted row with the highest n_events.
    * State is bounded by distinct ACTIVE hours per user; production
    * adds an event-time timeout to evict hours past the watermark
    * (the dedup path's pattern), which never changes totals. */
  def quotaState(events: Dataset[QuotaEvent], perHour: Long = 3L)
      : Dataset[QuotaSnap] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val snapEnc = Encoders.product[QuotaSnap]
    implicit val stEnc = Encoders.product[QuotaState]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[QuotaState, QuotaSnap](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[QuotaEvent], state: GroupState[QuotaState]) =>
          var counts = state.getOption.map(_.counts)
            .getOrElse(Map.empty[Long, Long])
          it.foreach { e =>
            counts = counts.updated(e.hb, counts.getOrElse(e.hb, 0L) + 1L)
          }
          state.update(QuotaState(uid, counts))
          val n = counts.valuesIterator.sum
          val acc = counts.valuesIterator.map(c => math.min(c, perHour)).sum
          QuotaSnap(uid, n, acc, n - acc)
      }
  }

  /** r31's CDC compaction as KEYED STREAMING STATE — the standing
    * latest-wins merge a compacted topic runs continuously instead
    * of as a batch query. Per user the state is the latest change by
    * (ts, event_id); late or out-of-order arrivals fold in by the
    * same comparison the batch window sort applies, so replaying the
    * log through micro-batches converges to exactly the batch
    * `Relational3.compactLog` state (the parity spec's property —
    * n_changes grows monotonically, so the final state per key is
    * the emitted row with the highest n_changes). Tombstone
    * semantics stay in the CONSUMER (filter last_type = 'error'
    * downstream), matching the batch query's residual filter. */
  def compactState(events: Dataset[EventChange]): Dataset[CompactState] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[CompactState]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[CompactState, CompactState](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventChange], state: GroupState[CompactState]) =>
          var s = state.getOption.getOrElse(
            CompactState(uid, Long.MinValue, Long.MinValue, "", 0L, 0L))
          it.foreach { e =>
            // exact micros: getTime carries millis; the sub-milli
            // remainder lives in getNanos (the events table is
            // microsecond-resolution, so millis alone would collide)
            val ts = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            val newer = ts > s.last_ts_us ||
              (ts == s.last_ts_us && e.event_id > s.last_event)
            s =
              if (newer) CompactState(uid, ts, e.event_id, e.event_type,
                e.cents, s.n_changes + 1)
              else s.copy(n_changes = s.n_changes + 1)
          }
          state.update(s)
          s
      }
  }

  final case class FunnelEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String)

  /** The incrementally-maintained funnel state. `clicks`/`purchases`
    * are sorted ascending and PRUNED: a candidate c2 is dropped once
    * a smaller kept candidate c1 < c2 is already past the gate
    * (c1 > vMin for clicks; p1 > current click answer for
    * purchases) — the gate times only ever DECREASE as earlier
    * events arrive, so a dropped candidate can never become the
    * answer (eligibility only grows downward). State is therefore
    * bounded by the stream's out-of-order depth per user, not by
    * lifetime event count: in-order arrival keeps at most one
    * candidate per stage. */
  final case class FunnelBuf(user_id: Long, vMin: Long,
      clicks: Seq[Long], purchases: Seq[Long], n_events: Long)

  final case class FunnelSnap(user_id: Long, reached: String,
      t_view_us: Long, t_click_us: Long, t_purchase_us: Long,
      n_events: Long)

  /** r33's ordered funnel as KEYED STREAMING STATE — the standing
    * "how far did each user get" a product dashboard maintains
    * continuously. Out-of-order arrivals are folded exactly: a late
    * early view lowers t_view, which can re-qualify an earlier click
    * the batch logic would have chosen — the pruned candidate lists
    * retain exactly the prefix needed for that re-qualification, so
    * replaying any permutation of the log converges to
    * `Relational3.funnel`'s batch answer (the parity spec's
    * property; n_events is monotone, so the final state per key is
    * the emitted row with the highest n_events). */
  def funnelState(events: Dataset[FunnelEvent]): Dataset[FunnelSnap] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val snapEnc = Encoders.product[FunnelSnap]
    implicit val bufEnc = Encoders.product[FunnelBuf]
    val NONE = Long.MaxValue
    def firstAfter(xs: Seq[Long], gate: Long): Long =
      xs.find(_ > gate).getOrElse(NONE)
    // keep everything <= the current answer; drop strictly-larger
    def prune(xs: Seq[Long], gate: Long): Seq[Long] = {
      val ans = firstAfter(xs, gate)
      if (ans == NONE) xs else xs.filter(_ <= ans)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelBuf, FunnelSnap](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelBuf]) =>
          var s = state.getOption.getOrElse(
            FunnelBuf(uid, NONE, Vector.empty, Vector.empty, 0L))
          it.foreach { e =>
            val ts = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            s = e.event_type match {
              case "view" =>
                s.copy(vMin = math.min(s.vMin, ts), n_events = s.n_events + 1)
              case "click" =>
                s.copy(clicks = (s.clicks :+ ts).sorted,
                  n_events = s.n_events + 1)
              case "purchase" =>
                s.copy(purchases = (s.purchases :+ ts).sorted,
                  n_events = s.n_events + 1)
              case _ => s.copy(n_events = s.n_events + 1)
            }
          }
          val tClick = firstAfter(s.clicks, s.vMin)
          s = s.copy(clicks = prune(s.clicks, s.vMin),
            purchases = prune(s.purchases, tClick))
          state.update(s)
          val tPurch = firstAfter(s.purchases, tClick)
          val reached =
            if (tPurch != NONE) "purchase"
            else if (tClick != NONE) "click"
            else if (s.vMin != NONE) "view"
            else "none"
          def out(v: Long) = if (v == NONE) -1L else v
          FunnelSnap(uid, reached, out(s.vMin), out(tClick), out(tPurch),
            s.n_events)
      }
  }

  final case class TransEvent(user_id: Long, ts_us: Long,
      event_id: Long, event_type: String)
  final case class TransStep(from_type: String, to_type: String, n: Long)
  final case class TransitionSnap(user_id: Long, n_events: Long,
      steps: Seq[TransStep])

  /** r55's transition matrix as KEYED STREAMING STATE — the
    * clickstream flow model maintained continuously: per user the
    * state is the (ts_us, event_id)-ordered event sequence, and each
    * micro-batch emits the user's CURRENT (from → to) step counts
    * recomputed from that order. Keeping the sequence (not just the
    * last event) is what makes OUT-OF-ORDER arrivals exact: a late
    * event splits the transition that previously spanned its slot —
    * a last-event-only state would count the broken pair forever.
    * State is bounded by the user's event count; with an upstream
    * watermark the sequence prunes to the out-of-order horizon
    * (events older than the watermark can keep only their boundary
    * element — the r38 interval argument), documented rather than
    * implemented here because the parity spec replays without a
    * watermark. Final per-user snapshots sum to exactly the batch
    * r55 matrix (the StreamingSpec property; n_events is monotone so
    * the final snapshot per key is the max row). */
  def transitionState(events: Dataset[TransEvent]): Dataset[TransitionSnap] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val snapEnc = Encoders.product[TransitionSnap]
    implicit val stEnc =
      Encoders.product[(Long, Seq[(Long, Long, String)])]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Seq[(Long, Long, String)]), TransitionSnap](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TransEvent],
         state: GroupState[(Long, Seq[(Long, Long, String)])]) =>
          val prev = state.getOption.map(_._2).getOrElse(Seq.empty)
          val merged = (prev ++ it.map(e => (e.ts_us, e.event_id, e.event_type)))
            .sortBy(t => (t._1, t._2))
          state.update((uid, merged))
          val counts = merged.iterator.zip(merged.iterator.drop(1))
            .foldLeft(Map.empty[(String, String), Long]) { case (m, (a, b)) =>
              val k = (a._3, b._3); m.updated(k, m.getOrElse(k, 0L) + 1L)
            }
          TransitionSnap(uid, merged.size.toLong,
            counts.toSeq.sortBy(_._1)
              .map { case ((f, t), n) => TransStep(f, t, n) })
      }
  }

  final case class SessEvent(user_id: Long, ts_us: Long)
  final case class SessSpan(start_us: Long, last_us: Long, n: Long)
  final case class SessionSnap(user_id: Long, n_events: Long,
      sessions: Seq[SessSpan])

  /** r20's SESSIONIZATION as keyed streaming state — the streaming
    * twin of the batch `session_window` aggregation, with the same
    * boundary contract (an event exactly `gap` after its nearest
    * session neighbor starts a NEW session: members satisfy the
    * STRICT `< gap` distance). State per user is the merged session
    * span list; each event either lands inside a span, extends one,
    * or BRIDGES several (a late out-of-order event can fuse two
    * sessions — the case processing-time sessionizers get wrong), so
    * the final snapshot converges to the batch rows under adversarial
    * replay — the quotaState/transitionState trust property, spec'd
    * against `Relational2.r20SessionWindow`. Production bounds state
    * by evicting spans older than the watermark (the dedup pattern);
    * span count per user is bounded by activity, not event count. */
  def sessionState(events: Dataset[SessEvent],
      gapUs: Long = 1800000000L): Dataset[SessionSnap] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val snapEnc = Encoders.product[SessionSnap]
    implicit val stEnc = Encoders.product[(Long, Seq[(Long, Long, Long)])]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Seq[(Long, Long, Long)]), SessionSnap](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent],
         state: GroupState[(Long, Seq[(Long, Long, Long)])]) =>
          var (nTotal, spans) =
            state.getOption.getOrElse((0L, Seq.empty[(Long, Long, Long)]))
          it.foreach { e =>
            nTotal += 1
            val t = e.ts_us
            val (ov, rest) = spans.partition { case (s, l, _) =>
              (t >= s && t <= l) || (t < s && s - t < gapUs) ||
                (t > l && t - l < gapUs)
            }
            val merged = (
              (t +: ov.map(_._1)).min,
              (t +: ov.map(_._2)).max,
              ov.map(_._3).sum + 1L)
            spans = (merged +: rest).sortBy(_._1)
          }
          state.update((nTotal, spans))
          SessionSnap(uid, nTotal,
            spans.map { case (s, l, n) => SessSpan(s, l, n) })
      }
  }

  final case class TopKObs(event_type: String, cents: Long, event_id: Long)
  final case class TopEntry(cents: Long, event_id: Long)
  final case class TopKState(n_seen: Long, top: Seq[TopEntry])
  final case class TopKSnap(event_type: String, n_seen: Long,
      top: Seq[TopEntry])

  /** Per-key BOUNDED TOP-K state — the standing leaderboard: per
    * event type the state is the k largest (cents, event_id) entries
    * seen so far, merged and re-trimmed each micro-batch. The state
    * bound is the point (k entries per key FOREVER, against the
    * moment/heavy-hitter ops whose per-key state is constant but
    * whose key set grows): top-k of a multiset union is
    * order-independent under the (cents desc, event_id asc) total
    * order, so the final snapshot equals the batch rank window
    * exactly under any replay — the parity spec's property. */
  def topKState(events: Dataset[TopKObs], k: Int = 5): Dataset[TopKSnap] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[TopKSnap]
    implicit val stEnc = Encoders.product[TopKState]
    events.groupByKey(_.event_type)
      .mapGroupsWithState[TopKState, TopKSnap](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[TopKObs], state: GroupState[TopKState]) =>
          val prev = state.getOption.getOrElse(TopKState(0L, Seq.empty))
          var n = prev.n_seen
          val buf = scala.collection.mutable.ArrayBuffer[TopEntry]()
          buf ++= prev.top
          it.foreach { e => n += 1L; buf += TopEntry(e.cents, e.event_id) }
          val top = buf.sortBy(e => (-e.cents, e.event_id)).take(k).toSeq
          state.update(TopKState(n, top))
          TopKSnap(key, n, top)
      }
  }

  final case class MomentObs(event_type: String, cents: Long)
  final case class MomentState(n: Long, sum_cents: Long, sumsq: Long)
  final case class MomentSnap(event_type: String, n: Long,
      sum_cents: Long, sumsq: Long)

  /** Per-key INTEGER MOMENT state — the streaming profiler: per
    * event type the state is the exact (n, Σcents, Σcents²) triple,
    * from which any consumer derives mean/variance/z-scores at read
    * time. Keeping the RAW integer moments instead of running
    * mean/variance (Welford) is the same discipline the batch
    * profilers use (x31/g5): integer sums are associative,
    * commutative and overflow-checked, so the final snapshot equals
    * the batch moments EXACTLY under any arrival order, chunking, or
    * restart — float accumulators cannot make that promise. State
    * is three longs per key; cents² of bounded per-event values fits
    * a long for corpus sizes up to ~2^63/max(cents²) rows per key
    * (checked at the batch twin by the same arithmetic). */
  def momentState(events: Dataset[MomentObs]): Dataset[MomentSnap] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[MomentSnap]
    implicit val stEnc = Encoders.product[MomentState]
    events.groupByKey(_.event_type)
      .mapGroupsWithState[MomentState, MomentSnap](
        GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[MomentObs], state: GroupState[MomentState]) =>
          var s = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
          it.foreach { e =>
            s = MomentState(s.n + 1L, s.sum_cents + e.cents,
              s.sumsq + e.cents * e.cents)
          }
          state.update(s)
          MomentSnap(k, s.n, s.sum_cents, s.sumsq)
      }
  }

  final case class HashObs(lang: String, h: Long)
  final case class KmvState(n_seen: Long, sketch: Seq[Long])
  final case class KmvSnap(lang: String, n_seen: Long, n_sketch: Int,
    kth: Long, sketch: Seq[Long])

  /** x62's bottom-k (KMV) sketch as KEYED STREAMING STATE — the
    * standing distinct-value/resemblance monitor of a live ingest
    * path: per language the state is the k smallest DISTINCT term
    * hashes seen so far, emitted as an updated snapshot each
    * micro-batch. State is bounded at k longs per key BY
    * CONSTRUCTION (that is the whole point of the sketch — compare
    * heavyHitterState, whose per-term state needs the eviction
    * contract); merge-and-trim is min-k over set union, which is
    * associative, commutative, and idempotent, so the final
    * snapshot equals the batch sketch under ANY arrival order,
    * chunking, or replay — the parity spec's property. Downstream,
    * two keys' final sketches compare exactly as x62's batch
    * sketches do (estimate Jaccard / distinct counts with zero
    * recompute over the corpus). */
  def kmvState(hashes: Dataset[HashObs], k: Int = 128): Dataset[KmvSnap] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[KmvSnap]
    implicit val stEnc = Encoders.product[KmvState]
    hashes.groupByKey(_.lang)
      .mapGroupsWithState[KmvState, KmvSnap](GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[HashObs], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(0L, Seq.empty))
          var n = prev.n_seen
          val buf = scala.collection.mutable.TreeSet[Long]()
          buf ++= prev.sketch
          it.foreach { o => n += 1L; buf += o.h }
          val sk = buf.take(k).toSeq
          state.update(KmvState(n, sk))
          KmvSnap(lang, n, sk.size, if (sk.nonEmpty) sk.last else -1L, sk)
      }
  }

  final case class TermObs(term: String)
  final case class TermCount(term: String, cnt: Long)

  /** x36's heavy-hitter counting as KEYED STREAMING STATE — the
    * standing term-frequency monitor a live ingestion pipeline runs
    * where the batch query runs Misra-Gries + recount: per term the
    * state is one long, emitted as an updated (term, cnt) snapshot
    * each micro-batch; counts are additive and order-independent,
    * so the final snapshot per term equals the batch count exactly
    * under ANY arrival order or chunking — the parity spec's
    * property (the ≥1/64-share selection is then one filter over
    * the final snapshots, exactly x36's recount semantics).
    *
    * Scale contract: state is one long per DISTINCT term in the
    * stream's lifetime — fine for bounded vocabularies; an unbounded
    * token stream bounds it the same two ways the batch side does
    * (per-partition Misra-Gries before the shuffle, or event-time
    * TTL eviction of cold terms), both of which only ever UNDER-count
    * evicted cold terms and cannot disturb a true heavy hitter. */
  def heavyHitterState(terms: Dataset[TermObs]): Dataset[TermCount] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[TermCount]
    implicit val stEnc = Encoders.scalaLong
    terms.groupByKey(_.term)
      .mapGroupsWithState[Long, TermCount](GroupStateTimeout.NoTimeout) {
        (term: String, it: Iterator[TermObs], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          TermCount(term, c)
      }
  }

  final case class PointObs(grp: String, id: Long, sz: Int, price: Double)
  final case class SkylinePoint(id: Long, sz: Int, price: Double)
  final case class SkylineState(n_seen: Long, pts: Seq[SkylinePoint])
  final case class SkylineSnap(grp: String, n_seen: Long,
      n_frontier: Int, frontier: Seq[SkylinePoint])

  /** r62's SKYLINE as KEYED STREAMING STATE — the standing Pareto
    * frontier of a live feed (per group: minimize sz, maximize
    * price), emitted as an updated snapshot each micro-batch. The
    * state IS the answer and is bounded by the frontier's own size
    * (dominated points are discarded on arrival and can never
    * return — dominance only grows as points accumulate), the same
    * by-construction bound as kmvState's k. The frontier of a set
    * is unique and arrival-order-independent (frontier(A ∪ B) =
    * frontier(frontier(A) ∪ B)), so the final snapshot equals the
    * batch r62 skyline under ANY chunking or replay — the parity
    * spec's property. Equal points do not dominate each other, so
    * exact duplicates both survive, matching the batch contract. */
  def skylineState(points: Dataset[PointObs]): Dataset[SkylineSnap] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[SkylineSnap]
    implicit val stEnc = Encoders.product[SkylineState]
    def dominates(a: SkylinePoint, b: SkylinePoint): Boolean =
      a.sz <= b.sz && a.price >= b.price &&
        (a.sz < b.sz || a.price > b.price)
    points.groupByKey(_.grp)
      .mapGroupsWithState[SkylineState, SkylineSnap](
        GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[PointObs], state: GroupState[SkylineState]) =>
          val prev = state.getOption.getOrElse(SkylineState(0L, Seq.empty))
          var n = prev.n_seen
          val incoming = it.map { o =>
            n += 1L; SkylinePoint(o.id, o.sz, o.price) }.toSeq
          val all = prev.pts ++ incoming
          val frontier = all
            .filter(p => !all.exists(q => dominates(q, p)))
            .sortBy(p => (p.sz, -p.price, p.id))
          state.update(SkylineState(n, frontier))
          SkylineSnap(grp, n, frontier.size, frontier)
      }
  }

  final case class IvObs(key: String, s_us: Long, dur_us: Long)
  final case class Iv(s: Long, e: Long)
  final case class IvState(n_seen: Long, min_s: Long, max_e: Long,
      merged: Seq[Iv])
  final case class IvSnap(key: String, covered_us: Long,
      n_intervals: Long, span_us: Long)

  /** r61's interval-UNION coverage as KEYED STREAMING STATE — the
    * standing duty-cycle monitor of a live activity feed: per key
    * the state is the MERGED disjoint interval list (overlapping and
    * touching intervals coalesce on arrival), plus the seen count
    * and the overall extent. Interval union is a set union, so the
    * merged list — and every emitted snapshot — is identical under
    * ANY arrival order, chunking, or replay: the parity spec's
    * property against the batch r61 rows. State is bounded by the
    * number of DISJOINT covered segments, not by event count; a
    * production stream bounds the segment list too by finalizing
    * segments wholly behind the event-time watermark into an
    * accumulated covered total (the dedup path's eviction pattern),
    * which never changes any total. Zero-length intervals count and
    * stretch the extent but add no coverage, matching batch. */
  def intervalCoverageState(ivs: Dataset[IvObs]): Dataset[IvSnap] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[IvSnap]
    implicit val stEnc = Encoders.product[IvState]
    ivs.groupByKey(_.key)
      .mapGroupsWithState[IvState, IvSnap](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[IvObs], state: GroupState[IvState]) =>
          val prev = state.getOption
            .getOrElse(IvState(0L, Long.MaxValue, Long.MinValue, Seq.empty))
          var n = prev.n_seen
          var lo = prev.min_s
          var hi = prev.max_e
          val add = scala.collection.mutable.ArrayBuffer[Iv]()
          it.foreach { o =>
            val e = o.s_us + math.max(o.dur_us, 0L)
            n += 1L
            if (o.s_us < lo) lo = o.s_us
            if (e > hi) hi = e
            if (e > o.s_us) add += Iv(o.s_us, e)
          }
          val sorted = (prev.merged ++ add).sortBy(iv => (iv.s, iv.e))
          val merged = scala.collection.mutable.ArrayBuffer[Iv]()
          sorted.foreach { iv =>
            if (merged.nonEmpty && iv.s <= merged.last.e) {
              if (iv.e > merged.last.e)
                merged(merged.size - 1) = Iv(merged.last.s, iv.e)
            } else merged += iv
          }
          state.update(IvState(n, lo, hi, merged.toSeq))
          IvSnap(key, merged.map(iv => iv.e - iv.s).sum, n,
            if (n == 0L) 0L else hi - lo)
      }
  }

  final case class SessEvObs(user_id: Long, day_us: Long, ts_us: Long,
      event_id: Long, event_type: String)
  final case class FirstKState(n_seen: Long, firsts: Seq[SessEvObs])
  final case class FirstKSnap(user_id: Long, day_us: Long,
      n_seen: Long, path: String)

  /** r65's session-opening path as KEYED STREAMING STATE — per
    * (user, day) the state is the k EARLIEST events by the total
    * (ts, event_id) order, emitted as the joined path string each
    * micro-batch. Min-k selection under a total order is
    * associative, commutative and idempotent (kmvState's argument
    * with (ts, event_id) in place of the hash), so the final
    * snapshot equals the batch r65 slot pivot under ANY arrival
    * order, chunking, or replay — late events that belong in the
    * opening displace later ones retroactively, which an
    * append-only assembler cannot do. State is k tuples per active
    * session BY CONSTRUCTION. */
  def firstKState(events: Dataset[SessEvObs], k: Int = 3)
      : Dataset[FirstKSnap] = {
    implicit val keyEnc = Encoders.product[(Long, Long)]
    implicit val outEnc = Encoders.product[FirstKSnap]
    implicit val stEnc = Encoders.product[FirstKState]
    events.groupByKey(e => (e.user_id, e.day_us))
      .mapGroupsWithState[FirstKState, FirstKSnap](
        GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), it: Iterator[SessEvObs],
            state: GroupState[FirstKState]) =>
          val prev = state.getOption.getOrElse(FirstKState(0L, Seq.empty))
          var n = prev.n_seen
          val all = prev.firsts ++ it.map { e => n += 1L; e }
          val firsts = all.sortBy(e => (e.ts_us, e.event_id)).take(k)
          state.update(FirstKState(n, firsts))
          FirstKSnap(key._1, key._2, n,
            firsts.map(_.event_type).mkString(">"))
      }
  }

  /** A1 as keyed streaming state: running per-video frame count +
    * high-water frame id, emitted once per video per micro-batch
    * (update mode). */
  def runningFrameCounts(frames: Dataset[Frame]): Dataset[VideoProgress] = {
    implicit val keyEnc = Encoders.STRING
    implicit val progressEnc = Encoders.product[VideoProgress]
    frames.groupByKey(_.video_id)
      .mapGroupsWithState[VideoProgress, VideoProgress](
        GroupStateTimeout.NoTimeout) {
        (vid: String, it: Iterator[Frame], state: GroupState[VideoProgress]) =>
          val prev = state.getOption.getOrElse(VideoProgress(vid, 0L, -1L))
          var n = prev.frames_total
          var hi = prev.max_frame_id
          it.foreach { f => n += 1; if (f.frame_id > hi) hi = f.frame_id }
          val next = VideoProgress(vid, n, hi)
          state.update(next)
          next
      }
  }
}
