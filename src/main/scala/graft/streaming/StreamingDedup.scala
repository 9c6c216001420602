package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming deduplication (SURVEY §2.8 + §2.10): keep-first over a
  * content digest, with the seen-set carried ACROSS micro-batches in the
  * state store — the streaming analog of [[graft.dedup.Dedup.exactDupSurvivors]]
  * for a continuously-ingesting training-data pipeline (a crawl feed where
  * the same page arrives again hours later must not re-enter the corpus).
  *
  * Semantics: a digest's survivor is emitted exactly once, in the first
  * micro-batch the digest appears in; within that batch the smallest doc_id
  * wins (matching the batch operator's tie rule). Later duplicates emit
  * nothing — Append output, so the sink only ever receives survivors.
  *
  * Scale notes (10^12 docs):
  *  - state is one tiny record per DISTINCT digest, hash-partitioned by the
  *    state store across executors — no driver-side set, no broadcast;
  *  - `ttl` bounds state for unbounded feeds: a digest idle longer than the
  *    TTL is evicted (ProcessingTimeTimeout) and would be re-emitted if it
  *    reappears after eviction — the standard bounded-state trade, chosen
  *    explicitly by the caller, never silently;
  *  - in BATCH mode the same code runs once per key with empty state, so
  *    output equals `GROUP BY digest -> MIN(doc_id)` exactly (the oracle).
  */
object StreamingDedup {

  final case class KeyedDoc(doc_id: Long, digest: String)
  final case class Survivor(digest: String, doc_id: Long)

  /** Per-key transition, factored out so the timeout branches are unit-
    * testable against `TestGroupState` (the e2e query only exercises the
    * unbounded path). State is a bare presence marker — at 10^12 docs every
    * state-store byte per distinct digest is checkpoint size, so nothing
    * beyond "seen" is carried. */
  private[graft] def transition(ttl: Option[String])(
      digest: String, it: Iterator[KeyedDoc],
      state: GroupState[Boolean]): Iterator[Survivor] =
    if (state.hasTimedOut) {
      // TTL eviction tick: drop the seen-marker, emit nothing
      state.remove()
      Iterator.empty
    } else if (state.exists) {
      // duplicate arrival: keep the marker alive, emit nothing
      ttl.foreach(state.setTimeoutDuration)
      Iterator.empty
    } else {
      var first = Long.MaxValue
      it.foreach(d => if (d.doc_id < first) first = d.doc_id)
      state.update(true)
      ttl.foreach(state.setTimeoutDuration)
      Iterator.single(Survivor(digest, first))
    }

  /** Keep-first dedup; `ttl` (e.g. "24 hours") bounds state for unbounded
    * streams, None keeps every digest forever (exact, unbounded state). */
  def firstSeen(docs: Dataset[KeyedDoc],
                ttl: Option[String] = None): Dataset[Survivor] = {
    implicit val stEnc = Encoders.scalaBoolean
    implicit val outEnc = Encoders.product[Survivor]
    implicit val keyEnc = Encoders.STRING
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.digest)
      .flatMapGroupsWithState[Boolean, Survivor](
        OutputMode.Append(), timeout)(transition(ttl))
  }
}
