package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time joins the reference has no analogue for (SURVEY.md §2's
  * exhaustiveness note: go-streams composes NO key joins) but that every
  * event-time pipeline at scale needs: the as-of join (each left row picks
  * the most recent right row at-or-before its timestamp) and the
  * point-in-interval join — both expressed so they survive 100 TB.
  *
  * Neither uses a range predicate in the join condition: Catalyst plans a
  * non-equi join as BroadcastNestedLoopJoin (fine only when one side is
  * tiny) or a sort-merge with per-key scan amplification. Instead:
  *
  *  - [[asOf]] is the union-and-carry form: tag both inputs, union them,
  *    and carry the latest right payload forward with one
  *    `last(_, ignoreNulls)` window per key ordered by time. ONE hash
  *    exchange on the key and one per-partition sort — the same cost as a
  *    single sort-merge join — regardless of how many right rows precede
  *    each left row. Both sides may be arbitrarily large; nothing is
  *    broadcast, nothing is range-exploded.
  *
  *  - [[interval]] is the bucketed range join (the same decomposition
  *    range-join hints apply in warehouse engines): intervals explode to
  *    the fixed-width time buckets they overlap, points compute their one
  *    bucket, and the match becomes a plain equi-join on (key, bucket)
  *    plus an exact residual filter. Each (point, interval) pair meets in
  *    exactly one bucket — the point's — so no post-join dedup is needed.
  *    Shuffle volume is |points| + |intervals| · ceil(len/width), an
  *    explicit knob instead of a hidden quadratic.
  */
object Joins {

  /** As-of join: for each left row, the single nearest right row with
    * equal key — `backward` (default) takes the greatest `rightTs <=
    * leftTs`, `forward` the smallest `rightTs >= leftTs`; `strict` makes
    * the comparison exclusive. Left-outer semantics: unmatched left rows
    * keep null payloads.
    *
    * The matched right timestamp is exposed as `matchedTs`. All left
    * columns pass through unchanged; `payload` columns are pulled from the
    * matched right row.
    *
    * The right side must be unique per (key, ts) — pre-aggregate if not
    * (ties at equal (key, ts) would otherwise make "the" nearest row
    * ill-defined in any engine).
    *
    * Skew: like every per-key ordered operator, one degenerate hot key
    * (an "unknown"/default id carrying a large fraction of both sides)
    * serializes that key through one task — AQE cannot split an ORDERED
    * window partition the way it splits a join, and salting would break
    * the per-key total order the semantics require. `maxKeyRows` is the
    * cap-plus-observability mitigation (the
    * [[graft.dedup.Dedup.minhashLshPairs]] pattern): keys whose COMBINED
    * row count (both sides) exceeds the cap are routed AROUND the window —
    * their left rows pass through unmatched (null payload, exactly like a
    * key with no right rows), their right rows are dropped — so one
    * degenerate key can no longer serialize the stage. Size the cap (and
    * see what a given cap routes) with [[asOfHotKeys]]. The default is
    * off (`Long.MaxValue`) and adds nothing to the plan; when on, the
    * only extra cost is one map-side-combined count over the two inputs
    * whose post-filter output (the hot keys themselves) is tiny by
    * construction and broadcast.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      matchedTs: String = "asof_ts",
      strict: Boolean = false,
      direction: String = "backward",
      maxKeyRows: Long = Long.MaxValue
  ): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be 'backward' or 'forward', got '$direction'")
    require(maxKeyRows > 0, "maxKeyRows must be positive")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(matchedTs) && !payload.exists(leftCols.contains),
      s"as-of output columns (${(matchedTs +: payload).mkString(", ")}) collide with left columns")
    val internal = Seq("__k", "__t", "__side", "__r", "__m", "__hk", "__n")
    require(!leftCols.exists(internal.contains) && !payload.exists(internal.contains),
      s"as-of reserves internal column names ${internal.mkString(", ")}")
    // the right row travels as ONE non-null struct so that a legitimately
    // null payload FIELD cannot make last(ignoreNulls) skip back to an
    // older right row
    val rStruct = struct(col(rightTs).as(matchedTs) +: payload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val l = left.select(
      col(leftKey).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(rType).as("__r") +:
        leftCols.map(col): _*)
    // SQL join semantics: a null key matches nothing — without this filter
    // the window's partitionBy would group null-key rows from BOTH sides
    // together and "match" them (null-key left rows still pass through
    // with null payloads; they just never meet a right row)
    val r = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        rStruct.as("__r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // at equal ts the right row sorts on the VISIBLE side of the left row
    // (before it when looking backward, after it when looking forward)
    // unless strict, where it sorts on the excluded side
    val backward = direction == "backward"
    val rightFirst = backward != strict
    val order = if (rightFirst) col("__side").asc else col("__side").desc
    val w0 = Window.partitionBy(col("__k")).orderBy(col("__t").asc, order)
    // forward carry runs as last() over the REVERSED sort, not first()
    // over an UnboundedFollowing frame: Spark's following-frame evaluator
    // re-aggregates from every row to the partition end — O(n²) per key
    // (the q128 lesson, SCALING.md) — while the reversed prefix frame is
    // O(n) incremental and row-for-row identical (the descending
    // (__t, side) order is the exact reverse of the ascending one)
    val carried =
      if (backward)
        last(col("__r"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else {
        val orderRev = if (rightFirst) col("__side").desc else col("__side").asc
        val wRev = Window.partitionBy(col("__k"))
          .orderBy(col("__t").desc, orderRev)
        last(col("__r"), ignoreNulls = true)
          .over(wRev.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      }
    def finish(env: DataFrame): DataFrame = env
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ (matchedTs +: payload).map(f => col(s"__m.$f").as(f)): _*)
    val u = l.unionByName(r)
    if (maxKeyRows == Long.MaxValue) finish(u.withColumn("__m", carried))
    else {
      // Hot keys by COMBINED count — a groupBy (map-side partial agg, tiny
      // post-filter output), NOT a window count, which would itself route
      // every row of the hot key through one task. Null-safe equality: the
      // all-null-key left partition is a degenerate window partition too.
      val hot = u.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
        .where(col("__n") > maxKeyRows)
        .select(col("__k").as("__hk"))
      val cold = u.join(broadcast(hot), col("__k") <=> col("__hk"), "left_anti")
      val routed = l.join(broadcast(hot), col("__k") <=> col("__hk"), "left_semi")
        .withColumn("__m", lit(null).cast(rType))
      finish(cold.withColumn("__m", carried)).unionByName(finish(routed))
    }
  }

  /** The keys a given `maxKeyRows` cap would route around [[asOf]]'s
    * window, with their combined (left + right) row counts — the
    * observability half of the cap: run this to SIZE the cap and to learn
    * what the degenerate keys contain ("unknown"/default ids, usually)
    * before deciding to route them. Null left keys count as a key here —
    * they form a window partition too, even though they never match.
    */
  def asOfHotKeys(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      maxKeyRows: Long
  ): DataFrame = {
    require(maxKeyRows > 0, "maxKeyRows must be positive")
    left.select(col(leftKey).as("key"))
      .unionByName(right.filter(col(rightKey).isNotNull).select(col(rightKey).as("key")))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > maxKeyRows)
  }

  /** [[asOf]] with a match-window bound — pandas `merge_asof(tolerance=)`
    * parity: the nearest prior (or next, forward) right row matches ONLY
    * if it lies within `toleranceMicros` of the left timestamp;
    * otherwise the left row passes through unmatched (null payload),
    * exactly as if no right row existed. Since the as-of match IS the
    * nearest candidate, "nearest within tolerance" reduces to one
    * integer-µs gap test on the matched row — a pure post-projection on
    * the [[asOf]] plan, no extra exchange, no change to the join shape.
    */
  def asOfTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceMicros: Long,
      matchedTs: String = "asof_ts",
      strict: Boolean = false,
      direction: String = "backward",
      maxKeyRows: Long = Long.MaxValue
  ): DataFrame = {
    require(toleranceMicros > 0, s"toleranceMicros must be positive: $toleranceMicros")
    val joined = asOf(left, right, leftKey, rightKey, leftTs, rightTs,
      payload, matchedTs, strict, direction, maxKeyRows)
    val gap =
      if (direction == "backward")
        unix_micros(col(leftTs)) - unix_micros(col(matchedTs))
      else unix_micros(col(matchedTs)) - unix_micros(col(leftTs))
    val ok = col(matchedTs).isNotNull && gap <= toleranceMicros
    val withFlag = joined.withColumn("__tol_ok", ok)
    (matchedTs +: payload)
      .foldLeft(withFlag)((df, c) =>
        df.withColumn(c, when(col("__tol_ok"), col(c))))
      .drop("__tol_ok")
  }

  /** Point-in-interval join: every (point, interval) pair with equal keys
    * and `start <= pointTs < end`. Inner semantics — a point joining no
    * interval is dropped; a point inside several intervals emits one row
    * per interval.
    *
    * `bucketMicros` is the blocking granularity: pick it near the typical
    * interval length so most intervals explode to ≤ 2 buckets. An interval
    * spanning more than `maxBuckets` buckets is DROPPED before the explode
    * — one degenerate open-ended interval (len/width of 10^9) would
    * otherwise fan out that many rows; same cap-plus-observability
    * treatment as MinHash's degenerate buckets — size the cap (or widen
    * the bucket) with [[oversizedIntervals]]. All point columns and all
    * interval columns pass through (names must not collide).
    */
  def interval(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      pointTs: String,
      start: String,
      end: String,
      bucketMicros: Long,
      maxBuckets: Int = 1 << 12
  ): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(maxBuckets > 0, "maxBuckets must be positive")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"point/interval column names collide: ${dup.mkString(", ")}")
    val p = points.withColumn("__pb", floor(unix_micros(col(pointTs)) / bucketMicros))
    // [start, end): the last covered bucket is floor((end-1µs)/width);
    // empty intervals (end <= start) explode to no buckets at all
    val i = intervals
      .filter(col(end) > col(start))
      .withColumn("__b0", floor(unix_micros(col(start)) / bucketMicros))
      .withColumn("__b1", floor((unix_micros(col(end)) - 1) / bucketMicros))
      .filter(col("__b1") - col("__b0") < maxBuckets)
      .withColumn("__ib", explode(sequence(col("__b0"), col("__b1"))))
    p.join(i,
        p("__pb") === i("__ib") &&
          p(pointKey) === i(intervalKey) &&
          p(pointTs) >= i(start) && p(pointTs) < i(end))
      .drop("__pb", "__ib", "__b0", "__b1")
  }

  /** The intervals a `maxBuckets` cap would drop from [[interval]], with
    * their bucket spans — run this to SIZE the cap (or to learn the bucket
    * width is wrong for the data) instead of discovering silently-missing
    * matches.
    */
  def oversizedIntervals(
      intervals: DataFrame,
      start: String,
      end: String,
      bucketMicros: Long,
      maxBuckets: Int
  ): DataFrame = {
    require(bucketMicros > 0 && maxBuckets > 0, "bucketMicros and maxBuckets must be positive")
    intervals
      .filter(col(end) > col(start))
      .withColumn("n_buckets",
        floor((unix_micros(col(end)) - 1) / bucketMicros)
          - floor(unix_micros(col(start)) / bucketMicros) + 1)
      .filter(col("n_buckets") > maxBuckets)
  }

  /** Streaming point-in-interval join — the unbounded form of [[interval]],
    * expressed so Structured Streaming can BOUND ITS STATE. Both inputs
    * must carry a watermark (`withWatermark`) on their respective time
    * columns. `maxLength` (e.g. `"2 hours"`) promises an upper bound on
    * every interval's length; it becomes the second time constraint
    * (`pointTs < start + maxLength`) that lets Spark compute, from the two
    * watermarks, when a buffered row can never match again and evict it.
    * Without that bound the exact residual `pointTs < end` alone would
    * force both sides' state to grow forever (end is an arbitrary column;
    * the engine cannot reason about it).
    *
    * Intervals longer than `maxLength` are truncated by the constraint —
    * matches past `start + maxLength` are dropped, so the bound is a
    * correctness contract, not a hint.
    *
    * No bucketing here: the streaming state store already partitions by
    * the join key, and the watermark — not a bucket width — is what caps
    * memory. Inner semantics, append output mode.
    */
  def intervalStream(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      pointTs: String,
      start: String,
      end: String,
      maxLength: String
  ): DataFrame = {
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"point/interval column names collide: ${dup.mkString(", ")}")
    points.join(intervals,
      points(pointKey) === intervals(intervalKey) &&
        points(pointTs) >= intervals(start) &&
        points(pointTs) < intervals(start) + expr(s"INTERVAL $maxLength") &&
        points(pointTs) < intervals(end))
  }

  /** Streaming interval ANTI — the unbounded form of [[intervalAnti]]:
    * points that NO interval of their key covers, on a live stream.
    * Expressed as a LEFT OUTER stream-stream join with
    * [[intervalStream]]'s exact time-bound condition, then keeping only
    * the null-augmented rows: Structured Streaming emits a left row with
    * null right columns precisely when the watermark proves no matching
    * interval can still arrive — which IS the anti-join decision, made
    * exactly once per point. Both inputs must carry watermarks;
    * `maxLength` is the same correctness contract as [[intervalStream]]
    * (a longer interval is truncated, so a point covered only past
    * `start + maxLength` is NOT considered covered). Null-key points
    * never match and therefore survive, as in the batch form.
    *
    * Emission latency is the price of exactness: a clean point emits
    * only once the watermark passes its match window, not on arrival —
    * the same buffer-until-final contract as the streaming as-of join.
    */
  def intervalAntiStream(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      pointTs: String,
      start: String,
      end: String,
      maxLength: String
  ): DataFrame = {
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"point/interval column names collide: ${dup.mkString(", ")}")
    val joined = points.join(intervals,
      points(pointKey) === intervals(intervalKey) &&
        points(pointTs) >= intervals(start) &&
        points(pointTs) < intervals(start) + expr(s"INTERVAL $maxLength") &&
        points(pointTs) < intervals(end),
      "left_outer")
    // a matched row always has a non-null interval start (the join
    // condition compared it), so null start ⇔ the watermark-final
    // "no interval ever covered this point" row
    joined.where(intervals(start).isNull)
      .select(points.columns.map(c => points(c)).toIndexedSeq: _*)
  }

  /** Interval ANTI join: the points NOT inside any interval of their
    * key — the exclusion form of [[interval]] (drop events during
    * incident windows, decontaminate training data around eval-period
    * intervals, dead-time filtering). One distinct + left-anti on the
    * caller-named point id, on top of the bucketed inner join's plan.
    *
    * `pointId` contract: it must be NON-NULL and UNIQUELY identify point
    * rows, and the contract is ENFORCED — a null id raises a loud runtime
    * error (baked into the join key, so it cannot be optimized away)
    * instead of the two silent failure modes an id-based anti join has
    * with nulls: plain equality never matches a null key, so a null-id
    * point inside an interval would LEAK through the screen; null-safe
    * equality conflates every null-id row into one identity and
    * over-drops them all. Rows merely SHARING a non-null id are excluded
    * together (if any falls inside an interval, all go) — over-drop is
    * the safe direction for an exclusion screen, but synthesize a unique
    * id rather than rely on it.
    *
    * Cap caveat, louder here than on the inner form: an interval dropped
    * by `maxBuckets` EXCLUDES NOTHING — for an exclusion screen a missed
    * interval is silent contamination, so size the cap with
    * [[oversizedIntervals]] and treat a non-zero count as a failure, not
    * a statistic.
    */
  def intervalAnti(
      points: DataFrame,
      intervals: DataFrame,
      pointId: String,
      pointKey: String,
      intervalKey: String,
      pointTs: String,
      start: String,
      end: String,
      bucketMicros: Long,
      maxBuckets: Int = 1 << 12
  ): DataFrame = {
    val hit = interval(points, intervals, pointKey, intervalKey, pointTs,
        start, end, bucketMicros, maxBuckets)
      .select(col(pointId).as("__hit_id")).distinct()
    // the null check lives INSIDE the join key: the anti join evaluates
    // it for every point row, so a null id fails the job loudly — it
    // cannot be silently retained (plain-equality leak) or conflated
    // with other null ids (null-safe over-drop)
    val guardedId = when(col(pointId).isNotNull, col(pointId))
      .otherwise(raise_error(lit(
        s"intervalAnti: null $pointId — the exclusion screen requires a " +
          "non-null unique point id; a null id would leak through or " +
          "over-drop (see scaladoc)")))
    points.join(hit, guardedId === col("__hit_id"), "left_anti")
  }

  /** Join-key skew diagnostics — the report to run BEFORE a big shuffle
    * join, because at 100 TB a single hot key is the difference between a
    * balanced stage and one straggler task holding the cluster. For the
    * top `topK` keys by row count: the key's share of all rows, its skew
    * factor against the mean key (how many "average keys" of work one
    * task would inherit), and the salt fan-out that would cap any salted
    * sub-key at `targetRowsPerTask` rows — the number to feed a
    * salting-rewrite or to justify leaving it to AQE's skew-join split.
    *
    * One map-combined count per key (the exchange carries distinct keys,
    * not rows), the mean via a scalar broadcast, `TakeOrderedAndProject`
    * for the top-k — the observability pass costs one scan.
    */
  def skewReport(
      df: DataFrame,
      key: Column,
      topK: Int = 20,
      targetRowsPerTask: Long = 1000000
  ): DataFrame = {
    require(topK > 0 && targetRowsPerTask > 0, s"bad topK/target: $topK/$targetRowsPerTask")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(
        col("key"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"),
        round(col("cnt") * col("n_keys") / col("total"), 4).as("skew_factor"),
        ceil(col("cnt") / targetRowsPerTask.toDouble).cast("long").as("salt_buckets"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
  }

  /** Salted inner equi-join — the manual skew rewrite for the cases AQE's
    * skew-join split can't reach (a skewed key feeding a non-sort-merge
    * path, a downstream operator pinned to the join's partitioning, or a
    * key whose skew is known a priori from [[skewReport]]): the LARGE
    * side's rows scatter across `saltBuckets` sub-keys by row hash; the
    * SMALL-but-not-broadcastable side replicates once per sub-key
    * (`explode` of a `saltBuckets`-literal array — a per-row expression,
    * no shuffle multiplier beyond the intended ×S on that side only).
    * Join on (key, salt), then drop the salt: result row-identical to the
    * plain inner join (spec-asserted), but the hot key's rows now spread
    * over S tasks instead of one straggler.
    *
    * `saltBuckets` comes from [[skewReport]]'s `salt_buckets` column —
    * size it so hotKeyRows / S ≤ targetRowsPerTask. Replication cost is
    * S × |small side|, which is why this beats broadcast only when the
    * small side exceeds the broadcast budget.
    */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int
  ): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(large.columns.contains(key) && small.columns.contains(key),
      s"join key '$key' must exist on both sides")
    val overlap = (large.columns.toSet & small.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns shared by both sides would collide post-join: ${overlap.mkString(", ")}")
    // row-content hash scatters a hot key's rows evenly; any per-row
    // expression works — determinism of the JOIN RESULT doesn't depend on
    // the salt assignment
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toSeq: _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(lit((0 until saltBuckets).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** BLOOM-PRUNED equi join — for the join regime between broadcast and
    * plain shuffle: the selective side is too big to broadcast AS DATA
    * (payload columns, tens of millions of rows) but its KEY-SET FILTER
    * fits anywhere (~1.2 MB per million keys at 1% fpp). Build a Bloom
    * filter over the selective side's keys (bounded executor-side partial
    * builds tree-merged — the IngestDedup backfill discipline, never a
    * driver collect of keys), broadcast it, and filter the LARGE side
    * in-scan ([[graft.plans.BloomMightContainB]], codegen) BEFORE the
    * shuffle: the exchange then carries only rows that can match (plus
    * the fpp share), instead of the whole 100-TB scan.
    *
    * Row-identical to `large.join(small, key)` by construction: a Bloom
    * filter has NO false negatives, and false positives merely ride the
    * exchange and drop in the join. When `small` is broadcast-sized
    * anyway, Catalyst's broadcast join already wins — this operator is
    * for the middle regime (and the plan it produces still lets Catalyst
    * pick broadcast for the join itself if sizes allow).
    *
    * The selective side is MATERIALIZED once ([[graft.Materialize]] —
    * spill-safe executor blocks, or reliable checkpoint under the
    * `graft.checkpointDir` conf) and the emptiness probe, the Bloom
    * build, and the final join all read that one snapshot: the previous
    * shape evaluated `small`'s plan three times, so a non-deterministic
    * plan (sampling, rand-derived, a re-read of a changing source) could
    * yield a filter with effective FALSE NEGATIVES against the join's
    * own evaluation — silently dropping true matches. The
    * materialization also yields the side's exact row count for free,
    * which auto-sizes the filter geometry: `expectedKeys` is now an
    * OPTIONAL override (pass it when the side carries many duplicate
    * keys and you want the smaller distinct-keys geometry). fpp fixed
    * at 1% (the repo-wide Bloom convention).
    */
  def bloomPrunedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      expectedKeys: Long = -1L
  ): DataFrame = {
    require(expectedKeys > 0 || expectedKeys == -1L,
      s"expectedKeys must be positive (or omitted for auto-sizing): $expectedKeys")
    require(large.columns.contains(key) && small.columns.contains(key),
      s"join key '$key' must exist on both sides")
    // xxhash64 is TYPE-sensitive where the equi join coerces: an INT key
    // on one side and a BIGINT on the other hash differently, and the
    // filter would silently prune every true match — refuse loudly
    require(large.schema(key).dataType == small.schema(key).dataType,
      s"join key '$key' types differ (${large.schema(key).dataType} vs " +
        s"${small.schema(key).dataType}): the Bloom hash is type-sensitive while the " +
        "join would coerce — cast both sides to one type first")
    import org.apache.spark.util.sketch.BloomFilter
    val smallM = graft.Materialize(small)
    val nRows = smallM.count()
    // an EMPTY selective side must yield the plain (empty) join, not a
    // treeReduce-on-zero-partials crash
    if (nRows == 0) return large.join(smallM, Seq(key))
    val geometry = if (expectedKeys > 0) expectedKeys else nRows
    val merged = smallM.select(xxhash64(col(key)).as("h"))
      .coalesce(8)
      .queryExecution.toRdd.map(_.getLong(0))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val bf = BloomFilter.create(geometry, 0.01)
          it.foreach(bf.putLong)
          Iterator.single(bf)
        }
      }
      .treeReduce((a, b) => a.mergeInPlace(b), depth = 2)
    val bc = large.sparkSession.sparkContext.broadcast(merged)
    import org.apache.spark.sql.GraftBridge
    val pruned = large.where(GraftBridge.column(graft.plans.BloomMightContainB(
      bc, GraftBridge.expression(xxhash64(col(key))))))
    pruned.join(smallM, Seq(key))
  }
}
