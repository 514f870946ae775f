package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: match point rows to interval rows with
  * NO equi key — the case where Spark's planner can only offer a
  * BroadcastNestedLoopJoin (O(n·m) comparisons) or a cartesian product.
  *
  * The trick is standard interval bucketing: quantize the domain into
  * fixed-width bins, replicate each interval onto every bin it overlaps
  * (`explode(sequence(...))`), tag each point with its single containing
  * bin, then hash-join on the bin id and re-check the exact predicate.
  * The join becomes a shuffle/broadcast HASH join whose per-bin work is
  * |points in bin| × |intervals overlapping bin| — linear at scale when
  * the bin width tracks the typical interval length.
  *
  * Correctness: a point in bin b can only fall inside an interval that
  * overlaps b, and every interval is present in each bin it overlaps
  * exactly once (`sequence` emits distinct bins), so the bin join plus
  * the exact predicate yields each qualifying (point, interval) pair
  * exactly once — no dedup pass needed.
  *
  * Scale posture: replication factor per interval is
  * ⌈len/binWidth⌉ + 1, so choose `binWidth` near the median interval
  * length (replication ≈ 2×). Degenerate long intervals fan out wide —
  * cap them upstream or split the few whales into their own broadcast
  * pass. The bin column is a dense long, so AQE's skew-join splitting
  * handles hot bins (many points in one time bucket).
  */
object RangeJoin {

  /** Join `points` (point column `p`, a numeric/long domain — e.g. epoch
    * seconds) to `intervals` (half-open [lo, hi)), returning each
    * qualifying pair with both sides' columns. Columns `lo`, `hi`, `p`
    * must be long-castable; names must not collide across the inputs. */
  def pointInInterval(points: DataFrame, p: String,
                      intervals: DataFrame, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = points.withColumn("__bin", floor(col(p).cast("long") / binWidth))
    // hi is exclusive, but a boundary-exact hi still maps into its bin
    // harmlessly (the exact predicate filters it); intervals where
    // lo >= hi produce an empty sequence and drop out, as they should
    val expanded = intervals
      .where(col(lo) < col(hi))
      .withColumn("__bin", explode(sequence(
        floor(col(lo).cast("long") / binWidth),
        floor((col(hi).cast("long") - 1) / binWidth))))
    binned.join(expanded, Seq("__bin"))
      .where(col(p) >= col(lo) && col(p) < col(hi))
      .drop("__bin")
  }

  /** Timestamp flavor: points at `pTs`, intervals [loTs, hiTs) as
    * timestamps, `binSeconds`-wide buckets on the epoch-seconds axis.
    * The exact predicate compares the original timestamps (micros
    * precision); bins only route the hash join. */
  def pointInIntervalTs(points: DataFrame, pTs: String,
                        intervals: DataFrame, loTs: String, hiTs: String,
                        binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // unix_timestamp truncates to seconds; the hi bound keeps its own
    // (truncated) bin rather than hi-1's, so a sub-second tail past a
    // bin boundary can't lose pairs — at worst one extra empty bin is
    // scanned and the exact predicate discards it
    val binned = points.withColumn("__bin", floor(unix_timestamp(col(pTs)) / binSeconds))
    val expanded = intervals
      .where(col(loTs) < col(hiTs))
      .withColumn("__bin", explode(sequence(
        floor(unix_timestamp(col(loTs)) / binSeconds),
        floor(unix_timestamp(col(hiTs)) / binSeconds))))
    binned.join(expanded, Seq("__bin"))
      .where(col(pTs) >= col(loTs) && col(pTs) < col(hiTs))
      .drop("__bin")
  }
}
