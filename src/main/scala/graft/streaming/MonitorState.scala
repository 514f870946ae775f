package graft.streaming

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe persistence for the foreachBatch monitors' mergeable
  * cross-batch state (the Space-Saving summary, HLL registers, CMS
  * cells, KLL compactors, A-Res top-k, day-spine accumulators — all
  * O(sketch) or calendar-bounded, never row-sized).
  *
  * Structured Streaming checkpoints the SOURCE offsets; without this,
  * a restarted monitor resumes mid-history with zeroed sketches and
  * silently estimates only the post-restart suffix. Here each merged
  * batch persists `(lastMergedBatchId, state)` next to the query's own
  * checkpoint, so offsets and sketch state recover together:
  *
  *  - '''Atomic commit''': state is written to a temp file and renamed
  *    into place (`state-<batchId>`), the one-winner posture of
  *    [[graft.etl.Snapshots]] — a torn write leaves the previous
  *    version as the newest complete file.
  *  - '''Replay-safe''': the persisted batchId feeds the monitors'
  *    at-least-once guard. Persist happens AFTER merge and BEFORE the
  *    streaming checkpoint commits the batch, so every crash point
  *    lands in one of two recoverable states: (a) state persisted,
  *    batch uncommitted → the replayed id is skipped by the guard;
  *    (b) state not persisted, batch uncommitted → the replay merges
  *    exactly once.
  *  - '''Bounded storage''': only the two newest versions are kept
  *    (the previous survives as the torn-write fallback).
  *
  * States are plain JVM-serializable values (immutable maps, arrays,
  * case classes) a few KB in size; Java serialization is sufficient
  * and schema-stable within a deployment.
  */
object MonitorState {

  private def stateDir(checkpointDir: String): Path =
    new Path(checkpointDir, "graft-monitor-state")

  /** Atomically persist (lastMergedBatchId, state). Idempotent per id:
    * a replayed persist of an already-committed id is a no-op (the
    * merge pipeline is deterministic, so the bytes would be identical). */
  def save(checkpointDir: String, hadoopConf: Configuration,
           id: Long, state: AnyRef): Unit = {
    val dir = stateDir(checkpointDir)
    val fs = dir.getFileSystem(hadoopConf)
    fs.mkdirs(dir)
    val fin = new Path(dir, f"state-$id%020d")
    if (fs.exists(fin)) return
    val tmp = new Path(dir, f".tmp-$id%020d")
    val out = new ObjectOutputStream(fs.create(tmp, true))
    try out.writeObject(state) finally out.close()
    if (!fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      require(fs.exists(fin), s"monitor-state commit lost: $fin")
    }
    versions(fs, dir).dropRight(2).foreach(p => fs.delete(p, false))
  }

  /** Newest persisted (lastMergedBatchId, state), if any. */
  def load[S <: AnyRef](checkpointDir: String,
                        hadoopConf: Configuration): Option[(Long, S)] = {
    val dir = stateDir(checkpointDir)
    val fs = dir.getFileSystem(hadoopConf)
    if (!fs.exists(dir)) None
    else versions(fs, dir).lastOption.map { p =>
      val id = p.getName.stripPrefix("state-").toLong
      val in = new ObjectInputStream(fs.open(p))
      try id -> in.readObject().asInstanceOf[S] finally in.close()
    }
  }

  private def versions(fs: FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("state-")).sortBy(_.getName).toSeq
}
