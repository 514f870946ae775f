package graft.streaming

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

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
  *    [[graft.etl.Snapshots]]. On filesystems without atomic rename
  *    (object stores like S3A) the destination can still be torn — so
  *    load() treats an unreadable newest file as torn, deletes it, and
  *    falls back to the previous version, which is sound because
  *    persist runs BEFORE the streaming checkpoint commits the batch:
  *    a torn state file's batch was never committed and will be
  *    replayed against the recovered previous state.
  *  - '''Replay-safe''': the persisted batchId feeds the monitors'
  *    at-least-once guard. Persist happens AFTER merge and BEFORE the
  *    streaming checkpoint commits the batch, so every crash point
  *    lands in one of two recoverable states: (a) state persisted,
  *    batch uncommitted → the replayed id is skipped by the guard;
  *    (b) state not persisted, batch uncommitted → the replay merges
  *    exactly once.
  *  - '''Bounded storage''': only the two newest versions are kept
  *    (the previous survives as the torn-write fallback).
  *  - '''Versioned envelope''': every file carries (magic, version,
  *    parameter fingerprint) ahead of the Java-serialized state. A
  *    redeploy that reshapes a sketch class (version bump) or a
  *    restart with changed sketch parameters (hll m, Space-Saving
  *    capacity, KLL k — the fingerprint) fails LOUD with a named
  *    remediation instead of a bare InvalidClassException or a
  *    silently wrong estimate from map-shaped state.
  *
  * States are plain JVM-serializable values (immutable maps, arrays,
  * case classes) a few KB in size; Java serialization inside the
  * versioned envelope is sufficient.
  */
object MonitorState {

  /** Envelope magic ("GMS\1"). */
  private val Magic = 0x474d5301
  /** Bump whenever the persisted state layout changes across a deploy. */
  val Version = 1

  private def stateDir(checkpointDir: String): Path =
    new Path(checkpointDir, "graft-monitor-state")

  /** Atomically persist (lastMergedBatchId, state) under the monitor's
    * parameter fingerprint. Idempotent per id: a replayed persist of an
    * already-committed id is a no-op (the merge pipeline is
    * deterministic, so the bytes would be identical). */
  def save(checkpointDir: String, hadoopConf: Configuration,
           id: Long, state: AnyRef, fingerprint: String = ""): Unit = {
    val dir = stateDir(checkpointDir)
    val fs = dir.getFileSystem(hadoopConf)
    fs.mkdirs(dir)
    val fin = new Path(dir, f"state-$id%020d")
    if (fs.exists(fin)) return
    val tmp = new Path(dir, f".tmp-$id%020d")
    // the envelope is RAW DataOutput bytes ahead of the serialization
    // stream, so load() can tell a foreign/pre-envelope layout (wrong
    // first four bytes) from a torn file without an ObjectInputStream
    // conflating both into EOFException
    val raw = fs.create(tmp, true)
    try {
      val env = new java.io.DataOutputStream(raw)
      env.writeInt(Magic)
      env.writeInt(Version)
      env.writeUTF(fingerprint)
      val out = new ObjectOutputStream(raw)
      out.writeObject(state)
      out.flush()
    } finally raw.close()
    if (!fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      require(fs.exists(fin), s"monitor-state commit lost: $fin")
    }
    versions(fs, dir).dropRight(2).foreach(p => fs.delete(p, false))
  }

  /** Newest persisted (lastMergedBatchId, state), if any. An unreadable
    * (torn) newest file is deleted and the previous version used — see
    * the object doc for why that is replay-sound. An envelope MISMATCH
    * (version or fingerprint) is not torn state but a deployment error,
    * and fails loud with the remediation in the message. */
  def load[S <: AnyRef](checkpointDir: String, hadoopConf: Configuration,
                        fingerprint: String = ""): Option[(Long, S)] = {
    val dir = stateDir(checkpointDir)
    val fs = dir.getFileSystem(hadoopConf)
    if (!fs.exists(dir)) return None
    versions(fs, dir).reverse.foreach { p => // newest first
      val id = p.getName.stripPrefix("state-").toLong
      try {
        val raw = fs.open(p)
        try {
          val env = new java.io.DataInputStream(raw)
          val magic = env.readInt()
          if (magic != Magic)
            // a pre-envelope file starts with the Java serialization
            // header (0xaced0005) — a deployment mismatch, not torn bytes
            failEnvelope(p, f"unrecognized magic 0x$magic%08x (foreign or pre-envelope file)")
          val ver = env.readInt()
          if (ver != Version)
            failEnvelope(p, s"state version $ver, this build expects $Version")
          val fp = env.readUTF()
          if (fp != fingerprint)
            failEnvelope(p, s"""parameter fingerprint "$fp", this monitor expects "$fingerprint"""")
          val in = new ObjectInputStream(raw)
          return Some(id -> in.readObject().asInstanceOf[S])
        } finally raw.close()
      } catch {
        case _: IOException | _: ClassNotFoundException =>
          // torn/corrupt file: drop it and fall back to the previous
          // version (its batch was never committed — object doc)
          fs.delete(p, false)
      }
    }
    None
  }

  private def failEnvelope(p: Path, what: String): Nothing =
    throw new IllegalStateException(
      s"graft monitor-state mismatch at $p: $what. A redeploy changed the " +
        "persisted sketch layout, or the monitor restarted with different " +
        "parameters against the same checkpoint; refusing to reload " +
        "incompatible state. Remediation: start the monitor with a FRESH " +
        "checkpoint dir (it re-covers history from the replayable source), " +
        "or roll back to the writing build/parameters.")

  private def versions(fs: FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("state-")).sortBy(_.getName).toSeq
}
