package graft

/** Per-JVM scratch root for materialized intermediates (memoized layouts,
  * edge/label checkpoints, signature tables, the media decode table).
  *
  * Placement: prefer `/dev/shm` (RAM-backed tmpfs) over `java.io.tmpdir`
  * when it offers comfortable headroom. Scratch artifacts are small
  * (tens of MB at the gate scale factors) but their WRITE PATTERN is
  * many-file — partitioned layouts commit hundreds of files, iterative
  * operators checkpoint every round — and on a disk-backed /tmp each
  * commit is a synchronous metadata op that multiplies under a loaded
  * host's I/O contention (the round-6 driver bench amplified exactly the
  * write-heavy entries 3–9× while CPU-bound entries stayed ~1.3×). On the
  * 1000-executor cluster this maps to what Spark already does: shuffle
  * and spill dirs belong on node-local fast storage, never on a
  * contended shared volume.
  *
  * Lifecycle: everything lives under one per-JVM root, deleted by a
  * shutdown hook — previous runs leaked thousands of
  * `/tmp/graft_*_<pid>_<nanos>` dirs with nothing to reclaim them. The
  * root embeds the pid+nanotime run tag, so concurrent JVMs (a gate run
  * next to a bench run) can never collide; per-SESSION uniqueness within
  * the JVM is the caller's job (callers append a session tag — the memo
  * maps are (session, dir)-keyed and a second session must not overwrite
  * parquet a prior session's memoized frames still scan). */
object Scratch {
  private val runTag =
    s"${ProcessHandle.current().pid()}_${java.lang.Long.toHexString(System.nanoTime())}"

  /** Keep a wide margin: tmpfs pages are RAM, and a full /dev/shm fails
    * writes with ENOSPC mid-commit. Fall back to the disk tmpdir unless
    * shm has 16 GiB usable — far above any gate-SF artifact set. */
  private val MinShmUsable = 16L << 30

  private[graft] lazy val root: String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > MinShmUsable)
        shm
      else new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    val dir = new java.io.File(base, s"graft_scratch_$runTag")
    dir.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(dir)))
    dir.getAbsolutePath
  }

  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(); ()
  }

  /** A scratch path unique to (kind, corpus dir, caller-supplied session
    * tag) within this JVM's run-tagged root. */
  def path(kind: String, d: String, sessionTag: String): String =
    s"$root/${kind}_${d.replaceAll("[^0-9a-zA-Z]", "_")}_s$sessionTag"
}
