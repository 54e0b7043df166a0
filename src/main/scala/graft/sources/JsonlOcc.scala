package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Optimistic concurrency for graft-jsonl commits.
  *
  * The format's mutations publish through rename (append legs) and
  * delete-then-publish (COW swap, compaction swap). Through round 11 that
  * carried a documented single-writer assumption; two concurrent
  * committers racing on the same files could interleave DESTRUCTIVELY:
  * writer B's swap could delete files writer A's replacement had just
  * published around, a MOR delete could land its sidecar against a file
  * a compaction had just rewritten (the deletes silently never apply —
  * resurrected rows), and a MERGE could re-emit rows a concurrent DELETE
  * had erased. The MySQL reference got ACID upserts for free
  * (`metro.sql:42-59` PRIMARY KEY + `MeshJoin.java:354-376` ON DUPLICATE
  * KEY UPDATE); this is the lake equivalent: Iceberg-style
  * validate-at-commit with a short critical section.
  *
  * Protocol — every mutating commit runs as:
  *
  *  1. ACQUIRE the table's commit lock (`_commit.lock`, atomic
  *     create-if-absent — the filesystem CAS primitive; object stores
  *     without atomic create would swap in a conditional PUT).
  *  2. VALIDATE the operation's read snapshot against the now-frozen live
  *     state: every file it plans to remove/reference must still exist,
  *     and no delete-vector sidecar that appeared since the operation
  *     planned may reference those files (a concurrent MOR delete's
  *     verdicts would be silently lost in the rewrite).
  *  3. APPLY (delete + publish) and RELEASE.
  *
  * A failed validation is a LOUD abort naming the conflicting files —
  * the operation re-run against the current table state is the retry.
  * Validation is deliberately conservative at FILE granularity (two
  * merges touching disjoint rows of one file conflict — same trade
  * Iceberg makes) and treats a sidecar renamed by a concurrent sweep as
  * new (spurious abort, never a lost update).
  *
  * The lock bounds only the commit critical section (milliseconds: a
  * listing, a few renames), never scans or shuffles — writers of a 100 TB
  * table still overlap everywhere except the final swap. */
private[graft] object JsonlOcc {

  val LockName = "_commit.lock"

  /** Acquisition budget; tests shrink it to exercise the timeout path. */
  @volatile private[graft] var lockTimeoutMs: Long = 30000L

  /** Test seam: runs after an operation's plan but BEFORE its commit
    * lock acquisition — the deterministic two-writer interleaving hook
    * (CatalogSpec parks writer B here, lets writer A commit, then
    * releases B into its validation). */
  @volatile private[graft] var beforeLockHook: Option[String => Unit] = None

  /** Live delete-vector sidecar names (the validation baseline every
    * mutating write captures at plan time). */
  def liveVectorNames(fs: FileSystem, root: Path): Set[String] =
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).collect {
      case st if st.isFile && st.getPath.getName.startsWith("_deletes-") =>
        st.getPath.getName
    }.toSet

  def withCommitLock[T](fs: FileSystem, root: Path, opDesc: String)(body: => T): T = {
    beforeLockHook.foreach(_(opDesc))
    val lock = new Path(root, LockName)
    val deadline = System.nanoTime() + lockTimeoutMs * 1000000L
    while (!tryAcquire(fs, root, opDesc)) {
      if (System.nanoTime() > deadline) {
        val holder =
          try {
            val in = fs.open(lock)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"graft-jsonl: $opDesc could not acquire the commit lock on " +
            s"$root within ${lockTimeoutMs}ms — held by [$holder]. " +
            "Another writer is committing; if its JVM died, verify no " +
            s"writer is live and remove $LockName manually.")
      }
      Thread.sleep(20)
    }
    try body
    finally fs.delete(lock, false)
  }

  /** One acquisition attempt. The `file://` scheme needs java.nio's
    * `Files.createFile` (true O_EXCL): Hadoop's RawLocalFileSystem
    * `create(path, overwrite = false)` is an exists() CHECK followed by a
    * plain stream open, so two racing local writers could both pass it —
    * the one deployment the bench and specs actually run on must not have
    * a weaker CAS than HDFS (whose exclusive create is server-side).
    * Holder info is diagnostic only and written best-effort: once the
    * create has succeeded the lock is OURS, and a failed diagnostic write
    * must not masquerade as contention (the writer would then spin out
    * the timeout against its own orphaned lock and wedge the table). */
  private def tryAcquire(fs: FileSystem, root: Path, opDesc: String): Boolean = {
    val holder = s"$opDesc @ ${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val scheme = Option(root.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val dir = java.nio.file.Paths.get(root.toUri.getPath)
      try {
        java.nio.file.Files.createDirectories(dir)
        val lockFile = java.nio.file.Files.createFile(dir.resolve(LockName))
        try { java.nio.file.Files.write(lockFile, holder); () }
        catch { case _: java.io.IOException => () }
        true
      } catch { case _: java.io.IOException => false } // exists ⊂ IOException
    } else {
      try {
        val out = fs.create(new Path(root, LockName), false)
        try { out.write(holder); out.close() }
        catch {
          case _: java.io.IOException =>
            try out.close() catch { case _: java.io.IOException => () }
        }
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** The data-file names a delete-vector sidecar references (its JSON
    * field names) — one reader shared by commit validation and both
    * delta commits. */
  def vectorFileNames(fs: FileSystem, p: Path): Set[String] = {
    val in = fs.open(p)
    val tree = try JsonlV2.mapper.readTree(in) finally in.close()
    val it = tree.fieldNames()
    val names = Set.newBuilder[String]
    while (it.hasNext) names += it.next()
    names.result()
  }

  /** Validate a delete-then-publish swap (COW row-level op, compaction):
    * the files the operation will remove must all still exist, and no
    * sidecar published since `vectorsAtPlan` may reference them. */
  def validateSwap(fs: FileSystem, root: Path, swapNames: Seq[String],
      vectorsAtPlan: Set[String], opDesc: String): Unit = {
    val missing = swapNames.filterNot(n => fs.exists(new Path(root, n)))
    require(missing.isEmpty,
      s"graft-jsonl: $opDesc conflicts with a concurrent commit — " +
        s"file(s) it scanned were already rewritten or removed: " +
        s"${missing.sorted.mkString(", ")}. Re-run the operation against " +
        "the current table state.")
    requireNoNewVectorsOn(fs, root, swapNames.toSet, vectorsAtPlan, opDesc,
      "its rewrite would silently drop those row-level deletes")
  }

  /** Validate a delta (MOR) commit: every file the new sidecars/verdicts
    * reference must still exist (a rewritten file ignores old-named
    * sidecars — the deletes would silently never apply), and for MERGE no
    * concurrent sidecar may have landed on those files since plan time
    * (the merge's row images predate those deletes — re-emitting them
    * resurrects erased rows). */
  def validateDeltaRefs(fs: FileSystem, root: Path, referenced: Set[String],
      vectorsAtPlan: Option[Set[String]], opDesc: String): Unit = {
    val missing = referenced.filterNot(n => fs.exists(new Path(root, n)))
    require(missing.isEmpty,
      s"graft-jsonl: $opDesc conflicts with a concurrent commit — its " +
        s"row-level verdicts reference file(s) that were rewritten or " +
        s"removed: ${missing.toSeq.sorted.mkString(", ")}. The verdicts " +
        "would silently never apply; re-run against the current state.")
    vectorsAtPlan.foreach(baseline =>
      requireNoNewVectorsOn(fs, root, referenced, baseline, opDesc,
        "its row images predate those deletes and would resurrect them"))
  }

  private def requireNoNewVectorsOn(fs: FileSystem, root: Path,
      files: Set[String], vectorsAtPlan: Set[String], opDesc: String,
      consequence: String): Unit = {
    val fresh = liveVectorNames(fs, root) -- vectorsAtPlan
    val touching =
      fresh.filter(v => vectorFileNames(fs, new Path(root, v)).exists(files))
    require(touching.isEmpty,
      s"graft-jsonl: $opDesc conflicts with a concurrent commit — delete " +
        s"vector(s) ${touching.toSeq.sorted.mkString(", ")} landed on " +
        s"file(s) it read after it planned; $consequence. Re-run the " +
        "operation against the current table state.")
  }
}
