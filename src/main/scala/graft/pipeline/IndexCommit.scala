package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process atomic build-then-commit for the persisted index
  * families (MinHash band index, IVF inverted lists, BM25 postings).
  *
  * The pre-round-13 `ensure*` paths were check-then-build: two JVMs
  * racing both observe "uncommitted" and `mode("overwrite")` into the
  * SAME shared index root, clobbering each other mid-build. This helper
  * applies the snapshot protocol's only commit primitive
  * ([[SnapshotMv]]'s `commitManifest`: write aside, then ONE atomic
  * rename) at whole-index granularity: the build runs in a hidden
  * sibling temp dir (invisible to every reader — readers only ever
  * resolve the final root), and publication is a single
  * `fs.rename(tmp, finalRoot)`. Rename-onto-existing fails on every
  * Hadoop FileSystem when the destination is present, so of N racing
  * builders exactly one publishes; the losers observe the winner's
  * committed index, discard their temp, and proceed — no torn state is
  * ever visible at the final path.
  */
object IndexCommit {

  /** Ensure a committed index at `finalRoot`: no-op when `isCommitted`
    * already holds; otherwise run `build` into a temp sibling and commit
    * it atomically. `build` receives the temp path and must leave a FULLY
    * committed layout there (data + manifests), because the rename makes
    * everything visible at once. A pre-protocol crash leftover (exists
    * but not committed) is cleared first — under this protocol partial
    * state can only ever exist at temp paths, never at `finalRoot`.
    */
  def ensure(fs: FileSystem, finalRoot: Path)(isCommitted: Path => Boolean)(
      build: Path => Unit): Unit = {
    if (isCommitted(finalRoot)) return
    val parent = finalRoot.getParent
    fs.mkdirs(parent)
    val tmp = new Path(parent, ".build-" + finalRoot.getName + "-" +
      java.util.UUID.randomUUID().toString.take(8))
    // Hadoop rename semantics: dst absent -> src becomes dst (atomic);
    // dst an existing dir -> src moves INSIDE dst (also "true"). So a
    // bare rename return value cannot distinguish winning from losing a
    // race — publish() applies the post-condition instead: if our temp
    // ended up nested under the destination we LOST (another writer owns
    // finalRoot); remove the stray and report failure.
    def publish(): Boolean = {
      if (fs.exists(finalRoot)) return false
      if (!fs.rename(tmp, finalRoot)) return false
      val stray = new Path(finalRoot, tmp.getName)
      if (fs.exists(stray)) { fs.delete(stray, true); false } else true
    }
    try {
      build(tmp)
      if (!publish() && !isCommitted(finalRoot)) {
        // The destination blocks publication yet holds no committed
        // index: under this protocol that can only be a PRE-protocol
        // crash leftover (a racing protocol writer only ever publishes a
        // complete index, atomically). Clearing it by a bare delete would
        // be a TOCTOU (ADVICE r13): a racer can publish between our
        // staleness observation and the delete, and the delete would
        // destroy the freshly COMMITTED index. Instead move the blocker
        // ASIDE with one atomic rename, then inspect what we actually
        // grabbed: a true leftover is discarded; a committed index that
        // raced in is put back (or, if yet another publication beat the
        // restore, dropped as a redundant identical build — `build` is a
        // deterministic function of the corpus).
        val trash = new Path(parent,
          ".trash-" + finalRoot.getName + "-" +
            java.util.UUID.randomUUID().toString.take(8))
        if (fs.rename(finalRoot, trash)) {
          if (isCommitted(trash)) {
            // we grabbed a committed index — restore it; if a racer
            // published meanwhile, both are complete so ours is surplus
            if (!fs.rename(trash, finalRoot)) fs.delete(trash, true)
          } else fs.delete(trash, true)
        }
        if (!publish() && !isCommitted(finalRoot))
          throw new java.io.IOException(
            s"index commit failed: cannot rename $tmp -> $finalRoot and " +
              "no committed index is present at the destination")
      }
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }
}
