package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The staged-compaction swap shared by the two persisted-index
  * lifecycles (IndexedDedup bands/features, IndexedLex postings/
  * doclen/stats): apply — or re-apply after a crash — a CERTIFIED
  * staged rebuild by moving each live table aside to
  * `_compact_trash` and renaming the staged one in. No-op (stage
  * cleared) when the `_stage_complete` marker is absent.
  *
  * Failure discipline: Hadoop's FileSystem.rename signals failure by
  * RETURNING FALSE, not throwing — so every rename's boolean is
  * checked and a false THROWS with stage and trash left in place
  * (the staged output is complete by marker and the live bytes are
  * still in trash, so the next compact()'s repair pass finishes the
  * swap idempotently; nothing is ever deleted until every table is
  * verified live). The old code ignored the booleans, so a failed
  * staged→live rename followed by the trash delete could destroy
  * both remaining copies of a table — silent total index loss.
  */
private[streaming] object CompactSwap {

  /** Swap the staged tables named `names` in at `path`. Destructive
    * cleanup (delete stage + trash) happens ONLY after verifying
    * every table exists at its live location. */
  def finishSwap(fs: FileSystem, path: String, names: Seq[String]): Unit = {
    val stage = new Path(s"$path/_compact_stage")
    val done = new Path(stage, "_stage_complete")
    if (!fs.exists(done)) { fs.delete(stage, true); return }
    val trash = new Path(s"$path/_compact_trash")
    fs.mkdirs(trash)
    names.foreach { name =>
      val staged = new Path(stage, name)
      val live = new Path(s"$path/$name")
      if (fs.exists(staged)) { // not yet swapped in
        if (fs.exists(live)) {
          val aside = new Path(trash, name)
          fs.delete(aside, true)
          require(fs.rename(live, aside),
            s"compaction swap: rename $live -> $aside returned false; " +
              "stage and trash left in place for repair")
        }
        require(fs.rename(staged, live),
          s"compaction swap: rename $staged -> $live returned false; " +
            "stage and trash left in place for repair")
      }
    }
    // every table must be live before destroying the only other copies
    names.foreach { name =>
      require(fs.exists(new Path(s"$path/$name")),
        s"compaction swap: $name missing at $path after swap; " +
          "stage and trash left in place for repair")
    }
    fs.delete(stage, true)
    fs.delete(trash, true)
    ()
  }
}
