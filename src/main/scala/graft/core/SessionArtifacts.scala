package graft.core

import org.apache.spark.sql.SparkSession

/** Lifecycle for the session-scoped artifacts the operator library
  * memoizes: persisted index frames (LSH band tables, prefix indexes),
  * materialized parquet artifacts (MinHash pairs, ngram candidates,
  * exact ANN top-k, staged stream slices, decimal/bucketed/fragmented
  * fixtures), bucketed catalog tables, and the `graft_*` temp views.
  *
  * Every memo follows one convention: it is keyed by a conf entry under
  * the [[Prefix]] namespace and (where it materializes data) points at a
  * temp directory whose name starts with `graft_`. That convention makes
  * cleanup a single sweep rather than per-operator bookkeeping.
  *
  * Why this exists (library contract, not bench plumbing): the memos are
  * deliberately session-scoped — fixtures are immutable within a session,
  * so a (session, data dir) key is sound and dies with the JVM. But a
  * long-lived session that processes MANY corpora would accumulate cache
  * registry entries and temp-dir artifacts for each one. Call
  * [[clear]] between corpora to drop all of it and start cold; the next
  * query against any data dir transparently rebuilds what it needs.
  * (This is the cleanup hook ADVICE asked for on `ngramJaccardPairs`'
  * persists and the `bucketedJoin`/`registerViews` staleness contract:
  * if the files under a data dir DO change in-session, `clear` is also
  * the way to force re-derivation.)
  */
object SessionArtifacts {
  /** Conf-key namespace all graft memos register under. */
  val Prefix = "spark.graft."

  /** Artifact temp dirs are created with this name prefix under the JVM
    * temp dir — the sweep refuses to delete anything else. */
  private val DirPrefix = "graft_"

  /** Drop every session-scoped artifact:
    *  1. unpersist all cached frames (catalog-wide — the library's
    *     persists are all CacheManager entries);
    *  2. drop the bucketed catalog tables and `graft_*` temp views;
    *  3. delete memoized artifact directories referenced from
    *     `spark.graft.*` conf values (only paths under java.io.tmpdir
    *     named `graft_*` — data-dir source markers are left untouched);
    *  4. unset every `spark.graft.*` conf key so the next call rebuilds.
    */
  def clear(s: SparkSession): Unit = {
    s.catalog.clearCache()
    Seq("graft_li_bkt", "graft_ord_bkt")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.names.foreach(n => s.catalog.dropTempView(s"graft_$n"))
    val graftKeys = s.conf.getAll.keys.filter(_.startsWith(Prefix)).toSeq
    graftKeys.foreach { k =>
      s.conf.getOption(k).foreach(deleteIfArtifactDir)
      s.conf.unset(k)
    }
  }

  /** Replace a memoized artifact-dir conf value, deleting the artifact
    * the old value pointed at first: a rebuild for a new data dir must
    * not orphan the previous corpus's directory beyond [[clear]]'s reach
    * (clear only sweeps dirs referenced from CURRENT conf values). */
  private[graft] def resetDir(s: SparkSession, dirKey: String, newDir: String): Unit = {
    s.conf.getOption(dirKey).foreach(deleteIfArtifactDir)
    s.conf.set(dirKey, newDir)
  }

  /** Best-effort recursive delete, gated to `graft_*` dirs under the JVM
    * temp dir so a mis-set conf value can never point the sweep at data. */
  private[graft] def deleteIfArtifactDir(v: String): Unit = {
    import java.nio.file.{Files, Paths, Path}
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir")).toAbsolutePath
    val p = try Paths.get(v).toAbsolutePath catch { case _: Exception => return }
    if (!p.startsWith(tmpRoot) || p == tmpRoot) return
    if (!p.getFileName.toString.startsWith(DirPrefix)) return
    if (!Files.isDirectory(p)) return
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    } catch { case _: Exception => () } // best-effort: leaks die with tmpdir
  }
}
