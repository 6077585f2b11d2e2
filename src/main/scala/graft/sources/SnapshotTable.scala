package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-isolated warehouse TABLE — H18's manifest/time-travel/
  * vacuum contract applied to the A13 parquet sink (the table-format
  * half of the lakehouse story; IndexStore covers the index half).
  * Copy-on-write at hash-bucket granularity, the Iceberg/Delta CoW
  * shape:
  *
  *   - data files are immutable parquet directories, one per (commit,
  *     bucket); a row lives in bucket pmod(hash(key), buckets)
  *   - a snapshot is a manifest mapping bucket → data dir; every
  *     commit writes an immutable `MANIFEST.v<k>` plus the current
  *     pointer, both by atomic rename (a reader never sees a half
  *     list; a crashed commit leaves at worst an orphan dir invisible
  *     to every manifest)
  *   - MERGE (the A20b upsert) rewrites ONLY the buckets its keys
  *     touch; untouched buckets' files are SHARED between snapshots
  *     by reference — the pre-merge view stays readable at O(0) extra
  *     storage for the untouched fraction
  *   - COMPACT rewrites the live layout into one fresh commit;
  *     result-neutral by construction (spec-pinned), retained older
  *     snapshots keep reading the pre-compaction files
  *   - VACUUM (inside every commit) deletes data dirs referenced by
  *     NO retained snapshot — reference counting at bucket-dir
  *     granularity, so a dir shared by five snapshots survives until
  *     the last one expires
  *
  * At 100 TB this is exactly a table format's metadata discipline:
  * commits are O(touched data) not O(table), readers are isolated
  * from concurrent rewrites by snapshot pinning, and storage is
  * bounded by the retention window. `WarehouseSpec` pins read
  * isolation across MERGE + compaction, file sharing, vacuum
  * exactness, and retention expiry. */
final class SnapshotTable(
    spark: SparkSession,
    val path: String,
    keyCol: String,
    buckets: Int = 4,
    keepSnapshots: Int = 3) {

  require(keepSnapshots >= 1, "must retain at least the current snapshot")

  /** Live column set, cached per instance and VALIDATED against the
    * snapshot version it was computed at: merges are widening-ONLY
    * (H23), so within one writer the set grows monotonically — seed
    * it from `create`'s batch (or ONE footer read) and union in each
    * commit's batch columns. This keeps `requireWidening` off the
    * per-commit hot path: the r14 guard priced a parquet-footer
    * Spark job on EVERY merge/stagedMerge, which showed up as the
    * streaming IVM twins' +20% (a WAP commit per micro-batch → a
    * footer job per batch). The version tag closes the
    * MULTI-INSTANCE hole a bare cache would open (r15 review): a
    * widening committed through a DIFFERENT handle bumps the table
    * version, so this handle's next guard sees the mismatch and
    * re-seeds from the newest footer instead of serving a stale
    * (narrower) live set — which would have let a malformed batch
    * slip past the H23 guard and null-fill the other writer's
    * column. The version check is a driver-side directory listing
    * (no Spark job), so the single-writer fast path stays free. */
  @volatile private var liveColsCache: Option[(Int, Set[String])] = None

  private def manifest: Path = Paths.get(path, "MANIFEST")

  private def listNames(dir: Path): Seq[String] =
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }

  /** Retained snapshot versions, oldest first. */
  def snapshots: Seq[Int] =
    listNames(Paths.get(path)).flatMap(n =>
      "^MANIFEST\\.v(\\d+)$".r.findFirstMatchIn(n).map(_.group(1).toInt))
      .sorted

  /** Current snapshot version (0 = not created). */
  def version: Int = snapshots.lastOption.getOrElse(0)

  private def readRefs(p: Path): Map[Int, String] =
    Files.readAllLines(p).asScala.filter(_.nonEmpty).map { line =>
      val Array(b, dir) = line.split(" ", 2)
      b.toInt -> dir
    }.toMap

  /** bucket → data-dir refs of the CURRENT snapshot (spec hook). */
  def refs: Map[Int, String] =
    if (!Files.exists(manifest)) Map.empty else readRefs(manifest)

  /** bucket → data-dir refs as of a retained snapshot. */
  def refsAsOf(v: Int): Map[Int, String] = {
    val p = Paths.get(path, s"MANIFEST.v$v")
    require(Files.exists(p),
      s"snapshot v$v of $path is not retained (have: $snapshots)")
    readRefs(p)
  }

  /** Data dirs on disk, relative to `path` (spec hook for vacuum). */
  def dataDirsOnDisk: Set[String] = {
    val dataRoot = Paths.get(path, "data")
    listNames(dataRoot).flatMap { commit =>
      listNames(dataRoot.resolve(commit)).filter(_.startsWith("__b="))
        .map(b => s"data/$commit/$b")
    }.toSet
  }

  private def bucketed(df: DataFrame): DataFrame =
    df.withColumn("__b", pmod(hash(col(keyCol)), lit(buckets)))

  /** Write `df`'s per-bucket dirs under `rel` (relative to the table
    * root); returns the refs produced (only non-empty buckets get a
    * dir). */
  private def writeDataAt(df: DataFrame, rel: String): Map[Int, String] = {
    val dir = s"$path/$rel"
    bucketed(df).write.partitionBy("__b").mode("errorifexists").parquet(dir)
    (0 until buckets).flatMap { b =>
      val d = s"$rel/__b=$b"
      if (Files.exists(Paths.get(path, d))) Some(b -> d) else None
    }.toMap
  }

  /** Write `df` as commit `c`'s per-bucket dirs. */
  private def writeData(df: DataFrame, c: Int): Map[Int, String] =
    writeDataAt(df, s"data/c$c")

  /** Returns the version number this commit produced — callers that
    * tag caches with the commit's version MUST use the returned value
    * rather than re-reading [[version]] after the fact: another
    * handle's commit can land in between, and tagging a narrower
    * column set with the NEWER version would let the next widening
    * guard serve it without re-seeding (r15 advisor). Residual (also
    * flagged, not closed here): a table dropped and recreated at the
    * same path restarts version numbering, so a live handle from the
    * old incarnation whose cached version collides with the new
    * table's current version would serve the old live set — dropping
    * a table out from under live handles is outside the protocol. */
  private def commitManifest(newRefs: Map[Int, String]): Int = {
    val v = version + 1
    val body = newRefs.toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b $d" }.mkString("", "\n", "\n")
    // 1. the immutable snapshot, atomically placed
    val tmpV = Paths.get(path, s"MANIFEST.tmp_v${System.nanoTime()}")
    Files.writeString(tmpV, body)
    Files.move(tmpV, Paths.get(path, s"MANIFEST.v$v"),
      StandardCopyOption.ATOMIC_MOVE)
    // 2. the current pointer
    val tmp = Paths.get(path, s"MANIFEST.tmp${System.nanoTime()}")
    Files.writeString(tmp, body)
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // 3. expire snapshots beyond retention...
    snapshots.dropRight(keepSnapshots)
      .foreach(old => Files.delete(Paths.get(path, s"MANIFEST.v$old")))
    // 4. ...then vacuum data dirs no retained snapshot references
    val live: Set[String] =
      snapshots.flatMap(refsAsOf(_).values).toSet ++ refs.values
    dataDirsOnDisk.filterNot(live.contains).foreach { d =>
      deleteRecursively(Paths.get(path, d))
      // drop the commit dir once its last bucket is gone
      val parent = Paths.get(path, d).getParent
      if (listNames(parent).forall(n => !n.startsWith("__b=")))
        deleteRecursively(parent)
    }
    v
  }

  /** Create the table (errors if it exists). */
  def create(df: DataFrame): Unit = {
    require(version == 0, s"snapshot table $path already exists")
    Files.createDirectories(Paths.get(path))
    val committed = commitManifest(writeData(df, 1))
    liveColsCache = Some((committed, df.columns.toSet))
  }

  /** MERGE (A20b upsert): rows in `updates` replace current rows with
    * the same key; new keys insert. Copy-on-write at bucket
    * granularity — only buckets containing an update key are
    * rewritten; every other bucket's file is carried into the new
    * snapshot BY REFERENCE. O(touched buckets' data + batch), never
    * O(table). */
  def merge(updates: DataFrame): Unit = merge(updates, None)

  /** MERGE with a delete set (the `WHEN MATCHED DELETE` arm): rows in
    * `updates` upsert by key; keys in `deletes` (a one-column relation
    * of `keyCol` values) are REMOVED from the table — the operation an
    * IVM maintenance commit needs when a maintained group's count
    * reaches 0. A key in both sets lands as the update. Still
    * copy-on-write at bucket granularity: only buckets containing an
    * update OR delete key rewrite; a bucket whose rows all vanish gets
    * no data dir and drops out of the new manifest. */
  def merge(updates: DataFrame, deletes: Option[DataFrame]): Unit = {
    val cur = refs
    require(cur.nonEmpty, s"snapshot table $path not created")
    requireWidening(cur, updates)
    val (touched, upserted) = upsertPlan(cur, updates, deletes)
    val c = version + 1
    val newRefs = writeData(upserted, c)
    val committed = commitManifest(cur -- touched ++ newRefs)
    noteCommitted(committed, updates.columns)
  }

  /** H23 is ONE-directional: a merge batch may WIDEN the schema (new
    * columns null-fill carried rows) but must never narrow it — the
    * `allowMissingColumns` union below would otherwise silently
    * null-fill a LIVE column on every upserted key when a malformed
    * caller ships a batch missing it, destroying data the caller
    * never meant to touch. Fail fast instead (spec-pinned). Schema
    * check only, served from the instance cache — at most ONE live
    * footer read per instance lifetime (see [[liveColsCache]]). */
  private def requireWidening(cur: Map[Int, String],
      updates: DataFrame): Unit = {
    val v = version
    val live = liveColsCache match {
      case Some((cv, cols)) if cv == v => cols
      case _ =>
        // first guard on a pre-existing table, or the table version
        // moved under us (a commit through another handle): the
        // widening-only invariant makes the MOST RECENT commit's dir
        // carry the widest live schema, so one dir's footer suffices
        // to (re-)seed the cache
        val cRe = "data/c(\\d+)/".r
        val newest = cur.values.maxBy(d =>
          cRe.findFirstMatchIn(d).map(_.group(1).toInt).getOrElse(-1))
        val cols = spark.read.parquet(s"$path/$newest").columns.toSet
        liveColsCache = Some((v, cols))
        cols
    }
    // compare under Spark's resolution semantics (case-insensitive
    // unless spark.sql.caseSensitive): a batch carrying `ID` against
    // a live `id` resolves fine in the union, so the guard must not
    // reject it as missing
    val batch = updates.columns.map(norm).toSet
    val missing = live.filterNot(c => batch.contains(norm(c)))
    require(missing.isEmpty,
      s"snapshot table $path: update batch is missing live column(s) " +
        s"${missing.mkString(", ")} — merges are widening-only (H23); " +
        "a narrower batch would null-fill those columns on every " +
        "upserted key")
  }

  private def norm(c: String): String =
    if (spark.conf.get("spark.sql.caseSensitive", "false").toBoolean) c
    else c.toLowerCase(java.util.Locale.ROOT)

  /** Fold a committed batch's columns into the live-set cache — the
    * monotone update that keeps the cache exact without any footer
    * read (a widening-checked batch's columns ⊇ the prior live set,
    * so post-commit live = batch ∪ prior spellings), tagged with the
    * version OUR commit just produced so the next guard's version
    * check passes on the single-writer fast path. `committedV` is the
    * version [[commitManifest]] RETURNED for this handle's own commit
    * — never a re-read of [[version]], which another handle's
    * interleaved widening commit could have bumped past ours, mis-
    * tagging this (narrower) column set as current (r15 advisor). */
  private def noteCommitted(committedV: Int, batchCols: Seq[String]): Unit = {
    val live = liveColsCache.map(_._2).getOrElse(Set.empty[String])
    val have = live.map(norm)
    liveColsCache = Some((committedV,
      live ++ batchCols.filterNot(c => have.contains(norm(c)))))
  }

  /** The MERGE read plan against a given snapshot: the touched-bucket
    * set (metadata-sized, ≤ `buckets` ints, derived from the update +
    * delete batch alone — the standing table is not scanned for it)
    * and the upserted relation over ONLY the touched buckets' standing
    * data. */
  private def upsertPlan(cur: Map[Int, String], updates: DataFrame,
      deletes: Option[DataFrame],
      batchKeysHint: Option[DataFrame] = None): (Set[Int], DataFrame) = {
    // no `.distinct()` anywhere in this derivation (r19 optimization):
    // the two consumers are duplicate-insensitive — the left-anti join
    // below only tests existence, and the touched-bucket collect
    // dedupes driver-side via toSet — so the old distincts bought
    // nothing but a shuffle inside the metadata job and another inside
    // the staged write
    val batchKeys = (batchKeysHint, deletes) match {
      // a caller that already holds the batch's key relation
      // (checkpointed, covering updates ∪ deletes — the IVM commit's
      // `keys`) passes it through and the plan below never re-derives
      // it from the two consumer relations
      case (Some(k), _) => k.select(col(keyCol))
      case (None, Some(d)) => updates.select(col(keyCol))
        .unionByName(d.select(col(keyCol)))
      case (None, None) => updates.select(col(keyCol))
    }
    val touched = bucketed(batchKeys).select(col("__b"))
      .collect().map(_.getInt(0)).toSet
    val standing = touched.toSeq.sorted.flatMap(cur.get) match {
      case Nil => None
      case dirs => Some(spark.read.parquet(
        dirs.map(d => s"$path/$d"): _*))
    }
    val upserted = standing match {
      case Some(s) =>
        // allowMissingColumns = schema evolution (H23): an update
        // batch may carry NEW columns — carried standing rows null-
        // fill them, and untouched buckets' files stay as-is (the
        // merged-schema read reconciles, the A30 discipline applied
        // to the table format)
        updates.unionByName(
          s.join(batchKeys, Seq(keyCol), "left_anti"),
          allowMissingColumns = true)
      case None => updates
    }
    (touched, upserted)
  }

  /** Stage a MERGE without publishing it — the write-audit-publish
    * (WAP) gate: the rewritten buckets land under `staged/` (outside
    * `data/`, so invisible to readers AND to vacuum), the table's
    * current snapshot is untouched, and the caller audits the
    * would-be table via [[StagedMerge.read]] before deciding. PUBLISH
    * atomically moves the staged dirs into the data area and commits
    * a new manifest — but only if no other commit landed since the
    * stage (first-committer-wins optimistic concurrency, the
    * Iceberg/Delta commit-conflict rule); ABORT deletes exactly the
    * staged dirs and nothing else. Either way the staged handle is
    * single-use.
    *
    * At 100 TB this is how a pipeline runs data-quality checks on the
    * full post-merge view without ever exposing a bad batch: the
    * expensive bucket rewrite happens ONCE (at stage time), audit
    * reads it in place, and publish is a metadata-only rename +
    * manifest commit. */
  def stageMerge(updates: DataFrame): StagedMerge = stageMerge(updates, None)

  /** [[stageMerge]] with a delete set — see [[merge(updates,deletes)]]
    * for the delete semantics. The WAP arm an IVM maintenance commit
    * uses: stage the post-maintenance buckets, audit the would-be
    * table, publish or abort. */
  def stageMerge(updates: DataFrame,
      deletes: Option[DataFrame]): StagedMerge =
    stageMerge(updates, deletes, None)

  /** [[stageMerge]] with a precomputed batch-key relation: `batchKeys`
    * must contain `keyCol` and cover EXACTLY the keys of
    * updates ∪ deletes (duplicates fine — both consumers are
    * duplicate-insensitive). An IVM commit already holds this relation
    * checkpointed, so passing it spares the stage the join subtree
    * that re-derives it from `updates` and `deletes` (r19
    * optimization). */
  def stageMerge(updates: DataFrame, deletes: Option[DataFrame],
      batchKeysHint: Option[DataFrame]): StagedMerge = {
    val cur = refs
    require(cur.nonEmpty, s"snapshot table $path not created")
    requireWidening(cur, updates)
    val base = version
    val (touched, upserted) = upsertPlan(cur, updates, deletes,
      batchKeysHint)
    val rel = s"staged/s${System.nanoTime()}"
    val stagedRefs = writeDataAt(upserted, rel)
    new StagedMerge(base, cur, touched, rel, stagedRefs, updates.columns)
  }

  /** A staged, unpublished MERGE — see [[stageMerge]]. */
  final class StagedMerge private[SnapshotTable] (
      baseVersion: Int,
      baseRefs: Map[Int, String],
      touched: Set[Int],
      stagedRel: String,
      stagedRefs: Map[Int, String],
      batchCols: Seq[String]) {

    private var consumed = false
    private def requireLive(): Unit =
      require(!consumed, "staged merge already published or aborted")

    /** The would-be table (base snapshot with touched buckets served
      * from the staged dirs) — the audit surface. */
    def read(): DataFrame = {
      requireLive()
      readRefsDf(baseRefs -- touched ++ stagedRefs)
    }

    /** Atomically promote the staged write to the current snapshot.
      * Fails (leaving the staged data intact for a re-stage decision)
      * if any commit landed after the stage — the audited view would
      * silently drop that commit's buckets otherwise. */
    def publish(): Unit = {
      requireLive()
      require(version == baseVersion,
        s"concurrent commit detected (staged at v$baseVersion, table " +
          s"now v$version): abort and re-stage against the new snapshot")
      val c = baseVersion + 1
      val target = Paths.get(path, s"data/c$c")
      require(!Files.exists(target), s"commit dir c$c already exists")
      Files.createDirectories(target.getParent)
      Files.move(Paths.get(path, stagedRel), target,
        StandardCopyOption.ATOMIC_MOVE)
      val moved = stagedRefs.map { case (b, d) =>
        b -> d.replaceFirst(java.util.regex.Pattern.quote(stagedRel),
          s"data/c$c")
      }
      val committed = commitManifest(baseRefs -- touched ++ moved)
      noteCommitted(committed, batchCols)
      consumed = true
    }

    /** Discard the staged write: deletes exactly the staged dirs. */
    def abort(): Unit = {
      requireLive()
      deleteRecursively(Paths.get(path, stagedRel))
      consumed = true
    }
  }

  /** Rewrite the live layout into one fresh commit — result-neutral
    * (the data is byte-identical relationally); retained snapshots
    * keep reading the pre-compaction files until they expire. */
  def compact(): Unit = {
    val cur = refs
    require(cur.nonEmpty, s"snapshot table $path not created")
    // the merged-schema read (readRefsDf), NOT a plain parquet read:
    // after a widening merge (H23) the live refs mix pre- and
    // post-widening files, and a plain read would infer the narrow
    // schema from an arbitrary footer and silently DROP the widened
    // column's values in the rewrite (caught by WarehouseSpec's
    // post-compaction pin)
    commitManifest(writeData(readRefsDf(cur), version + 1))
  }

  /** The current table. */
  def read(): DataFrame = readRefsDf(refs)

  /** Time travel: the table as of a RETAINED snapshot — bit-stable
    * under any later merge/compaction while retained (spec-pinned);
    * raises once the snapshot has expired. */
  def readAsOf(v: Int): DataFrame = readRefsDf(refsAsOf(v))

  private def readRefsDf(r: Map[Int, String]): DataFrame = {
    require(r.nonEmpty, s"snapshot table $path has no data")
    // mergeSchema: a snapshot may reference data dirs written before
    // AND after a schema-widening merge (H23) — the read reconciles
    // by name, null-filling the new columns for pre-widening files;
    // a snapshot written entirely before the widening keeps its old
    // schema (its refs never include widened files)
    spark.read.option("mergeSchema", "true")
      .parquet(r.values.toSeq.map(d => s"$path/$d"): _*)
  }

  /** Drop everything (test cleanup). */
  def drop(): Unit = deleteRecursively(Paths.get(path))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
}
