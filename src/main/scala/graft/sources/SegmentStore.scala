package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only SEGMENT store for the streaming ANN-index maintenance
  * paths (G28/G29/E32): each append lands as its OWN directory under
  * the family dir (`<dir>/seg_<nonce>`), committed by an ATOMIC RENAME
  * from a dot-hidden staging sibling — the ModelStore publish
  * discipline applied to segment fan-out.
  *
  * Why not `df.write.mode("append").parquet(dir)`: Spark's append mode
  * shares one `_temporary` staging dir across jobs, so two concurrent
  * writers can delete each other's in-flight task files at job commit
  * (a known multi-writer hazard), and a reader listing the directory
  * DURING a commit can see half a job's part files — a torn segment.
  * Segment-per-directory + rename closes both: writers never share a
  * staging dir, and a segment is visible to the `seg_*` glob iff its
  * rename (atomic on one filesystem; an object store's equivalent is
  * the manifest swap) already happened, so every read is a clean
  * snapshot of fully-committed segments. `Round18Spec` rehearses two
  * latch-interleaved writers plus a reader mid-append against exactly
  * these guarantees.
  *
  * Reference provenance: the reference (WebScrap_DataPipeline) has no
  * index store; the layout is the standard public LSM/object-store
  * segment pattern (immutable segment files + atomic manifest/rename
  * commit).
  */
object SegmentStore {

  /** Append one segment atomically. Safe under concurrent writers. */
  def append(df: DataFrame, dir: String): Unit = {
    val parent = Paths.get(dir)
    Files.createDirectories(parent)
    val nonce =
      s"${System.nanoTime()}_${java.util.UUID.randomUUID.toString.take(8)}"
    val tmp = parent.resolve(s".stage_$nonce")
    df.write.parquet(tmp.toString)
    commit(tmp, parent.resolve(s"seg_$nonce"))
  }

  /** Rename the staged dir into the glob namespace. */
  private def commit(tmp: Path, target: Path): Unit =
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // cross-device fallback (never on one /tmp filesystem; an
        // object store replaces this whole commit with a manifest
        // swap) — plain move is still a metadata op on one mount
        Files.move(tmp, target)
    }

  /** Snapshot read: every fully-committed segment, none in flight. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/seg_*")
}
