package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Marker-last LSM segment protocol shared by the persisted ANN index
  * tiers ([[IvfIndex]], [[Sq8Index]], [[PqIndex]]): a generation-
  * numbered BASE segment plus epoch-numbered DELTA segments, where
  * every piece of data becomes visible only through a marker file
  * written AFTER the data it commits — so readers never observe a
  * torn write, replayed streaming epochs are detected and skipped,
  * and compaction swaps in a rewritten base atomically.
  *
  * Layout under an index `path`:
  *  - `base/<gen>/`   — base segment data, one dir per generation;
  *  - `gens/<gen>_<upto>` — empty generation marker, written LAST:
  *    the CURRENT base is the max `<gen>`, and `<upto>` is the
  *    highest delta epoch folded into it (−1 for a fresh index).
  *    Markers are never rewritten, so "which base + which deltas"
  *    is resolved by ONE atomic-enough operation (a directory list)
  *    — no read-modify-write pointer file, no rename races;
  *  - `deltas/<epoch>/` — delta segment data;
  *  - `epochs/<epoch>`  — empty delta commit marker, written LAST.
  *    Markers OUTLIVE their (compacted) data segments on purpose:
  *    they are the replay guard for streaming ingest whose epoch ids
  *    are monotone per checkpoint lineage.
  *
  * Consistency: a reader resolves (gen, upto) once, then reads
  * `base/<gen>` plus committed deltas with epoch > upto. Compaction
  * writes `base/<gen+1>` FIRST and its `gens/` marker second — a
  * reader interleaved between the two steps still resolves gen and
  * double-counts nothing (the new base is invisible until the marker
  * lands). Superseded generations and folded delta data are retired
  * only by an explicit [[gc]], so lazily-evaluated DataFrames handed
  * out before a compact keep reading their own consistent snapshot.
  *
  * 100 TB shape: this is the metadata layer only — segment data
  * stays wherever the index writes it (c_id-partitioned parquet for
  * IVF, plain parquet codes for SQ8/PQ), markers are empty files, and
  * every operation here is O(#segments) driver-side metadata, never a
  * data scan.
  *
  * WRITER CONTRACT (single writer per index): READERS may be
  * arbitrarily concurrent with one writer — that is what marker-last
  * buys — but the protocol assumes at most ONE mutating party
  * ([[initBase]] / [[appendEpoch]] / [[compact]] / [[gc]]) per index
  * path at a time. A streaming ingest owns its index through its
  * checkpoint lineage; maintenance ([[compact]]+[[gc]]) either runs
  * inside that ingest loop or in a window when the ingest is stopped.
  * The marker files are the tripwire, not the lock: every marker is
  * created exclusively (create-if-absent), so if two writers DO race
  * — e.g. two streams with different checkpoint lineages pointed at
  * the same index — the loser fails loudly on the marker collision
  * instead of committing an interleaved mixed segment. */
private[graft] object LsmSegments {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listNames(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) Seq.empty else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Create a marker file EXCLUSIVELY: markers are never rewritten,
    * so an existing file at a marker path means a second writer is
    * racing this one (or a caller broke the single-writer contract) —
    * fail loudly rather than let the loser commit a mixed segment. */
  private def touch(spark: SparkSession, file: String): Unit = {
    val f = fs(spark, file)
    val p = new org.apache.hadoop.fs.Path(file)
    f.mkdirs(p.getParent)
    try f.create(p, false).close()
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"LsmSegments: marker $file could not be created exclusively — " +
            "a concurrent writer committed it first. The single-writer-" +
            "per-index contract is broken (two streams with different " +
            "checkpoint lineages pointed at one index?); this writer's " +
            "segment data is uncommitted and invisible.", e)
    }
  }

  /** Write one c_id-partitioned segment — the on-disk shape both
    * inverted-list tiers ([[IvfIndex]], [[IvfPqIndex]]) share, so the
    * empty-frame fallback lives ONCE here: a partitioned write of an
    * EMPTY frame lands no partition dirs and no data files —
    * unreadable (no schema to infer) — yet the caller still commits
    * the epoch/generation marker, permanently poisoning the store. An
    * empty segment is a real case (an empty streaming micro-batch, an
    * admission epoch where nothing survives, an empty store init for
    * the admission loop's semantic stage), so it is rewritten
    * unpartitioned: one metadata-only parquet file carrying the
    * schema, c_id as a plain (long) column. Both tiers' loadSegment
    * unions byName and casts c_id to long (a no-op on the plain
    * column), and the zero-row segment never affects pruning. The
    * check is one driver-side directory listing. */
  private[graft] def writeCidPartitionedSegment(df: DataFrame, p: String): Unit = {
    graft.sources.FileSources.writePartitionedParquet(
      df, p, partitionCols = Seq("c_id"))
    val dir = new org.apache.hadoop.fs.Path(p)
    val f = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val hasParts = f.exists(dir) &&
      f.listStatus(dir).exists(_.getPath.getName.startsWith("c_id="))
    if (!hasParts) df.write.mode("overwrite").parquet(p)
  }

  /** Committed delta epochs, ascending. */
  def committedEpochs(spark: SparkSession, path: String): Seq[Long] =
    listNames(spark, s"$path/epochs")
      .filter(_.forall(_.isDigit)).map(_.toLong).sorted

  /** The exact `<gen>_<upto>` marker-name parse shared by
    * [[genMarkers]] (reads) and [[gc]] (deletes) — one definition so
    * "invisible to readers" and "untouchable by gc" are the same set
    * of names by construction. */
  private def parseGenMarker(n: String): Option[(Long, Long)] =
    n.split('_') match {
      case Array(g, u) if g.forall(_.isDigit) =>
        scala.util.Try((g.toLong, u.toLong)).toOption
      case _ => None
    }

  /** All committed (generation, maxFoldedEpoch) markers. */
  private def genMarkers(spark: SparkSession, path: String): Seq[(Long, Long)] =
    listNames(spark, s"$path/gens").flatMap(parseGenMarker)

  /** The current (generation, maxFoldedEpoch). Fails loudly on an
    * uninitialized index — serving from a half-written index must
    * never silently return empty results. */
  def current(spark: SparkSession, path: String): (Long, Long) = {
    val gens = genMarkers(spark, path)
    require(gens.nonEmpty,
      s"LsmSegments: no committed base generation under $path/gens — " +
        "the index was never initialized (or its init was torn before " +
        "the generation marker)")
    gens.maxBy(_._1)
  }

  /** Commit a generation marker — the LAST step of init/compact; test
    * seam for the compaction-race spec. */
  private[graft] def writeGenMarker(
      spark: SparkSession, path: String, gen: Long, upto: Long): Unit =
    touch(spark, s"$path/gens/${gen}_$upto")

  /** Initialize the base: `write(base/0)` then the gen marker. Fails
    * BEFORE writing anything if the index already holds a committed
    * generation — re-initializing a live index is always a second
    * writer (or a caller bug), and failing here keeps its data intact
    * instead of clobbering base/0 and then losing the marker race. */
  def initBase(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val existing = listNames(spark, s"$path/gens")
    require(existing.isEmpty,
      s"LsmSegments: index at $path is already initialized (generation " +
        s"markers ${existing.sorted.mkString(", ")}) — refusing to re-init " +
        "over a live index. Changing an index's parameters or corpus means " +
        "a NEW index path.")
    write(s"$path/base/0")
    writeGenMarker(spark, path, 0L, -1L)
  }

  /** Idempotently append one delta epoch: `write(deltas/<epoch>)`
    * (overwrite — replays clobber torn attempts), then the commit
    * marker. Returns false if the epoch was already committed (the
    * replay case — nothing is written). */
  def appendEpoch(spark: SparkSession, path: String, epoch: Long)(
      write: String => Unit): Boolean = {
    val f = fs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/epochs/$epoch")
    if (f.exists(marker)) false
    else {
      write(s"$path/deltas/$epoch")
      touch(spark, s"$path/epochs/$epoch")
      true
    }
  }

  /** One consistent snapshot: the current base path plus the delta
    * paths of committed epochs newer than the base's fold point. A
    * committed-but-missing delta dir surfaces as a loud read failure
    * downstream ([[gc]] only ever deletes deltas ≤ upto). */
  def liveSegments(spark: SparkSession, path: String): (String, Seq[String]) = {
    val (gen, upto) = current(spark, path)
    val deltas = committedEpochs(spark, path).filter(_ > upto)
      .map(e => s"$path/deltas/$e")
    (s"$path/base/$gen", deltas)
  }

  /** TIME TRAVEL: the consistent snapshot AS OF delta epoch `epoch` —
    * the index exactly as a reader saw it right after that epoch's
    * commit. Resolution mirrors [[liveSegments]] over the RETAINED
    * marker set: the newest retained generation whose fold point is
    * ≤ `epoch`, plus the committed deltas in (foldPoint, epoch].
    * `epoch = -1` is the fresh-index snapshot (base generation only).
    *
    * The horizon is exactly what [[gc]]'s `retainGens` kept: every
    * retained generation's snapshot — and every as-of point BETWEEN
    * retained fold points — stays serveable, because gc retains all
    * delta data newer than the OLDEST retained generation's fold
    * point. An `epoch` older than that horizon fails LOUDLY (the
    * folded deltas are gone; silently serving the nearest newer
    * snapshot would misreport history). Asking for an epoch newer
    * than the last commit just serves the live snapshot — same as a
    * lakehouse `AS OF` with a future timestamp.
    *
    * 100 TB shape: identical to [[liveSegments]] — one driver-side
    * directory listing resolves (gen, deltas); no data is scanned
    * here, and the snapshot's segment reads prune exactly like the
    * live ones. */
  def segmentsAsOf(
      spark: SparkSession, path: String, epoch: Long): (String, Seq[String]) = {
    val gens = genMarkers(spark, path)
    require(gens.nonEmpty,
      s"LsmSegments: no committed base generation under $path/gens — " +
        "the index was never initialized (or its init was torn before " +
        "the generation marker)")
    val eligible = gens.filter(_._2 <= epoch)
    require(eligible.nonEmpty,
      s"LsmSegments: as-of epoch $epoch is older than the time-travel " +
        s"horizon — every retained generation of $path has folded past " +
        s"it (fold points: ${gens.map(_._2).sorted.mkString(", ")}). " +
        "Retain more history with gc(retainGens = n).")
    val (gen, upto) = eligible.maxBy(_._1)
    val deltas = committedEpochs(spark, path)
      .filter(e => e > upto && e <= epoch)
      .map(e => s"$path/deltas/$e")
    (s"$path/base/$gen", deltas)
  }

  /** Fold the [[segmentsAsOf]] snapshot through a tier's own segment
    * loader — the shared body of every tier's `readAsOf`. */
  private[graft] def foldAsOf(
      spark: SparkSession, path: String, epoch: Long,
      load: String => DataFrame): DataFrame = {
    val (basePath, deltaPaths) = segmentsAsOf(spark, path, epoch)
    deltaPaths.foldLeft(load(basePath))((acc, p) => acc.unionByName(load(p)))
  }

  /** Fold committed deltas into a NEW base generation: read the live
    * snapshot via `load`, `write` it to `base/<gen+1>`, then commit
    * the generation marker. The old generation and the folded delta
    * data remain on disk until [[gc]] — in-flight readers stay
    * consistent throughout. No-op when there is nothing to fold. */
  def compact(
      spark: SparkSession, path: String,
      load: Seq[String] => DataFrame,
      write: (DataFrame, String) => Unit): Unit = {
    val (gen, upto) = current(spark, path)
    val epochs = committedEpochs(spark, path).filter(_ > upto)
    if (epochs.nonEmpty) {
      val (basePath, deltaPaths) = liveSegments(spark, path)
      write(load(basePath +: deltaPaths), s"$path/base/${gen + 1}")
      writeGenMarker(spark, path, gen + 1, epochs.max)
    }
  }

  /** Retire everything the RETAINED generations supersede: older base
    * generations, fully-folded delta DATA (epoch ≤ the OLDEST retained
    * generation's fold point — the epoch markers stay forever as the
    * streaming replay guard), TORN delta directories (data written but
    * never committed by a marker — a crashed append whose epoch was
    * then never replayed; invisible to every reader by construction,
    * but leaked disk until reclaimed here), and superseded generation
    * markers.
    *
    * `retainGens = 0` (the default) keeps only the current generation
    * — call that form when no readers hold lazy plans over an older
    * snapshot. `retainGens = 1` keeps the previous generation (and
    * every committed delta its snapshot needs) alive too: the policy
    * an ONLINE maintenance loop uses, so any reader that resolved its
    * snapshot since the previous compaction keeps reading consistently
    * for one more full compaction cycle. Either way gc IS a writer
    * (the single-writer contract): an in-flight append's
    * not-yet-committed delta dir is indistinguishable from a torn one,
    * so gc runs between appends, never concurrent with one. */
  def gc(spark: SparkSession, path: String, retainGens: Int = 0): Unit = {
    val gens = genMarkers(spark, path).sortBy(-_._1)
    require(gens.nonEmpty,
      s"LsmSegments: no committed base generation under $path/gens — " +
        "nothing to gc on an uninitialized index")
    val kept = gens.take(retainGens + 1)
    val keptGens = kept.map(_._1).toSet
    // uptos are monotone in gen, so the oldest retained generation
    // bounds which folded deltas any retained snapshot still needs
    val minUpto = kept.map(_._2).min
    val f = fs(spark, path)
    listNames(spark, s"$path/base")
      .filter(n => n.forall(_.isDigit) && !keptGens.contains(n.toLong))
      .foreach(n => f.delete(new org.apache.hadoop.fs.Path(s"$path/base/$n"), true))
    val committed = committedEpochs(spark, path).toSet
    listNames(spark, s"$path/deltas")
      .filter(n => n.forall(_.isDigit) &&
        (n.toLong <= minUpto || !committed.contains(n.toLong)))
      .foreach(n => f.delete(new org.apache.hadoop.fs.Path(s"$path/deltas/$n"), true))
    // markers are deleted only when the FULL `<gen>_<upto>` name
    // parses (genMarkers' exact parse, reused) and the generation is
    // not retained; names genMarkers can't see (a stray _SUCCESS-style
    // file, `12_garbage`, a >Long digit run) are invisible to readers
    // and left alone here too — gc deletes only markers its own
    // writer could have produced, and never aborts mid-sweep on junk
    listNames(spark, s"$path/gens")
      .filter(n => parseGenMarker(n).exists { case (g, _) => !keptGens.contains(g) })
      .foreach(n => f.delete(new org.apache.hadoop.fs.Path(s"$path/gens/$n"), false))
  }
}
