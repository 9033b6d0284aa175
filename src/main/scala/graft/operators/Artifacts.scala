package graft.operators

import org.apache.spark.sql.SparkSession

import graft.sources.Sinks.VersionedTable

/** The operational front door for committed-artifact upkeep: one sweep
  * over every versioned table under a root with shared cadence and
  * retention knobs.
  *
  * Every committed artifact in this library (DedupIndex, AnnIndex,
  * MediaIndex, EvalRegistry, tokenizer bundles, rollups, DSIR/LM/
  * temperature model tables) is ultimately one or more
  * [[graft.sources.Sinks.VersionedTable]]s, and each accretes the same
  * two kinds of debt under upsert traffic: bucket-file fragmentation
  * (the small-file storm every object store punishes) and superseded
  * manifest versions (kept for pinned readers, garbage afterwards).
  * Each artifact already exposes its own `maintain`; what a deployment
  * actually schedules is ONE job over the whole artifact root — this.
  *
  * [[maintainAll]] discovers every table under `root` (the walk stops
  * at a commits dir, so composite artifacts are maintained at their
  * sub-table granularity — exactly where compact/vacuum operate) and
  * runs compact + vacuum on each, returning one receipt row per table
  * (the TakedownLog discipline: an ops job leaves queryable evidence).
  * Both primitives are optimistic-commit transactions, so the sweep is
  * safe to run concurrently with live writers and readers; `minAgeMs`
  * keeps versions a pinned reader might still hold.
  *
  * Deliberately NOT here: monoid folds ([[RollupIndex.foldPartials]]
  * needs the artifact's RollupShape) and index-quality maintenance
  * (retrains, re-banding) — those stay with the owning loop's cadence.
  * This sweep is the artifact-agnostic storage layer only.
  */
object Artifacts {

  /** One table's maintenance receipt: versions on disk before/after
    * (vacuum's observable) and the latest version after the sweep
    * (compaction bumps it only when something was fragmented).
    */
  final case class MaintainReport(table: String, latestVersion: Long,
                                  versionsBefore: Long, versionsAfter: Long)

  /** Every committed table under `root` — see
    * [[graft.sources.Sinks.VersionedTable.discover]]. */
  def discover(spark: SparkSession, root: String): Seq[String] =
    VersionedTable.discover(spark, root)

  /** `minAgeMs` defaults to vacuumVersioned's own 1-hour guard — the
    * concurrency claim above DEPENDS on it (a cutoff of now would
    * reclaim a live writer's staged-but-unpublished dirs); pass 0 only
    * from tests / offline maintenance where no writer can be live.
    *
    * SNAPSHOT-AWARE vacuum (r11): sub-tables of a composite artifact
    * carry a root-snapshot pin ([[graft.sources.Sinks
    * .ArtifactSnapshot]]); the sweep protects each pinned version from
    * the `keep` budget, so a maintenance cadence can never force every
    * snapshot reader into the fall-forward path at once (compaction
    * bumps versions without new snapshots — without protection, enough
    * idle cadences would age every pin out).
    *
    * `protectGroups` (r12) extends that shield to NAMED snapshots: the
    * pins of the newest N root groups (not just the latest) survive the
    * keep budget, so a job pinned to a recent historical group
    * ([[graft.sources.Sinks.ArtifactSnapshot.readAt]]) keeps serving
    * byte-identically across maintenance sweeps for its whole lifetime.
    * Past the window, readAt refuses loudly (it never falls forward) —
    * that refusal is the contract's boundary, this knob its width.
    */
  /** `protectPipelines` (r13) is the same shield ONE level up — the
    * TWO-LEVEL pin propagation: the newest N PIPELINE snapshots
    * ([[graft.sources.Sinks.PipelineSnapshot]]) pin whole artifacts at
    * group versions; the sweep resolves each pinned group to its
    * sub-table manifest versions and shields those too (plus direct
    * `t:` table pins), so a reader resolving "the pipeline as of batch
    * B" inside the window survives any number of sweeps byte-
    * identically. Without it, a pipeline snapshot's advertised replay
    * horizon (publish keep = 64 batches) silently collapsed to the
    * per-artifact `protectGroups` window (~2 batches) after routine
    * maintenance (r12 ADVICE). The effective pipeline audit horizon is
    * min(publish `keep`, this window, the artifact's own group-manifest
    * keep) — past it, pipeline-named reads refuse loudly.
    */
  /** `rollups` (r13): opt-in per-rollup fold hook — [[RollupIndex
    * .foldPartials]] needs the artifact's RollupShape, so the
    * shape-agnostic sweep can't discover it; a deployment passes
    * (rollup root -> shape) and the sweep folds each BEFORE the
    * storage pass (so compaction immediately reclaims the rewrite),
    * filing one [[TakedownReceipt]] per fold into `receiptLog` when
    * given (jobId-guarded: a replayed sweep never double-files).
    */
  def maintainAll(spark: SparkSession, root: String,
                  maxFilesPerBucket: Int = 1, keepVersions: Int = 8,
                  minAgeMs: Long = 3600000L,
                  protectGroups: Int = 2,
                  protectPipelines: Int = 8,
                  rollups: Map[String, RollupIndex.RollupShape] = Map.empty,
                  receiptLog: Option[String] = None,
                  jobId: String = "", asOfUs: Long = 0L): Seq[MaintainReport] = {
    import graft.sources.Sinks.PipelineSnapshot
    val foldReceipts = rollups.toSeq.sortBy(_._1).map { case (r, shape) =>
      RollupIndex.foldPartialsReceipted(spark, r, shape)
    }
    receiptLog.foreach { log =>
      require(jobId.nonEmpty,
        "Artifacts.maintainAll: receiptLog needs a jobId (the replay guard)")
      if (foldReceipts.nonEmpty)
        TakedownLog.append(spark, log, foldReceipts, asOfUs, jobId)
    }
    val (pipeRoots, artRoots) = VersionedTable.discoverGroupRoots(spark, root)
      .partition(PipelineSnapshot.isPipelineRoot(spark, _))
    val artPins: Seq[(String, Set[Long])] =
      artRoots.flatMap { r =>
        graft.sources.Sinks.ArtifactSnapshot
          .pinsRecent(spark, r, math.max(protectGroups, 1))
          .map { case (sub, vs) => s"$r/$sub" -> vs }
      }
    val pipePins: Seq[(String, Set[Long])] =
      pipeRoots.flatMap(pr => PipelineSnapshot
        .protectedTablePins(spark, pr, math.max(protectPipelines, 0)).toSeq)
    val pins: Map[String, Set[Long]] =
      (artPins ++ pipePins).groupMapReduce(_._1)(_._2)(_ ++ _)
    discover(spark, root).map { t =>
      val before = VersionedTable.versionCount(spark, t)
      VersionedTable.compact(spark, t, maxFilesPerBucket)
      VersionedTable.vacuumVersioned(spark, t, keep = keepVersions,
        minAgeMs = minAgeMs,
        protect = pins.getOrElse(t, Set.empty))
      val v = VersionedTable.latestManifest(spark, t).map(_._1).getOrElse(-1L)
      MaintainReport(t, v, before, VersionedTable.versionCount(spark, t))
    }
  }

  /** One composite artifact's snapshot-health receipt: the latest group
    * version, how many sub-tables it pins, and the pins whose manifest
    * no longer exists (readers fall forward to latest for those — the
    * observable the candidate vacuum protection keeps at zero).
    */
  final case class SnapshotReport(root: String, groupVersion: Long,
                                  pinned: Int, fallenForward: Seq[String])

  /** Root-snapshot health under `root` — run it on the maintenance
    * cadence next to [[maintainAll]] so a crashed mutator's stale pin
    * or a pruned pinned version is an observable, not a silent
    * fall-forward at serve time.
    *
    * PIPELINE-level roots ([[graft.sources.Sinks.PipelineSnapshot]])
    * are surfaced through the same sweep (r12): their pins name whole
    * ARTIFACTS (`g:<path>` group pins / `t:<path>` table pins), so an
    * unresolvable entry means pipeline retention outran an artifact's
    * protectGroups window and named pipeline reads will refuse.
    */
  /** `pipelineWindow`: for pipeline roots, how many recent snapshots to
    * health-check (match [[maintainAll]]'s `protectPipelines` so the
    * report covers exactly the window the sweep promises to keep
    * servable). Fallen entries are tagged `v<snapshot>:<kind>:<path>`.
    */
  def snapshotHealth(spark: SparkSession, root: String,
                     pipelineWindow: Int = 8): Seq[SnapshotReport] =
    VersionedTable.discoverGroupRoots(spark, root).map { r =>
      val (gv, parts) = VersionedTable.latestGroup(spark, r).get
      val isPipeline =
        graft.sources.Sinks.PipelineSnapshot.isPipelineRoot(spark, r)
      val fallen =
        if (isPipeline)
          graft.sources.Sinks.PipelineSnapshot
            .health(spark, r, window = pipelineWindow)
            .collect { case p if !p.resolvable =>
              val kind = if (p.served) "s:" else if (p.grouped) "g:" else "t:"
              s"v${p.snapshot}:$kind${p.path}" }
        else parts.toSeq.sortBy(_._1).collect {
          case (sub, v) if !VersionedTable.manifestExists(spark, s"$r/$sub", v) => sub
        }
      // pipeline roots: count the latest snapshot's g:/t: pins (served
      // pins are replay metadata for the same artifacts, batch markers
      // are identity)
      val pinCount =
        if (isPipeline) parts.keys.count(k => k.startsWith("g:") || k.startsWith("t:"))
        else parts.size
      SnapshotReport(r, gv, pinCount, fallen)
    }
}
