package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Dsir, Html, TextOps}
import graft.sources.Warc

/** The end-to-end crawl→training-corpus DAG — the composition story the
  * individual §2 lenses exist for, wired as one facade a 100 TB user
  * calls once per crawl drop:
  *
  *   WARC blobs ── C68 split ──▶ (url, html)
  *              ── C60 HTML extract ──▶ clean text (boilerplate gone)
  *              ── C75 mojibake repair ──▶ encoding fixed (a
  *                   UTF-8→Latin-1 misdecode survives NFC untouched and
  *                   fingerprints apart from its clean twin, so repair
  *                   must run BEFORE normalize/dedup)
  *              ── C62 NFC normalize ──▶ canonical bytes
  *              ── C23 quality rules ──▶ keep/drop
  *              ── C80 decontaminate (opt-in registry) ──▶ benchmark-
  *                   contaminated docs out — BEFORE dedup and DSIR, the
  *                   two stages a surviving benchmark doc would poison
  *              ── C22+C41 dedup clusters + canonical keep ──▶ one doc
  *                   per near-dup cluster
  *              ── C65 DSIR vs a trusted target slice ──▶ the curated
  *                   corpus, importance-selected
  *
  * plus a per-stage FUNNEL report (stage, rows) — the telemetry a
  * curation run ships so a distribution shift at any stage is visible
  * (pair it with C67's drift monitor across drops).
  *
  * Ordering is load-bearing and matches production practice: normalize
  * BEFORE dedup (the same logical text must fingerprint together —
  * C62's reason to exist), dedup BEFORE DSIR (importance weights
  * estimated on a dup-heavy pool over-weight whatever is duplicated),
  * quality rules as early as clean text exists (everything downstream
  * is cheaper on fewer docs).
  *
  * Every stage is one of the oracle-checked operators applied verbatim
  * — this facade adds NO new semantics (PipelineSpec pins
  * stage-by-stage equality), so its correctness is inherited from the
  * per-stage DuckDB gates.
  */
object CurationPipeline {

  /** The curated corpus plus the funnel. `target` marks the trusted
    * docs (doc_id set) DSIR matches the pool against — the C65
    * target-slice contract with the facade owning the labeling.
    * `registry`: optional C80 eval-protection fingerprints (committed
    * or in-session) — when present, contaminated docs drop at stage 5,
    * BEFORE dedup canonical-keep and DSIR (a benchmark doc must not be
    * the survivor its near-dup cluster keeps, nor weight the selection
    * model). The stage row is always in the funnel (a pass-through
    * when no registry), so downstream stage names never shift.
    */
  def curate(warcBlobs: Dataset[Row], targetIds: Set[Long],
             registry: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val spark = warcBlobs.sparkSession

    // The funnel issues six count() actions; without persists each
    // would re-execute the WARC split, HTML extraction, normalization
    // and the gate joins (up to six full re-runs per curate() call —
    // not a 100 TB-shaped facade). Persist each stage boundary via the
    // session registry and release before returning: the counts reuse
    // each other, and the caller's one action on `curated` re-derives
    // the (now released) chain exactly once.
    graft.GraftCache.releaseCreatedDuring(spark) {
      val split = graft.GraftCache.persistTracked(Warc.splitWarc(warcBlobs))
      val extracted = Html.htmlExtract(split, col("html"))
        .select(col("doc_id"),
          // C75: same row count as extraction (a repair, not a filter),
          // so it shares the extract funnel stage
          graft.functions.Exprs.fixMojibake(col("clean_text")).as("clean_text"))
      val normalized = graft.GraftCache.persistTracked(
        Curation.textNormalize(extracted, col("clean_text"))
          .select(col("doc_id"), col("norm_text").as("text"))
          .withColumn("n_chars", length(col("text")).cast("long")))
      val qualityKept = graft.GraftCache.persistTracked(normalized.join(
        TextOps.qualityRules(normalized).filter(col("keep")).select("doc_id"), "doc_id"))
      val decon = registry match {
        case None => qualityKept
        case Some(reg) => graft.GraftCache.persistTracked(qualityKept.join(
          graft.operators.EvalRegistry.decontaminate(qualityKept, reg)
            .filter(col("keep")).select("doc_id"), "doc_id"))
      }
      val canonKept = graft.GraftCache.persistTracked(decon.join(
        Dedup.canonicalKeep(decon).filter(col("keep")).select("doc_id"), "doc_id"))
      val labeled = canonKept.withColumn("source",
        when(col("doc_id").isInCollection(targetIds), lit(Dsir.TargetSource))
          .otherwise(lit("pool")))
      val curated = labeled.join(
        Dsir.dsirWeights(labeled).filter(col("keep")).select("doc_id"), "doc_id")
        .select("doc_id", "text", "n_chars")

      // stage seconds ride the funnel (each count materializes its
      // stage on top of the already-persisted upstream, so the delta is
      // that stage's own cost — the complete telemetry a curation run
      // ships next to the row counts)
      def timed(rows: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = rows
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val stages = Seq(
        "1_warc_records" -> timed(split.count()),
        "2_html_extracted" -> timed(extracted.count()),
        "3_normalized" -> timed(normalized.count()),
        "4_quality_kept" -> timed(qualityKept.count()),
        "5_decontaminated" -> timed(decon.count()),
        "6_canonical_kept" -> timed(canonKept.count()),
        "7_dsir_selected" -> timed(curated.count()))
        .map { case (n, (rows, secs)) => (n, rows, secs) }
      val s = spark
      import s.implicits._
      (curated, stages.toDF("stage", "rows", "secs"))
    }
  }
}
