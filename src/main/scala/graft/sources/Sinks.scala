package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-side patterns for the 100 TB pipeline (SURVEY.md §2: sources &
  * sinks). The reference's sink is row-at-a-time psycopg2 INSERTs
  * (instagram_scraper.py:203, interest_analyzer.py:262); at scale the
  * equivalents are:
  *
  *  - date-partitioned parquet (partition pruning on read: a day's
  *    reprocess touches a day's files);
  *  - bucketed tables on the join key (co-located joins: downstream
  *    joins on the bucket key need NO shuffle — proven by SinksSpec
  *    asserting the absence of a shuffle exchange in the join plan);
  *  - compacted output (`coalesce` to target file counts — small-file
  *    storms kill object stores).
  */
object Sinks {

  /** Date-partitioned parquet sink: `path/day=YYYY-MM-DD/part-*.parquet`.
    * `repartition(col)` routes each day to one shuffle partition → one
    * file per day without serializing the write into a single task
    * (never `coalesce(1)` a partitioned write — it collapses the whole
    * job to one core).
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .repartition(col("day"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Bucketed + sorted managed table: joins/aggregations on `key` read
    * co-located buckets and skip the shuffle entirely.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a partitioned sink back; predicate on `day` prunes partitions. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Latest-wins merge of base ∪ delta on `keys`, newest `versionCol`
    * first; on a version tie the delta row wins (the reference's
    * `ON CONFLICT DO UPDATE` takes the incoming row,
    * instagram_scraper.py:194-207).
    */
  private def latestWins(base: DataFrame, delta: DataFrame,
                         keys: Seq[String], versionCol: String): DataFrame = {
    val all = base.withColumn("__src", lit(1))
      .unionByName(delta.withColumn("__src", lit(0)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src"))
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** MERGE-style sink: the reference's `INSERT … ON CONFLICT DO UPDATE`
    * (instagram_scraper.py:194-207) as a read-modify-write over a parquet
    * path. Reads the base (if any), keeps the newest row per key
    * (delta wins version ties), writes to a staging dir and swaps it in
    * with a filesystem rename — Spark cannot overwrite a path that feeds
    * the running plan. Single-writer batch semantics, like the
    * reference's one scraper process. For large partitioned tables use
    * [[mergeUpsertBucketed]], which rewrites only affected buckets.
    */
  def mergeUpsert(spark: SparkSession, path: String, delta: DataFrame,
                  keys: Seq[String], versionCol: String): Unit = {
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery FIRST: a prior run that died between the two swap
    // renames leaves the only full copy parked at __prev with no target.
    // Restore it before merging — otherwise this run would treat the
    // delta as the whole table and the cleanup below would delete the
    // parked copy, silently dropping every non-delta row.
    val prev = new Path(path + "__prev")
    if (fs.exists(prev) && !fs.exists(target) && !fs.rename(prev, target))
      throw new java.io.IOException(
        s"mergeUpsert: crash-recovery rename $prev -> $target failed; restore it manually")
    val merged =
      if (fs.exists(target))
        latestWins(spark.read.parquet(path), delta, keys, versionCol)
      else
        latestWins(delta.limit(0), delta, keys, versionCol) // dedupe delta itself
    val staging = new Path(path + "__staging")
    fs.delete(staging, true)
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // Crash-RECOVERABLE swap (not atomic): park the current table at
    // __prev, then move staging in. Concurrent readers do see a brief
    // no-target window between the two renames; a crash inside that
    // window leaves the data parked at __prev, which the recovery block
    // at the top of this method restores on the next run.
    fs.delete(prev, true)
    if (fs.exists(target) && !fs.rename(target, prev))
      throw new java.io.IOException(s"mergeUpsert: rename $target -> $prev failed")
    if (!fs.rename(staging, target)) {
      if (fs.exists(prev)) fs.rename(prev, target) // restore the old table
      throw new java.io.IOException(s"mergeUpsert: rename $staging -> $target failed")
    }
    fs.delete(prev, true)
  }

  /** Partition-scoped MERGE for big tables: rows live in
    * `bucket=<pmod(hash(keys), numBuckets)>` directories — a partition
    * key that is a pure function of the merge key, so an upserted row
    * can never leave stale copies in another partition. Only buckets
    * that the delta touches are read (partition-pruned scan), merged,
    * staged, and swapped in; untouched buckets are never rewritten. At
    * 100 TB this turns a full-table rewrite into
    * |delta buckets|/numBuckets of one.
    *
    * Failure contract: the per-bucket swap parks the old bucket under
    * `__prev` and restores it if the staging rename fails, so every
    * bucket is always readable — but the swap is atomic per BUCKET, not
    * per merge: a crash mid-loop leaves earlier touched buckets on the
    * new version and later ones on the old. The merge is idempotent
    * (latest-wins on the version column), so the recovery is simply to
    * re-run it: the re-run first restores any bucket a dying swap left
    * parked under `__prev`, so no committed row is ever lost.
    */
  def mergeUpsertBucketed(spark: SparkSession, path: String, delta: DataFrame,
                          keys: Seq[String], versionCol: String,
                          numBuckets: Int = 64): Unit = {
    val bucket = pmod(hash(keys.map(col): _*), lit(numBuckets))
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery FIRST: restore any bucket whose prior swap died
    // between park and staging-rename (parked copy exists, target bucket
    // missing). A parked bucket whose target EXISTS means that bucket's
    // swap completed — the parked copy is stale and safe to drop with
    // the rest of prevRoot.
    val prevRoot = new Path(path + "__prev")
    if (fs.exists(prevRoot)) {
      fs.listStatus(prevRoot).foreach { st =>
        val dst = new Path(target, st.getPath.getName)
        if (!fs.exists(dst) && !fs.rename(st.getPath, dst))
          throw new java.io.IOException(
            s"mergeUpsertBucketed: crash-recovery rename ${st.getPath} -> $dst failed; restore it manually")
      }
      fs.delete(prevRoot, true)
    }
    val deltaB = delta.withColumn("bucket", bucket)
    if (!fs.exists(target)) {
      latestWins(deltaB.limit(0), deltaB, keys, versionCol)
        .repartition(col("bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
      return
    }
    // affected-bucket ids: bounded by numBuckets — partition metadata,
    // not data, so the driver-side collect is constant-size.
    val touched = deltaB.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val baseSlice = spark.read.parquet(path)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
    val merged = latestWins(baseSlice, deltaB, keys, versionCol)
    val staging = new Path(path + "__staging")
    fs.delete(staging, true)
    merged.repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging.toString)
    // Same crash-recoverable swap as mergeUpsert, per bucket: the
    // current bucket dir is parked under __prev (outside the table root,
    // so partition discovery never sees it) before staging moves in; if
    // the staging rename fails, the parked dir is restored in-line, and
    // a crash between the renames is healed by the recovery block above
    // on the next run.
    fs.delete(prevRoot, true)
    fs.mkdirs(prevRoot)
    touched.foreach { b =>
      val src = new Path(staging, s"bucket=$b")
      val dst = new Path(target, s"bucket=$b")
      val parked = new Path(prevRoot, s"bucket=$b")
      if (fs.exists(dst) && !fs.rename(dst, parked))
        throw new java.io.IOException(s"mergeUpsertBucketed: rename $dst -> $prevRoot failed")
      if (fs.exists(src) && !fs.rename(src, dst)) {
        if (fs.exists(parked)) fs.rename(parked, dst) // restore the old bucket
        throw new java.io.IOException(s"mergeUpsertBucketed: rename $src -> $dst failed")
      }
    }
    fs.delete(staging, true)
    fs.delete(prevRoot, true)
  }

  // ---------------- z-order layout (multi-dimensional data skipping) ----------------

  /** Morton/z-order interleave of two non-negative 16-bit-clamped
    * dimensions as a Spark SQL expression string — pure integer
    * shifts/masks inside one `aggregate` lambda, so it stays in
    * whole-stage codegen and mirrors nibble-for-nibble in the oracle.
    */
  def zOrderSqlExpr(x: String, y: String, bits: Int = 16): String =
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) ->
       |  acc + shiftleft(shiftright(least($x, 65535L), i) & 1L, 2 * i)
       |      + shiftleft(shiftright(least($y, 65535L), i) & 1L, 2 * i + 1))""".stripMargin

  /** Z-order locality index over the documents corpus: interleaving the
    * bits of (n_chars, n_tok) gives one sort key under which documents
    * close in BOTH dimensions land in the same parquet files — so
    * range-partitioned, min/max-stats'd files let a 2-D predicate
    * (length band × token band) skip most of a 100 TB corpus, the
    * OPTIMIZE ZORDER pattern of lakehouse tables. The index itself is a
    * pure map-side projection (zero shuffles); [[writeZOrdered]] adds
    * the one range shuffle that materializes the layout.
    */
  def zOrderIndex(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("n_chars").cast("long").as("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("zval", expr(zOrderSqlExpr("n_chars", "n_tok")))

  val zOrderIndexSql: String =
    """WITH t AS (SELECT doc_id, n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
      |SELECT doc_id, n_chars, n_tok,
      |  CAST(list_sum(list_transform(range(0, 16), i ->
      |    (((least(n_chars, 65535) >> i) & 1) << (2 * i))
      |    + (((least(n_tok, 65535) >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zval
      |FROM t""".stripMargin

  /** Materialize the z-ordered layout: range-partition on the z-value
    * (each output file owns one contiguous z-range → disjoint min/max
    * stats) and sort within partitions so row groups inherit the
    * locality too. SinksSpec proves the skipping property: per-file
    * z-ranges are pairwise disjoint.
    */
  def writeZOrdered(indexed: DataFrame, path: String, numFiles: Int = 8): Unit =
    indexed
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> ((s, d) => zOrderIndex(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_zorder" -> zOrderIndexSql)
}
