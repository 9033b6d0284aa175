package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Multimodal
import graft.pipeline.GraftPipeline
import graft.sources.Tables
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** End-to-end smoke drive of the non-oracle surfaces (streaming, media
  * plumbing, pipeline facade): `sbt "runMain graft.Smoke"`.
  * Prints observable results; exits nonzero on any violated expectation.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 1. live streaming sessionization across micro-batches
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStream(in.toDS())
      .writeStream.format("memory").queryName("live").outputMode("append").start()
    in.addData(Event(1, new Timestamp(0), 9, "click", 0),
      Event(2, new Timestamp(300000), 9, "click", 0))
    q.processAllAvailable()
    in.addData(Event(3, new Timestamp(4000000), 9, "click", 0))
    q.processAllAvailable()
    val closed = spark.sql("select * from live").collect()
    println(s"[smoke] closed sessions: ${closed.mkString("; ")}")
    q.stop()
    require(closed.length == 1 && closed.head.getLong(2) == 2,
      "expected one closed 2-event session")

    // 2. multimodal batch plumbing over real testdata
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001")))
    val n = feats.count()
    println(s"[smoke] media features: $n rows, sample=${feats.head()}")
    require(n == 500, s"expected 500 media rows, got $n")

    // 2b. real audio decode kernel (JDK javax.sound WAV path)
    val wavFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array.tabulate(16000)(i => if (i % 2 == 0) 0x40.toByte else 0x3f.toByte)
    val wavBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), wavFmt, 8000L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavBos)
    val audioOut = Multimodal.extractAudioFeatures(
      Seq((1L, wavBos.toByteArray), (2L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    println(s"[smoke] audio decode: ${audioOut.mkString("; ")}")
    require(audioOut(0).getBoolean(1) && audioOut(0).getInt(2) == 8000 &&
      math.abs(audioOut(0).getDouble(5) - 1.0) < 1e-9, "1s 8kHz wav should decode")
    require(!audioOut(1).getBoolean(1), "garbage bytes should quarantine in-band")

    // 2c. real video decode kernel (RIFF/AVI container + raw-DIB frames)
    val aviBos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val frame = Array.fill[Byte](12 * 2)(80.toByte) // 4x2 gray-80 BGR24
    val avih = chunk("avih", u32(100000L) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(2) ++
      u32(0) ++ u32(1) ++ u32(0) ++ u32(4) ++ u32(2) ++ Array.fill[Byte](16)(0))
    val body = "AVI ".getBytes("US-ASCII") ++
      chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih) ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ chunk("00db", frame) ++ chunk("00db", frame))
    aviBos.write("RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body)
    val videoOut = Multimodal.extractVideoFeatures(
      Seq((1L, aviBos.toByteArray), (2L, Array[Byte](9, 9, 9))).toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    println(s"[smoke] video decode: ${videoOut.mkString("; ")}")
    require(videoOut(0).getBoolean(1) && videoOut(0).getInt(2) == 4 &&
      videoOut(0).getDouble(7) == 80.0, "gray AVI should decode with exact luma")
    require(!videoOut(1).getBoolean(1), "garbage bytes should quarantine in-band")

    // 3. facade mutual followers
    val followers = Seq((1L, 2L), (2L, 1L)).toDF("user_id", "other_id")
    val following = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("user_id", "other_id")
    val mut = GraftPipeline.calculateMutualFollowers(followers, following).collect()
    println(s"[smoke] mutuals: ${mut.mkString("; ")}")
    require(mut.length == 2, "expected 2 mutual rows")

    // 4. sinks: date-partitioned layout on disk
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_smoke_sink").toString
    graft.sources.Sinks.writePartitionedByDay(
      Tables.events(spark, "/root/testdata/sf0.001"), "ts", s"$sinkDir/by_day")
    val dayDirs = new java.io.File(s"$sinkDir/by_day").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    println(s"[smoke] sink partitions: ${dayDirs.take(3).mkString(", ")} … (${dayDirs.length} days)")
    require(dayDirs.nonEmpty && dayDirs.forall(_.startsWith("day=")), "expected day= layout")

    // 5. SQL-callable native functions (GraftExtensions)
    val sqlRow = spark.sql(
      "SELECT graft_dot_long(array(1L,2L), array(3L,4L)) AS d, graft_hamming('abc','abd') AS h").head()
    println(s"[smoke] sql functions: dot=${sqlRow.getLong(0)} hamming=${sqlRow.getLong(1)}")
    require(sqlRow.getLong(0) == 11L && sqlRow.getLong(1) == 1L)

    // 6. ingest quarantine
    val csv = java.nio.file.Files.createTempFile("smoke", ".csv")
    java.nio.file.Files.writeString(csv, "id,name,score\n1,a,0.5\nBAD,row,zz\n")
    val (clean, bad) = graft.sources.Ingest.quarantine(
      graft.sources.Ingest.readCsv(spark, csv.toString,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))))
    println(s"[smoke] ingest: clean=${clean.count()} quarantined=${bad.count()}")
    require(clean.count() == 1 && bad.count() == 1)

    // 7. MERGE sink round-trip (ON CONFLICT DO UPDATE semantics on disk)
    val mergeDir = java.nio.file.Files.createTempDirectory("graft_smoke_merge").toString
    val mBase = Seq((1L, "old", 100L), (2L, "bob", 100L)).toDF("user_id", "username", "last_updated_us")
    val mDelta = Seq((1L, "new", 200L), (3L, "carol", 50L)).toDF("user_id", "username", "last_updated_us")
    graft.sources.Sinks.mergeUpsert(spark, s"$mergeDir/users", mBase, Seq("user_id"), "last_updated_us")
    graft.sources.Sinks.mergeUpsert(spark, s"$mergeDir/users", mDelta, Seq("user_id"), "last_updated_us")
    val mergedBack = spark.read.parquet(s"$mergeDir/users").orderBy("user_id")
      .collect().map(r => s"${r.getLong(0)}:${r.getString(1)}").mkString(",")
    println(s"[smoke] merge sink: $mergedBack")
    require(mergedBack == "1:new,2:bob,3:carol", s"unexpected merge result $mergedBack")

    // 8. incremental cursor ingest: run 2 reads only rows past the cursor
    val incDir = java.nio.file.Files.createTempDirectory("graft_smoke_inc").toString
    (1L to 10L).map(i => (i, s"r$i")).toDF("event_id", "v")
      .write.mode("append").parquet(s"$incDir/data")
    val r1 = graft.sources.Ingest.readIncremental(spark, s"$incDir/data", s"$incDir/cur", "event_id")
    graft.sources.Ingest.advanceCursor(spark, s"$incDir/cur", r1, "event_id")
    (11L to 13L).map(i => (i, s"r$i")).toDF("event_id", "v")
      .write.mode("append").parquet(s"$incDir/data")
    val r2 = graft.sources.Ingest.readIncremental(spark, s"$incDir/data", s"$incDir/cur", "event_id")
    println(s"[smoke] incremental ingest: run1=${r1.count()} run2=${r2.count()}")
    require(r1.count() == 10 && r2.count() == 3, "cursor should isolate the new rows")

    // 9. streaming ANN serving: per-batch exact top-k
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = corpus.limit(1).collect().map(r => (r.getLong(0) + 500L, r.getSeq[Float](1)))
    val annIn = MemoryStream[(Long, Seq[Float])]
    var annTop = Seq.empty[(Long, Long, Int)]
    val annQ = EventStream.streamingAnnTopK(
      annIn.toDF().toDF("query_id", "embedding"), corpus, 3) { (df, _) =>
      annTop = annTop ++ df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    annIn.addData(probes.toSeq)
    annQ.processAllAvailable()
    annQ.stop()
    println(s"[smoke] streaming ann top-k: ${annTop.mkString("; ")}")
    require(annTop.exists(t => t._1 == probes.head._1 && t._2 == probes.head._1 - 500L && t._3 == 1),
      "rank-1 should be the query's own corpus vector")

    // 10. streaming upsert exit path: two micro-batches MERGEd into a
    // parquet target, latest version per key wins across batches
    val upDir = java.nio.file.Files.createTempDirectory("graft-smoke-upsert").toString
    val upIn = MemoryStream[EventStream.Event]
    val upQ = EventStream.streamingUpsertSink(
      upIn.toDF(), s"$upDir/t", Seq("user_id"), "event_id", s"$upDir/ckpt")
    upIn.addData(EventStream.Event(1, new java.sql.Timestamp(1000), 7, "signup", 1.0))
    upQ.processAllAvailable()
    upIn.addData(EventStream.Event(2, new java.sql.Timestamp(2000), 7, "click", 2.0))
    upQ.processAllAvailable()
    upQ.stop()
    val upRow = spark.read.parquet(s"$upDir/t").select("user_id", "event_id", "event_type").head()
    println(s"[smoke] streaming upsert: $upRow")
    require(upRow.getLong(0) == 7L && upRow.getLong(1) == 2L && upRow.getString(2) == "click",
      "cross-batch upsert must keep the latest version")

    // 11. transactional versioned table: two optimistic commits, a
    // snapshot read of the first, compaction as a third version
    val vtDir = java.nio.file.Files.createTempDirectory("graft-smoke-vt").toString + "/t"
    import spark.implicits._
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, vtDir,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver"), Seq("id"), "ver", 4)
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, vtDir,
      Seq((2L, "b2", 2L)).toDF("id", "v", "ver"), Seq("id"), "ver", 4)
    val vtLatest = graft.sources.Sinks.VersionedTable.read(spark, vtDir)
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    val vtV0 = graft.sources.Sinks.VersionedTable.read(spark, vtDir, Some(0L))
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    println(s"[smoke] versioned table: latest=$vtLatest v0=$vtV0")
    require(vtLatest == Seq((1L, "a"), (2L, "b2")) && vtV0 == Seq((1L, "a"), (2L, "b")),
      "versioned table must serve latest AND the pinned snapshot")

    // 12. MP4 metadata: a planted ISO-BMFF header through the batched path
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def atom(t: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ t.getBytes("US-ASCII") ++ body
    val mvhd = atom("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(1800) ++ Array.fill[Byte](80)(0))
    val mp4 = atom("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ atom("moov", mvhd)
    val mp4Out = graft.operators.Multimodal.extractMp4Meta(
      Seq((1L, mp4), (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    println(s"[smoke] mp4 meta: ${mp4Out.mkString("; ")}")
    require(mp4Out(0).getBoolean(1) && mp4Out(0).getDouble(3) == 3.0 && !mp4Out(1).getBoolean(1),
      "planted mp4 must parse (duration 3s) and junk must quarantine")

    // 13. video fingerprint roundtrip: corpus encode → container walk →
    // temporal hash → banded probe against its own index finds the
    // exact-dup (plus the quarantine path on junk)
    import org.apache.spark.sql.functions.col
    val vdocs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id").limit(40)
    val vIdx = graft.operators.VideoDedup.videoPhash(vdocs)
    val vProbe = graft.operators.VideoDedup.videoCorpus(
      vdocs.select((col("doc_id") + 10000L).as("doc_id"))) // same pixel groups
      .withColumnRenamed("doc_id", "media_id")
    val vHits = graft.operators.BandedPairs.probeJoin(
      graft.operators.VideoDedup.vhashPayloads(vProbe, "media_id"), "media_id",
      vIdx, "doc_id", "vhash", graft.operators.VideoDedup.NumBands,
      graft.operators.VideoDedup.BandBits, graft.operators.VideoDedup.HammingThreshold)
      .count()
    require(graft.operators.VideoDedup.vhash64("junk".getBytes).isEmpty,
      "junk bytes must quarantine")
    println(s"[smoke] video fingerprint probe: $vHits near-dup hits from 40 probes")
    require(vHits > 0, "shifted ids share pixel groups — probe must find near-dups")

    // 14. LM gate: train on the corpus, score a fluent vs a shuffled doc
    val lmDocs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val (lmCb, lmCw) = graft.operators.Classify.lmTrain(lmDocs)
    val firstText = lmDocs.orderBy("doc_id").select("text").head().getString(0)
    val shuffled = firstText.split(" ").reverse.mkString(" ")
    // keyed by doc_id, not positional: if the chosen text had no modeled
    // bigrams, doc 1 would be absent from the scorer output and pair(0)
    // would silently be the reversed doc
    val byId = graft.operators.Classify.lmScoreAgainst(
      Seq((1L, firstText), (2L, shuffled)).toDF("doc_id", "text"), lmCb, lmCw)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fluent = byId.getOrElse(1L, 0L)
    val garbled = byId.getOrElse(2L, 0L)
    println(s"[smoke] lm gate: corpus-fluent doc scores $fluent vs reversed $garbled")
    require(fluent > garbled,
      "a corpus sentence must outscore its reversal under the corpus LM")

    // 15. committed artifacts: dedup index serve→admit→extend, rollup
    // maintenance vs rescan, tokenizer round-trip — the three round-8
    // artifact lifecycles end to end on a throwaway path
    val artDir = java.nio.file.Files.createTempDirectory("graft-smoke-artifacts").toString
    val artDocs = Tables.documents(spark, "/root/testdata/sf0.001")
    graft.operators.DedupIndex.build(artDocs, s"$artDir/dedup")
    val verdicts = graft.operators.DedupIndex
      .serve(graft.operators.DedupIndex.plantedBatch(artDocs), s"$artDir/dedup")
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[smoke] dedup index verdicts: $verdicts")
    require(Set("exact", "near", "new").subsetOf(verdicts.keySet),
      "planted batch must exercise all three verdict classes")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    graft.operators.RollupIndex.build(
      li.filter(col("l_orderkey") % 2 === 0), s"$artDir/rollup", "even")
    graft.operators.RollupIndex.applyDelta(
      li.filter(col("l_orderkey") % 2 =!= 0), s"$artDir/rollup", "odd")
    graft.operators.RollupIndex.applyDelta(
      li.filter(col("l_orderkey") % 2 =!= 0), s"$artDir/rollup", "odd") // replay
    val stateN = graft.operators.RollupIndex.read(spark, s"$artDir/rollup").count()
    val rescanN = graft.operators.RollupIndex.present(
      graft.operators.RollupIndex.partialAgg(li)).count()
    println(s"[smoke] rollup index: $stateN maintained keys ($rescanN by rescan)")
    require(stateN == rescanN, "maintained state must match the one-pass rescan")
    val bpeM = graft.operators.TextOps.bpeTrain(artDocs, 4)
    graft.operators.TextOps.commitBpe(bpeM, s"$artDir/bpe")
    val bpeLoaded = graft.operators.TextOps.loadBpeMerges(spark, s"$artDir/bpe")
    println(s"[smoke] committed tokenizer: ${bpeLoaded.size} merges " +
      s"(${bpeLoaded.take(2).mkString(", ")} …)")
    require(bpeLoaded.nonEmpty, "the committed tokenizer must round-trip")

    // 16. cross-artifact pipeline snapshot (r12): publish one "pipeline
    // as of batch N" reference over the dedup artifact, mutate, and
    // prove the pinned audit serve still re-draws the historical
    // verdict while latest serving has moved on
    val pipeRoot = s"$artDir/pipeline"
    graft.sources.Sinks.PipelineSnapshot.publish(spark, pipeRoot, 0L,
      grouped = Seq(s"$artDir/dedup"))
    val snap0 = graft.sources.Sinks.PipelineSnapshot.latest(spark, pipeRoot).get
    import spark.implicits._
    val lateDoc = Seq((777777L, "a brand new page arriving after the snapshot"))
      .toDF("doc_id", "text")
    graft.operators.DedupIndex.extend(lateDoc, s"$artDir/dedup", buildV = 9L)
    graft.sources.Sinks.PipelineSnapshot.publish(spark, pipeRoot, 1L,
      grouped = Seq(s"$artDir/dedup"))
    val probe = Seq((888888L, "a brand new page arriving after the snapshot"))
      .toDF("doc_id", "text")
    val asOf0 = graft.operators.DedupIndex
      .serveAt(probe, s"$artDir/dedup", snap0.groupPin(s"$artDir/dedup"))
      .head().getString(1)
    val asOfNow = graft.operators.DedupIndex
      .serve(probe, s"$artDir/dedup").head().getString(1)
    println(s"[smoke] pipeline snapshot: as-of-batch-0=$asOf0 latest=$asOfNow " +
      s"(pins=${snap0.pins.size})")
    require(asOf0 == "new" && asOfNow == "exact",
      "the pinned audit serve must re-draw the pre-extend verdict")

    // 17. corpus compliance surface (r13): a registry update reaches
    // back into the committed corpus — the retro sweep forgets the
    // paraphrased benchmark leak, readers stop seeing it (merge-on-read
    // tombstones, raw files untouched), its index slot re-opens, and
    // the registry gate is what rejects the content from then on
    val compDir = java.nio.file.Files.createTempDirectory("graft-smoke-comp").toString
    val compBench = Seq((100L, (1 to 30).map(t => s"smokebench$t").mkString(" ")))
      .toDF("doc_id", "text")
    graft.operators.EvalRegistry.register(compBench, s"$compDir/registry")
    graft.operators.EvalRegistry.registerNear(compBench, s"$compDir/registry")
    val compPara = compBench.select((col("doc_id") + 1L).as("doc_id"),
      graft.operators.EvalRegistry.paraphrase.as("text"))
    val compCorpus = Seq((1L, "an ordinary novel page about nothing"))
      .toDF("doc_id", "text").unionByName(compPara)
    compCorpus.write.mode("append").parquet(s"$compDir/corpus")
    graft.operators.DedupIndex.build(compCorpus, s"$compDir/index")
    val retro = graft.operators.Corpus.retroDecontaminate(spark,
      s"$compDir/corpus", s"$compDir/registry", "smoke-retro",
      indexPath = Some(s"$compDir/index"), logPath = Some(s"$compDir/tdlog"),
      asOfUs = 1L)
    val compKept = graft.operators.Corpus.read(spark, s"$compDir/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val compRaw = spark.read.parquet(s"$compDir/corpus").count()
    val paraText = compPara.head().getString(1)
    val compServe = graft.operators.DedupIndex.serve(
      Seq((999L, paraText)).toDF("doc_id", "text"), s"$compDir/index")
      .head().getString(1)
    val compGate = graft.operators.EvalRegistry.decontaminateNear(
      Seq((999L, paraText)).toDF("doc_id", "text"),
      graft.operators.EvalRegistry.loadNear(spark, s"$compDir/registry"))
      .head().getAs[Boolean]("keep")
    println(s"[smoke] retro decontamination: scanned=${retro.scanned} " +
      s"near=${retro.nearHits} kept=$compKept raw=$compRaw " +
      s"serve=$compServe registry_keep=$compGate")
    require(retro.nearHits == 1L && compKept == Set(1L) && compRaw == 2L &&
      compServe == "new" && !compGate,
      "retro sweep must forget the paraphrase, keep the files, re-open " +
        "the index slot, and leave the registry gate as the backstop")

    println("[smoke] OK")
    spark.stop()
  }
}
