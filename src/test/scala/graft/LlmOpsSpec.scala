package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Embeddings, TextOps}
import graft.sources.Tables
import graft.streaming.EventStream

/** Property tests for the LLM-data-pipeline operators (dedup, similarity,
  * text analysis) on sf0.001/sf0.01.
  */
class LlmOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  // ---------------- band-recall floors (C2 / C3 / C12b) ----------------
  // ANN has recall pins; the hash-dedup banding did not — these plant
  // duplicate pairs at CONTROLLED Jaccard/Hamming distances and pin
  // candidate recall against the theoretical band curve, so a future
  // cap/band retune can't silently drop detection.

  test("minhash-LSH recall floor: planted-Jaccard pairs hit >= 1-(1-J^2)^bands - 4 sigma") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // per planted pair: doc A = 40 distinct pair-local tokens, doc B
    // shares the first m then diverges -> shared shingles m-2 of 38
    // each, J = (m-2)/(78-m) exactly
    val nTok = 40
    val nPairs = 150
    def mk(pairId: Int, m: Int): Seq[(Long, String)] = {
      val a = (0 until nTok).map(i => s"p${pairId}a$i")
      val b = a.take(m) ++ (m until nTok).map(i => s"p${pairId}b$i")
      Seq((pairId * 2L, a.mkString(" ")), (pairId * 2L + 1, b.mkString(" ")))
    }
    for (m <- Seq(27, 35)) {
      val jac = (m - 2).toDouble / (78 - m).toDouble
      val pBand = 1.0 - math.pow(1.0 - jac * jac, Dedup.NumBands)
      val docs = (0 until nPairs).flatMap(p => mk(p, m)).toDF("doc_id", "text")
      val cand = Dedup.minhashCandidates(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = (0 until nPairs).count(p => cand.contains((p * 2L, p * 2L + 1)))
      val recall = hit.toDouble / nPairs
      val sigma = math.sqrt(pBand * (1 - pBand) / nPairs)
      assert(recall >= pBand - 4 * sigma,
        f"m=$m J=$jac%.3f: recall $recall%.3f below band curve $pBand%.3f - 4sigma")
    }
  }

  test("simhash chunk-blocking recall is EXACTLY the some-chunk-equal predicate; hamming<=3 always recovered") {
    val s = spark
    import s.implicits._
    // textual near-dups at graded edit sizes: base doc + k token swaps
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 400).map(i => s"w$i")
    def doc(pairId: Int): Seq[String] =
      (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size)))
    val pairs = (0 until 120).map { p =>
      val base = doc(p)
      val k = 1 + p % 6
      val edited = base.zipWithIndex.map { case (t, i) =>
        if (i % (60 / k) == 3) s"e${p}x$i" else t }
      (p * 2L, base.mkString(" "), p * 2L + 1, edited.mkString(" "))
    }
    val docs = pairs.flatMap(p => Seq((p._1, p._2), (p._3, p._4))).toDF("doc_id", "text")
    val sims = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count(t => t._1 != t._2)
    def someChunk(a: String, b: String) = (0 until Dedup.SimChunks)
      .exists(c => a.substring(c * 16, c * 16 + 16) == b.substring(c * 16, c * 16 + 16))
    val got = Dedup.dedupSimhash(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (ida, _, idb, _) =>
      val (sa, sb) = (sims(ida), sims(idb))
      val d = hamming(sa, sb)
      val expected = someChunk(sa, sb) && d <= 12
      assert(got.contains((ida, idb)) == expected,
        s"pair ($ida,$idb) hamming=$d someChunk=${someChunk(sa, sb)}: " +
          s"blocking must equal the pigeonhole predicate exactly")
      if (d <= 3) assert(got.contains((ida, idb)),
        s"pair ($ida,$idb) hamming=$d: <=3 flips MUST be recovered (pigeonhole over 4 chunks)")
    }
  }

  test("banded fingerprint recall floor (the C12b/C3 engine): controlled-Hamming plants meet the exact band curve") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val nPairs = 300
    val bits = 64; val bands = 4; val bandBits = 16
    // exact P(>=1 of 4 bands intact | d flips uniform w/o replacement):
    // inclusion-exclusion over intact band subsets
    def choose(n: Int, k: Int): Double =
      if (k < 0 || k > n) 0.0 else (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    def pCurve(d: Int): Double = (1 to bands).map { j =>
      val sign = if (j % 2 == 1) 1.0 else -1.0
      sign * choose(bands, j) * choose(bits - j * bandBits, d) / choose(bits, d)
    }.sum
    for (d <- Seq(4, 10)) {
      val rows = (0 until nPairs).flatMap { p =>
        val base = Array.fill(bits)(rnd.nextInt(2))
        val flips = rnd.shuffle((0 until bits).toList).take(d)
        val mate = base.clone(); flips.foreach(i => mate(i) = 1 - mate(i))
        Seq((p * 2L, base.mkString("")), (p * 2L + 1, mate.mkString("")))
      }
      val fps = rows.toDF("doc_id", "fp")
      val got = graft.operators.BandedPairs.pairs(fps, "doc_id", "fp",
        bands, bandBits, threshold = d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = (0 until nPairs).count(p => got.contains((p * 2L, p * 2L + 1)))
      val recall = hit.toDouble / nPairs
      val pd = pCurve(d)
      val sigma = math.sqrt(pd * (1 - pd) / nPairs)
      assert(recall >= pd - 4 * sigma,
        f"d=$d: recall $recall%.3f below exact band curve $pd%.3f - 4sigma=${4 * sigma}%.3f")
    }
  }

  test("embed outliers: overflow guard auto-rescales and preserves the exact ranking") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q0 = Embeddings.quantized(emb).select("vec_id", "qv")
    assert(Embeddings.overflowShift(q0) == 0,
      "test-SF corpus must sit inside the exact envelope (shift 0)")
    val base = Embeddings.embedOutliersOnQ(q0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // inflate components 2^20x: n*max|q| now far past the int64-safe
    // envelope, so the guard MUST engage — and because the inflated
    // components are exact multiples of 2^shift (shift < 20), the
    // rescaled scores are the base scores times an exact power of 4:
    // identical ordering, identical ties, identical ranks
    val b = 20
    val qBig = q0.select(col("vec_id"),
      expr(s"transform(qv, x -> x * ${1L << b}L)").as("qv"))
    val shift = Embeddings.overflowShift(qBig)
    assert(shift > 0 && shift < b,
      s"inflated corpus must trigger a partial shift, got $shift")
    val big = Embeddings.embedOutliersOnQ(qBig)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(big.map(r => (r._1, r._3)).toSeq == base.map(r => (r._1, r._3)).toSeq,
      "rescaled ranking must equal the unshifted ranking id-for-id")
    val scale = BigInt(1) << (2 * (b - shift))
    assert(big.zip(base).forall { case (bg, bs) => BigInt(bg._2) == BigInt(bs._2) * scale },
      s"rescaled scores must be base * 4^(b-shift) exactly (shift=$shift)")
  }

  test("containment finds the contained-in-bigger pair symmetric LSH structurally misses") {
    val s = spark
    import s.implicits._
    // A (20 tokens) verbatim inside B (200 tokens): containment(A,B)=~1
    // while Jaccard ~ 0.1 — below any LSH band's practical floor
    val aTok = (0 until 20).map(i => s"core$i")
    val bTok = (0 until 90).map(i => s"pre$i") ++ aTok ++ (0 until 90).map(i => s"post$i")
    val cTok = (0 until 200).map(i => s"other$i") // unrelated control
    val docs = Seq(
      (1L, aTok.mkString(" ")), (2L, bTok.mkString(" ")), (3L, cTok.mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, c) => a == 1L && b == 2L && c > 0.85 },
      s"A⊆B must be reported with near-1 containment, got ${pairs.toSeq}")
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L },
      "the unrelated doc must not pair with anything")
    assert(!pairs.exists { case (a, b, _) => a == 2L && b == 1L },
      "B is not contained in A at threshold (direction matters)")
    // the symmetric candidate graph indeed misses the pair (the gap
    // this operator exists for)
    val sym = Dedup.minhashCandidates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!sym.contains((1L, 2L)),
      "sanity: the symmetric LSH family must miss the low-Jaccard containment pair")
  }

  test("exact dedup: keeper is group-min, singleton docs are their own keeper") {
    val d = TextOps.dedupExact(Tables.documents(spark, sf))
    assert(d.filter(col("keeper_id") > col("doc_id")).count() == 0)
    assert(d.filter(col("is_dup") && col("keeper_id") === col("doc_id")).count() == 0)
  }

  test("dedup clusters: every candidate edge is intra-cluster, labels are component minima") {
    val docs = Tables.documents(spark, sf)
    val clusters = Dedup.dedupClusters(docs)
    // transitivity: both endpoints of every LSH candidate edge share a cluster
    val byId = clusters.select(col("doc_id"), col("cluster_id"))
    val crossEdges = Dedup.minhashCandidates(docs)
      .join(byId.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster_id", "ca"), "doc_a")
      .join(byId.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster_id", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(crossEdges == 0, "an LSH candidate pair landed in two different clusters")
    // the label is the component min: no doc has cluster_id > doc_id min rule violated
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() == 0)
    // canonical flag: exactly one canonical doc per cluster, and it's the min
    val bad = clusters.groupBy("cluster_id")
      .agg(sum(col("is_canonical").cast("long")).as("n_canon"), min("doc_id").as("mn"))
      .filter(col("n_canon") =!= 1 || col("mn") =!= col("cluster_id")).count()
    assert(bad == 0)
  }

  test("chunking: full token coverage, overlap = chunkSize - stride, text reconstructs") {
    val docs = Tables.documents(spark, sf)
    val chunks = TextOps.chunkDocs(docs, chunkSize = 64, stride = 48)
    // Every token of every doc is covered: per doc, sum of (stride-worth
    // of new tokens) == n_tok, i.e. last chunk ends exactly at n_tok.
    val cover = chunks.groupBy("doc_id")
      .agg(max(col("start_tok") + col("n_chunk_tok")).as("covered"),
        count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")), "doc_id")
    assert(cover.filter(col("covered") =!= col("n_tok")).count() == 0)
    // chunk_idx is dense 0..n-1 per doc (derived from start, no window)
    val dense = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"), min("chunk_idx").as("mn"))
    assert(dense.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
    // Non-final chunks are exactly chunkSize tokens; stitching chunk 0
    // with the non-overlapped tail of chunk 1 reproduces the doc prefix.
    val first2 = chunks.filter(col("chunk_idx") <= 1)
      .groupBy("doc_id").pivot("chunk_idx", Seq(0, 1))
      .agg(first(col("chunk_text")))
      .filter(col("1").isNotNull)
      .join(docs.select("doc_id", "text"), "doc_id")
      // chunk 0 is only a full chunkSize window when the doc has >= 64
      // tokens (shorter docs still chunk, but chunk 0 is their whole text)
      .filter(size(split(col("text"), " ")) >= 64)
      .limit(20).collect()
    assert(first2.nonEmpty)
    first2.foreach { r =>
      val c0 = r.getAs[String]("0").split(" ")
      val c1 = r.getAs[String]("1").split(" ")
      val full = r.getAs[String]("text").split(" ")
      assert(c0.length == 64)
      assert(c0.drop(48).sameElements(c1.take(16)), s"doc ${r.get(0)}: overlap mismatch")
      assert((c0 ++ c1.drop(16)).sameElements(full.take(48 + c1.length)))
    }
  }

  test("sequence packing: bins partition the corpus, budget respected before overshoot") {
    val docs = Tables.documents(spark, sf)
    val budget = 512L
    val bins = TextOps.packSequences(docs, budget = budget, shards = 32)
    // Conservation: every doc's tokens land in exactly one bin.
    val totTokens = docs.select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    val totDocs = docs.count()
    val agg = bins.agg(sum("n_tokens"), sum("n_docs")).head
    assert(agg.getLong(0) == totTokens && agg.getLong(1) == totDocs)
    // Contiguous fill: bins within a (lang, shard) stream have
    // non-overlapping doc ranges in bin order.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "shard").orderBy("bin_id")
    val overlap = bins
      .withColumn("prev_last", lag("last_doc", 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
    assert(overlap.count() == 0)
    // Overshoot bound: a bin opens strictly under the next budget
    // boundary, so it can exceed the budget by at most one document:
    // n_tokens < budget + max single-doc token count.
    val maxDoc = docs.select(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(bins.filter(col("n_tokens") >= budget + maxDoc).count() == 0)
  }

  test("packing shard default scales with the cluster, explicit shards pin the layout") {
    val docs = Tables.documents(spark, sf)
    // auto: 4 streams per core so the running-sum window partition is
    // bounded by corpus/(4·cores), whatever the deployment size
    val auto = TextOps.resolvedShards(docs, 0)
    assert(auto == 4 * spark.sparkContext.defaultParallelism, s"auto shards $auto")
    assert(TextOps.resolvedShards(docs, 32) == 32)
    // the auto layout must actually reach the plan: distinct shard ids
    // cover [0, auto) (doc_ids are dense, so every residue is hit)
    val shardsSeen = TextOps.packSequences(docs)
      .select(countDistinct("shard")).head.getLong(0)
    assert(shardsSeen == auto, s"expected $auto shard streams, saw $shardsSeen")
  }

  test("LSH occupancy cap: a degenerate mega-bucket emits no pairs, small buckets still do") {
    val s = spark
    import s.implicits._
    // 100 identical docs: one bucket per band with occupancy 100 >
    // MaxBucketOccupancy. Without the cap this emits 100*99/2 pairs per
    // band; with it, zero — identical boilerplate is exact-dedup's job.
    val boiler = (1L to 100L).map(i => (i, "the same boilerplate text repeated in every doc"))
    val dup = Seq(
      (200L, "a genuinely distinct document about something else"),
      (201L, "a genuinely distinct document about something else"))
    val docs = (boiler ++ dup).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(_._1 <= 100L), s"mega-bucket leaked pairs: ${pairs.take(5).toSeq}")
    assert(pairs.toSeq == Seq((200L, 201L)), s"small bucket must still pair: ${pairs.toSeq}")
    // clusters stay consistent with the capped pair graph: the identical
    // pair clusters together, the boilerplate docs are all singletons
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters(201L) == 200L && clusters(200L) == 200L)
    assert((1L to 100L).forall(i => clusters(i) == i))
  }

  test("split assign: total partition, deterministic, near-target fractions") {
    val docs = Tables.documents(spark, sf)
    val s1 = TextOps.splitAssign(docs)
    // every doc in exactly one split, buckets in range
    assert(s1.count() == docs.count())
    assert(s1.filter(col("bucket") < 0 || col("bucket") > 255).count() == 0)
    // rerun is bit-identical (hash-keyed, not random())
    val s2 = TextOps.splitAssign(docs)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // fractions near 240/8/8 out of 256 (loose: small corpus)
    val n = s1.count().toDouble
    val bySplit = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit("train") / n > 0.85)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) > 0)
  }

  test("reservoir sample: exact size, rerun-stable, ranks contiguous") {
    val docs = Tables.documents(spark, sf)
    val s1 = TextOps.reservoirSample(docs, n = 100)
    assert(s1.count() == 100)
    assert(s1.select("doc_id").distinct().count() == 100)
    val rns = s1.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq == (1L to 100L), "ranks must be exactly 1..N")
    val s2 = TextOps.reservoirSample(docs, n = 100)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("stratified sample: exact size per stratum, disjoint from nothing, rerun-stable") {
    val docs = Tables.documents(spark, sf)
    val s1 = TextOps.stratifiedSample(docs, n = 10)
    // every stratum with >= 10 docs yields exactly 10; smaller strata yield all
    val strata = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(n, 10L), s"lang=$lang")
    }
    // ranks contiguous within each stratum
    val badRn = s1.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L).count()
    assert(badRn == 0)
    val s2 = TextOps.stratifiedSample(docs, n = 10)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
  }

  test("epoch mix: conservation and per-copy indexing") {
    val docs = Tables.documents(spark, sf)
    val m = TextOps.epochMix(docs)
    // every doc appears exactly `epochs` times, epochs in 1..3
    val bad = m.groupBy("doc_id", "epochs").count()
      .filter(col("count") =!= col("epochs") || col("epochs") < 1 || col("epochs") > 3)
      .count()
    assert(bad == 0)
    assert(m.select("doc_id").distinct().count() == docs.count())
    // epoch indices are 1..epochs per doc
    assert(m.filter(col("epoch") < 1 || col("epoch") > col("epochs")).count() == 0)
    assert(m.select("doc_id", "epoch").distinct().count() == m.count())
  }

  test("source overlap: pairs ordered, counts match a direct self-join") {
    val docs = Tables.documents(spark, sf)
    val m = TextOps.sourceOverlap(docs)
    assert(m.filter(col("source_a") >= col("source_b")).count() == 0)
    // cross-check against the naive distinct-(fp,source) self-join
    val fp = docs.select(col("source"),
      array_min(transform(graft.functions.Exprs.shingles(split(col("text"), " "), 5),
        s => md5(s))).as("fp")).distinct()
    val naive = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    assert(m.exceptAll(naive).count() == 0 && naive.exceptAll(m).count() == 0)
  }

  test("repetition profile: bounds hold, a degenerate doc flags repetitive, word salad mostly not") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      // long enough that an all-distinct bigram set sits under the
      // top-share threshold (1/(n-1) < 0.08 needs n > 13)
      (2L, "a perfectly ordinary sentence with no repeated phrasing at all that keeps going long enough to be measured fairly"),
      (3L, "one")).toDF("doc_id", "text")
    val prof = TextOps.repetitionProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // degenerate doc: every bigram identical → top share 1.0, dup frac ≈ 1
    assert(prof(1L).getAs[Double]("top_bigram_share") == 1.0)
    assert(prof(1L).getAs[Boolean]("repetitive"))
    assert(!prof(2L).getAs[Boolean]("repetitive"))
    // single-token doc: denominators guarded, shares stay in [0, 1]
    val p3 = prof(3L)
    assert(p3.getAs[Double]("top_tok_share") == 1.0)
    assert(p3.getAs[Double]("dup_bigram_frac") == 0.0)
    // real corpus: every share within bounds
    val bad = TextOps.repetitionProfile(Tables.documents(spark, sf))
      .filter(col("top_tok_share") > 1.0 || col("top_tok_share") <= 0.0 ||
        col("top_bigram_share") > 1.0 || col("dup_bigram_frac") < 0.0 ||
        col("dup_bigram_frac") >= 1.0)
      .count()
    assert(bad == 0)
  }

  test("sampled overflow cap: mega-bucket keeps a bounded subsample, never drops to zero") {
    val s = spark
    import s.implicits._
    val cap = 3
    val boiler = (1L to 100L).map(i => (i, "the same boilerplate text repeated in every doc"))
    val dup = Seq(
      (200L, "a genuinely distinct document about something else"),
      (201L, "a genuinely distinct document about something else"))
    val docs = (boiler ++ dup).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docs)
    // every sampled bucket is cap-bounded
    val over = Dedup.minhashBandsSampled(sig, cap)
      .groupBy("b", "band_key").count().filter(col("count") > cap).count()
    assert(over == 0, "a sampled bucket exceeded the cap")
    // unlike drop-mode, the mega-bucket still emits SOME pairs — at most
    // NumBands * C(cap,2) of them — and the distinct near-dup pair survives
    val pairs = Dedup.dedupLshSampled(docs, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mega = pairs.filter(_._1 <= 100L)
    assert(mega.nonEmpty, "sampled mode must retain a detection path into the mega-bucket")
    assert(mega.size <= Dedup.NumBands * cap * (cap - 1) / 2,
      s"mega-bucket pair output not bounded: ${mega.size}")
    assert(pairs.contains((200L, 201L)))
    // sampled pairs are a subset of the UNCAPPED pair graph (no invented edges)
    val rawPairs = {
      val bands = Dedup.minhashBands(sig)
      bands.as("b1").join(bands.as("b2"),
          col("b1.b") === col("b2.b") && col("b1.band_key") === col("b2.band_key"))
        .filter(col("b1.doc_id") < col("b2.doc_id"))
        .select(col("b1.doc_id"), col("b2.doc_id")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pairs.subsetOf(rawPairs))
    graft.GraftCache.releaseAll(spark)
  }

  test("large-star/small-star CC matches min-label clusters on real docs") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.dedupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Dedup.dedupClustersLogStar(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "the two CC engines must produce identical clusterings")
  }

  test("large-star/small-star CC converges logarithmically on a chain graph") {
    val s = spark
    import s.implicits._
    // a 64-node path 0-1-2-...-63: diameter 63 — min-label's worst case
    // (one round per hop). The star alternation must finish well inside
    // 12 LS+SS rounds (O(log n)) and still label every node with 0.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Dedup.ccLargeSmallStar(chain, maxRounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 64)
    assert(labels.values.forall(_ == 0L), s"chain must collapse to root 0: $labels")
    graft.GraftCache.releaseAll(spark)
  }

  test("bloom-pruned incremental dedup is bit-identical to the exact anti-join") {
    val docs = Tables.documents(spark, sf)
    val exact = TextOps.dedupIncremental(docs)
    val bloom = graft.operators.Sketches.dedupIncrementalBloom(docs)
    assert(exact.exceptAll(bloom).count() == 0 && bloom.exceptAll(exact).count() == 0,
      "no false negatives: the Bloom path must reproduce the exact result")
    assert(bloom.count() == exact.count())
    graft.GraftCache.releaseAll(spark)
  }

  test("canonical keep: one keeper per cluster, and it has the cluster's max quality") {
    val docs = Tables.documents(spark, sf)
    val ck = Dedup.canonicalKeep(docs)
    // exactly one keep per cluster, and every doc appears exactly once
    val perCluster = ck.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    assert(perCluster.filter(col("n_keep") =!= 1L).count() == 0)
    assert(ck.count() == docs.count())
    // the keeper's quality is the cluster max
    val maxQ = ck.groupBy("cluster_id").agg(max(col("quality")).as("max_q"))
    val bad = ck.filter(col("keep")).join(maxQ, "cluster_id")
      .filter(col("quality") =!= col("max_q"))
    assert(bad.count() == 0, "a keeper is not its cluster's max-quality member")
    graft.GraftCache.releaseAll(spark)
  }

  test("substring dups: exact-dup docs are fully covered, rates bounded") {
    val docs = Tables.documents(spark, sf)
    val sd = Dedup.substringDups(docs)
    assert(sd.filter(col("n_dup_grams") > col("n_grams")).count() == 0)
    assert(sd.filter(col("dup_rate") < 0 || col("dup_rate") > 1).count() == 0)
    // any doc whose full text appears in another doc_id must be 100% covered
    val texts = docs.groupBy("text").agg(count(lit(1)).as("n"), min("doc_id").as("d"))
    val dupDocs = docs.join(texts.filter(col("n") >= 2).select("text"), "text")
      .filter(size(split(col("text"), " ")) >= Dedup.SubstrGramTokens)
      .select("doc_id")
    val uncovered = sd.join(dupDocs, "doc_id").filter(col("dup_rate") < 1.0)
    assert(uncovered.count() == 0, "an exact-dup doc has dup_rate < 1")
    graft.GraftCache.releaseAll(spark)
  }

  test("bpe merges: top pair count matches a brute-force recount") {
    val docs = Tables.documents(spark, sf)
    val merges = graft.operators.TextOps.bpeMerges(docs).collect()
    assert(merges.length == 20)
    val counts = merges.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "counts must be non-increasing")
    val (p0, c0) = (merges.head.getString(0), merges.head.getLong(1))
    val brute = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .filter(col("pair") === p0).count()
    assert(brute == c0, s"top pair $p0: brute $brute != $c0")
  }

  test("bpe trainer: greedy merge semantics, monotone counts, re-segmentation consistency") {
    val s = spark
    import s.implicits._
    // handcrafted corpus where greedy left-to-right merging matters:
    // "ababab" has 3 (a,b) pairs but also 2 (b,a) pairs; after merging
    // (a,b) everywhere, round 2 must count pairs over the RE-SEGMENTED
    // corpus (ab|ab|ab → (ab,ab)×2), never the original characters.
    val docs = Seq(
      (1L, "ababab ababab"), (2L, "ababab"), (3L, "aaab"), (4L, "xy"))
      .toDF("doc_id", "text")
    // minCount = 1: this corpus deliberately weights count-1 words
    // ("aaab", "xy") into the pair counts under test
    val m = TextOps.bpeTrain(docs, k = 3, minCount = 1L).collect()
    assert(m.length == 3)
    val r1 = m.find(_.getInt(0) == 1).get
    // (a,b) occurs 3+3+3+1 = 10 times (weighted by token multiplicity:
    // "ababab" count 3 → 9, plus one in "aaab")
    assert(r1.getString(1) == "a" && r1.getString(2) == "b" && r1.getLong(4) == 10L)
    val r2 = m.find(_.getInt(0) == 2).get
    // re-segmented: ababab → ab|ab|ab (×3 tokens) gives (ab,ab)×2 each = 6;
    // aaab → a|a|ab gives (a,a)=1,(a,ab)=1; xy gives (x,y)=1
    assert(r2.getString(1) == "ab" && r2.getString(2) == "ab" && r2.getLong(4) == 6L)
    assert(r2.getString(3) == "abab")
    // counts can rise round-over-round only via newly-created symbols;
    // merged symbol is always left||right
    m.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    graft.GraftCache.releaseAll(spark)
  }

  test("bpe trainer: self-pair merges over odd runs are exactly greedy (replace-based would under-merge)") {
    val s = spark
    import s.implicits._
    // token "aaaaaa" (run of 6): greedy (a,a) gives [aa,aa,aa] = 3
    // merges per token; a double string-replace gives only 2 (it cannot
    // re-match across the separator it consumed). Round 2 then counts
    // (aa,aa) pairs: greedy segmentation has 2 per token.
    val docs = Seq((1L, "aaaaaa aaaaaa"), (2L, "aaaaaa")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, k = 2).collect()
    val r1 = m.find(_.getInt(0) == 1).get
    // round 1: (a,a) occurs 5 adjacent times per token x 3 tokens = 15
    assert(r1.getString(3) == "aa" && r1.getLong(4) == 15L)
    val r2 = m.find(_.getInt(0) == 2).get
    // greedy resegment: aa|aa|aa -> (aa,aa) x2 x 3 tokens = 6.
    // An under-merging resegment (aa|a|aa|a) would count (aa,a),(a,aa)
    // instead and this assertion would fail.
    assert(r2.getString(1) == "aa" && r2.getString(2) == "aa" && r2.getLong(4) == 6L,
      s"round 2 got (${r2.getString(1)},${r2.getString(2)}) x ${r2.getLong(4)}")
    graft.GraftCache.releaseAll(spark)
  }

  test("committed tokenizer: encode from the artifact == encode in-session, order preserved") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val k = 6
    val merges = TextOps.bpeTrain(docs, k)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-model").toString
    TextOps.commitBpe(merges, path)
    val loaded = TextOps.loadBpeMerges(spark, path)
    val trained = merges.select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(loaded == trained,
      "the committed merge list must round-trip in learned order")
    val direct = TextOps.bpeEncode(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val served = TextOps.bpeEncodeWith(docs, loaded).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(served == direct,
      "encoding from the committed tokenizer must match the in-session encode")
    // a retrain replaces the WHOLE model atomically — latest wins, and a
    // SHORTER retrain must not leave the old model's tail rounds behind
    val shorter = TextOps.bpeTrain(docs, k - 2)
    TextOps.commitBpe(shorter, path, buildV = 1L)
    assert(TextOps.loadBpeMerges(spark, path).size == shorter.count(),
      "a shorter retrain must fully replace the committed model")
    graft.GraftCache.releaseAll(spark)
  }

  test("bpe trainer: fold round followed by replace round matches at token boundaries") {
    val s = spark
    import s.implicits._
    // round 1 winner is the SELF pair (a,a) (tie with (a,b), broken by
    // right symbol) -> fold path, re-segmenting "aab" as aa|b. Round 2's
    // winner (aa,b) is NON-self -> replace path, and its only occurrence
    // sits at the TOKEN END — if the fold round dropped the trailing
    // separator, the ␟aa␟b␟ pattern would miss every token and round 2
    // would pick a different (or no) pair.
    val docs = Seq((1L, "aab aab aab")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, k = 2).collect()
    val r1 = m.find(_.getInt(0) == 1).get
    assert(r1.getString(3) == "aa" && r1.getLong(4) == 3L, s"round1 ${r1}")
    val r2 = m.find(_.getInt(0) == 2).get
    assert(r2.getString(1) == "aa" && r2.getString(2) == "b" && r2.getLong(4) == 3L,
      s"round 2 must merge (aa,b) at token ends, got ${r2}")
    graft.GraftCache.releaseAll(spark)
  }

  test("bpe trainer: dries up early on a fully-mergeable corpus instead of erroring") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); afterwards every token is one symbol — no
    // pairs remain, so rounds 2..5 must not exist
    val m = TextOps.bpeTrain(docs, k = 5).collect()
    assert(m.length == 1 && m.head.getString(3) == "ab")
    graft.GraftCache.releaseAll(spark)
  }

  test("bpe vocab floor: filtering == training on the floored sub-vocab; no-op when nothing is under it (r10)") {
    val s = spark
    import s.implicits._
    // base corpus listed twice: every token count >= 2, so the default
    // floor drops NOTHING and minCount 2 == minCount 1 exactly
    val words = Seq("abc abd bcd", "abd bcd bce bce", "cab abc abd")
    val base = (words ++ words).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def merges(df: org.apache.spark.sql.DataFrame, mc: Long) =
      TextOps.bpeTrain(df, 8, minCount = mc).collect().map(_.toSeq).toSeq
    assert(merges(base, 2L) == merges(base, 1L),
      "a floor that drops nothing must be the identity")
    // singleton junk appended (unique multi-symbol tokens): the floored
    // train must equal training on the corpus WITHOUT the junk — the
    // floor is exactly 'train on the sub-vocab', not an approximation
    val junk = (0 until 20)
      .map(i => (100L + i, s"zq${i}xx${i}y qq${i}zz"))
      .toDF("doc_id", "text")
    assert(merges(base.unionByName(junk), 2L) == merges(base, 2L),
      "floored training must ignore the singleton tail entirely")
    graft.GraftCache.releaseAll(spark)
  }

  test("bloom dedup with an EMPTY historical side keeps every delta row unknown") {
    val s = spark
    import s.implicits._
    // every doc_id ≡ 8/9 (mod 10) → the internal 80/20 split leaves the
    // historical side empty; the Bloom aggregate over zero rows is NULL,
    // and the coalesce(…, false) probe must route all rows to
    // is_known=false exactly like the plain anti-join does.
    val docs = Seq((8L, "a"), (9L, "b"), (18L, "a"), (19L, "c"))
      .toDF("doc_id", "text")
    val exact = TextOps.dedupIncremental(docs)
    val bloom = graft.operators.Sketches.dedupIncrementalBloom(docs)
    assert(exact.count() == 4 && exact.filter(col("is_known")).count() == 0)
    assert(bloom.exceptAll(exact).count() == 0 && exact.exceptAll(bloom).count() == 0,
      "empty-hist Bloom path must equal the exact path")
    graft.GraftCache.releaseAll(spark)
  }

  test("sketch bounds hold: HLL distinct and approx quantiles within contract") {
    val ad = graft.operators.Sketches.approxDistinctTokens(Tables.documents(spark, sf))
    assert(ad.filter(!col("hll_within_bound")).count() == 0)
    val aq = graft.operators.Sketches.approxOrderQuantiles(Tables.orders(spark, sf))
    assert(aq.filter(!col("p50_within_bound") || !col("p90_within_bound")).count() == 0)
  }

  test("rank-based multi-quantile twin == percentile_disc value for value") {
    val orders = Tables.orders(spark, sf)
    // 0.07 and 0.55 are the float-ceil hazard cases: double(q)*n lands
    // just ABOVE the integer rank (0.07*100 = 7.000000000000001), so a
    // ceil-on-doubles position picks the rank above percentile_disc's —
    // the exact 6-dp-rational position must not
    val qs = Seq(0.07, 0.5, 0.55, 0.9)
    val scal = graft.operators.Sketches.orderQuantilesScalable(orders, qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3)).toMap
    def exact(q: Double) =
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY o_totalprice)")
    val aggCols = qs.map(q => exact(q).as(s"p$q"))
    val buf = orders.groupBy("o_orderstatus")
      .agg(aggCols.head, aggCols.tail: _*).collect()
    assert(buf.nonEmpty)
    buf.foreach { r =>
      val g = r.getString(0)
      // the rank twin must reproduce the buffered sort-agg exactly
      // (same long cents, so doubles compare exactly)
      def asDouble(i: Int): Double = r.get(i) match {
        case d: java.math.BigDecimal => d.doubleValue()
        case d: Double => d
        case x => throw new IllegalStateException(s"unexpected $x")
      }
      qs.zipWithIndex.foreach { case (q, i) =>
        assert(scal((g, q)) == asDouble(i + 1), s"$g p$q")
      }
    }
    graft.GraftCache.releaseAll(spark)
  }

  test("edit-distance verify: bounded by prefix, zero only for identical prefixes") {
    val docs = Tables.documents(spark, sf)
    val ed = Dedup.dedupEditDistance(docs)
    assert(ed.filter(col("prefix_edit_dist") < 0 || col("prefix_edit_dist") > 64).count() == 0)
    // candidates with distance 0 must actually share the 64-char prefix
    val pre = docs.select(col("doc_id"), substring(col("text"), 1, 64).as("p"))
    val zeros = ed.filter(col("prefix_edit_dist") === 0)
      .join(pre.select(col("doc_id").as("doc_a"), col("p").as("pa")), "doc_a")
      .join(pre.select(col("doc_id").as("doc_b"), col("p").as("pb")), "doc_b")
    assert(zeros.filter(col("pa") =!= col("pb")).count() == 0)
  }

  test("minhash candidates have higher jaccard than random pairs") {
    val j = Dedup.dedupNgramJaccard(Tables.documents(spark, sf))
    val candAvg = j.agg(avg("jaccard")).head().getDouble(0)
    // candidate pairs found by LSH banding should be far above the
    // ~0.001 background jaccard of random doc pairs in this corpus
    assert(candAvg > 0.05, s"candidate avg jaccard $candAvg suspiciously low")
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("minhash signature agreement correlates with jaccard") {
    val mh = Dedup.dedupMinhashLsh(Tables.documents(spark, sf))
    val j = Dedup.dedupNgramJaccard(Tables.documents(spark, sf))
    val joined = mh.join(j, Seq("doc_a", "doc_b")).cache()
    val hi = joined.filter(col("n_hash_agree") >= 6).agg(avg("jaccard")).head().getDouble(0)
    val lo = joined.filter(col("n_hash_agree") <= 2).agg(avg("jaccard")).head().getDouble(0)
    assert(hi > lo, s"8-perm minhash should rank pairs: hi=$hi lo=$lo")
  }

  test("simhash: hamming bounded, pairs distinct") {
    val s = Dedup.dedupSimhash(Tables.documents(spark, sf))
    assert(s.filter(col("hamming") < 0 || col("hamming") > 12).count() == 0)
    assert(s.count() == s.select("doc_a", "doc_b").distinct().count())
  }

  test("brute-force ANN: exactly k neighbors per probe, cos in [-1,1]") {
    val a = Embeddings.annTopK(Tables.embeddings(spark, sf))
    val counts = a.groupBy("q_id").count().collect()
    assert(counts.length == Embeddings.NumProbes)
    assert(counts.forall(_.getLong(1) == Embeddings.TopK))
    assert(a.filter(col("cos") < -1.0 || col("cos") > 1.0).count() == 0)
  }

  test("LSH ANN recall: top-1 brute-force neighbor found for most probes") {
    val bf = Embeddings.annTopK(Tables.embeddings(spark, sf))
      .filter(col("rn") === 1).select("q_id", "n_id")
    val lsh = Embeddings.annLsh(Tables.embeddings(spark, sf)).select("q_id", "n_id")
    val hit = bf.join(lsh, Seq("q_id", "n_id")).count()
    // 4 tables x 4 bits at ~0.4-0.5 cos: expect most top-1s recalled
    assert(hit >= Embeddings.NumProbes / 2,
      s"LSH recalled only $hit/${Embeddings.NumProbes} top-1 neighbors")
  }

  test("multi-probe recall >= single-probe recall, both against brute force") {
    val bf = Embeddings.annTopK(Tables.embeddings(spark, sf))
      .filter(col("rn") === 1).select("q_id", "n_id")
    val single = Embeddings.annLsh(Tables.embeddings(spark, sf)).select("q_id", "n_id")
    val multi = Embeddings.annMultiProbe(Tables.embeddings(spark, sf)).select("q_id", "n_id")
    val hitS = bf.join(single, Seq("q_id", "n_id")).count()
    val hitM = bf.join(multi, Seq("q_id", "n_id")).count()
    assert(hitM >= hitS, s"multi-probe recall $hitM < single-probe $hitS")
    assert(hitM >= (Embeddings.NumProbes * 7) / 10,
      s"multi-probe recalled only $hitM/${Embeddings.NumProbes}")
  }

  test("IVF: every vector assigned to exactly one list; search returns k per probe") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    val assign = Embeddings.ivfAssign(q)
    assert(assign.count() == q.count())
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    val lists = assign.select("c_id").distinct().count()
    assert(lists > 1 && lists <= Embeddings.NumCentroids)
    val ivf = Embeddings.annIvf(Tables.embeddings(spark, sf))
    assert(ivf.groupBy("q_id").count().count() == Embeddings.NumProbes)
    // nprobe/numcentroids = 1/4 of corpus scanned, recall still nonzero
    val bf = Embeddings.annTopK(Tables.embeddings(spark, sf))
      .filter(col("rn") === 1).select("q_id", "n_id")
    val hit = bf.join(ivf.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    assert(hit >= Embeddings.NumProbes / 2,
      s"IVF recalled only $hit/${Embeddings.NumProbes} top-1 neighbors")
  }

  test("IVF occupancy: one row per centroid incl. empty lists, counts total, shares bounded (r11)") {
    val occ = Embeddings.ivfOccupancy(Tables.embeddings(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly the codebook's rows — an empty list must appear as 0, not vanish
    val cbIds = Embeddings.kmeansCodebook(
      Embeddings.quantized(Tables.embeddings(spark, sf)))
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(occ.map(_._1).toSet == cbIds && occ.length == cbIds.size,
      "occupancy must cover every centroid exactly once")
    val n = Embeddings.quantized(Tables.embeddings(spark, sf)).count()
    assert(occ.map(_._2).sum == n, "list populations must total the corpus")
    // floor shares: per-mille sums to <= 1000, load 100 = fair share
    assert(occ.map(_._3).sum <= 1000L && occ.forall(o => o._3 >= 0))
    assert(occ.forall(o => o._4 <= Embeddings.NumCentroids * 100L))
    // the diagnostic agrees with the assignment it claims to describe
    val fromAssign = Embeddings.ivfAssign(
      Embeddings.quantized(Tables.embeddings(spark, sf)))
      .groupBy("c_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    occ.foreach { case (c, nv, _, _) =>
      assert(fromAssign.getOrElse(c, 0L) == nv) }
    graft.GraftCache.releaseAll(spark)
  }

  test("IVF k-means codebook: recall >= untrained first-N codebook recall") {
    val bf = Embeddings.annTopK(Tables.embeddings(spark, sf))
      .filter(col("rn") === 1).select("q_id", "n_id")
    val trained = Embeddings.annIvf(Tables.embeddings(spark, sf))
    val untrained = Embeddings.annIvfWith(Tables.embeddings(spark, sf), Embeddings.initCodebook)
    val hitT = bf.join(trained.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val hitU = bf.join(untrained.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    assert(hitT >= hitU, s"trained codebook recall $hitT < untrained $hitU")
    // k-means must actually move the centroids off the init vectors
    val init = Embeddings.initCodebook(Embeddings.quantized(Tables.embeddings(spark, sf)))
      .select(col("c_id"), col("cqv").as("init_cqv"))
    val moved = Embeddings.kmeansCodebook(Embeddings.quantized(Tables.embeddings(spark, sf)))
      .join(init, "c_id")
      .filter(col("cqv") =!= col("init_cqv"))
      .count()
    assert(moved > 0, "k-means left every centroid exactly at its init vector")
  }

  test("PQ: codes complete and bounded, ADC cosine in [-1,1], exactly k per probe") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    val cbs = Embeddings.pqCodebooks(q)
    assert(cbs.length == Embeddings.PqM)
    cbs.foreach(cb => assert(cb.count() == Embeddings.NumCentroids))
    // every vector gets one code per subspace, all within [0, NumCentroids)
    val codes = Embeddings.pqEncode(q, cbs)
    assert(codes.count() == q.count())
    for (m <- 0 until Embeddings.PqM) {
      val bad = codes.filter(col(s"code_$m") < 0 ||
        col(s"code_$m") >= Embeddings.NumCentroids).count()
      assert(bad == 0, s"subspace $m: code out of range")
    }
    // ADC scores are true cosines against the PQ reconstruction
    val out = Embeddings.annPq(Tables.embeddings(spark, sf))
    val rows = out.collect()
    assert(rows.length == Embeddings.NumProbes * Embeddings.TopK)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("IVF-PQ: k per probe, ADC cosines bounded, recall >= plain IVF") {
    val ivfpq = Embeddings.annIvfPq(Tables.embeddings(spark, sf))
    val rows = ivfpq.collect()
    assert(rows.length == Embeddings.NumProbes * Embeddings.TopK)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    // IVF-PQ's candidate set IS plain IVF's (same routing); the ADC
    // scan shortlists RefineK codes per probe and the exact re-rank
    // recovers the in-list exact ranking on that shortlist. The ≥ pin
    // guards the composition (routing, codebooks, refine width) against
    // regression — raw ADC rank alone measured 4/10 here, the refine
    // stage is what buys recall parity back.
    val bf = Embeddings.annTopK(Tables.embeddings(spark, sf))
      .filter(col("rn") === 1).select("q_id", "n_id")
    val ivf = Embeddings.annIvf(Tables.embeddings(spark, sf))
    val hitIvf = bf.join(ivf.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val hitIvfPq = bf.join(ivfpq.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    assert(hitIvfPq >= hitIvf,
      s"IVF-PQ recall $hitIvfPq < plain IVF $hitIvf")
  }

  test("semDedupScaled: codebook sized from the corpus, clusters bounded, output total") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val target = 16L
    val sd = Embeddings.semDedupScaled(emb, targetClusterSize = target)
    assert(sd.count() == n, "scaled SemDeDup must emit one row per vector")
    val pops = sd.groupBy("c_id").count()
    val kEff = pops.count()
    assert(kEff > Embeddings.NumCentroids,
      s"codebook must scale past the $kEff-cluster test artifact for n=$n/target=$target")
    val maxPop = pops.agg(max("count")).head().getLong(0)
    assert(maxPop <= 8 * target,
      s"cluster population $maxPop exceeds 8x target $target")
    // the keep rule stays SemDeDup's: every cluster keeps its earliest member
    val keptPerCluster = sd.filter(col("is_kept")).groupBy("c_id").count().count()
    assert(keptPerCluster == kEff, "every non-empty cluster must keep at least one member")
  }

  test("IVF sampled-training path: codebook is complete and assignment total") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    val cb = Embeddings.kmeansCodebook(q, trainMod = Embeddings.TrainModAtScale)
    assert(cb.count() == Embeddings.NumCentroids)
    val assign = Embeddings.ivfAssign(q, cb)
    assert(assign.count() == q.count())
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
  }

  test("contamination: flags only non-benchmark docs, counts positive") {
    val c = TextOps.contamination(Tables.documents(spark, sf))
    assert(c.filter(col("doc_id") % 10 === 0).count() == 0,
      "benchmark docs must not flag themselves")
    assert(c.filter(col("n_shared") <= 0).count() == 0)
    assert(c.count() > 0, "synthetic corpus has near-dups; expected hits")
  }

  test("stopword strip: token counts add up and no stopword survives") {
    val sw = TextOps.stopwordStrip(Tables.documents(spark, sf))
    val tc = TextOps.tokenCount(Tables.documents(spark, sf)).select("doc_id", "ws_tokens")
    val bad = sw.join(tc, "doc_id")
      .filter(col("n_kept") + col("n_removed") =!= col("ws_tokens")).count()
    assert(bad == 0)
    val leaked = sw.filter(
      col("clean_text").rlike("(^| )(" + TextOps.enStopwords.mkString("|") + ")( |$)")).count()
    assert(leaked == 0, "stopwords must not survive stripping")
    assert(sw.filter(col("n_removed") > 0).count() > 0)
  }

  test("docFreq: df bounded by corpus size, share in (0,1], idf consistent") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val d = TextOps.docFreq(docs)
    assert(d.filter(col("df") <= 0 || col("df") > n).count() == 0)
    assert(d.filter(col("doc_share") <= 0 || col("doc_share") > 1).count() == 0)
    val i = TextOps.idf(docs)
    assert(i.filter(col("idf") < 0).count() == 0)
  }

  test("near-dup cosine pairs meet the threshold and are unique") {
    val nd = Embeddings.nearDupCosine(Tables.embeddings(spark, sf))
    assert(nd.filter(col("cos") < Embeddings.NearDupThreshold).count() == 0)
    assert(nd.count() == nd.select("vec_a", "vec_b").distinct().count())
  }

  test("near-dup wide-table knob: non-default widths keep all pair invariants") {
    // The production scaling path is wider tables (bucket count 2^bits);
    // the packed-signature bit math must be width-generic. 3x8-bit
    // tables: 256 buckets/table instead of 16.
    val nd = Embeddings.nearDupCosine(Tables.embeddings(spark, sf),
      numTables = 3, bitsPerTable = 8)
    val rows = nd.collect()
    assert(rows.forall(_.getDouble(2) >= Embeddings.NearDupThreshold))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length,
      "first-colliding-table dedup must hold at non-default widths")
  }

  test("pii redaction scrubs every planted email and phone") {
    val out = TextOps.piiRedact(Tables.documents(spark, sf))
    val n = out.count()
    assert(n > 0)
    // every doc had exactly one email and one phone planted
    assert(out.filter(col("n_emails") =!= 1L || col("n_phones") =!= 1L).count() == 0)
    // scrub completeness: re-run the planted text through the public
    // redaction query's own building blocks and assert nothing matches
    // after redaction (md5 in the query output proves cross-engine
    // parity; this proves the redaction actually removed the PII).
    val planted = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9][0-9-]{6,}[0-9]"
    val red = Tables.documents(spark, sf)
      .select(regexp_replace(regexp_replace(planted, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("r"))
    assert(red.filter(regexp_count(col("r"), lit(emailRe)) > 0 ||
      regexp_count(col("r"), lit(phoneRe)) > 0).count() == 0)
    assert(red.filter(!col("r").contains("<EMAIL>") || !col("r").contains("<PHONE>"))
      .count() == 0)
  }

  test("props stats: group counts cover all events, avg bounded by min/max") {
    val events = Tables.events(spark, sf)
    val out = graft.operators.Reference.propsStats(events).collect()
    assert(out.map(_.getLong(1)).sum == events.count(), "every event's k counted")
    out.foreach { r =>
      val (mn, mx, avg) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(avg >= mn && avg <= mx, s"avg $avg outside [$mn,$mx]")
    }
  }

  test("quantization is exact integers with positive norms") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    assert(q.filter(col("nrm") <= 0).count() == 0)
    val mx = q.select(max(array_max(col("qv")))).head().getLong(0)
    assert(mx < 2000, s"quantized magnitude $mx out of expected range")
  }

  test("semdedup: keep-first rule — cluster minimum always kept, drops only above tau") {
    val out = Embeddings.semDedup(Tables.embeddings(spark, sf)).cache()
    // The earliest member of every cluster has no prior neighbor: its
    // score is null and it must be kept.
    val minPerCluster = out.groupBy("c_id").agg(min("vec_id").as("vec_id"))
    val minRows = out.join(minPerCluster, Seq("c_id", "vec_id"), "left_semi")
    assert(minRows.filter(!col("is_kept") || col("max_prior_cos").isNotNull).isEmpty,
      "cluster-minimum vectors must be kept with a null score")
    // A dropped vector must have crossed the threshold; a kept one not.
    assert(out.filter(!col("is_kept") &&
      col("max_prior_cos") < Embeddings.NearDupThreshold).isEmpty)
    assert(out.filter(col("is_kept") &&
      col("max_prior_cos") >= Embeddings.NearDupThreshold).isEmpty)
    // Every vector surfaces exactly once.
    assert(out.count() == Tables.embeddings(spark, sf).count())
    out.unpersist()
  }

  test("knn classify: one prediction per probe, vote bounded by k, winner is a real neighbor label") {
    val emb = Tables.embeddings(spark, sf)
    val out = Embeddings.knnClassify(emb).cache()
    assert(out.count() == Embeddings.NumProbes)
    assert(out.filter(col("votes") < 1 || col("votes") > Embeddings.TopK).count() == 0)
    // The predicted label must actually appear among that probe's top-k
    // neighbors' labels (re-derive the neighbor set independently).
    val nnLabels = Embeddings.annTopK(emb)
      .join(emb.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      .select(col("q_id"), col("n_label"))
    val phantom = out.join(nnLabels,
      out("q_id") === nnLabels("q_id") && col("pred_label") === col("n_label"),
      "left_anti").count()
    assert(phantom == 0, "a predicted label never occurs among the probe's neighbors")
    out.unpersist()
  }

  test("line dedup: boilerplate stripped everywhere, unique docs untouched, order kept") {
    val docs = Tables.documents(spark, sf)
    val out = TextOps.lineDedup(docs, lineTok = 4, minDocs = 2).cache()
    // Telemetry is internally consistent: removed <= total, every doc present.
    assert(out.count() == docs.count())
    assert(out.filter(col("lines_removed") > col("lines_total")).count() == 0)
    // A removed line must occur in >= 2 docs: re-derive and cross-check —
    // no line surviving in any cleaned_text may be a cross-doc duplicate.
    // (split("") yields [""], so fully-stripped docs must be excluded)
    val survivors = out.filter(col("cleaned_text") =!= "").select(col("doc_id"),
        explode(split(col("cleaned_text"), " ")).as("tok"))
    assert(survivors.count() ==
      out.agg(sum("n_tok_after")).head().getLong(0),
      "cleaned_text token count must equal the n_tok_after telemetry")
    // Docs with zero removed lines reconstruct their original text exactly.
    val untouched = out.filter(col("lines_removed") === 0)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(untouched.filter(col("cleaned_text") =!= col("text")).count() == 0,
      "a doc with no boilerplate must round-trip byte-identically")
    // Global effect at this SF: some boilerplate exists and is stripped.
    assert(out.agg(sum("lines_removed")).head().getLong(0) > 0)
    out.unpersist()
  }

  test("bm25: k per term max, rn dense, score non-increasing, every hit contains its term") {
    val docs = Tables.documents(spark, sf)
    val k = 5
    val out = TextOps.bm25TopDocs(docs, k = k).cache()
    // bounded: at most k rows per term, rn dense 1..n
    val perTerm = out.groupBy("term")
      .agg(count(lit(1)).as("n"), min("rn").as("mn"), max("rn").as("mx"))
    assert(perTerm.filter(col("n") > k || col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    assert(perTerm.count() == TextOps.Bm25Terms.size.toLong)
    // ordering: within a term, score never increases as rn increases
    val self = out.as("a").join(out.as("b"),
      col("a.term") === col("b.term") && col("a.rn") < col("b.rn"))
    assert(self.filter(col("a.score") < col("b.score")).count() == 0)
    // relevance sanity: every returned doc actually contains the term
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term")).distinct()
    assert(out.join(toks, Seq("doc_id", "term"), "left_anti").count() == 0,
      "a top-k doc does not contain its query term")
    out.unpersist()
  }

  test("percentile norm: pct in [0,1] with 0/1 attained per lang, ties equal, order preserved") {
    val docs = Tables.documents(spark, sf)
    val out = TextOps.percentileNorm(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("pct") < 0.0 || col("pct") > 1.0).count() == 0)
    // per-lang extremes: min pct is 0 always; max pct is 1 unless the
    // top n_chars value is tied (rank semantics) or the stratum is a singleton
    val ext = out.groupBy("lang").agg(min("pct").as("mn"), max("pct").as("mx"),
      count(lit(1)).as("n"), countDistinct("n_chars").as("nd"))
    assert(ext.filter(col("mn") =!= 0.0).count() == 0)
    assert(ext.filter(col("n") > 1 && col("nd") === col("n") && col("mx") =!= 1.0).count() == 0)
    // ties share a percentile; strict order implies strictly higher pct
    val pairs = out.as("a").join(out.as("b"),
      col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
    assert(pairs.filter(col("a.n_chars") === col("b.n_chars") &&
      col("a.pct") =!= col("b.pct")).count() == 0, "equal keys must share a percentile")
    assert(pairs.filter(col("a.n_chars") < col("b.n_chars") &&
      col("a.pct") >= col("b.pct")).count() == 0, "percentile must be strictly monotone in the key")
    out.unpersist()
  }

  test("cluster sample: <= n per cluster with dense rn, members belong to their cluster") {
    val emb = Tables.embeddings(spark, sf)
    val n = 10
    val out = Embeddings.clusterSample(emb, n = n).cache()
    val perC = out.groupBy("c_id")
      .agg(count(lit(1)).as("cnt"), min("rn").as("mn"), max("rn").as("mx"))
    assert(perC.filter(col("cnt") > n || col("mn") =!= 1 || col("mx") =!= col("cnt")).count() == 0)
    // sampled cluster assignment agrees with a fresh IVF assignment
    val q = Embeddings.quantized(emb)
    val assign = Embeddings.ivfAssign(q).withColumnRenamed("c_id", "true_c")
    assert(out.join(assign, "vec_id").filter(col("c_id") =!= col("true_c")).count() == 0)
    // deterministic: a second run picks the identical sample
    val again = Embeddings.clusterSample(emb, n = n)
    assert(out.select("vec_id", "c_id", "rn").except(
      again.select("vec_id", "c_id", "rn")).count() == 0)
    out.unpersist()
  }

  test("token rarity: exact token accounting, bounds hold, rarity is attained") {
    val docs = Tables.documents(spark, sf)
    val out = TextOps.tokenRarity(docs).cache()
    assert(out.count() == docs.count())
    // n_tok matches the raw tokenization
    val truth = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("true_n"))
    assert(out.join(truth, "doc_id").filter(col("n_tok") =!= col("true_n")).count() == 0)
    // commonness lies within [rarest_gtf, corpus max gtf]; rarest >= 1
    assert(out.filter(col("rarest_gtf") < 1).count() == 0)
    assert(out.filter(col("commonness") < col("rarest_gtf").cast("double")).count() == 0)
    // sum of every doc's sum_gtf ties out to sum over terms of gtf^2
    val gtf = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("gtf"))
    val lhs = out.agg(sum("sum_gtf")).head().getLong(0)
    val rhs = gtf.agg(sum(col("gtf") * col("gtf"))).head().getLong(0)
    assert(lhs == rhs, "per-doc commonness mass must equal sum of gtf^2 over the vocabulary")
    out.unpersist()
  }

  test("gram matrix: diagonal mass equals the summed quantized norms; full triangle present") {
    import graft.operators.Embeddings
    val emb = Tables.embeddings(spark, sf)
    val g = Embeddings.gramMatrix(emb).cache()
    val d = Embeddings.Dim
    assert(g.count() == d.toLong * (d + 1) / 2, "exactly the upper triangle")
    val diag = g.filter(col("i") === col("j")).agg(sum("g")).head().getLong(0)
    val norms = Embeddings.quantized(emb).agg(sum("nrm")).head().getLong(0)
    assert(diag == norms, "trace of Sigma xx^T must equal the summed squared norms")
    // the one-buffer GramUpper kernel must reproduce the builtin
    // explode+hash-agg formulation cell-for-cell (its executable spec)
    val builtin = Embeddings.gramMatrixBuiltin(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val native = g.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(native == builtin, "GramUpper must equal the builtin Gram cell-for-cell")
    g.unpersist()
  }

  test("label centroids: exact recompute for one label, counts constant across dims") {
    import graft.operators.Embeddings
    val emb = Tables.embeddings(spark, sf)
    val c = Embeddings.labelCentroids(emb).cache()
    // every (label, dim) cell carries that label's full population
    val badCounts = c.groupBy("label").agg(countDistinct("n").as("k"))
      .filter(col("k") =!= 1).count()
    assert(badCounts == 0, "n must be constant across dims within a label")
    // direct recompute for the smallest label
    val lbl = emb.agg(min("label")).head().getInt(0)
    val vecs = Embeddings.quantized(emb)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === lbl)
      .select("qv").collect().map(_.getSeq[Long](0))
    val got = c.filter(col("label") === lbl).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    (0 until Embeddings.Dim).foreach { dim =>
      val (n, s) = got(dim)
      assert(n == vecs.length.toLong)
      assert(s == vecs.map(_(dim)).sum, s"dim $dim centroid sum")
    }
    c.unpersist()
  }

  test("pca projection: components decorrelate the corpus, variances descend") {
    import graft.operators.Embeddings
    val emb = Tables.embeddings(spark, sf)
    val k = 6
    val proj = Embeddings.pcaProject(emb, k).collect().map(_.getSeq[Double](1))
    assert(proj.nonEmpty && proj.forall(_.length == k))
    val n = proj.length.toDouble
    val means = (0 until k).map(j => proj.map(_(j)).sum / n)
    def cov(a: Int, b: Int): Double =
      proj.map(r => (r(a) - means(a)) * (r(b) - means(b))).sum / n
    val vars = (0 until k).map(j => cov(j, j))
    // eigen-order: variances non-increasing (small tolerance for the
    // Jacobi sweep's convergence threshold)
    vars.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - 1e-6 * math.max(a, 1.0), s"variances must descend: $vars")
    }
    assert(vars.head > 0.0, "top component must carry variance")
    // decorrelation: off-diagonal covariance tiny relative to the scale
    val scale = vars.max
    for (a <- 0 until k; b <- a + 1 until k) {
      assert(math.abs(cov(a, b)) < 1e-6 * scale,
        s"components $a,$b correlated: ${cov(a, b)} vs scale $scale")
    }
    // jacobi unit: a planted diagonal matrix returns axis eigenvectors
    val diag = Array.tabulate(4, 4)((i, j) => if (i == j) (4 - i).toDouble else 0.0)
    val top2 = Embeddings.jacobiTopK(diag, 2)
    assert(math.abs(top2(0)(0) - 1.0) < 1e-9 && math.abs(top2(1)(1) - 1.0) < 1e-9,
      "diagonal matrix eigenvectors are the axes in eigenvalue order")
  }

  test("hybrid rrf: fusion recomputed from the two source rankings, rank order dense") {
    import graft.operators.{Retrieval, TextOps}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val fused = Retrieval.hybridRrf(docs, emb).collect()
    assert(fused.nonEmpty)
    val byTerm = fused.groupBy(_.getString(0))
    assert(byTerm.keySet == TextOps.Bm25Terms.toSet,
      "every query term must produce a fused list")
    byTerm.foreach { case (term, rows) =>
      val rns = rows.map(_.getInt(3)).sorted.toSeq
      assert(rns == (1 to rows.length), s"$term: ranks must be dense from 1")
      assert(rows.length <= Retrieval.TopK)
      // rrf scores non-increasing in rank, bounded by the two-list max
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted.reverse, s"$term: rrf must be non-increasing")
      assert(byRank.head <= 2.0 / (Retrieval.RrfC + 1), s"$term: rrf above two-list max")
      assert(byRank.last > 0.0)
    }
    // a doc present in BOTH lists at rank 1 would hit exactly the max;
    // every fused score must be reconstructible from some (rs, rd) pair
    val valid = (for {
      rs <- 0 to Retrieval.TopK; rd <- 0 to Retrieval.TopK
      if rs > 0 || rd > 0
    } yield (if (rs > 0) 1.0 / (Retrieval.RrfC + rs) else 0.0) +
      (if (rd > 0) 1.0 / (Retrieval.RrfC + rd) else 0.0)).toSet
    fused.foreach { r =>
      assert(valid.contains(r.getDouble(2)),
        s"rrf ${r.getDouble(2)} not a valid two-rank fusion")
    }
  }

  // ---------------- C76: UniMax waterfill algebra ----------------

  test("unimax waterfill: skewed masses exercise both branches; cap, conservation, uniformity hold") {
    // 3 tiny sources, 2 medium, 1 giant; cap 2, budget 60% of 2x total
    val masses = Seq(
      "tiny_a" -> 10L, "tiny_b" -> 12L, "tiny_c" -> 15L,
      "mid_a" -> 100L, "mid_b" -> 120L, "giant" -> 2000L)
    val total = masses.map(_._2).sum
    val cap = 2L
    val budget = 2L * total * 6 / 10 // 2714
    val alloc = TextOps.unimaxAlloc(masses, budget, cap)
    val byName = alloc.map(a => a._1 -> a._3).toMap
    // every tiny/mid source hits the epoch cap (uniform share >> cap*n)
    Seq("tiny_a", "tiny_b", "tiny_c", "mid_a", "mid_b").foreach { s =>
      val n = masses.toMap.apply(s)
      assert(byName(s) == cap * n, s"$s must be epoch-capped")
    }
    // the giant is share-bound: takes everything left, NOT cap*n
    assert(byName("giant") == budget - (masses.toMap - "giant").values.map(_ * cap).sum)
    assert(byName("giant") < cap * 2000L)
    // invariants: alloc <= cap*n everywhere; total == budget when the
    // largest source is share-bound (floor leftovers only exist if even
    // the last source capped)
    alloc.foreach { case (s, n, t) => assert(t <= cap * n && t >= 0, s) }
    assert(alloc.map(_._3).sum == budget)
    // processing order is ascending (n, source): allocations of
    // share-bound sources never decrease in that order
    val shareBound = alloc.filter { case (_, n, t) => t < cap * n }.map(_._3)
    assert(shareBound == shareBound.sorted)
  }

  test("unimax waterfill: budget above the full cap leaves a remainder and caps everything") {
    val masses = Seq("a" -> 10L, "b" -> 20L)
    val alloc = TextOps.unimaxAlloc(masses, 1000L, 3L)
    assert(alloc.map(_._3) == Seq(30L, 60L), "everything capped")
    assert(alloc.map(_._3).sum < 1000L, "unspendable budget remains")
  }

  test("q_unimax_mix: registered defaults fire both branches on the real corpus and conserve the budget") {
    val docs = Tables.documents(spark, sf)
    val rows = TextOps.unimaxMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length >= 2)
    val total = rows.map(_._2).sum
    val budget = 27L * total / 10L
    assert(rows.map(_._3).sum == budget, "ascending waterfill spends the whole budget")
    val capped = rows.count(t => t._3 == 3L * t._2)
    assert(capped > 0, "some source must hit the 3-epoch cap at sf0.01")
    assert(capped < rows.length, "some source must be share-bound at sf0.01")
    rows.foreach { case (s, n, t, fe, rem) =>
      assert(t <= 3L * n, s)
      assert(fe == t / n && rem == t % n, s"$s: epoch split must be exact")
    }
  }

  test("q_unimax_apply: realization conserves the allocation exactly per source; truncation only at the boundary (r10)") {
    val docs = Tables.documents(spark, sf)
    val alloc = TextOps.unimaxMix(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val emitted = TextOps.unimaxApply(docs).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // conservation: Σ emit_tok per source == the waterfill's allocation
    val bySource = emitted.groupBy(_._1).map { case (s, g) => s -> g.map(_._4).sum }
    alloc.foreach { case (s, (a, _, _)) =>
      assert(bySource.getOrElse(s, 0L) == a,
        s"$s: emitted ${bySource.getOrElse(s, 0L)} tokens != allocation $a")
    }
    assert(bySource.keySet == alloc.keySet)
    emitted.foreach { case (s, epoch, nTok, emitTok) =>
      val (_, fe, _) = alloc(s)
      assert(epoch >= 1 && epoch <= fe + 1, s"$s epoch $epoch out of range")
      assert(emitTok > 0 && emitTok <= nTok, s"$s emit $emitTok vs $nTok")
      if (epoch <= fe)
        assert(emitTok == nTok, s"$s: full epochs must emit whole docs")
    }
    // at most ONE truncated doc per source (the remainder boundary)
    emitted.filter(e => e._4 < e._3).groupBy(_._1).foreach { case (s, g) =>
      assert(g.length == 1, s"$s: ${g.length} truncated docs, want 1")
    }
    graft.GraftCache.releaseAll(spark)
  }

  test("corpus-wide bitext candidates cover C81b's pairs bit-identically; mining reaches past the probe window (r11)") {
    graft.GraftCache.releaseAll(spark)
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // C81b's pair frame: the shared refined candidate stream, filtered
    // cross-lingual exactly as bitextMineAnn does
    val annPairs = Embeddings.ivfPqRefinedPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (y, x, _) => langOf(y) != "en" && langOf(x) == "en" }
      .map { case (y, x, c) => (y, x) -> c }.toMap
    assert(annPairs.nonEmpty)
    graft.GraftCache.releaseAll(spark)
    val corpusPairs = Embeddings.corpusCrossLingualPairs(docs, emb, "en")
      .collect().map(r => (r.getAs[Long]("y_id"), r.getAs[Long]("x_id")) ->
        r.getAs[Double]("cos")).toMap
    // COVERAGE: a pivot-side candidate's shortlist rank can only improve
    // when same-language candidates leave the race, so every pair C81b
    // scores is scored corpus-wide too — at the bit-identical cosine
    annPairs.foreach { case (pair, cos) =>
      assert(corpusPairs.contains(pair),
        s"C81b pair $pair missing from the corpus-wide candidate frame")
      assert(corpusPairs(pair) == cos,
        s"pair $pair cosine drifted: ${corpusPairs(pair)} vs $cos")
    }
    // the corpus-wide frame genuinely mines past the probe window
    assert(corpusPairs.keys.exists(_._1 >= Embeddings.NumProbes),
      "no candidate outside the probe window — the miner is still bounded")
    graft.GraftCache.releaseAll(spark)
    // mined output: reaches past the window; honest NON-superset at the
    // margin level (C81b's under-filled /2k denominators inflate its
    // margins — the corpus-wide frame is the better-calibrated one)
    val corpusRows = Embeddings.bitextMineCorpus(docs, emb).collect()
    val minedYs = corpusRows.map(_.getAs[Long]("doc_id"))
    assert(minedYs.exists(_ >= Embeddings.NumProbes),
      "corpus-wide mining must emit docs the probe-bounded miner cannot")
    // semantic pins: y non-pivot, x pivot, one best pair per y, margins clear
    corpusRows.foreach { r =>
      val y = r.getAs[Long]("doc_id"); val x = r.getAs[Long]("en_id")
      assert(langOf(y) != "en" && langOf(x) == "en",
        s"mined pair ($y -> $x) violates the cross-lingual contract")
      assert(r.getAs[Double]("margin") >= Embeddings.MarginThreshold)
    }
    assert(minedYs.distinct.length == minedYs.length, "one best pair per mined doc")
    graft.GraftCache.releaseAll(spark)
  }

  test("margin calibration: planted pairs separate cleanly above the noise, curve is NOT flat, 1.1 is a measured point (r11)") {
    graft.GraftCache.releaseAll(spark)
    val emb = Tables.embeddings(spark, sf)
    val rows = Embeddings.marginCalibration(emb).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_planted"), r.getAs[Double]("planted_rate")))
      .sortBy(_._1)
    val noiseBins = rows.filter(_._3 == 0L).map(_._1)
    val plantedBins = rows.filter(_._3 > 0L)
    assert(noiseBins.nonEmpty && plantedBins.nonEmpty,
      "the diagram needs both noise and planted mass")
    // FLAT-CURVE DETECTION: a margin with no signal would mix planted
    // pairs through the noise bins at the ~base rate everywhere. Here
    // the planted pairs must separate COMPLETELY: every bin containing
    // a planted pair is pure (rate 1.0) and sits strictly above every
    // noise bin.
    assert(plantedBins.forall(_._4 == 1.0),
      s"planted bins must be pure: ${plantedBins.mkString(", ")}")
    assert(plantedBins.map(_._1).min > noiseBins.max,
      s"planted mass (bins >= ${plantedBins.map(_._1).min}) must clear the " +
        s"noise ceiling (bin ${noiseBins.max}) — a flat curve fails here")
    // every planted pair is accounted for and clears the 1.1 threshold
    // bin — the constant is a measured operating point, not a guess
    val nPlantedIds = emb.select("vec_id").collect().map(_.getLong(0))
      .count(id => id % 4 == 1 && id > 0)
    assert(plantedBins.map(_._3).sum == nPlantedIds.toLong,
      s"all $nPlantedIds planted pairs must appear in the diagram")
    val thresholdBin = math.floor(Embeddings.MarginThreshold / 0.05).toLong
    assert(plantedBins.map(_._1).min >= thresholdBin,
      "every planted pair clears the 1.1 operating point")
    // ...and the diagram also documents WHY mining is best-pair +
    // threshold, not threshold alone: some noise pairs clear 1.1 too
    assert(noiseBins.exists(_ >= thresholdBin),
      "expected noise mass above 1.1 (threshold alone is not precision-1)")
    graft.GraftCache.releaseAll(spark)
  }

  test("calibrated mining threshold: measured cut mines exactly the planted pairs, tightens the 1.1 constant, commits and serves (r11)") {
    graft.GraftCache.releaseAll(spark)
    val emb = Tables.embeddings(spark, sf)
    def minedSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("en_id"))).toSet
    val bin = Embeddings.measuredMarginBin(emb)
    val calibrated = minedSet(Embeddings.bitextMineCalibrated(emb))
    val atConstant = minedSet(Embeddings.marginMine(
      Embeddings.plantedBitextPairs(emb), Embeddings.MarginK,
      Embeddings.MarginThreshold))
    val plantedTruth = emb.select("vec_id").collect().map(_.getLong(0))
      .filter(id => id % 4 == 1 && id > 0).map(id => (id, id - 1)).toSet
    // the measured cut recovers EXACTLY the planted truth: full recall
    // (the purity rule sits below the planted mass) and full precision
    // (noise best-pairs between 1.1 and the cut are rejected)
    assert(calibrated == plantedTruth,
      s"calibrated mining must equal the planted truth; diff +${
        (calibrated -- plantedTruth).size} -${(plantedTruth -- calibrated).size}")
    // ...which strictly tightens the 1.1 constant on this corpus
    assert(calibrated.subsetOf(atConstant),
      "raising the cut must only remove pairs")
    assert(atConstant.size > calibrated.size,
      "expected the constant to admit noise best-pairs the measured cut rejects")
    // committed operating point: integer bin round-trips exactly and the
    // served mining is row-identical to the in-session calibrated run
    val dir = java.nio.file.Files.createTempDirectory("graft-margin-thr").toString
    assert(Embeddings.commitMarginThreshold(emb, dir) == bin)
    assert(Embeddings.loadMarginThresholdBin(spark, dir) == bin)
    // the artifact carries its calibration context (r11 review): a
    // load-side width/k mismatch would silently shift the operating
    // point, so loaders consume the COMMITTED width/k, never parameters
    assert(Embeddings.loadMarginThreshold(spark, dir) ==
      ((bin, 0.05, Embeddings.MarginK)))
    // the full production composition C84 -> C85 -> C81c: the committed
    // cut applied to the ROUTED corpus miner only removes pairs vs the
    // constant, and every survivor clears the cut
    val docs = Tables.documents(spark, sf)
    graft.GraftCache.releaseAll(spark)
    val atConstantRouted = Embeddings.bitextMineCorpus(docs, emb).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("en_id"))).toSet
    graft.GraftCache.releaseAll(spark)
    val routed = Embeddings.bitextMineCorpusCommitted(docs, emb, dir).collect()
    val routedSet = routed.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("en_id"))).toSet
    assert(routedSet.subsetOf(atConstantRouted),
      "raising the routed cut must only remove pairs")
    routed.foreach(r => assert(r.getAs[Double]("margin") >= bin * 0.05))
    graft.GraftCache.releaseAll(spark)
  }

  test("routed margin calibration: full planted recall through the IVF chain, noise mass shrinks, separation holds (r11)") {
    graft.GraftCache.releaseAll(spark)
    val emb = Tables.embeddings(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_planted"), r.getAs[Double]("planted_rate")))
    val brute = rows(Embeddings.marginCalibration(emb))
    graft.GraftCache.releaseAll(spark)
    val routed = rows(Embeddings.marginCalibrationAnn(emb))
    // the ANN trade: routing + the ADC shortlist drop noise pairs...
    assert(routed.map(_._2).sum < brute.map(_._2).sum,
      "the routed diagram must see strictly less pair mass than brute")
    // ...but EVERY planted pair survives — a translation's vector is ≈
    // its partner's, so its nearest coarse lists include the partner's
    // own list: zero planted recall lost to the chain (the per-bin
    // evidence behind C81c's honest-trade claim)
    assert(routed.map(_._3).sum == brute.map(_._3).sum,
      s"planted recall through the chain must be total " +
        s"(${routed.map(_._3).sum} vs brute ${brute.map(_._3).sum})")
    // separation is preserved on the routed frame
    val rPlanted = routed.filter(_._3 > 0L)
    val rNoise = routed.filter(_._3 == 0L)
    assert(rPlanted.forall(_._4 == 1.0) && rNoise.nonEmpty &&
      rPlanted.map(_._1).min > rNoise.map(_._1).max,
      "routed planted bins must stay pure and above the noise ceiling")
    graft.GraftCache.releaseAll(spark)
  }

  test("served margin calibration: planted recall and separation through the PRODUCTION index's codebooks (r11)") {
    graft.GraftCache.releaseAll(spark)
    val emb = Tables.embeddings(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_planted"), r.getAs[Double]("planted_rate")))
    val brute = rows(Embeddings.marginCalibration(emb))
    graft.GraftCache.releaseAll(spark)
    // the production quantizer: an AnnIndex committed off the REAL
    // corpus — the calibration job may load it, never retrain it
    val dir = java.nio.file.Files.createTempDirectory("graft-served-cal").toString
    graft.operators.AnnIndex.build(emb, dir)
    val served = rows(Embeddings.marginCalibrationServed(emb, dir))
    // the served chain still trades noise mass away...
    assert(served.map(_._2).sum < brute.map(_._2).sum,
      "the served diagram must see strictly less pair mass than brute")
    // ...and codebooks that never saw the perturbed vectors still lose
    // ZERO planted recall on this corpus — the ±1 plant sits well
    // inside a coarse cell, so partner and translation co-route even
    // under the real-corpus quantizer (the go/no-go evidence for
    // calibrating on planted + mining with the production index)
    assert(served.map(_._3).sum == brute.map(_._3).sum,
      s"planted recall through the SERVED codebooks must be total " +
        s"(${served.map(_._3).sum} vs brute ${brute.map(_._3).sum})")
    val sPlanted = served.filter(_._3 > 0L)
    val sNoise = served.filter(_._3 == 0L)
    assert(sPlanted.forall(_._4 == 1.0) && sNoise.nonEmpty &&
      sPlanted.map(_._1).min > sNoise.map(_._1).max,
      "served planted bins must stay pure and above the noise ceiling")
    graft.GraftCache.releaseAll(spark)
  }

  test("committed BPE vocab: train-from-artifact == fresh train(union) bit-identically; replay and fold no-ops (r11)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    graft.GraftCache.releaseAll(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-vocab").toString
    TextOps.commitBpeVocab(a, dir, "crawl-a")
    TextOps.commitBpeVocab(b, dir, "crawl-b")
    def merges(df: DataFrame): Seq[(Int, String, String, String, Long)] =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val k = 24
    val fromArtifact = merges(TextOps.bpeTrainCommitted(spark, dir, k))
    val fresh = merges(TextOps.bpeTrain(docs, k))
    assert(fromArtifact.nonEmpty && fromArtifact == fresh,
      "extend∘train must equal train(union) merge for merge, bit-identically")
    // replayed ingest: the rollup ledger no-ops it, counts do not double
    TextOps.commitBpeVocab(b, dir, "crawl-b")
    graft.GraftCache.releaseAll(spark)
    assert(merges(TextOps.bpeTrainCommitted(spark, dir, k)) == fresh,
      "a replayed crawl delta must not change the trained merges")
    // fold compaction: associative count monoid, train unchanged
    TextOps.maintainBpeVocab(spark, dir)
    graft.GraftCache.releaseAll(spark)
    assert(merges(TextOps.bpeTrainCommitted(spark, dir, k)) == fresh,
      "foldPartials must not change the trained merges")
    // the floor binds on MERGED counts: a token occurring once in each
    // of two crawls survives minCount=2 — committing floored per-crawl
    // counts would have dropped it and trained nothing here
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bpe-vocab2").toString
    val ta = Seq((1L, "zzcross unique1")).toDF("doc_id", "text")
    val tb = Seq((2L, "zzcross unique2")).toDF("doc_id", "text")
    TextOps.commitBpeVocab(ta, dir2, "a")
    TextOps.commitBpeVocab(tb, dir2, "b")
    val vocab2 = TextOps.loadBpeVocab(spark, dir2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab2("zzcross") == 2L && vocab2("unique1") == 1L)
    val cross = merges(TextOps.bpeTrainCommitted(spark, dir2, 4, minCount = 2L))
    graft.GraftCache.releaseAll(spark)
    assert(cross.nonEmpty && cross == merges(
      TextOps.bpeTrain(ta.unionAll(tb), 4, minCount = 2L)),
      "the cross-crawl token must train identically to train(union)")
    graft.GraftCache.releaseAll(spark)
  }

  test("byte-level BPE (C91): hand-walked merges, ASCII isomorphism to the char trainer, byte fallback through multi-byte scripts, committed-vocab lifecycle reused (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    graft.GraftCache.releaseAll(spark)
    def rows(df: DataFrame): Seq[(Int, String, String, String, Long)] =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // 1. hand-walked: "aaab aaab cd" — UTF-8 bytes 61 61 61 62 / 63 64.
    // Round 1: overlapping self-pair (61,61) counts 2 per occurrence x2
    // words = 4; greedy fold leaves [6161, 61, 62]. Round 2: tie at 2
    // between (6161,61) and (61,62) breaks to the lexicographically
    // smaller left "61". Round 3 merges the two survivors.
    val hand = Seq((1L, "aaab aaab cd")).toDF("doc_id", "text")
    assert(rows(TextOps.bpeTrainBytes(hand, k = 3, minCount = 1L)) == Seq(
      (1, "61", "61", "6161", 4L),
      (2, "61", "62", "6162", 2L),
      (3, "6161", "6162", "61616162", 2L)),
      "byte trainer must match the hand computation")
    graft.GraftCache.releaseAll(spark)
    // 2. ASCII isomorphism: on a pure-ASCII corpus the byte trainer IS
    // the char trainer under the hex rendering (per-symbol hex of the
    // raw symbol; fixed-width lowercase hex comparison == UTF-8 byte
    // comparison, so every count AND every tie-break corresponds)
    val ascii = Seq(
      (1L, "the cat sat on the mat"), (2L, "the rat sat on a hat"),
      (3L, "that cat that rat that bat"), (4L, "on and on and on"))
      .toDF("doc_id", "text")
    def hexOf(s: String): String =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02x").mkString
    val charM = rows(TextOps.bpeTrain(ascii, k = 6, minCount = 1L))
    val byteM = rows(TextOps.bpeTrainBytes(ascii, k = 6, minCount = 1L))
    assert(byteM == charM.map { case (r, l, rr, m, n) =>
      (r, hexOf(l), hexOf(rr), hexOf(m), n) },
      s"ASCII corpora must train isomorphically: $charM vs $byteM")
    graft.GraftCache.releaseAll(spark)
    // 3. byte fallback: a multi-byte script trains on bytes INSIDE the
    // code point — "€" = e2 82 ac; the char trainer can only merge
    // whole € symbols, the byte trainer's first merge is a byte pair
    // within them ((82,ac) by the tie-break)
    val euro = Seq((1L, "€€ €€")).toDF("doc_id", "text")
    val byteEuro = rows(TextOps.bpeTrainBytes(euro, k = 1, minCount = 1L))
    assert(byteEuro == Seq((1, "82", "ac", "82ac", 4L)),
      s"multi-byte scripts must train through byte fallback: $byteEuro")
    val charEuro = rows(TextOps.bpeTrain(euro, k = 1, minCount = 1L))
    assert(charEuro.head._2 == "€",
      "premise: the char trainer sees whole code points here")
    graft.GraftCache.releaseAll(spark)
    // 4. the committed (tok, cnt) vocab artifact feeds the byte trainer
    // unchanged (symbolization is train-time): train-from-artifact ==
    // fresh train(union), bit-identically — one ingest lifecycle, two
    // tokenizers
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-bytes").toString
    TextOps.commitBpeVocab(a, dir, "crawl-a")
    TextOps.commitBpeVocab(b, dir, "crawl-b")
    val k = 24
    val fromArtifact = rows(TextOps.bpeTrainBytesCommitted(spark, dir, k))
    graft.GraftCache.releaseAll(spark)
    val fresh = rows(TextOps.bpeTrainBytes(docs, k))
    assert(fromArtifact.nonEmpty && fromArtifact == fresh,
      "byte train-from-artifact must equal fresh train(union) bit-identically")
    graft.GraftCache.releaseAll(spark)
  }

  test("tokenizer bundle: merges+vocab+fertility commit as one unit; extend retrains as train(union); fertility rides the committed merges (r11)") {
    import spark.implicits._
    graft.GraftCache.releaseAll(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-tokenizer").toString
    val k = 24
    TextOps.commitTokenizer(a, dir, "crawl-a", k)
    // merges from the bundle == a fresh train on crawl A
    val served = TextOps.loadBpeMerges(spark, dir)
    val freshA = TextOps.bpeTrain(a.select("doc_id", "text"), k).collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(served == freshA, "bootstrap merges must equal a fresh train")
    // fertility was measured WITH the committed merges, per lang
    val filedFert = TextOps.loadTokenizerFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val liveFert = TextOps.fertilityWith(a, served).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(filedFert == liveFert, "committed fertility must ride the committed merges")
    // build_v derives from the vocab ledger (r11 review): bootstrap = 1
    // applied delta, extend = 2 — every extend is distinguishable, so
    // fertility staleness is visible, never silent
    def fertV() = TextOps.loadTokenizerFertility(spark, dir)
      .select("lang", "build_v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fertV().values.toSet == Set(1L),
      "bootstrap fertility must file at build_v 1")
    // extend with crawl B: the retrain equals a fresh train on A ∪ B
    graft.GraftCache.releaseAll(spark)
    TextOps.extendTokenizer(b, dir, "crawl-b", k)
    val langsB = b.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langsB.forall(l => fertV()(l) == 2L),
      "extend must re-file fertility at a MONOTONE build_v, not a fixed default")
    val extended = TextOps.loadBpeMerges(spark, dir)
    val freshUnion = TextOps.bpeTrain(docs.select("doc_id", "text"), k).collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(extended == freshUnion,
      "extend∘train must equal train(union) through the bundle")
    // the encode path serves compatible ids: bundle merges encode B
    // exactly as an in-session union-trained encoder would
    val viaBundle = TextOps.bpeEncodeWith(b.select("doc_id", "text"), extended)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val viaFresh = TextOps.bpeEncodeWith(b.select("doc_id", "text"), freshUnion)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaBundle == viaFresh)
    // ROOT SNAPSHOT (r11): a crashed extend that committed new merges
    // but died before fertility/snapshot is INVISIBLE to readers —
    // simulate with a bare commitBpe (raw merges commit, no snapshot)
    // at the LEDGER-derived buildV a real crashed extend would use
    // (delta wins version ties, so the replay's re-commit overwrites)
    val fertBefore = TextOps.loadTokenizerFertility(spark, dir).collect()
      .map(_.toSeq).toSet
    TextOps.commitBpe(
      TextOps.bpeTrain(a.select("doc_id", "text"), 8), dir, buildV = 2L)
    assert(TextOps.loadBpeMerges(spark, dir) == extended,
      "a reader crossed the torn merges/fertility window")
    assert(TextOps.loadTokenizerFertility(spark, dir).collect()
      .map(_.toSeq).toSet == fertBefore)
    // the completed mutation (replayed extend, same delta = vocab no-op
    // but fresh retrain + snapshot) adopts the latest consistent pair
    TextOps.extendTokenizer(b, dir, "crawl-b", k)
    assert(TextOps.loadBpeMerges(spark, dir) == extended,
      "the replayed extend must restore the k-merge bundle over the torn row")
    // PINNED vocab read (r11): a newer crawl's counts merged in WITHOUT
    // a retrain — the audit read stays on the counts the served merges
    // trained on, while the retrain's read sees everything
    val pinnedCounts = TextOps.loadBpeVocabPinned(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    TextOps.commitBpeVocab(
      Seq((99L, "zz zz zz")).toDF("doc_id", "text"), dir, "crawl-c-counts-only")
    assert(TextOps.loadBpeVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap.get("zz").contains(3L),
      "the retrain read must see the new crawl's counts")
    assert(TextOps.loadBpeVocabPinned(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq == pinnedCounts,
      "the pinned read must stay on the counts the served merges trained on")
    graft.GraftCache.releaseAll(spark)
  }

  test("tokenizer bundle BYTE mode: one committed unit serves char AND byte models; extend retrains both as train(union); byte fertility rides the committed byte merges (r13)") {
    import spark.implicits._
    graft.GraftCache.releaseAll(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-tok-bytes").toString
    val k = 24
    TextOps.commitTokenizer(a, dir, "crawl-a", k)
    // ONE bundle, TWO models: the byte merges equal a fresh byte train
    val servedB = TextOps.loadBpeMergesBytes(spark, dir)
    graft.GraftCache.releaseAll(spark)
    val freshB = TextOps.bpeTrainBytes(a.select("doc_id", "text"), k).collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(servedB == freshB, "bundle byte merges must equal a fresh byte train")
    assert(TextOps.loadBpeMerges(spark, dir) != servedB,
      "char and byte models are genuinely distinct symbol alphabets")
    // byte fertility was measured WITH the committed byte merges
    val filedFertB = TextOps.loadTokenizerFertilityBytes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val liveFertB = TextOps.fertilityBytesWith(a, servedB).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(filedFertB == liveFertB,
      "committed byte fertility must ride the committed byte merges")
    // extend retrains BOTH models to train(union)
    graft.GraftCache.releaseAll(spark)
    TextOps.extendTokenizer(b, dir, "crawl-b", k)
    val extendedB = TextOps.loadBpeMergesBytes(spark, dir)
    graft.GraftCache.releaseAll(spark)
    val freshUnionB = TextOps.bpeTrainBytes(docs.select("doc_id", "text"), k)
      .collect().map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    assert(extendedB == freshUnionB,
      "extend∘train must equal train(union) for the byte model too")
    // the streaming byte encode serves the committed byte model
    val viaBundle = EventStream
      .streamingBpeEncodeBytesBundle(b.select("doc_id", "text"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val viaFresh = TextOps.bpeEncodeBytesWith(b.select("doc_id", "text"), freshUnionB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaBundle == viaFresh,
      "the streaming byte encode must match the in-session union encoder")
    // a char-only bundle refuses the byte serve loudly
    val dirChar = java.nio.file.Files.createTempDirectory("graft-tok-char").toString
    TextOps.commitTokenizer(a, dirChar, "crawl-a", k, byteMode = false)
    intercept[IllegalArgumentException] {
      EventStream.streamingBpeEncodeBytesBundle(b.select("doc_id", "text"), dirChar)
    }
    graft.GraftCache.releaseAll(spark)
  }
}
