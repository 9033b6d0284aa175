package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the pure kernels whose correctness rests on
  * an analytic argument rather than an oracle:
  *
  *  - the BPE re-segmentation fold (TextOps.bpeTrain): the delimited
  *    string left-fold (merge = append `r` without a separator) equals
  *    greedy left-to-right BPE pair merging — fuzzed against a direct
  *    scan-merge reference over multi-character symbols, self-pairs
  *    (a,a) (where a string-replace formulation provably under-merges),
  *    and symbols that embed other symbols as substrings;
  *  - the MP4 atom walk (Multimodal.parseMp4Meta): never throws and
  *    never loops on arbitrary or adversarially box-shaped bytes.
  */
object BpeFoldProps extends Properties("bpe.greedyFold") {

  private val Sep = "\u001f"

  /** Reference semantics: greedy left-to-right merge of (l, r). */
  private def greedyMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** The PRODUCTION kernel (Exprs.bpeMergeGreedy — the codegen'd
    * single-pass merge behind TextOps.bpeTrain/bpeEncode), driven
    * through the same ␟-wrapped string format the operators use.
    */
  private def foldMerge(syms: List[String], l: String, r: String): List[String] = {
    val seg = org.apache.spark.unsafe.types.UTF8String.fromString(
      Sep + syms.mkString(Sep) + Sep)
    graft.functions.Exprs.bpeMergeGreedy(seg, l, r)
      .toString.split(Sep).toList.filter(_.nonEmpty)
  }

  // symbols shaped like real BPE rounds produce: single chars plus
  // merged runs, including symbols that CONTAIN other symbols and the
  // self-pair cases where a naive string-replace formulation
  // under-merges (aaaaaa -> 2 merges instead of greedy's 3)
  private val symbolGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "ab", "ba", "aa", "bb", "aab", "abab")

  private val symsGen: Gen[List[String]] = Gen.listOfN(12, symbolGen)

  property("fold == greedy merge, any symbols, any pair (incl. self-pairs)") =
    forAll(symsGen, symbolGen, symbolGen) { (syms, l, r) =>
      foldMerge(syms, l, r) == greedyMerge(syms, l, r)
    }

  property("self-pair runs of every length collapse exactly like greedy") =
    forAll(Gen.choose(0, 11), symbolGen) { (n, x) =>
      val syms = List.fill(n)(x)
      foldMerge(syms, x, x) == greedyMerge(syms, x, x)
    }

  property("output stays \u001f-wrapped (later rounds match token-final pairs)") =
    forAll(symsGen, symbolGen, symbolGen) { (syms, l, r) =>
      val out = graft.functions.Exprs.bpeMergeGreedy(
        org.apache.spark.unsafe.types.UTF8String.fromString(Sep + syms.mkString(Sep) + Sep),
        l, r).toString
      out.startsWith(Sep) && out.endsWith(Sep)
    }

  property("identity when the pair never occurs adjacently") =
    forAll(symsGen) { syms =>
      foldMerge(syms, "z", "q") == syms // z/q never generated
    }
}

object Mp4WalkProps extends Properties("mp4.parse") {

  import graft.operators.Multimodal

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  /** Adversarial generator: well-formed box HEADERS with hostile sizes
    * over garbage bodies — the shape that trips naive walkers.
    */
  private val boxyBytes: Gen[Array[Byte]] = {
    val types = Gen.oneOf("ftyp", "moov", "mvhd", "trak", "tkhd", "hdlr",
      "mdia", "free", "mdat")
    val box = for {
      t <- types
      size <- Gen.oneOf(Gen.choose(0L, 64L), Gen.const(1L),
        Gen.const(0L), Gen.const(0xffffffffL), Gen.const(0x7fffffffL))
      bodyLen <- Gen.choose(0, 40)
      body <- Gen.listOfN(bodyLen, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield {
      val b = new java.io.ByteArrayOutputStream()
      b.write(((size >> 24) & 0xff).toInt); b.write(((size >> 16) & 0xff).toInt)
      b.write(((size >> 8) & 0xff).toInt); b.write((size & 0xff).toInt)
      b.write(t.getBytes("US-ASCII"))
      body.foreach(x => b.write(x.toInt))
      b.toByteArray
    }
    Gen.listOfN(6, box).map(_.toArray.flatten)
  }

  property("never throws on random bytes") = forAll(rawBytes) { bytes =>
    Multimodal.parseMp4Meta(bytes) // Option either way; a throw fails the prop
    true
  }

  property("never throws on adversarial box structures") = forAll(boxyBytes) { bytes =>
    Multimodal.parseMp4Meta(bytes)
    true
  }

  property("parsed metadata is internally consistent") = forAll(boxyBytes) { bytes =>
    Multimodal.parseMp4Meta(bytes).forall { case (_, dur, nt, nv, na, w, h) =>
      dur >= 0.0 && nt >= 0 && nv >= 0 && na >= 0 && nv + na <= nt &&
        w.forall(_ > 0) && h.forall(_ > 0)
    }
  }
}

/** The codec-roundtrip dedup kernels (ImageDedup.phash64,
  * AudioDedup.fingerprint64) must QUARANTINE, never throw, on arbitrary
  * bytes and on corrupted-but-plausible payloads — they run inside
  * mapPartitions over crawl data, where one throwing row fails the
  * task. Corruption generators flip bytes inside REAL encoded payloads
  * so the codec parsers see valid magic numbers with broken interiors.
  */
object CodecQuarantineProps extends org.scalacheck.Properties("codec.quarantine") {
  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll
  import graft.operators.{AudioDedup, ImageDedup}

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  private def corrupted(valid: Array[Byte]): Gen[Array[Byte]] = for {
    nFlips <- Gen.choose(1, 12)
    flips <- Gen.listOfN(nFlips, for {
      pos <- Gen.choose(0, valid.length - 1)
      v <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (pos, v))
  } yield {
    val out = valid.clone()
    flips.foreach { case (p, v) => out(p) = v }
    out
  }

  // one real payload of each kind, generated through the production
  // encoders (driver-side, no Spark session needed)
  private val validPng: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImageDedup.ImgDim, ImageDedup.ImgDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until ImageDedup.ImgDim; x <- 0 until ImageDedup.ImgDim) {
      val v = ImageDedup.pixelValue(7L, x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private val validWav: Array[Byte] = {
    val pcm = new Array[Byte](AudioDedup.NumSamples * 2)
    for (t <- 0 until AudioDedup.NumSamples) {
      val amp = AudioDedup.blockAmp(7L, t / AudioDedup.BlockLen) * AudioDedup.AmpUnit
      val s = (if (t % 2 == 0) amp else -amp).toShort
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, AudioDedup.NumSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  property("phash64 never throws on random bytes") = forAll(rawBytes) { bs =>
    ImageDedup.phash64(bs); true
  }
  property("phash64 never throws on corrupted PNGs; intact PNG still hashes") =
    forAll(corrupted(validPng)) { bs =>
      ImageDedup.phash64(bs) // Option either way
      Prop(ImageDedup.phash64(validPng).exists(_.length == 64))
    }
  property("fingerprint64 never throws on random bytes") = forAll(rawBytes) { bs =>
    AudioDedup.fingerprint64(bs); true
  }
  property("fingerprint64 never throws on corrupted WAVs; intact WAV still hashes") =
    forAll(corrupted(validWav)) { bs =>
      AudioDedup.fingerprint64(bs)
      Prop(AudioDedup.fingerprint64(validWav).exists(_.length == 64))
    }

  private val validAvi: Array[Byte] = {
    import graft.operators.VideoDedup
    val frames = Array.tabulate(VideoDedup.FrameCount) { f =>
      Array.tabulate(VideoDedup.Dim * VideoDedup.Dim)(
        i => VideoDedup.pixelValue(7L, f, i % VideoDedup.Dim, i / VideoDedup.Dim))
    }
    VideoDedup.encodeAvi(frames, VideoDedup.Dim, VideoDedup.Dim)
  }
  property("vhash64 never throws on random bytes") = forAll(rawBytes) { bs =>
    graft.operators.VideoDedup.vhash64(bs); true
  }
  property("vhash64 never throws on corrupted AVIs; intact AVI still hashes") =
    forAll(corrupted(validAvi)) { bs =>
      graft.operators.VideoDedup.vhash64(bs)
      Prop(graft.operators.VideoDedup.vhash64(validAvi).exists(_.length == 64))
    }
}

/** The DSIR ratio kernel (Dsir.lrOf): the int64-fit bound, sign, and
  * monotonicity are ANALYTIC claims the operator's exactness rests on —
  * fuzzed over count shapes far past any real corpus (ct ≤ cr ≤ nr up
  * to 10¹⁵, raw/target ratios up to 10⁹).
  */
object DsirRatioProps extends Properties("dsir.lrOf") {
  import graft.operators.Dsir

  private val counts: Gen[(Long, Long, Long, Long)] = for {
    nt <- Gen.chooseNum(1L, 1000000000000000L) // target features, to 10^15
    ratio <- Gen.chooseNum(1L, 1000000000L)    // raw/target ratio, to 10^9
    nr0 = BigInt(nt) * ratio
    nr = if (nr0.isValidLong) nr0.toLong else Long.MaxValue / 2
    ct <- Gen.chooseNum(0L, nt)
    crMin = ct                                  // target ⊆ raw: cr >= ct
    cr <- Gen.chooseNum(crMin, math.max(crMin, math.min(nr, crMin + 1000000000L)))
  } yield (ct, cr, nt, nr)

  property("never negative and fits the analytic bound Scale*(Nr+B)/(Nt+B)") =
    forAll(counts) { case (ct, cr, nt, nr) =>
      val lr = Dsir.lrOf(ct, cr, BigInt(nt), BigInt(nr))
      val bound = BigInt(Dsir.Scale) * (BigInt(nr) + Dsir.NumBuckets) /
        (BigInt(nt) + Dsir.NumBuckets)
      Prop(lr >= 0L) && Prop(BigInt(lr) <= bound)
    }

  property("monotone in the target count at fixed raw count") =
    forAll(counts) { case (ct, cr, nt, nr) =>
      (ct + 1 <= cr) ==> {
        Prop(Dsir.lrOf(ct + 1, cr, BigInt(nt), BigInt(nr)) >=
          Dsir.lrOf(ct, cr, BigInt(nt), BigInt(nr)))
      }
    }

  property("antitone in the raw count at fixed target count") =
    forAll(counts) { case (ct, cr, nt, nr) =>
      Prop(Dsir.lrOf(ct, cr + 1, BigInt(nt), BigInt(nr)) <=
        Dsir.lrOf(ct, cr, BigInt(nt), BigInt(nr)))
    }
}

/** The driver-side BPE trainer (TextOps.bpeTrainDriver): its
  * incremental pair-count bookkeeping (subtract a touched word's old
  * adjacencies, add its merged ones; stale-tolerant occurrence index)
  * must equal a from-scratch per-round recount — including overlapping
  * self-pair runs, frequency weighting, the UTF-8 tie-break, and the
  * subtle case where a previously-merged pair RE-FORMS after a later
  * round mints its right symbol anew.
  */
object BpeTrainProps extends Properties("bpe.trainDriver") {
  import graft.operators.TextOps
  import scala.math.Ordering.Implicits._

  // a tiny alphabet forces dense pair collisions, ties, and re-forming
  // pairs; the astral symbol exercises the UTF-8-vs-UTF-16 collation
  private val sym: Gen[String] = Gen.oneOf("a", "b", "c", "😀")
  private val word: Gen[Array[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, sym).map(_.toArray))
  private val vocabGen: Gen[Array[(Array[String], Long)]] = for {
    n <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(n, word)
    cs <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
  } yield ws.zip(cs).toArray

  private def u8(s: String): Seq[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq.map(_ & 0xff)

  private def mergeGreedy(w: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == l && w(i + 1) == r) { out += l + r; i += 2 }
      else { out += w(i); i += 1 }
    }
    out.result()
  }

  /** From-scratch reference: recount every pair every round. */
  private def reference(vocab: Array[(Array[String], Long)], k: Int)
      : IndexedSeq[(Int, String, String, String, Long)] = {
    var words = vocab.map(_._1)
    val cnts = vocab.map(_._2)
    val out = IndexedSeq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, wi) <- words.zipWithIndex; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + cnts(wi)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, u8(l), u8(r)) }
        out += ((round, l, r, l + r, n))
        words = words.map(mergeGreedy(_, l, r))
        round += 1
      }
    }
    out.result()
  }

  property("incremental trainer == from-scratch per-round reference") =
    forAll(vocabGen, Gen.chooseNum(1, 12)) { (vocab, k) =>
      val got = TextOps.bpeTrainDriver(vocab.map { case (w, c) => (w.clone, c) }, k)
      val want = reference(vocab.map { case (w, c) => (w.clone, c) }, k)
      Prop(got == want) :| s"got=$got want=$want"
    }

  // the r10 vocab floor's safety base case: words that contribute no
  // adjacency (single-symbol, any count) can never influence a merge —
  // so a floor that only ever drops such words is exactly the identity
  property("pairless words never affect the merge sequence") =
    forAll(vocabGen, Gen.listOf(sym), Gen.chooseNum(1, 12)) { (vocab, noise, k) =>
      val noisy = vocab ++ noise.map(s => (Array(s), 1L))
      val got = TextOps.bpeTrainDriver(noisy.map { case (w, c) => (w.clone, c) }, k)
      val want = TextOps.bpeTrainDriver(vocab.map { case (w, c) => (w.clone, c) }, k)
      Prop(got == want) :| s"noise=${noise.mkString("|")}"
    }
}

/** The WARC splitter (sources.Warc.parseRecords): never-throws /
  * never-loops on arbitrary bytes, and writer∘splitter == identity for
  * ADVERSARIAL payloads — including payloads embedding the record magic
  * and blank lines, which is exactly what defeats delimiter splitting
  * and what Content-Length framing exists to survive.
  */
object WarcProps extends Properties("warc.parseRecords") {
  import graft.sources.Warc

  private val rawBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  private val hostilePayload: Gen[Array[Byte]] = for {
    pre <- rawBytes
    mid <- Gen.oneOf("WARC/1.0\r\n", "\r\n\r\n", "Content-Length: 0\r\n\r\n",
      "WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    post <- rawBytes
  } yield pre ++ mid.getBytes("UTF-8") ++ post

  property("never throws on random bytes") = forAll(rawBytes) { bs =>
    Warc.parseRecords(bs); true
  }

  property("roundtrip == identity, even with magic/blank-lines inside payloads") =
    forAll(Gen.listOfN(3, hostilePayload)) { payloads =>
      val recs = payloads.zipWithIndex.map { case (p, i) => (s"https://x/$i", p) }
      val parsed = Warc.parseRecords(Warc.encodeFile(recs))
      Prop(parsed.length == recs.length) && Prop(
        parsed.zip(recs).forall { case (got, (uri, p)) =>
          got.headers.contains("WARC-Target-URI" -> uri) &&
            java.util.Arrays.equals(got.payload, p)
        })
    }

  property("near-Int.MaxValue Content-Length: skipped via resync, no overflow throw") =
    forAll(Gen.oneOf("2147483600", "2147483647", s"${Int.MaxValue - 6}"),
      hostilePayload) { (hugeLen, p) =>
      // p(record start) + len + 4 wraps negative in Int arithmetic, so a
      // 32-bit bounds check would pass and copyOfRange would throw —
      // breaking the never-throws resync contract. The Long-arithmetic
      // check must reject the record and still find the intact one after.
      val evil = ("WARC/1.0\r\nWARC-Target-URI: https://x/evil\r\n" +
        s"Content-Length: $hugeLen\r\n\r\n").getBytes("UTF-8") ++
        "tiny actual payload".getBytes("UTF-8")
      val blob = evil ++ Warc.encodeRecord("https://x/ok", p)
      val hits = Warc.parseRecords(blob).filter(
        _.headers.contains("WARC-Target-URI" -> "https://x/ok"))
      Prop(hits.exists(h => java.util.Arrays.equals(h.payload, p)))
    }

  property("garbage prefix/suffix never hides the intact records between them") =
    forAll(rawBytes, rawBytes, hostilePayload) { (pre, post, p) =>
      val blob = pre ++ Warc.encodeRecord("https://x/ok", p) ++ post
      val hits = Warc.parseRecords(blob).filter(
        _.headers.contains("WARC-Target-URI" -> "https://x/ok"))
      // the record is still found (garbage may parse as extra records,
      // never fewer) and its payload survives byte-for-byte
      Prop(hits.exists(h => java.util.Arrays.equals(h.payload, p)))
    }
}

/** The C75 repair heuristic must never throw, must reverse the real
  * UTF-8→Latin-1 misdecode (once and twice), and must be the identity
  * on text that is already a repair fixpoint — fuzzing across ASCII,
  * Latin-1, CJK and supplementary-plane content, the populations where
  * a too-eager heuristic would corrupt clean text.
  */
object MojibakeProps extends Properties("mojibake.fix") {
  import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.Exprs

  private val expr = Exprs.FixMojibake(
    org.apache.spark.sql.catalyst.expressions.Literal("x"))
  private def fix(s: String): String =
    expr.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[UTF8String].toString
  private def mangle(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)
  // repair-stable form of an arbitrary string (fix is a contraction to
  // its own fixpoint within the round cap for <=2-mangled inputs)
  private def fixpoint(s: String): String = {
    var cur = s; var i = 0
    while (i < 6) { val n = fix(cur); if (n == cur) i = 6 else { cur = n; i += 1 } }
    cur
  }

  private val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar,
    Gen.oneOf(' ', '.', ','),
    Gen.choose(0xa0.toChar, 0xff.toChar),            // Latin-1 letters
    Gen.choose(0x4e00.toChar, 0x4eff.toChar),        // CJK
    Gen.const('\uD83D'), Gen.const('\uDE00')         // loose surrogates too
  )).map(_.mkString)

  private val cleanText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '.'),
    Gen.oneOf('é', 'ï', 'ñ', 'ü', '中')
  )).map(_.mkString)

  property("never throws, never nulls, on arbitrary UTF-16 content") =
    forAll(anyText) { s => fix(s) != null }

  property("single and double misdecodes reverse to the repair fixpoint") =
    forAll(cleanText) { s0 =>
      val c = fixpoint(s0)
      Prop(fix(mangle(c)) == c && fix(mangle(mangle(c))) == c)
    }

  property("identity on repair fixpoints (no false repair)") =
    forAll(cleanText) { s0 =>
      val c = fixpoint(s0)
      Prop(fix(c) == c)
    }

  property("idempotent within the round cap on <=2-mangled inputs") =
    forAll(cleanText, Gen.choose(0, 2)) { (s0, k) =>
      val s = (0 until k).foldLeft(fixpoint(s0))((a, _) => mangle(a))
      Prop(fix(fix(s)) == fix(s))
    }

  property("pure ASCII is untouched") =
    forAll(Gen.asciiPrintableStr) { s => Prop(fix(s) == s) }
}
