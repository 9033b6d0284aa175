package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot_long(a,
  * b) …")` works next to the Column API. Activate with
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[Exprs.type].getName, null, name, usage, "", "", "",
      "", "4.0.0", "", "scala_udf")

  /** Evaluate a parameter that must be a literal integer (e.g. shingle
    * width). A non-foldable expression would otherwise be eval'd against
    * no input row and die with an opaque NPE/ClassCastException; fail
    * with a message that names the contract instead.
    */
  private def literalString(fn: String, param: String, e: Expression): String = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: $param must be a literal string, got non-foldable expression ${e.sql}")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal string, got $other")
    }
  }

  private def literalInt(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: $param must be a literal integer, got non-foldable expression ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal integer, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_long"),
      info("graft_dot_long", "graft_dot_long(a, b) - exact integer dot product of two bigint arrays"),
      (args: Seq[Expression]) => Exprs.DotLong(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      info("graft_hamming", "graft_hamming(a, b) - hamming distance between two strings"),
      (args: Seq[Expression]) => Exprs.HammingStr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(shingles) - 64-bit simhash of a string array as a bit string"),
      (args: Seq[Expression]) => Exprs.SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, w) - distinct w-token shingles, first-occurrence order"),
      (args: Seq[Expression]) => Exprs.Shingles(args(0),
        literalInt("graft_shingles", "w", args(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_min_k"),
      info("graft_min_k", "graft_min_k(v, k) - aggregate: the k smallest bigint values, sorted ascending"),
      (args: Seq[Expression]) => Exprs.MinKLong(args(0),
        literalInt("graft_min_k", "k", args(1))).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_max_k_scored"),
      info("graft_max_k_scored",
        "graft_max_k_scored(score, id, k) - aggregate: the k (score double, id bigint) pairs with highest score (ties: smaller id), best-first"),
      (args: Seq[Expression]) => Exprs.MaxKScored(args(0), args(1),
        literalInt("graft_max_k_scored", "k", args(2))).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "graft_ngrams(tokens, w) - ALL w-token grams in order (non-distinct sibling of graft_shingles)"),
      (args: Seq[Expression]) => Exprs.Ngrams(args(0),
        literalInt("graft_ngrams", "w", args(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
        "graft_heavy_hitters(v, k) - aggregate: Misra-Gries summary (k counters) as array<struct<token,est_cnt>>; superset of items with freq > N/k, estimates undercount by at most N/k"),
      (args: Seq[Expression]) => Exprs.MisraGries(args(0),
        literalInt("graft_heavy_hitters", "k", args(1))).toAggregateExpression()))
    // Spark ships Bloom-filter expressions for its own runtime filters
    // but does not SQL-register them; surface them for the semi-join
    // pruning operators (Sketches.dedupIncrementalBloom). Both are
    // codegen'd natives — no UDF in the membership hot path.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(xxhash64(col), estimatedItems, numBits) - aggregate: serialized Bloom filter over the hashed input"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, xxhash64(col)) - Bloom membership probe (false => definitely absent)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5bucket"),
      info("graft_md5bucket",
        "graft_md5bucket(str, salt, mod) - hashing-trick bucket: first 4 md5(salt || str) bytes as uint32, mod `mod`; value-identical to the portable hexPrefixVal SQL chain"),
      (args: Seq[Expression]) => Exprs.Md5BucketMod(args(0),
        literalString("graft_md5bucket", "salt", args(1)),
        literalInt("graft_md5bucket", "mod", args(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(shingles, k) - k-permutation minhash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh) => Exprs.MinHashSig(sh, 8)
        case Seq(sh, k) => Exprs.MinHashSig(sh,
          literalInt("graft_minhash_sig", "k", k))
      }))
  }
}
