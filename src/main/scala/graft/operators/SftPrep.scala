package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Post-training (SFT/DPO/code-infill) data preparation — the stages
  * between a curated pretraining corpus and an instruction-tuning run
  * (SURVEY.md §2 C97–C99). Everything here is a pure map-side
  * projection or one bounded catalog-keyed aggregate: at 100 TB these
  * run at scan speed next to the curation gates, and none of them ever
  * needs a window.
  *
  * Corpus note: the synthetic documents table holds prose, not chat
  * transcripts or code, so the transcript-shaped inputs are PLANTED
  * deterministically from each doc's own tokens (the C60/C95
  * convention) — the parsers face the oracle codepoint-for-codepoint.
  */
object SftPrep {

  private val toks: Column = split(col("text"), " ")

  // ----------------------- C97: dialog-turn parsing (SFT transcripts)

  /** Planted chat transcript: the doc's tokens in four contiguous
    * chunks under a system/user/assistant/user role cycle, one
    * `role: content` line per turn — the line-oriented chat-log shape
    * SFT corpora arrive in before they become structured turns.
    */
  private[graft] def plantedTranscript: Column = {
    // Column `/` is DOUBLE division — integral cuts need explicit
    // floors to mirror the oracle's `//`
    val n = size(toks)
    def cut(i: Int): Column = floor(n * i / 4).cast("int")
    def chunk(i: Int): Column = array_join(
      slice(toks, cut(i) + 1, cut(i + 1) - cut(i)), " ")
    concat(
      lit("system: "), chunk(0), lit("\n"),
      lit("user: "), chunk(1), lit("\n"),
      lit("assistant: "), chunk(2), lit("\n"),
      lit("user: "), chunk(3), lit("\n"))
  }

  private[graft] val plantedTranscriptSql: String = {
    def chunk(i: Int) =
      s"array_to_string(tk[(n * $i // 4) + 1:(n * ${i + 1} // 4)], ' ')"
    s"""'system: ' || ${chunk(0)} || chr(10) ||
       |'user: ' || ${chunk(1)} || chr(10) ||
       |'assistant: ' || ${chunk(2)} || chr(10) ||
       |'user: ' || ${chunk(3)} || chr(10)""".stripMargin
  }

  /** C97: parse line-oriented chat transcripts into structured turns —
    * (doc_id, turn_idx, role, n_words, content_md5): one row per
    * `role: content` line, roles restricted to the chat alphabet
    * (anything else is content damage and surfaces as role 'invalid'
    * rather than silently merging into a neighbor turn). Pure split +
    * explode + string ops; zero shuffles.
    */
  def dialogTurns(documents: DataFrame, transcript: Column): DataFrame =
    documents
      .select(col("doc_id"), transcript.as("tr"))
      .select(col("doc_id"),
        posexplode(filter(split(col("tr"), "\n"), l => l =!= lit("")))
          .as(Seq("turn_idx", "line")))
      .select(
        col("doc_id"), col("turn_idx").cast("long").as("turn_idx"),
        when(regexp_extract(col("line"), "^(system|user|assistant): ", 1) =!= "",
          regexp_extract(col("line"), "^(system|user|assistant): ", 1))
          .otherwise(lit("invalid")).as("role"),
        regexp_replace(col("line"), "^(system|user|assistant): ", "").as("content"))
      .select(col("doc_id"), col("turn_idx"), col("role"),
        size(filter(split(col("content"), " "), w => w =!= lit("")))
          .cast("long").as("n_words"),
        md5(col("content")).as("content_md5"))

  /** The C97 parse as a reusable CTE chain ending in
    * `turns(doc_id, turn_idx, role, n_words, content_md5)` — spliced
    * (never copied) into every oracle that consumes parsed turns
    * (C97/C101/C101b), the [[Dedup.candSqlCte]] discipline.
    */
  private val dialogTurnsCtes: String =
    s"""b AS (SELECT doc_id, string_split(text, ' ') AS tk,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
       |m AS (SELECT doc_id, $plantedTranscriptSql AS tr FROM b),
       |l AS (SELECT doc_id, u.i AS i, u.s AS line FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
       |    i -> struct_pack(i := i, s := ls[i]))) AS u
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(tr, chr(10)), x -> x <> '') AS ls
       |        FROM m))),
       |p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS turn_idx,
       |  regexp_extract(line, '^(system|user|assistant): ', 1) AS tag,
       |  regexp_replace(line, '^(system|user|assistant): ', '') AS content
       |  FROM l),
       |turns AS (SELECT doc_id, turn_idx,
       |  CASE WHEN tag <> '' THEN tag ELSE 'invalid' END AS role,
       |  CAST(len(list_filter(string_split(content, ' '), w -> w <> ''))
       |    AS BIGINT) AS n_words,
       |  md5(content) AS content_md5
       |FROM p)""".stripMargin

  val dialogTurnsSql: String =
    s"""WITH $dialogTurnsCtes
       |SELECT doc_id, turn_idx, role, n_words, content_md5 FROM turns""".stripMargin

  // ------------- C101: chat templating + loss masking (r13)

  /** C101: the step between parsed turns (C97) and packed sequences
    * (C25) — render each turn under the chat template and emit its
    * TOKEN SPAN plus the loss mask: a turn occupies n_words + 2
    * template tokens (role-open tag, content, end tag), spans are
    * half-open [span_start, span_end) offsets into the doc's templated
    * sequence, and only ASSISTANT turns train — n_train_tokens =
    * content + end tag (the standard SFT masking rule: the model
    * learns to produce the reply and to stop, never to parrot the
    * prompt). Turns the parser flagged 'invalid' train NOTHING — damage
    * must not leak into the loss.
    *
    * Scale: the running offset is a window PARTITIONED BY doc_id
    * (conversation-sized partitions — a few turns each — never a
    * corpus-wide ordering); everything else is a projection.
    */
  def chatTemplate(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .select(col("doc_id"), col("turn_idx"), col("role"),
        (col("n_words") + 2L).as("n_tok"),
        when(col("role") === "assistant", col("n_words") + 1L)
          .otherwise(lit(0L)).as("n_train_tokens"))
      .withColumn("span_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("turn_idx"), col("role"),
        (col("span_end") - col("n_tok")).as("span_start"),
        col("span_end"), col("n_train_tokens"))
  }

  val chatTemplateSql: String =
    s"""WITH $dialogTurnsCtes,
       |sp AS (SELECT doc_id, turn_idx, role,
       |  n_words + 2 AS n_tok,
       |  CASE WHEN role = 'assistant' THEN n_words + 1 ELSE 0 END AS n_train
       |  FROM turns),
       |c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY doc_id
       |    ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_end
       |  FROM sp)
       |SELECT doc_id, turn_idx, role,
       |  CAST(span_end - n_tok AS BIGINT) AS span_start, span_end,
       |  CAST(n_train AS BIGINT) AS n_train_tokens
       |FROM c""".stripMargin

  /** C101b: the end-to-end SFT batch pipeline in ONE plan — the C28
    * convention applied to post-training: parse transcripts (C97) →
    * template + mask (C101) → pack whole conversations into token-
    * budget bins per (lang, shard) stream (C25's fill rule). Each bin
    * row carries n_train_tokens next to n_tokens — the number the loss
    * actually sees, which is what an SFT run provisions by. Only
    * doc_id-keyed joins, conversation-sized windows, one bounded
    * per-shard running sum, one per-bin agg.
    */
  def sftBatches(documents: DataFrame, budget: Long = 512L,
                 shards: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nShards = TextOps.resolvedShards(documents, shards)
    val perDoc = chatTemplate(dialogTurns(documents, plantedTranscript))
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start")).as("n_tok"),
        sum(col("n_train_tokens")).as("n_train"))
      .join(documents.select("doc_id", "lang"), "doc_id")
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDoc
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin_id", expr(s"(cum_tok - n_tok) DIV $budget"))
      .groupBy("lang", "shard", "bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_train")).as("n_train_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val sftBatchesSql: String =
    s"""WITH $dialogTurnsCtes,
       |docs AS (SELECT doc_id,
       |  CAST(sum(n_words + 2) AS BIGINT) AS n_tok,
       |  CAST(sum(CASE WHEN role = 'assistant' THEN n_words + 1 ELSE 0 END)
       |    AS BIGINT) AS n_train
       |  FROM turns GROUP BY doc_id),
       |j AS (SELECT docs.doc_id, docs.n_tok, docs.n_train, d.lang,
       |  docs.doc_id % 32 AS shard
       |  FROM docs JOIN documents d ON docs.doc_id = d.doc_id),
       |c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang, shard
       |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM j)
       |SELECT lang, shard, (cum_tok - n_tok) // 512 AS bin_id,
       |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_train) AS BIGINT) AS n_train_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY lang, shard, bin_id""".stripMargin

  // --------------------- C98: preference-pair construction (DPO prep)

  /** C98: best-vs-worst preference pairs per stratum — the synthetic-
    * preference construction DPO-style data pipelines run when human
    * labels are scarce: within each language, the highest-quality doc
    * (C9's score) is `chosen` and the lowest `rejected`, ties broken by
    * smaller doc_id. Both ends are ONE bounded struct-extreme hash
    * aggregate per stratum (the C46 argmax discipline — no rank window
    * over the corpus, partial-agg friendly, skew-immune: the hot
    * stratum contributes one partial row per task). Margin is a
    * subtraction of two cross-engine bit-identical doubles.
    */
  def preferencePairs(documents: DataFrame): DataFrame =
    TextOps.qualityScore(documents).select("doc_id", "quality")
      .join(documents.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(
        max(struct(col("quality").as("q"), (-col("doc_id")).as("nd"))).as("cm"),
        min(struct(col("quality").as("q"), col("doc_id").as("d"))).as("rm"))
      .select(col("lang"),
        (-col("cm.nd")).as("chosen_id"), col("cm.q").as("chosen_q"),
        col("rm.d").as("rejected_id"), col("rm.q").as("rejected_q"),
        (col("cm.q") - col("rm.q")).as("margin"))

  val preferencePairsSql: String =
    s"""WITH qs AS (${TextOps.qualityScoreSql}),
       |j AS (SELECT qs.doc_id, qs.quality, d.lang
       |      FROM qs JOIN documents d ON qs.doc_id = d.doc_id),
       |a AS (SELECT lang,
       |  max({'q': quality, 'nd': -doc_id}) AS cm,
       |  min({'q': quality, 'd': doc_id}) AS rm
       |  FROM j GROUP BY 1)
       |SELECT lang,
       |  CAST(-((cm).nd) AS BIGINT) AS chosen_id, (cm).q AS chosen_q,
       |  (rm).d AS rejected_id, (rm).q AS rejected_q,
       |  (cm).q - (rm).q AS margin
       |FROM a""".stripMargin

  // ------------------------- C99: fill-in-the-middle (code infilling)

  /** C99: FIM/PSM transformation (Bavarian et al. 2022 — the code-LLM
    * pretraining transform): each document splits at the two
    * deterministic third-points into prefix/middle/suffix, re-emitted
    * in PSM order (`<fim_prefix>P<fim_suffix>S<fim_middle>M`) so the
    * model learns to infill. Split points are pure integer arithmetic
    * on the token count (no randomness — the engine-side contract is
    * the transform; production randomizes the cut upstream by salting
    * doc_id). Map-side only; output carries the section lengths and
    * the transformed text's md5 so the oracle hash-compares the full
    * reassembly.
    */
  def fimSplit(documents: DataFrame): DataFrame = {
    val n = size(toks)
    // floor-div cuts (Column `/` is double division)
    val cut1 = floor(n / 3).cast("int")
    val cut2 = floor(n * 2 / 3).cast("int")
    val prefix = slice(toks, lit(1), cut1)
    val middle = slice(toks, cut1 + 1, cut2 - cut1)
    val suffix = slice(toks, cut2 + 1, n - cut2)
    documents.select(
      col("doc_id"),
      size(prefix).cast("long").as("n_prefix"),
      size(middle).cast("long").as("n_middle"),
      size(suffix).cast("long").as("n_suffix"),
      md5(concat(
        lit("<fim_prefix>"), array_join(prefix, " "),
        lit("<fim_suffix>"), array_join(suffix, " "),
        lit("<fim_middle>"), array_join(middle, " "))).as("psm_md5"))
  }

  val fimSplitSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
      |c AS (SELECT doc_id, tk, n, n // 3 AS c1, n * 2 // 3 AS c2 FROM t)
      |SELECT doc_id,
      |  CAST(len(tk[1:c1]) AS BIGINT) AS n_prefix,
      |  CAST(len(tk[c1 + 1:c2]) AS BIGINT) AS n_middle,
      |  CAST(len(tk[c2 + 1:n]) AS BIGINT) AS n_suffix,
      |  md5('<fim_prefix>' || array_to_string(tk[1:c1], ' ') ||
      |      '<fim_suffix>' || array_to_string(tk[c2 + 1:n], ' ') ||
      |      '<fim_middle>' || array_to_string(tk[c1 + 1:c2], ' ')) AS psm_md5
      |FROM c""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dialog_turns" -> ((s, d) =>
      dialogTurns(Tables.documents(s, d), plantedTranscript)),
    "q_preference_pairs" -> ((s, d) => preferencePairs(Tables.documents(s, d))),
    "q_fim_split" -> ((s, d) => fimSplit(Tables.documents(s, d))),
    "q_chat_template" -> ((s, d) =>
      chatTemplate(dialogTurns(Tables.documents(s, d), plantedTranscript))),
    "q_sft_batches" -> ((s, d) =>
      sftBatches(Tables.documents(s, d), shards = 32)))

  def oracle: Map[String, String] = Map(
    "q_dialog_turns" -> dialogTurnsSql,
    "q_preference_pairs" -> preferencePairsSql,
    "q_fim_split" -> fimSplitSql,
    "q_chat_template" -> chatTemplateSql,
    "q_sft_batches" -> sftBatchesSql)
}
