package graft.ops

import graft.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-training-data operators over `documents` / `embeddings`
  * (SURVEY.md §2b north-star extension): dedup, similarity search, text
  * analysis, multimodal joins.
  *
  * Scale posture: exact dedup groups on a 256-bit content hash (shuffle
  * carries 32 bytes + key, never the document body); similarity search
  * broadcasts the small query side and keeps the corpus streaming; all
  * text metrics are single-pass, codegen'd higher-order functions.
  */
object Llm {

  /** Cosine similarity between two double-array columns.
    * Left-fold (`aggregate`) matches DuckDB `list_reduce` order, and all
    * inputs are float-exact doubles, so results are bitwise reproducible
    * across engines. */
  private def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact dedup via content hash: keep lowest doc_id per sha256(text)
    * (R16/R18 duplicate identity, generalized from (path,size,mtime) to
    * content). At 100 TB the shuffle key is the 32-byte digest. */
  private def dedupExact: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Brute-force top-k cosine similarity: the ANN correctness baseline.
    * Query side (5 vectors) is broadcast; corpus side never shuffles
    * until the final per-query top-k (k rows per query). */
  private def simCosineTopk: Q = (s, d) => {
    val e = t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cosine(col("qemb"), col("emb")).as("cos"))
      .select(col("qid"), col("vec_id"), col("cos"), row_number().over(w).as("rn"))
      .where(col("rn") <= 10)
      .select(col("qid"), col("rn"), col("vec_id"), round(col("cos"), 6).as("cosine"))
      .orderBy("qid", "rn")
  }

  /** Corpus statistics by language: doc counts, token/char volumes. */
  private def textStats: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 4).as("avg_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  private def textTokens: Q = (s, d) =>
    t(s, d, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy("doc_id")

  /** Quality scoring: length, stopword ratio, punctuation ratio, average
    * word length → a composite [0,1] score. */
  private def textQuality: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stops = size(filter(toks, x =>
      x.isin("the", "a", "of", "and", "to"))).cast("double")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double")
    t(s, d, "documents")
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(stops / nTok, 4).as("stop_ratio"),
        round(punct / length(col("text")).cast("double"), 4).as("punct_ratio"),
        round((length(col("text")).cast("double") - (nTok - 1)) / nTok, 4)
          .as("avg_word_len"),
        round(least(nTok, lit(200.0)) / 200.0 * 0.5 + (stops / nTok) * 0.5, 4)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: letter-frequency scores per candidate
    * language, argmax with a fixed precedence. (A real n-gram model slots
    * into the same shape; the synthetic corpus is English-ish word soup,
    * so the interesting property is determinism, not accuracy.) */
  private def textLangId: Q = (s, d) => {
    def cnt(ch: String): Column =
      (length(col("text")) - length(translate(col("text"), ch, ""))).cast("double")
    val sEn = cnt("e") * 1.27 + cnt("t") * 0.91
    val sEs = cnt("a") * 1.25 + cnt("o") * 0.87
    val sDe = cnt("n") * 1.00 + cnt("s") * 0.73
    val sFr = cnt("i") * 0.76 + cnt("u") * 0.63
    val pred = when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
      .when(sEs >= sDe && sEs >= sFr, "es")
      .when(sDe >= sFr, "de")
      .otherwise("fr")
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"), pred.as("pred_lang"),
        (pred === col("lang")).as("is_match"))
      .orderBy("doc_id")
  }

  /** Multimodal row: text metadata ⋈ vector by id. */
  private def multimodalJoin: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val emb = t(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("emb"))
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("label"), col("n_chars"),
        element_at(col("emb"), 1).as("emb0"),
        round(sqrt(aggregate(col("emb"), lit(0.0), (a, x) => a + x * x)), 6)
          .as("emb_norm"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "sim_cosine_topk" -> simCosineTopk,
    "text_stats" -> textStats,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_lang_id" -> textLangId,
    "multimodal_join" -> multimodalJoin,
  )

  private val duckCos =
    """list_reduce(list_transform(list_zip(q.emb, e.emb),
         s -> s[1] * s[2]), (a, b) -> a + b)
       / (sqrt(list_reduce(list_transform(q.emb, x -> x * x), (a, b) -> a + b))
        * sqrt(list_reduce(list_transform(e.emb, x -> x * x), (a, b) -> a + b)))"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY doc_id""",
    "sim_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
          pairs AS (
            SELECT q.vec_id AS qid, e.vec_id AS vec_id, $duckCos AS cos
            FROM e q JOIN e ON q.vec_id < 5 AND e.vec_id <> q.vec_id)
          SELECT qid, rn, vec_id, round(cos, 6) AS cosine
          FROM (SELECT qid, vec_id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, vec_id) AS rn
                FROM pairs)
          WHERE rn <= 10 ORDER BY qid, rn""",
    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
                sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
                round(sum(len(string_split(text, ' ')))::DOUBLE / count(*), 4)
                  AS avg_tokens,
                sum(n_chars)::BIGINT AS total_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "text_tokens" ->
      """SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS ws_tokens,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
                  AS re_tokens,
                length(text)::BIGINT AS len_chars
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """WITH q AS (
           SELECT doc_id,
                  len(string_split(text, ' '))::DOUBLE AS n_tok,
                  len(list_filter(string_split(text, ' '),
                      x -> x IN ('the','a','of','and','to')))::DOUBLE AS stops,
                  len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE AS punct,
                  length(text)::DOUBLE AS n_chars
           FROM documents)
         SELECT doc_id, n_tok::BIGINT AS n_tokens,
                round(stops / n_tok, 4) AS stop_ratio,
                round(punct / n_chars, 4) AS punct_ratio,
                round((n_chars - (n_tok - 1)) / n_tok, 4) AS avg_word_len,
                round(least(n_tok, 200.0) / 200.0 * 0.5 + (stops / n_tok) * 0.5, 4)
                  AS quality
         FROM q ORDER BY doc_id""",
    "text_lang_id" ->
      """WITH c AS (
           SELECT doc_id, lang,
                  (length(text) - length(replace(text, 'e', '')))::DOUBLE * 1.27
                + (length(text) - length(replace(text, 't', '')))::DOUBLE * 0.91 AS s_en,
                  (length(text) - length(replace(text, 'a', '')))::DOUBLE * 1.25
                + (length(text) - length(replace(text, 'o', '')))::DOUBLE * 0.87 AS s_es,
                  (length(text) - length(replace(text, 'n', '')))::DOUBLE * 1.00
                + (length(text) - length(replace(text, 's', '')))::DOUBLE * 0.73 AS s_de,
                  (length(text) - length(replace(text, 'i', '')))::DOUBLE * 0.76
                + (length(text) - length(replace(text, 'u', '')))::DOUBLE * 0.63 AS s_fr
           FROM documents)
         SELECT doc_id, lang,
                CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                     WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                     WHEN s_de >= s_fr THEN 'de'
                     ELSE 'fr' END AS pred_lang,
                (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                      WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                      WHEN s_de >= s_fr THEN 'de'
                      ELSE 'fr' END = lang) AS is_match
         FROM c ORDER BY doc_id""",
    "multimodal_join" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
         SELECT doc_id, lang, label, n_chars,
                emb[1] AS emb0,
                round(sqrt(list_reduce(list_transform(emb, x -> x * x),
                                       (a, b) -> a + b)), 6) AS emb_norm
         FROM documents JOIN e ON doc_id = vec_id
         ORDER BY doc_id""",
  )
}
