package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation tranche: the quality/packing/quantization
  * operators an LLM-scale data pipeline runs between raw corpus and
  * training shards.
  *
  *  - Gopher-style per-doc quality signals (Rae et al. 2021 §A1.1-ish:
  *    word count, mean word length, stopword fraction, lexical
  *    diversity) with a keep/drop verdict;
  *  - repetition ratios (top-token / top-bigram coverage — the Gopher
  *    repetition filters);
  *  - per-stratum deterministic sampling (content-hash thresholds per
  *    language — reproducible train/val splits at any scale);
  *  - sequence packing (greedy doc→fixed-token-budget bins per lang —
  *    the shard-building step before tokenizer/trainer handoff);
  *  - int8 embedding quantization with exact integer reconstruction
  *    error (the storage-shrink step for ANN indexes over corpus
  *    embeddings);
  *  - corpus bigram LM score per doc (mean transition probability —
  *    a perplexity proxy for quality filtering).
  *
  * All oracle-checked. Scores use scaled-integer (ppm) arithmetic — the
  * tranche-wide discipline (see TextOps3): bit-identical across
  * engines, independent of aggregation order.
  *
  * Scale notes (100 TB): signals/quantization are pure map stages
  * (row-local array math, no shuffle); repetition and LM score are
  * token-explode → partial-agg group-bys; packing windows are
  * per-stratum (never a global sort); the sampler is a map-side filter
  * that composes with predicate pushdown.
  */
object TrainingOps {
  type Q = (SparkSession, String) => DataFrame

  private val stops = Seq("the", "a")

  /** 8-token shingles as a row-local array (decontamination grain:
    * long spans, so only genuine copied passages collide — the 3-token
    * near-dup grain would flag everything in a topical corpus). */
  private val gram8Expr =
    "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))"

  /** The stand-in benchmark/eval split: ~5% of docs by id. */
  private def isEval = col("doc_id") % 100 < 5

  private def tokens8(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .filter(size(col("w")) >= 8)

  /** Bloom sketch of the eval split's 8-token shingle hashes — built
    * distributed with NO distinct() and NO exact count pass: bloom
    * insertion is idempotent, and expectedNumItems only needs an upper
    * bound (eval ≈ 5% of docs × ≤ ~40 grams/doc → 2 × docs
    * over-covers; oversizing only lowers the fpp, never misses). One
    * explode pass with per-partition sketch merge, zero shuffles.
    * Shared by the batch query and [[graft.streaming.DecontamStream]]. */
  def evalBloom(s: SparkSession, d: String): org.apache.spark.util.sketch.BloomFilter = {
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val evalH = tokens8(docs.filter(isEval))
      .select(explode(expr(s"transform($gram8Expr, g -> xxhash64(g))")).as("h"))
    val n = math.max(Tables.documents(s, d).count() * 2, 64L)
    evalH.stat.bloomFilter("h", n, 0.001)
  }

  /** Gopher-style signals as a stateless transform over any relation
    * with (doc_id, lang, text) — row-local array math, one pass, no
    * shuffle. Shared verbatim by the batch query and the streaming
    * quality gate ([[graft.streaming.QualityGateStream]]) so the two
    * paths cannot drift. */
  def gopherSignals(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        split(col("text"), " ", -1).as("w"), length(col("text")).cast("long").as("len"))
      .select(col("doc_id"), col("lang"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        size(filter(col("w"), x => x.isin(stops: _*))).cast("long").as("n_stop"),
        (col("len") - (size(col("w")) - 1)).cast("long").as("n_word_chars"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        expr("n_word_chars * 1000000 div n_words").as("mean_wlen_ppm"),
        expr("n_distinct * 1000000 div n_words").as("distinct_ppm"),
        expr("n_stop * 1000000 div n_words").as("stop_ppm"))
      .withColumn("keep",
        col("n_words") >= 40 &&
          col("mean_wlen_ppm").between(3000000L, 8000000L) &&
          col("stop_ppm") >= 10000L)

  val queries: Map[String, Q] = Map(
    // Gopher-style signals, row-local: one pass over the token array.
    // mean word length derives from n_chars minus separators — no
    // per-token length pass needed.
    "doc_gopher_signals" -> ((s, d) =>
      gopherSignals(Tables.documents(s, d)).orderBy("doc_id")),

    // repetition filters: coverage of the most frequent token and the
    // most frequent bigram (x2: a bigram occurrence covers two tokens)
    "doc_repetition" -> ((s, d) => {
      // ROW-LOCAL reformulation (r19): the max multiplicity of a doc's
      // tokens equals the longest equal-run in its SORTED token array —
      // one map stage computes both signals in place of the former two
      // explode→(doc,term)-aggregate→(doc)-aggregate pipelines plus
      // their join (4 exchanges + explode volume → 0 exchanges but the
      // presentation sort). The aggregate() run-counter is an
      // interpreted HOF, so this trades shuffle for per-row CPU — the
      // trade the x10 scale cell validates (see OPTIMIZATION_r19.md).
      // Results are bit-identical: sorting makes equal tokens adjacent,
      // so the longest run IS the max count; null-text docs vanish from
      // the old explode pipeline and are filtered to match.
      def maxRun(arr: String) =
        s"""aggregate(array_sort($arr),
           |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
           |  (a, x) -> named_struct(
           |    'prev', x,
           |    'run', IF(x <=> a.prev, a.run + 1L, 1L),
           |    'best', GREATEST(a.best, IF(x <=> a.prev, a.run + 1L, 1L))),
           |  a -> a.best)""".stripMargin
      Widen(Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .filter(col("text").isNotNull))
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
          expr(maxRun("w")).as("max_tok"),
          expr("IF(size(w) >= 2, " + maxRun(
            "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")
            + ", CAST(NULL AS BIGINT))").as("max_big"))
        .select(col("doc_id"), col("n_tok"),
          expr("max_tok * 1000000 div n_tok").as("top_token_ppm"),
          coalesce(expr("max_big * 2 * 1000000 div n_tok"), lit(0L)).as("top_bigram_ppm"))
        .orderBy("doc_id")
    }),

    // per-language deterministic sample: content-hash thresholds give
    // each stratum its own rate (en 1/4, de 1/8, es 1/16, rest 1/32) —
    // a map-side filter, reproducible under any partitioning/engine
    "sample_stratified" -> ((s, d) => {
      val h = substring(md5(col("text").cast("binary")), 1, 2)
      val thr = when(col("lang") === "en", "40")
        .when(col("lang") === "de", "20")
        .when(col("lang") === "es", "10")
        .otherwise("08")
      Tables.documents(s, d)
        .filter(h < thr)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // sequence packing: docs stream into 2048-token bins per language
    // (bin = floor of the tokens-before-this-doc / budget — greedy,
    // order-deterministic by doc_id). Output: per-bin manifest.
    "doc_pack_bins" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
      t.withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin_id", expr("(cum - n_tok) div 2048"))
        .groupBy("lang", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin_id")
    }),

    // symmetric int8 quantization of the (already integer-quantized)
    // embedding: code = round-toward-zero of x*127/amax, computed on
    // absolute values so integer division agrees across engines
    // (floor == trunc on non-negatives); SSE is exact integer math.
    "emb_quantize_int8" -> ((s, d) =>
      DedupOps.quantized(Tables.embeddings(s, d))
        .withColumn("amax", greatest(expr("array_max(transform(q, x -> abs(x)))"), lit(1L)))
        .withColumn("sse", expr(
          """aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + CASE WHEN x >= 0
            |  THEN (x - ((x * 127 div amax) * amax) div 127) * (x - ((x * 127 div amax) * amax) div 127)
            |  ELSE (x + (((-x) * 127 div amax) * amax) div 127) * (x + (((-x) * 127 div amax) * amax) div 127)
            |END)""".stripMargin))
        .select(col("vec_id"), col("amax"), col("sse"), size(col("q")).cast("long").as("dim"))
        .orderBy("vec_id")),

    // benchmark decontamination, exact path: flag any training doc
    // sharing an 8-token shingle with the eval set. Eval shingles are
    // few → broadcast; the corpus side is a map + broadcast-semi-join,
    // no corpus shuffle. Oracle-checked.
    "decontaminate_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val evalG = tokens8(docs.filter(isEval))
        .select(explode(expr(gram8Expr)).as("g")).distinct()
      val trainG = tokens8(docs.filter(!isEval))
        .select(col("doc_id"), explode(expr(gram8Expr)).as("g")).distinct()
      trainG.join(broadcast(evalG), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    }),

    // decontamination, sketch path: Bloom filter over the eval set's
    // hashed shingles (built distributed, merged once), probed row-
    // locally against each training doc's shingle-hash array — ship
    // the few-MB sketch, not the corpus. Guaranteed no false
    // negatives (spec: superset of the exact path); rows-only check
    // (sketch layout is engine-specific).
    "decontaminate_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val bloom = evalBloom(s, d)
      val probed = tokens8(docs.filter(!isEval))
        .withColumn("ghs", expr(s"array_distinct(transform($gram8Expr, g -> xxhash64(g)))"))
        .select(col("doc_id"),
          size(filter(col("ghs"),
            h => graft.functions.BloomFunctions.probe(s, bloom, h))).cast("long")
            .as("n_flagged"))
      probed.filter(col("n_flagged") > 0).orderBy("doc_id")
    }),

    // cross-source duplication matrix: how many distinct 8-token spans
    // each source pair shares — the corpus-provenance audit that
    // decides which sources to dedup against each other first (span
    // grain, not whole-doc: partial copies count)
    "source_overlap" -> ((s, d) => {
      // sh feeds both self-join legs, but checkpoint + shared
      // repartition(g) (the sparse_cosine_topk pattern) measured a WASH
      // here (r19 A/B min-of-6: 1.12 vs 1.12 s) — the post-distinct
      // relation is small and the join already cheap; left lazy
      val sh = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("source"), split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("source"), explode(expr(gram8Expr)).as("g"))
        .distinct()
      sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("src_a", "src_b")
    }),

    // corpus bigram LM score: mean/min transition probability (ppm)
    // per doc under the corpus-wide bigram model — docs full of rare
    // transitions (low mean, low min) read as noise
    "doc_lm_score" -> ((s, d) => {
      // round-robin for the same single-split reason as doc_repetition
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val big = docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
        // big feeds the pair census AND the per-doc scoring join; pair
        // feeds the unigram tier AND the model join — without the two
        // checkpoints the bigram explode re-ran three times (the
        // multi-branch rule)
        .localCheckpoint(true)
      val pair = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(true)
      val uni = pair.groupBy("w1").agg(sum("c12").as("c1"))
      val model = pair.join(uni, "w1")
        .withColumn("p_ppm", expr("c12 * 1000000 div c1"))
        .select("w1", "w2", "p_ppm")
      big.join(model, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_ppm) div count(1)").as("mean_p_ppm"),
          min(col("p_ppm")).as("min_p_ppm"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "doc_gopher_signals" ->
      """WITH s AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w,
        |         CAST(length(text) AS BIGINT) AS len
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |         CAST(len(w) AS BIGINT) AS n_words,
        |         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |         CAST(len(list_filter(w, x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_stop,
        |         len - (len(w) - 1) AS n_word_chars
        |  FROM s)
        |SELECT doc_id, lang, n_words,
        |       n_word_chars * 1000000 // n_words AS mean_wlen_ppm,
        |       n_distinct * 1000000 // n_words AS distinct_ppm,
        |       n_stop * 1000000 // n_words AS stop_ppm,
        |       (n_words >= 40
        |        AND n_word_chars * 1000000 // n_words BETWEEN 3000000 AND 8000000
        |        AND n_stop * 1000000 // n_words >= 10000) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "doc_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |tt AS (SELECT doc_id, max(c) AS max_tok, CAST(sum(c) AS BIGINT) AS n_tok
        |       FROM tc GROUP BY 1),
        |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |big AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS b
        |        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM big GROUP BY 1, 2),
        |bt AS (SELECT doc_id, max(c) AS max_big FROM bc GROUP BY 1)
        |SELECT tt.doc_id, n_tok,
        |       max_tok * 1000000 // n_tok AS top_token_ppm,
        |       COALESCE(max_big * 2 * 1000000 // n_tok, 0) AS top_bigram_ppm
        |FROM tt LEFT JOIN bt ON bt.doc_id = tt.doc_id
        |ORDER BY tt.doc_id""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(text), 1, 2) <
        |      CASE lang WHEN 'en' THEN '40' WHEN 'de' THEN '20'
        |                WHEN 'es' THEN '10' ELSE '08' END
        |ORDER BY doc_id""".stripMargin,

    "doc_pack_bins" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT lang, CAST(cum - n_tok AS BIGINT) // 2048 AS bin_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, bin_id""".stripMargin,

    "emb_quantize_int8" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, q,
        |         greatest(list_max(list_transform(q, x -> abs(x))), 1) AS amax
        |  FROM q)
        |SELECT vec_id, amax,
        |       CAST(list_sum(list_transform(q, x -> CASE WHEN x >= 0
        |         THEN (x - ((x * 127 // amax) * amax) // 127) * (x - ((x * 127 // amax) * amax) // 127)
        |         ELSE (x + (((-x) * 127 // amax) * amax) // 127) * (x + (((-x) * 127 // amax) * amax) // 127)
        |       END)) AS BIGINT) AS sse,
        |       CAST(len(q) AS BIGINT) AS dim
        |FROM a ORDER BY vec_id""".stripMargin,

    "decontaminate_exact" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
        |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM w)),
        |evalg AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 < 5),
        |traing AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 100 >= 5)
        |SELECT doc_id, count(*) AS n_shared
        |FROM traing JOIN evalg USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "source_overlap" ->
      """WITH w AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (SELECT DISTINCT source, array_to_string(w[i:i+7], ' ') AS g
        |       FROM (SELECT source, w, unnest(range(1, len(w) - 6)) AS i FROM w))
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "doc_lm_score" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |big AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w)),
        |pair AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY 1),
        |model AS (SELECT pair.w1, w2, c12 * 1000000 // c1 AS p_ppm
        |          FROM pair JOIN uni ON pair.w1 = uni.w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(p_ppm) AS BIGINT) // count(*) AS mean_p_ppm,
        |       min(p_ppm) AS min_p_ppm
        |FROM big JOIN model ON big.w1 = model.w1 AND big.w2 = model.w2
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
