package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Num.roundz

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything is pure `Column` expressions (codegen'd, no UDFs), so at
  * 100 TB these run inside whole-stage codegen over the parquet scan with
  * full column pruning — a text-stats pass is one narrow map stage, no
  * shuffle.
  */
object TextStats {

  /** Whitespace tokens of trimmed text; empty text → empty array (the raw
    * `split("", "\\s+")` would yield `[""]`).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: word runs and individual
    * punctuation marks count separately (`"don't"` → `don` `'` `t` = 3).
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Character-class counts (letters / digits / punctuation / whitespace),
    * each as `length(text) - length(text with the class removed)`.
    */
  def charCount(text: Column): Column = length(text)
  def letterCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Za-z]", ""))
  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))
  def whitespaceCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "\\s", ""))

  /** Count of tokens that appear in `words` (occurrence count, not set
    * intersection — repeated stopwords count every time).
    */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(words)))

  /** Small per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Public common function words.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "para"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"),
  )

  /** Language-ID heuristic: score = stopword hits per language, normalized
    * by token count; winner = max score, ties broken by language code
    * ascending; zero hits anywhere → "und" (undetermined).
    *
    * Implemented as ONE `aggregate` fold over the (score, lang) structs —
    * still a single projection. The earlier `array_sort`-comparator
    * version referenced the sorted result twice (score + lang fields), so
    * the whole sort — and the 5 stopword-filter scores feeding it — was
    * evaluated twice per row; the fold's finish lambda reads its
    * accumulator (a lambda variable, evaluated once) instead.
    */
  def langId(text: Column, stopwords: Map[String, Seq[String]] = Stopwords): Column =
    langIdFromTokens(tokens(lower(text)), stopwords)

  /** Language-ID over a pre-tokenized lowercase array. Callers doing this at
    * scale should stage the token array as its own column first — the
    * comparator below references it once per language, and interpreted
    * higher-order functions re-evaluate (rather than reuse) a non-attribute
    * input on every reference.
    */
  def langIdFromTokens(toks: Column, stopwords: Map[String, Seq[String]] = Stopwords): Column = {
    // lang-ascending construction order + strict `>` in the fold = ties
    // keep the earliest (smallest) language code, matching the documented
    // tie-break without any sort.
    val scored = array(stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isInCollection(words))).as("score"), lit(lang).as("lang"))
    }: _*)
    aggregate(
      scored,
      struct(lit(0).as("score"), lit("und").as("lang")),
      (acc, e) => when(e.getField("score") > acc.getField("score"), e).otherwise(acc),
      acc => acc.getField("lang"))
  }

  /** Heuristic quality score in [0,1]: rewards a sane document length,
    * mid-range mean word length, low punctuation density, and nonzero
    * stopword presence. Deterministic and SQL-expressible (mirrored in the
    * DuckDB oracle).
    */
  def qualityScore(text: Column, stopwords: Seq[String] = Stopwords("en")): Column = {
    val nTok = tokenCount(text)
    val meanWordLen = when(nTok > 0,
      (length(regexp_replace(text, "\\s", "")).cast("double") / nTok)).otherwise(lit(0.0))
    val punctRatio = when(length(text) > 0,
      punctCount(text).cast("double") / length(text)).otherwise(lit(0.0))
    val lengthOk = when(nTok.between(10, 100000), lit(0.25)).otherwise(lit(0.0))
    val wordLenOk = when(meanWordLen.between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0))
    val punctOk = when(punctRatio < 0.2, lit(0.25)).otherwise(lit(0.0))
    val stopOk = when(wordHits(text, stopwords) > 0, lit(0.25)).otherwise(lit(0.0))
    roundz(lengthOk + wordLenOk + punctOk + stopOk, 2)
  }

  /** `(df + <as>)` quality score via staged intermediates — the scale shape
    * of `qualityScore` (kept as the single-Column semantics oracle;
    * TextStatsSpec asserts they agree). One projection stages the lowercase
    * token array and the cheap codegen'd lengths; the score then reads
    * attributes, so the text is tokenized ONCE instead of once per score
    * term (interpreted higher-order `filter` gets no CSE — re-evaluating it
    * per term re-splits the document each time).
    */
  def withQualityScore(df: DataFrame, textCol: String, as: String = "quality",
      stopwords: Seq[String] = Stopwords("en")): DataFrame =
    withQualityScoreFromTokens(
      df.withColumn("__qltoks", tokens(lower(col(textCol)))),
      textCol, "__qltoks", as, stopwords)
      .drop("__qltoks")

  /** `withQualityScore` over an ALREADY-staged lowercase token attribute —
    * for pipelines that also feed the same tokens to language-ID etc.: the
    * document is then tokenized once for every stage that needs it.
    */
  def withQualityScoreFromTokens(df: DataFrame, textCol: String,
      toksCol: String, as: String = "quality",
      stopwords: Seq[String] = Stopwords("en")): DataFrame = {
    val t = col(textCol)
    val staged = df
      .withColumn("__ntok", size(col(toksCol)))
      .withColumn("__nonspace", length(regexp_replace(t, "\\s", "")))
      .withColumn("__npunct", punctCount(t))
      .withColumn("__nchars", length(t))
      .withColumn("__stophits", size(filter(col(toksCol), x => x.isInCollection(stopwords))))
    val nTok = col("__ntok")
    val meanWordLen = when(nTok > 0, col("__nonspace").cast("double") / nTok).otherwise(lit(0.0))
    val punctRatio = when(col("__nchars") > 0,
      col("__npunct").cast("double") / col("__nchars")).otherwise(lit(0.0))
    val score =
      when(nTok.between(10, 100000), lit(0.25)).otherwise(lit(0.0)) +
      when(meanWordLen.between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0)) +
      when(punctRatio < 0.2, lit(0.25)).otherwise(lit(0.0)) +
      when(col("__stophits") > 0, lit(0.25)).otherwise(lit(0.0))
    staged.withColumn(as, roundz(score, 2))
      .drop("__ntok", "__nonspace", "__npunct", "__nchars", "__stophits")
  }

  /** Document-term TF-IDF over a corpus: `(idCol, token, tf, tfidf)` with
    * tf = in-document term count and idf = ln(N / df) where df is the number
    * of documents containing the token. The idf is rounded to 8 decimals
    * before the multiply so rankings are bit-stable across engines (the
    * DuckDB oracle mirrors the formula; a last-ulp `ln` difference must not
    * flip a tie).
    *
    * Scale shape: explode → partial+final count per (doc, token) — the
    * explode fan-out is absorbed map-side; document frequency aggregates the
    * (doc, token) pairs again (vocabulary-sized output); the join back is a
    * hash join on token. Three shuffles total, each on data that shrinks as
    * it flows. N comes from one count job on the corpus (a driver scalar,
    * like pivot-value discovery).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val toks = Staging.explodeStaged(docs, Seq(idCol),
      tokens(lower(col(textCol))), as = "token")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("token"))
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * roundz(log(lit(n.toDouble) / col("df")), 8)).as("tfidf"))
  }

  /** Sparse TF-IDF cosine similarity pairs via a posting-list join — the
    * LEXICAL complement to dense embedding cosine (x10): two documents
    * pair only through tokens they share, so the join touches only
    * co-occurring postings instead of all pairs.
    *
    * Scale guard: tokens with document frequency above `maxDocFreq` are
    * dropped from pairing (a token in k documents contributes k² posting
    * pairs — ubiquitous tokens are stopwords with near-zero IDF weight
    * anyway). Norms are computed in the pruned term space, so cosine stays
    * a true cosine there. Documents sharing no surviving token simply
    * never appear.
    *
    * Output: (a, b, cosine) with a < b and cosine ≥ threshold.
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDocFreq: Int = 1000): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"threshold=$threshold out of [0,1]")
    val n = docs.count()
    val toks = Staging.explodeStaged(docs, Seq(idCol),
      tokens(lower(col(textCol))), as = "token")
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, Seq("token"))
      .where(col("df") <= maxDocFreq)
      .select(col(idCol), col("token"),
        (col("tf") * roundz(log(lit(n.toDouble) / col("df")), 8)).as("__w"))
    val norms = w.groupBy(col(idCol))
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__nrm"))
    w.select(col("token"), col(idCol).as("a"), col("__w").as("__wa"))
      .join(w.select(col("token"), col(idCol).as("b"), col("__w").as("__wb")),
        Seq("token"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("__wa") * col("__wb")).as("__dot"))
      .join(norms.select(col(idCol).as("a"), col("__nrm").as("__na")), Seq("a"))
      .join(norms.select(col(idCol).as("b"), col("__nrm").as("__nb")), Seq("b"))
      .select(col("a"), col("b"),
        roundz(col("__dot") / (col("__na") * col("__nb")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** PII-ish redaction patterns — ASCII-only so the Java-regex (Spark) and
    * RE2 (DuckDB oracle) engines agree byte-for-byte on these.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberRe = "[0-9]{3,}"

  /** Mask emails then long digit runs (ids, phone fragments, card numbers).
    * One narrow projection — the redaction pass over a 100 TB corpus is a
    * scan-speed map with full pushdown around it.
    */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), LongNumberRe, "<NUM>")

  /** Fixed-size token chunking with overlap — the training-data shape that
    * turns documents into model-context-sized pieces. Chunk i covers tokens
    * `[i·stride + 1, i·stride + chunkTokens]` (1-based, stride =
    * chunkTokens − overlap); the last chunk may be short; empty documents
    * produce no chunks.
    *
    * Output: `(idCol, chunk_idx, n_chunk_tokens, chunk_text)`. The chunk
    * array is built per row and exploded through `Staging.explodeStaged`
    * (generator-inlining would rebuild every chunk per emitted row).
    */
  def chunked(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 50, overlap: Int = 10): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    val staged = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
    // chunk count: ceil((n − overlap) / stride) while a chunk still adds
    // ≥1 unseen token; a doc with 0 < n ≤ overlap gets one (short) chunk
    val nChunks = when(col("__n") > overlap,
      floor((col("__n") - lit(overlap) - 1) / lit(stride)) + 1)
      .when(col("__n") > 0, lit(1L))
      .otherwise(lit(0L))
    // sequence needs a non-descending range — always build ≥1 slot, then
    // drop the empty chunk an empty document produces (slice of [] is [])
    val chunkStructs = transform(sequence(lit(0L), greatest(nChunks, lit(1L)) - 1), i =>
      struct(
        i.cast("long").as("chunk_idx"),
        slice(col("__toks"), (i * stride + 1).cast("int"), lit(chunkTokens)).as("ctoks")))
    Staging.explodeStaged(
      staged.select(col(idCol), chunkStructs.as("__chunks")),
      keep = Seq(idCol), arrExpr = col("__chunks"), as = "__c")
      .where(size(col("__c.ctoks")) > 0)
      .select(col(idCol), col("__c.chunk_idx").as("chunk_idx"),
        size(col("__c.ctoks")).as("n_chunk_tokens"),
        concat_ws(" ", col("__c.ctoks")).as("chunk_text"))
  }

  /** Forward-window skip-gram co-occurrence counts — the training-prep
    * table behind word2vec-style embeddings (Mikolov et al. 2013,
    * public): every (token, following-token-at-offset-1..window) pair,
    * counted corpus-wide. Where [[pmiPairs]] asks "same document", this
    * asks "within `window` positions" — the signal that distinguishes
    * syntax-scale affinity from topic-scale affinity.
    *
    * One corpus-sized NARROW pass: each document zips its own token
    * array against `window` shifted slices of itself (never a
    * positional self-join — the classic blowup this shape replaces),
    * explodes once, and the single shuffle carries map-side-combined
    * partial counts; `minCount` prunes the long tail after the
    * aggregate. Ubiquitous pairs are absorbed by the same partial
    * aggregation every groupBy in the engine leans on.
    */
  def skipgramCounts(docs: DataFrame, textCol: String, window: Int,
      minCount: Long): DataFrame = {
    require(window >= 1 && window <= 8 && minCount >= 1,
      s"bad skipgramCounts params window=$window minCount=$minCount")
    val pairCols = (1 to window).map { o =>
      when(size(col("__t")) > o,
        zip_with(
          slice(col("__t"), lit(1), size(col("__t")) - o),
          slice(col("__t"), lit(1 + o), size(col("__t")) - o),
          (a, b) => struct(a.as("a"), b.as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
    }
    docs.select(tokens(lower(col(textCol))).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(explode(concat(pairCols: _*)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Pointwise mutual information of token pairs co-occurring in the same
    * document — collocation mining over a corpus (which words travel
    * together more than chance predicts). Counts are document-level
    * (distinct tokens per doc), PMI = ln(df(a,b)·N / (df(a)·df(b))).
    *
    * Scale guards: the per-doc pair expansion is quadratic in a doc's
    * DISTINCT token count, so documents above `maxDocTokens` distinct
    * tokens are excluded (giant docs are boilerplate/spam in practice and
    * would each emit millions of pairs); `minCount` prunes the pair tail
    * before the PMI join; output is top-`topK` pairs by count. The
    * self-join keys on doc id — co-partitioned after one shuffle, never a
    * cross join.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L, maxDocTokens: Int = 1000, topK: Int = 100): DataFrame = {
    require(minCount >= 1 && maxDocTokens >= 2 && topK >= 1,
      s"bad pmiPairs params minCount=$minCount maxDocTokens=$maxDocTokens topK=$topK")
    val dt = docs.select(col(idCol).as("__d"),
      explode(tokens(lower(col(textCol)))).as("tok")).distinct()
    val ok = dt.groupBy(col("__d")).agg(count(lit(1)).as("__ntok"))
      .where(col("__ntok") <= maxDocTokens).select(col("__d"))
    // d2 feeds four subplans (N, doc frequencies, both self-join sides) —
    // persist it so the explode+distinct shuffle runs once, and release it
    // deterministically by materializing the (≤ topK rows) result eagerly
    val d2 = dt.join(ok, Seq("__d"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = d2.agg(countDistinct(col("__d")).as("__nd"))
      val f = d2.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val pr = d2.select(col("__d"), col("tok").as("ta"))
        .join(d2.select(col("__d"), col("tok").as("tb")), Seq("__d"))
        .where(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("c"))
        .where(col("c") >= minCount)
      val ranked = pr
        .join(f.select(col("tok").as("ta"), col("df").as("__dfa")), Seq("ta"))
        .join(f.select(col("tok").as("tb"), col("df").as("__dfb")), Seq("tb"))
        .crossJoin(broadcast(nd))
        .select(col("ta"), col("tb"), col("c"),
          roundz(log(col("c").cast("double") * col("__nd") / (col("__dfa") * col("__dfb"))), 6)
            .as("pmi"))
        .orderBy(col("c").desc, col("ta"), col("tb")).limit(topK)
      val spark = docs.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(ranked.collect().toIndexedSeq, 1),
        ranked.schema)
    } finally { d2.unpersist(); () }
  }

  /** CCNet-style unigram language-model score: each document's mean log10
    * probability of its (casefolded, whitespace) tokens under the corpus's
    * OWN unigram distribution — no external model. Add-one smoothing over
    * the top-`vocabSize` vocabulary; out-of-vocabulary tokens share the
    * smoothed floor `1 / (N + V + 1)`. Gibberish and repetitive-junk
    * documents score far below fluent ones; filter on a percentile of this
    * column the way CCNet buckets by LM perplexity.
    *
    * Scale shape: token counts are one hash shuffle with map-side partial
    * aggregation; the top-V vocabulary is a `TakeOrdered` (driver holds V
    * rows, never the vocabulary); scoring is a broadcast join + one
    * shuffle by document id. The counts frame is persisted across its two
    * small jobs (top-V, total N) and released before return.
    *
    * Output: (idCol, unigram_lp) — null for tokenless documents.
    */
  /** Fit a smoothed unigram LM over a `tok` token stream: the
    * top-`vocabSize` counts (count-desc, token-asc tiebreak; the count
    * column named `cntCol`) plus the add-one denominator `n + v + 1`.
    * This is THE LM-fitting convention both `unigramLogProb` and
    * `importanceWeights` mirror into their DuckDB oracles — change it
    * here and the x60/x84 oracles must follow, or the gate catches the
    * drift. Driver traffic: one K-row collect + one 1-row sum.
    */
  private def unigramLm(toks: DataFrame, vocabSize: Int,
      cntCol: String): (DataFrame, Double) = {
    val spark = toks.sparkSession
    val cnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val top = cnt.orderBy(col("c").desc, col("tok")).limit(vocabSize).collect()
      val nRow = cnt.agg(sum(col("c"))).collect()(0)
      val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
      val vocabDf = spark.createDataFrame(
        spark.sparkContext.parallelize(top.toIndexedSeq, 1),
        new org.apache.spark.sql.types.StructType()
          .add("tok", "string").add("c", "long"))
        .select(col("tok"), col("c").as(cntCol))
      (vocabDf, (n + top.length + 1).toDouble)
    } finally { cnt.unpersist(); () }
  }

  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize=$vocabSize must be positive")
    val (vocabDf, denom) = fitUnigramLm(docs, textCol, vocabSize)
    unigramLogProbFromLm(docs, idCol, textCol, vocabDf, denom)
  }

  /** Score documents against an ALREADY-FITTED unigram LM (a `(tok, c)`
    * vocab frame + denominator, per `fitUnigramLm` / a loaded
    * [[graft.operators.LmStore]]) — the stateless half of
    * [[unigramLogProb]], split out so the mergeable count store (x169)
    * and the in-query path share one scorer. Vocab broadcasts
    * (K-bounded); tokenless documents keep a row with a null score.
    */
  def unigramLogProbFromLm(docs: DataFrame, idCol: String, textCol: String,
      vocabDf: DataFrame, denom: Double): DataFrame = {
    val tk = docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
    val scored = tk.join(broadcast(vocabDf.select(col("tok"), col("c"))),
        Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(avg(log10((coalesce(col("c"), lit(0L)) + 1).cast("double") / lit(denom)))
        .as("unigram_lp"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Bigram LM score: `unigramLogProb`'s estimator applied to the stream
    * of ADJACENT TOKEN PAIRS — each document's mean log10 probability of
    * its bigrams under the corpus's own smoothed bigram distribution
    * (top-`vocabSize` bigrams by count, add-one smoothing, OOV at the
    * smoothed floor; the exact `unigramLm` convention, shared so x60 and
    * this stay one estimator).
    *
    * What the extra order sensitivity buys over x60: a document whose
    * WORDS are all common but whose word ORDER is scrambled (shuffled or
    * templated junk) scores near the unigram corpus average yet far below
    * it on bigrams — the cheap next rung of the CCNet fluency ladder.
    *
    * Pair construction keeps the MULTISET (no dedup — counts are what the
    * LM estimates): zip the token array against its own tail; `zip_with`
    * pads the tail with one trailing null, whose null pair is filtered.
    * Documents with fewer than two tokens have no bigrams → null score,
    * same convention as `unigramLogProb`.
    *
    * Scale shape is x60's: one explode to pairs, count shuffle with
    * map-side partials, top-V vocab broadcast (driver holds V rows), one
    * shuffle by document id for the average.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize=$vocabSize must be positive")
    val ts = tokens(lower(col(textCol)))
    val pairs = filter(
      zip_with(ts, slice(ts, lit(2), size(ts)), (a, b) => concat(a, lit(" "), b)),
      p => p.isNotNull)
    val tk = docs.select(col(idCol), explode(pairs).as("tok"))
    val (vocabDf, denom) = unigramLm(tk.select(col("tok")), vocabSize, "c")
    val scored = tk.join(broadcast(vocabDf), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(avg(log10((coalesce(col("c"), lit(0L)) + 1).cast("double") / lit(denom)))
        .as("bigram_lp"))
    // left join back: documents without bigrams keep a row with a null score
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** DSIR-style importance weight per source document (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): the
    * average per-token log-likelihood ratio between a TARGET-domain
    * unigram LM and the SOURCE (raw-corpus) LM —
    * `avg_tok [ log p_target(tok) − log p_source(tok) ]` — positive means
    * the document reads more like the target domain than like the raw
    * corpus. Feed the weights to `Training.weightedSampleNPerGroup` (via
    * `exp`) for the actual importance RESAMPLING step of the recipe.
    *
    * Both LMs use the `unigramLogProb` estimator: top-`vocabSize` vocab by
    * count (count-desc, token-asc tiebreak), add-one smoothing over
    * denominator `n + v + 1`, OOV tokens count 0. Averaging (not summing)
    * keeps the weight length-invariant, so resampling doesn't
    * systematically prefer short documents.
    *
    * Plan shape at 100 TB: the raw corpus explodes to tokens ONCE; both
    * vocab tables are top-K-bounded broadcasts (the only driver traffic:
    * two K-row collects + two 1-row sums); the per-doc average reduces
    * with map-side partial agg. The target corpus is the in-domain quality
    * sample — small by definition — and is never joined row-to-row against
    * the source.
    *
    * Output: (idCol, dsir_w) for every source document — null for
    * tokenless ones, same convention as `unigramLogProb`.
    */
  def importanceWeights(source: DataFrame, target: DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 1000): DataFrame = {
    val (srcVocab, srcDenom) = fitUnigramLm(source, textCol, vocabSize)
    val (tgtVocab, tgtDenom) = fitUnigramLm(target, textCol, vocabSize)
    scoreImportance(source, idCol, textCol, tgtVocab, tgtDenom, srcVocab, srcDenom)
  }

  /** Fit the smoothed unigram LM of a corpus (the `unigramLm` convention):
    * the `(tok, c)` top-K vocab frame plus the add-one denominator —
    * exactly what `DsirStream.freezeLms` persists as side tables so a
    * stream can score against LMs fitted once, offline.
    */
  def fitUnigramLm(docs: DataFrame, textCol: String,
      vocabSize: Int): (DataFrame, Double) = {
    require(vocabSize > 0, s"vocabSize=$vocabSize must be positive")
    unigramLm(docs.select(explode(tokens(lower(col(textCol)))).as("tok")),
      vocabSize, "c")
  }

  /** Score documents against ALREADY-FITTED target/source LMs (each a
    * `(tok, c)` frame + denominator, per `fitUnigramLm`): the stateless
    * stage of the DSIR recipe, shared verbatim by the batch
    * `importanceWeights` and the streaming `DsirStream` scorer so the two
    * can never drift. Both vocab frames broadcast (K-bounded).
    */
  def scoreImportance(docs: DataFrame, idCol: String, textCol: String,
      tgtVocab: DataFrame, tgtDenom: Double,
      srcVocab: DataFrame, srcDenom: Double): DataFrame = {
    val scored = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .join(broadcast(tgtVocab.select(col("tok"), col("c").as("__ct"))),
        Seq("tok"), "left")
      .join(broadcast(srcVocab.select(col("tok"), col("c").as("__cs"))),
        Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(avg(
        log10((coalesce(col("__ct"), lit(0L)) + 1).cast("double") / lit(tgtDenom)) -
          log10((coalesce(col("__cs"), lit(0L)) + 1).cast("double") / lit(srcDenom)))
        .as("dsir_w"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Per-group corpus cross-entropy (nats) under the corpus's OWN
    * smoothed unigram LM (the `unigramLm` convention: top-`vocabSize`
    * vocab, add-one smoothing, OOV at the smoothed floor) — the
    * feed-quality dashboard row next to x150's volume health: a source
    * whose token stream is improbable under the shared corpus
    * distribution (template junk, boilerplate storms, wrong language)
    * reads high, and the number is comparable ACROSS sources because
    * every source is scored against the same LM.
    *
    * Exactness discipline (the x130 BM25 idiom): each token's negative
    * log-prob is rounded and scaled to an integer (×10⁶) BEFORE the
    * per-group sum, so the aggregate is an order-free integer sum that
    * partial-agg ordering can never flake, and the one final division
    * runs over exact integer totals. Scale shape: one token explode,
    * a broadcast vocab join (K-bounded), one grouped integer aggregate.
    */
  def sourceCrossEntropy(docs: DataFrame, groupCol: String,
      textCol: String, vocabSize: Int = 1000): DataFrame = {
    val tk = docs.select(col(groupCol),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val (vocabDf, denom) = unigramLm(tk.select(col("tok")), vocabSize, "c")
    tk.join(broadcast(vocabDf), Seq("tok"), "left")
      .withColumn("__nlp6",
        round(-log((coalesce(col("c"), lit(0L)) + 1).cast("double")
          / lit(denom)) * lit(1e6), 0).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("__nlp6")).as("__s"))
      .select(col(groupCol), col("n_tok"),
        round(col("__s").cast("double") / col("n_tok") / lit(1e6), 6)
          .as("xent_nats"))
  }

  /** Lines (non-blank, trimmed-for-matching is NOT applied — matching is
    * exact) appearing in at least `minDocs` DISTINCT documents: the
    * C4/RefinedWeb boilerplate signal (nav menus, cookie banners, footers
    * repeat verbatim across a site's pages).
    *
    * Plan: explode lines → one hash shuffle keyed on the line string →
    * `countDistinct(doc)` with map-side partial aggregation. The shuffle
    * carries (line, doc_id) pairs; boilerplate lines are short by nature,
    * and the partial agg collapses each (line, doc) repeat before the
    * exchange, so the shuffled volume is bounded by distinct pairs, not by
    * corpus size.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs: a boilerplate line repeats")
    docs.select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .where(length(trim(col("line"))) > 0)
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("ndocs"))
      .where(col("ndocs") >= minDocs)
  }

  /** Remove boilerplate lines (per `frequentLines`) from every document and
    * reassemble the remaining lines in their original order. Documents left
    * with no lines survive with empty text — downstream length/quality
    * gates decide their fate, not this operator.
    *
    * The frequent-line set is small by construction (it is the repeated
    * boilerplate, not the corpus), so the removal join is a broadcast
    * left-anti — the corpus shuffles once (by `idCol`, for reassembly) and
    * the line table never shuffles it.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    val freq = frequentLines(docs, idCol, textCol, minDocs).select(col("line"))
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val kept = lines.join(broadcast(freq), Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          _.getField("line")),
        "\n").as("__rebuilt"),
      count(lit(1)).as("n_kept_lines"))
    // left join back so fully-boilerplate documents keep a row (empty text)
    docs.select(col(idCol),
        (size(split(col(textCol), "\n"))).as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__rebuilt"), lit("")).as(textCol),
        col("n_lines"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"))
  }

  /** Document fingerprint: 64-bit xxHash of the casefolded,
    * whitespace-collapsed text. Two documents differing only in spacing or
    * case share a fingerprint (a cheap near-exact dedup key).
    */
  def fingerprint(text: Column): Column =
    xxhash64(normalize(text))

  /** Casefold + collapse all whitespace runs to single spaces + trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Corpus-self-trained multinomial Naive Bayes classifier — x6's
    * heuristic lang-id upgraded to a TRAINED model, fitted and applied in
    * one plan over the corpus's own (text, label) pairs: the standard
    * first-rung quality/domain classifier a training-data pipeline hangs
    * off its labeled slice (fastText's niche, linear over token counts).
    *
    * Model: `argmax_label [ ln P(label) + Σ_tok ln P(tok | label) ]` with
    * add-one smoothing over the CORPUS vocabulary —
    * `P(tok | label) = (c(tok,label) + 1) / (t_label + V)`. Every estimate
    * comes from one aggregation each (token-label counts, label totals,
    * label priors, one distinct-count action for V), so training is three
    * hash shuffles with map-side partials regardless of corpus size; the
    * full label×vocab log-prob GRID stays distributed (never collected) and
    * scoring joins it by token — per-row fanout = #labels, bounded.
    *
    * Determinism across engines (the x102 convention): scores are rounded
    * to `scoreRound` decimals BEFORE the argmax and ties break on label
    * ascending, so the DuckDB oracle replaying the same arithmetic picks
    * the same winner.
    *
    * Output: (idCol, labelCol, predicted) — `predicted` null for tokenless
    * documents (no score rows; the left join keeps the doc).
    */
  def naiveBayesPredict(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, scoreRound: Int = 6): DataFrame =
    naiveBayesArgmax(docs,
      naiveBayesScores(docs, idCol, textCol, labelCol, scoreRound),
      idCol, labelCol)

  /** The trained-model internals [[naiveBayesPredict]] argmaxes over: one
    * row per (doc, label) with the rounded posterior log-score. Exposed so
    * downstream diagnostics (confidence calibration, margin audits) read
    * the SAME fitted model — refitting in two places could drift.
    * Tokenless docs hold no rows. Output: (idCol, __lab, __score).
    */
  def naiveBayesScores(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, scoreRound: Int = 6): DataFrame = {
    val (grid, priors, nTotal) = naiveBayesFit(docs, textCol, labelCol)
    naiveBayesScoresFromModel(docs, idCol, textCol, grid, priors, nTotal,
      scoreRound)
  }

  /** Fit the multinomial NB model alone — the trainable half of
    * [[naiveBayesScores]], split out so the stored-model serve (x168)
    * and the in-query path share one estimator (the `scoreImportance`
    * pattern): returns the distributed label×vocab log-prob grid
    * `(tok, __lab, __lp)`, the label priors `(__lab, __nd)`, and the
    * document total. The only driver values are two bounded Longs
    * (vocabulary size, corpus size).
    */
  def naiveBayesFit(docs: DataFrame, textCol: String,
      labelCol: String): (DataFrame, DataFrame, Double) = {
    val tk = docs.select(col(labelCol).as("__lab"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val tokCnt = tk.groupBy(col("__lab"), col("tok"))
      .agg(count(lit(1)).as("__c"))
    val labTot = tokCnt.groupBy(col("__lab")).agg(sum(col("__c")).as("__t"))
    val vocab = tk.select(col("tok")).distinct()
    val v = vocab.count().toDouble
    val nTotal = docs.count().toDouble
    val priors = docs.groupBy(col(labelCol).as("__lab"))
      .agg(count(lit(1)).as("__nd"))
    val grid = vocab.crossJoin(broadcast(labTot))
      .join(tokCnt, Seq("__lab", "tok"), "left")
      .select(col("tok"), col("__lab"),
        log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (col("__t").cast("double") + lit(v))).as("__lp"))
    (grid, priors, nTotal)
  }

  /** Score documents against an ALREADY-FITTED NB model (grid + priors +
    * doc total, per [[naiveBayesFit]]) — the stateless serving stage:
    * one token join against the grid (per-row fanout = #labels), one
    * grouped sum, the prior added broadcast-side. Tokens absent from the
    * model's vocabulary contribute nothing (inner join) — the standard
    * serve-time OOV convention for a frozen multinomial NB.
    */
  def naiveBayesScoresFromModel(docs: DataFrame, idCol: String,
      textCol: String, grid: DataFrame, priors: DataFrame, nTotal: Double,
      scoreRound: Int = 6): DataFrame =
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
      .join(grid, Seq("tok"))
      .groupBy(col(idCol), col("__lab"))
      .agg(sum(col("__lp")).as("__s"))
      .join(broadcast(priors), Seq("__lab"))
      .select(col(idCol), col("__lab"),
        roundz(col("__s") + log(col("__nd").cast("double") / lit(nTotal)),
          scoreRound).as("__score"))

  /** Argmax a scored frame into per-doc predictions next to the true
    * label — shared by [[naiveBayesPredict]] and the stored-model serve
    * so the rounding-then-argmax convention (ties on label ascending)
    * lives in exactly one place.
    */
  def naiveBayesArgmax(docs: DataFrame, scored: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__score").desc, col("__lab"))
    val pred = scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__lab").as("predicted"))
    docs.select(col(idCol), col(labelCol)).join(pred, Seq(idCol), "left")
  }

  /** Confidence calibration of the self-trained NB classifier — the eval
    * every gating classifier needs before its scores drive a corpus
    * filter: does a bigger decision margin actually mean a more reliable
    * prediction? Per doc, the margin between the top-2 label scores
    * (rounded scores scaled to exact ×10⁶ longs BEFORE subtracting, so
    * margins, bins, and bin sums are integer-exact across engines); docs
    * bucket into `nBins` fixed-width margin bins (width in ×10⁶ units,
    * last bin clamps) and each bin reports its accuracy — a monotone
    * accuracy-vs-margin curve is what "trust the margin as confidence"
    * means. Window rank is per-doc (parallelism scales with docs); the
    * bin aggregation is bounded by `nBins`.
    *
    * Output: (bin, n, n_correct, accuracy, mean_margin), ratios round-6.
    */
  def naiveBayesCalibration(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, binWidthX1m: Long = 250000L, nBins: Int = 10,
      scoreRound: Int = 6): DataFrame = {
    require(binWidthX1m > 0 && nBins > 0,
      s"naiveBayesCalibration: bad binWidthX1m=$binWidthX1m nBins=$nBins")
    val scored = naiveBayesScores(docs, idCol, textCol, labelCol, scoreRound)
      .withColumn("__sx", round(col("__score") * 1e6, 0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__score").desc, col("__lab"))
    val perDoc = scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 2)
      .groupBy(col(idCol))
      .agg(
        max(when(col("__rn") === 1,
          struct(col("__sx"), col("__lab")))).as("__t1"),
        max(when(col("__rn") === 2, col("__sx"))).as("__sx2"),
        count(lit(1)).as("__k"))
      .where(col("__k") === 2) // tokenless docs score no labels; need top-2
      .select(col(idCol), col("__t1.__lab").as("__pred"),
        (col("__t1.__sx") - col("__sx2")).as("__mx"))
    perDoc.join(docs.select(col(idCol), col(labelCol)), Seq(idCol))
      .groupBy(least(lit(nBins - 1),
        floor(col("__mx") / lit(binWidthX1m))).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pred") === col(labelCol), 1L).otherwise(0L))
          .as("n_correct"),
        sum(col("__mx")).as("__sm"))
      .select(col("bin"), col("n"), col("n_correct"),
        roundz(col("n_correct").cast("double") / col("n"), 6).as("accuracy"),
        roundz(col("__sm").cast("double") / lit(1e6) / col("n"), 6)
          .as("mean_margin"))
  }

  /** Label-distinctive tokens by the log-odds z-score with an informative
    * Dirichlet prior (Monroe et al. 2008, "Fightin' Words") — the
    * corpus-linguistics answer to "which words MAKE this slice different":
    * for each (label, token), the log-odds of the token in the label vs
    * the rest of the corpus, shrunk by a prior proportional to the
    * corpus frequency (`α_w = α₀·c_w/n` — rare tokens need more evidence)
    * and standardized by its estimated variance
    * `1/(c_Lw+α_w) + 1/(c_rest,w+α_w)`. Unlike PMI (x64: token-token
    * association) or TF-IDF (x30: token-document weight), this contrasts
    * token-LABEL usage with principled shrinkage — the tool for slice
    * characterization and leakage hunting ("what vocabulary leaks the
    * label?").
    *
    * Plan: token-label counts (one shuffle, map-side partials), two
    * bounded marginals, the label×vocab grid distributed (never
    * collected; the only driver value is the corpus token total), z
    * computed per grid row, then top-`topK` per label with the
    * round-before-rank determinism rule (z to `zRound`, token-asc ties)
    * — WindowGroupLimit bounds the rank map-side.
    *
    * Output: (labelCol, tok, z, rank), rank 1..topK per label.
    */
  def distinctiveTokens(docs: DataFrame, textCol: String, labelCol: String,
      topK: Int = 10, alpha0: Double = 100.0, zRound: Int = 6): DataFrame = {
    require(topK > 0 && alpha0 > 0, s"distinctiveTokens: bad topK=$topK / alpha0=$alpha0")
    val tk = docs.select(col(labelCol).as("__lab"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val cnt = tk.groupBy(col("__lab"), col("tok")).agg(count(lit(1)).as("__c"))
    val labTot = cnt.groupBy(col("__lab")).agg(sum(col("__c")).as("__nl"))
    val tokTot = cnt.groupBy(col("tok")).agg(sum(col("__c")).as("__cw"))
    val nRow = tokTot.agg(sum(col("__cw"))).collect()(0)
    require(!nRow.isNullAt(0) && nRow.getLong(0) > 0, "distinctiveTokens: empty corpus")
    val n = nRow.getLong(0).toDouble
    val grid = tokTot.crossJoin(broadcast(labTot))
      .join(cnt, Seq("__lab", "tok"), "left")
      .withColumn("__clw", coalesce(col("__c"), lit(0L)).cast("double"))
      .withColumn("__aw", lit(alpha0) * col("__cw").cast("double") / lit(n))
    val cRest = col("__cw").cast("double") - col("__clw")
    val nRest = lit(n) - col("__nl").cast("double")
    val delta =
      log((col("__clw") + col("__aw")) /
        (col("__nl").cast("double") + lit(alpha0) - col("__clw") - col("__aw"))) -
      log((cRest + col("__aw")) / (nRest + lit(alpha0) - cRest - col("__aw")))
    val variance =
      lit(1.0) / (col("__clw") + col("__aw")) + lit(1.0) / (cRest + col("__aw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__lab")).orderBy(col("__z").desc, col("tok"))
    grid.withColumn("__z", roundz(delta / sqrt(variance), zRound))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("__lab").as(labelCol), col("tok"), col("__z").as("z"),
        col("rank").cast("long").as("rank"))
  }

  /** RELATIVE quality gate, CCNet-style: keep each label-slice's documents
    * whose (rounded) unigram-LM score clears that slice's own
    * `keepAbovePercentile` threshold — per-language absolute thresholds
    * are meaningless (character entropy differs by script), so CCNet
    * buckets per language by the language's own score distribution; this
    * is that gate. Scores are rounded BEFORE thresholding on both engines
    * (the determinism rule), the per-label thresholds are one bounded
    * percentile aggregate broadcast back, and the gate is a narrow
    * filter. Documents with no tokens (null score) are dropped — a
    * tokenless doc clears no quality bar.
    */
  def relativeQualityGate(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, keepAbovePercentile: Double,
      vocabSize: Int = 1000): DataFrame = {
    require(keepAbovePercentile > 0 && keepAbovePercentile < 1,
      s"relativeQualityGate: percentile $keepAbovePercentile outside (0,1)")
    val lp = unigramLogProb(docs, idCol, textCol, vocabSize)
      .select(col(idCol), roundz(col("unigram_lp"), 6).as("__lp"))
    val scored = docs.join(lp, Seq(idCol))
    val thr = scored.groupBy(col(labelCol))
      .agg(expr(s"percentile(__lp, $keepAbovePercentile)").as("__thr"))
    scored.join(broadcast(thr), Seq(labelCol))
      .where(col("__lp") >= col("__thr"))
      .drop("__lp", "__thr")
  }

  /** Convenience: attach the full stats bundle to a document DataFrame. */
  def withStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("__toks", tokens(lower(t)))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_chars_m", charCount(t))
      .withColumn("punct_ratio",
        roundz(when(length(t) > 0, punctCount(t).cast("double") / length(t)).otherwise(0.0), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_guess", langIdFromTokens(col("__toks")))
      .withColumn("fp", fingerprint(t))
      .drop("__toks")
  }
}
