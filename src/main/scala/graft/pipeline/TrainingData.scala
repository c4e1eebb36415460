package graft.pipeline

import graft.tables.Checkpoints.CheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.functions.StableRound
import graft.tables.Tables

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond cleaning (north-star surface; no reference analog — SURVEY.md
  * §2.10/§2.12): deterministic split assignment, domain-mixture weighting,
  * benchmark decontamination, fixed-length sequence chunking, stratified
  * downsampling, and offset bin packing.
  */
object TrainingData {

  /** Deterministic train/val/test split (80/10/10) by hashing the document
    * KEY — the standard reproducible-split move: assignment is a pure
    * function of doc_id, so re-runs, backfills and incremental arrivals
    * all land each doc in the same split with NO coordination, no stored
    * assignment table, and no RNG (rand() would shuffle docs between
    * splits on every retry). Embarrassingly parallel: one projection, one
    * tiny 3-group aggregate. */
  val pipe02TrainSplit: Q = Q(
    "pipe02_train_split",
    """WITH b AS (SELECT doc_id, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      |      AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("split")
  }

  /** Domain-mixture weights: per-source corpus share and the per-doc
    * sampling weight that would equalize sources (target = uniform
    * mixture; weight = target_share / actual_share). The shape every
    * data-mixing recipe reduces to: one tiny groupBy + a broadcast of the
    * 1-row corpus totals. */
  val pipe03MixtureWeights: Q = Q(
    "pipe03_mixture_weights",
    """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |t AS (SELECT count(*) AS total, count(DISTINCT source) AS n_sources
      |      FROM documents)
      |SELECT s.source, s.n_docs,
      |  floor(CAST(s.n_docs AS DOUBLE) / t.total * 10000 + 0.5) / 10000
      |    AS share,
      |  floor((CAST(t.total AS DOUBLE) / t.n_sources) / s.n_docs
      |    * 10000 + 0.5) / 10000 AS weight
      |FROM s, t ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bySource = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = docs.agg(count(lit(1)).as("total"),
      countDistinct("source").as("n_sources"))
    bySource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"),
        StableRound.r4(col("n_docs").cast("double") / col("total"))
          .as("share"),
        StableRound.r4((col("total").cast("double") / col("n_sources"))
          / col("n_docs")).as("weight"))
      .orderBy("source")
  }

  /** Benchmark decontamination: corpus docs sharing ≥3 distinct word-bigram
    * shingles with any EVAL-set doc (here: doc_id % 50 = 0 stands in for
    * the benchmark suite). The canonical pre-training hygiene pass — eval
    * examples must be removed from (or at least flagged in) the training
    * corpus, and n-gram overlap is the standard detector.
    *
    * Scale shape: the eval side's shingle set is broadcast, so the
    * corpus-side explode streams map-side through the hash join with no
    * shuffle of corpus shingles; the only shuffle is the groupBy on
    * surviving (corpus_doc, eval_doc) hits, which overlap filtering keeps
    * small. CAVEAT the fixture hides: this eval split (doc_id % 50 = 0) is
    * 2% OF THE CORPUS, so it grows linearly with corpus size and would
    * blow the broadcast/driver memory limit long before 100 TB. The
    * broadcast is therefore GUARDED by an eval-side TEXT-VOLUME probe —
    * sum(n_chars) over the pruned column, capped at ~100 MB (the exploded
    * shingle relation tracks text bytes, not doc count: 400k long docs
    * blow a broadcast that 400k tweets fit) — falling back to a shuffle
    * join on the shingle key above the cap. A production
    * decontamination pass against a FIXED benchmark suite (MMLU/GSM8K/...,
    * thousands of docs, not 2% of the corpus) always stays under the
    * guard — that is the case the broadcast plan is designed for. */
  val pipe04Decontaminate: Q = Q(
    "pipe04_decontaminate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
      |         range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS sh
      |       FROM toks),
      |eval_sh AS (SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % 50 = 0),
      |corp_sh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0)
      |SELECT c.doc_id, e.eval_id, count(*) AS n_shared
      |FROM corp_sh c JOIN eval_sh e ON c.sh = e.sh
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY doc_id, eval_id""".stripMargin) { (s, d) =>
    // shingle dedup is PER DOC, so it's in-row array_distinct — not a
    // corpus-wide distinct() shuffle (the oracle's DISTINCT dedupes the
    // same (doc, shingle) pairs)
    def shingles(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(graft.functions.Shingles.distinctBigramsCol(col("text")))
          .as("sh"))
    val docs = Tables.documents(s, d)
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val evalSh = shingles(evalDocs)
      .withColumnRenamed("doc_id", "eval_id")
    val corpSh = shingles(
      Tables.spread(s, docs.filter(col("doc_id") % 50 =!= 0), "doc_id"))
    // Broadcast guard (see scaladoc): the broadcast payload is the
    // EXPLODED shingle relation, whose size tracks total eval TEXT volume
    // (≈ one bigram string per token), not the doc count — 400k long docs
    // can blow the broadcast while 400k tweets fit. Probe the pruned
    // n_chars column and cap the eval text at ~100 MB (shingle relation
    // ≈ 2-3× that serialized); above it, fall back to a shuffle join
    // rather than OOM the driver.
    val evalChars = evalDocs
      .agg(coalesce(sum("n_chars"), lit(0L))).head().getLong(0)
    val evalShJoinSide =
      if (evalChars <= 100000000L) broadcast(evalSh)
      else evalSh
    corpSh.join(evalShJoinSide, "sh")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .orderBy("doc_id", "eval_id")
  }

  /** Sequence chunking for LM training: split each doc's token stream into
    * fixed-length (32-token) training sequences, each carrying a content
    * hash for downstream exact dedup at the SEQUENCE level. Per-row
    * generator (one explode over the in-row chunk count, slices taken from
    * the in-row token array) — zero shuffle before the presentation sort,
    * like tx04/tx05; the chunking of a 100 TB corpus is purely map-side. */
  /** The pipe05 transform on any (doc_id, text) frame — stateless
    * (per-row generator), so the SAME definition runs under
    * `readStream` unchanged; `StreamingSpec` proves stream == batch. */
  def packChunks(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val chunk = expr("slice(l, cast(chunk_idx * 32 + 1 as int), 32)")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .select(col("doc_id"), col("l"),
        explode(sequence(lit(0L),
          ceil(size(col("l")) / lit(32.0)).cast("long") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        size(chunk).as("chunk_tokens"),
        md5(concat_ws(" ", chunk)).as("chunk_hash"))
  }

  val pipe05PackChunks: Q = Q(
    "pipe05_pack_chunks",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |idx AS (SELECT doc_id, l,
      |          unnest(range(CAST(ceil(len(l) / 32.0) AS BIGINT))) AS chunk_idx
      |        FROM toks)
      |SELECT doc_id, chunk_idx,
      |  len(list_slice(l, chunk_idx * 32 + 1, chunk_idx * 32 + 32))
      |    AS chunk_tokens,
      |  md5(array_to_string(
      |    list_slice(l, chunk_idx * 32 + 1, chunk_idx * 32 + 32), ' '))
      |    AS chunk_hash
      |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    packChunks(Tables.documents(s, d)).orderBy("doc_id", "chunk_idx")
  }

  /** Stratified downsampling to a balanced mixture: keep the same number
    * of docs from every source (the smallest source's count), chosen by
    * deterministic hash order — the materialization counterpart of
    * pipe03's weights (weights tell you how to RE-weigh; this actually
    * draws the balanced subset, reproducibly).
    *
    * Scale: the per-source hash-order rank is a two-pass distributed
    * rank (pipe08's recipe — md5-prefix buckets + broadcast offsets), so
    * a pathologically large source sorts in corpus/(|sources|·256)-sized
    * tasks, not one; the runtime cap then filters exact ranks. The
    * rank-free approximate variant remains the furthest escalation: a
    * hash-THRESHOLD filter (keep if bucket < cap/cnt × buckets,
    * pipe02's shape). */
  val pipe06StratifiedSample: Q = Q(
    "pipe06_stratified_sample",
    """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
      |cap AS (SELECT greatest(1, min(cnt) // 2) AS cap FROM c),
      |r AS (SELECT doc_id, source,
      |        row_number() OVER (PARTITION BY source
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |      FROM documents)
      |SELECT doc_id, source, rk FROM r, cap WHERE rk <= cap
      |ORDER BY source, rk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // target = HALF the smallest source (downsampling must actually drop
    // rows — on a balanced corpus a min-count cap keeps everything and the
    // hash-order selection never gets exercised)
    val cap = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("cnt"))
      .agg(greatest(lit(1L), floor(min("cnt") / 2).cast("long")).as("cap"))
    // Two-pass distributed rank (pipe08's recipe): the md5 hash's first
    // two chars are 256 order-preserving uniform buckets of the sample
    // order, so the per-source rank never sorts a whole source in one
    // task — the quota being a runtime value (which defeats
    // WindowGroupLimit pruning) doesn't matter, because no corpus-sized
    // window exists to prune.
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("hx"))
      .withColumn("bucket", substring(col("hx"), 1, 2))
      .materialized
    val offs = base.groupBy("source", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("off",
        sum("n").over(Window.partitionBy("source").orderBy("bucket"))
          - col("n"))
      .select("source", "bucket", "off")
    base
      .withColumn("lrk", row_number().over(
        Window.partitionBy("source", "bucket")
          .orderBy(col("hx"), col("doc_id"))))
      .join(broadcast(offs), Seq("source", "bucket"))
      .withColumn("rk", (col("off") + col("lrk")).cast("int"))
      .crossJoin(broadcast(cap))
      .filter(col("rk") <= col("cap"))
      .select("doc_id", "source", "rk")
      .orderBy("source", "rk")
  }

  /** Offset bin packing: group consecutive docs (per source, doc_id
    * order) into 512-token training bins — the complement of pipe05
    * (which SPLITS long docs; this GROUPS short ones so no bin is mostly
    * padding). bin_id = the doc's starting token offset ÷ 512, from a
    * running sum — deterministic, no sequential driver state, and a doc
    * spanning a boundary starts the next bin's carryover (standard offset
    * binning; bins can exceed the budget by at most one doc's tail).
    *
    * Scale: the running sum is a two-pass distributed prefix (see the
    * body comment) — per-task work is corpus/(|sources|·256), never a
    * whole source in one task. */
  val pipe07PackBins: Q = Q(
    "pipe07_pack_bins",
    """WITH t AS (SELECT doc_id, source,
      |            len(string_split(text, ' ')) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM t)
      |SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_id,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY source, bin_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // TWO-PASS DISTRIBUTED PREFIX SUM (pipe08's recipe, for SUM instead
    // of rank): a bare partitionBy(source) running sum serializes each
    // source's population into one task. doc_id ranges are
    // order-preserving buckets (floor((id-min)/W) for positive W), so
    // pass 1 turns per-(source, bucket) token sums — a map-side-combined
    // |sources|×256-row frame — into exclusive prefix offsets, and pass
    // 2's running sum partitions by (source, bucket): corpus/(|sources|
    // ·256) per task, plus a broadcast offset. min/max(doc_id) is one
    // 1-row collect, the same driver round-trip the Lloyd trainers make.
    val bounds = Tables.documents(s, d)
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi")).head()
    // empty corpus → null min/max; (0, 1) keeps the pipeline flowing to
    // its natural empty result instead of an NPE at the driver
    val lo = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val hi = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    val width = math.max(1L, (hi - lo) / 256 + 1)
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("bucket", floor((col("doc_id") - lo) / width))
      .materialized
    val offs = base.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("bt"))
      .withColumn("off",
        sum("bt").over(Window.partitionBy("source").orderBy("bucket"))
          - col("bt"))
      .select("source", "bucket", "off")
    val w = Window.partitionBy("source", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("lcum", sum("n_tokens").over(w))
      .join(broadcast(offs), Seq("source", "bucket"))
      .withColumn("cum", col("off") + col("lcum"))
      .withColumn("bin_id",
        floor((col("cum") - col("n_tokens")) / 512).cast("long"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin_id")
  }

  /** Deterministic global shuffle + sharding for training order: every doc
    * gets a pseudo-random but REPRODUCIBLE position (md5 of doc_id — the
    * seeded-shuffle idiom; no engine rand()), sharded into 8 output files'
    * worth of work. Scale shape: ONE shuffle keyed by shard, and the
    * per-shard position is a window over that same partitioning — writers
    * then emit shard files with `partitionBy(shard)` without re-shuffling.
    * This is the step that breaks source/crawl locality before training
    * (adjacent docs from one crawl must not land in one batch).
    *
    * POSITION AT SCALE — a TWO-PASS DISTRIBUTED RANK, not one window per
    * shard: a bare per-shard row_number serializes each shard's whole
    * population into one sorting task (corpus/8 rows here; corpus/1024
    * even at production shard counts). Instead the hex sort key's first
    * two characters form 256 ORDER-PRESERVING uniform buckets (for
    * fixed-position substrings, prefix order IS string order; equal
    * prefixes stay inside one bucket), so pass 1 counts each
    * (shard, bucket) — map-side combined, 8×256 rows total — and turns
    * the counts into exclusive prefix offsets with a window over that
    * TINY frame; pass 2 ranks WITHIN (shard, bucket) — partitions of
    * corpus/(shards·256) — and adds the broadcast offset. Same positions
    * as the serial window, proven by the unchanged oracle; this is the
    * classic scan-then-offset parallel prefix, spelled declaratively. */
  val pipe08ShardShuffle: Q = Q(
    "pipe08_shard_shuffle",
    """WITH h AS (SELECT doc_id,
      |    md5(CAST(doc_id AS VARCHAR)) AS hx
      |  FROM documents)
      |SELECT doc_id,
      |  ('0x' || substr(hx, 1, 8))::BIGINT % 8 AS shard,
      |  row_number() OVER (PARTITION BY ('0x' || substr(hx, 1, 8))::BIGINT % 8
      |                     ORDER BY substr(hx, 9), doc_id) AS pos
      |FROM h ORDER BY shard, pos""".stripMargin) { (s, d) =>
    val hx = md5(col("doc_id").cast("string"))
    val shard = pmod(
      conv(substring(hx, 1, 8), 16, 10).cast("long"), lit(8))
    // two consumers (bucket counts + local ranks) of the keyed frame
    val base = Tables.documents(s, d)
      .select(col("doc_id"), shard.as("shard"),
        substring(hx, 9, 24).as("sort_key"))
      .withColumn("bucket", substring(col("sort_key"), 1, 2))
      .materialized
    // pass 1: exclusive prefix offsets over the 8×256-row count frame
    val offs = base.groupBy("shard", "bucket").agg(count(lit(1)).as("n"))
      .withColumn("off",
        sum("n").over(Window.partitionBy("shard").orderBy("bucket"))
          - col("n"))
      .select("shard", "bucket", "off")
    // pass 2: rank within the bucket, shift by the bucket's offset
    base
      .withColumn("lrk", row_number().over(
        Window.partitionBy("shard", "bucket")
          .orderBy(col("sort_key"), col("doc_id"))))
      .join(broadcast(offs), Seq("shard", "bucket"))
      .select(col("doc_id"), col("shard"),
        (col("off") + col("lrk")).as("pos"))
      .orderBy("shard", "pos")
  }

  /** Corpus card — the one-row dataset datasheet (the artifact a training
    * run records next to the data): doc/dup counts, token volume,
    * lang/source diversity, repetition-flag rate, size profile. ONE full
    * scan, every statistic folded into a single aggregation with map-side
    * partials (count-distincts expand in-operator) — the cheapest possible
    * shape, because at 100 TB the scan IS the cost and a per-metric query
    * suite would multiply it. Per-row signals (bigram repetition, token
    * counts) are in-row expressions; corpus-level signals are exact
    * aggregates. */
  val pipe09CorpusCard: Q = Q(
    "pipe09_corpus_card",
    """WITH per AS (
      |  SELECT doc_id, lang, source, n_chars, md5(text) AS fp,
      |    len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS ws_tokens,
      |    CASE WHEN len(string_split(text, ' ')) >= 2 THEN
      |      (1.0 - CAST(len(list_distinct(list_transform(
      |           range(1, len(string_split(text, ' '))),
      |           i -> string_split(text, ' ')[i] || ' ' ||
      |                string_split(text, ' ')[i+1]))) AS DOUBLE)
      |        / (len(string_split(text, ' ')) - 1)) >= 0.1
      |    ELSE FALSE END AS repetitive
      |  FROM documents)
      |SELECT count(*) AS n_docs,
      |  count(*) - count(DISTINCT fp) AS n_exact_dup_docs,
      |  CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources,
      |  CAST(sum(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repetitive,
      |  floor(avg(n_chars) * 100 + 0.5) / 100 AS mean_chars
      |FROM per""".stripMargin) { (s, d) =>
    import graft.functions.StableRound
    val rep = when(size(col("l")) >= 2,
      (lit(1.0) - size(graft.functions.Shingles
        .distinctBigramsCol(col("text")))
        .cast("double") / (size(col("l")) - 1)) >= 0.1)
      .otherwise(lit(false))
    Tables.documents(s, d)
      .select(col("lang"), col("source"), col("n_chars"), col("text"),
        split(col("text"), " ").as("l"))
      .select(col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("fp"),
        size(expr("filter(l, x -> x != '')")).as("ws_tokens"),
        rep.as("repetitive"))
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct("fp")).as("n_exact_dup_docs"),
        sum("ws_tokens").cast("long").as("total_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        sum(when(col("repetitive"), 1).otherwise(0)).cast("long")
          .as("n_repetitive"),
        StableRound.r2(avg("n_chars")).as("mean_chars"))
  }

  /** Epoch/repetition planner (pipe03 taken to its operational
    * conclusion): given a fixed training token budget, how many EPOCHS of
    * each source does the uniform-mixture target imply, and how many
    * tokens does each source actually contribute once the standard ≤4×
    * repetition cap (the "repeat small sources at most a few epochs"
    * doctrine) is applied? Per source: whitespace-token supply, the
    * uniform per-source token target, epochs = min(4, target/supply), and
    * the planned contribution floor(min(4·supply, target)).
    *
    * Everything is arithmetic on two aggregates: per-source token sums
    * (one groupBy with map-side combine — token counting is per-row, no
    * explode) and the 1-row corpus totals, broadcast. The budget is a
    * deterministic function of the corpus (10% of total supply) so the
    * plan is reproducible at any scale factor. */
  val pipe11EpochPlan: Q = Q(
    "pipe11_epoch_plan",
    """WITH s AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
      |      AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
      |             count(*) AS n_sources FROM s),
      |p AS (SELECT s.source, s.n_tokens,
      |        floor(CAST(t.total AS DOUBLE) * 0.1 / t.n_sources) AS target
      |      FROM s, t)
      |SELECT source, n_tokens, CAST(target AS BIGINT) AS target_tokens,
      |  CASE WHEN n_tokens > 0 THEN
      |    floor(least(4.0, target / n_tokens) * 10000 + 0.5) / 10000
      |  END AS epochs,
      |  CAST(floor(least(4.0 * n_tokens, target)) AS BIGINT)
      |    AS planned_tokens
      |FROM p ORDER BY source""".stripMargin) { (s, d) =>
    val perSource = Tables.documents(s, d)
      .select(col("source"),
        size(graft.functions.Shingles.ngramsCol(col("text"), 1, skipEmpty = true, distinct = false)).as("nt"))
      .groupBy("source").agg(sum("nt").as("n_tokens"))
    val totals = perSource.agg(sum("n_tokens").as("total"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("target",
        floor(col("total").cast("double") * 0.1 / col("n_sources")))
      .select(col("source"), col("n_tokens"),
        col("target").cast("long").as("target_tokens"),
        // explicit CASE, not least(..., NULL): BOTH engines' least() skips
        // NULL args, so nullif alone would report a zero-supply source as
        // 4.0 epochs instead of the intended NULL (no ANSI crash either
        // way — the division is guarded by the branch)
        when(col("n_tokens") > 0, StableRound.r4(least(lit(4.0),
          col("target").cast("double") / col("n_tokens"))))
          .as("epochs"),
        floor(least(lit(4.0) * col("n_tokens"), col("target").cast("double")))
          .cast("long").as("planned_tokens"))
      .orderBy("source")
  }

  /** Temperature-resampled language mixture (α = 0.5) — the multilingual
    * rebalancing standard (mBERT/XLM-R exponential smoothing): sampling
    * share q_l ∝ p_l^α flattens the head language toward the tail, and
    * each language's keep-rate is q_l·total / n_l. Keyed on `lang` (the
    * fixture's one skewed attribute — en is ~2.8× any other language);
    * selection is the pipe02 md5-bucket so membership is a pure function
    * of doc_id and the SAME docs are kept on every engine and every
    * rerun.
    *
    * Integer-exact end to end — no float ever gates a row: p^0.5 enters
    * as w_l = floor(sqrt(n_l)·10^6) (IEEE sqrt is correctly rounded, so
    * both engines compute the identical integer), the normalizer is an
    * integer SUM of those, targets are integer `div`s, and the keep
    * threshold compares md5-bucket mod 10^6 against an integer. A float
    * formulation would hinge on the sum-order of Σ p^α — exactly the
    * cross-engine drift this corpus-wide gate cannot afford. (At 100 TB
    * the w·total products approach BIGINT range; production widens the
    * intermediate to DECIMAL(38,0) — same plan shape.)
    *
    * Scale shape: per-lang counts are one tiny combine-heavy groupBy; the
    * rate table is a handful of rows crossJoin-broadcast back; selection
    * is a broadcast join + per-row hash compare; realized counts are a
    * second tiny groupBy. Two corpus scans, zero wide shuffles. */
  val pipe14TemperatureMix: Q = Q(
    "pipe14_temperature_mix",
    """WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |w AS (SELECT lang, n_docs,
      |        CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w
      |      FROM s),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_total,
      |             CAST(sum(n_docs) AS BIGINT) AS total FROM w),
      |r AS (SELECT w.lang, w.n_docs,
      |        (w.w * t.total) // t.w_total AS target_docs,
      |        least(1000000,
      |          ((w.w * t.total) // t.w_total) * 1000000 // w.n_docs)
      |          AS thr
      |      FROM w, t),
      |k AS (SELECT d.lang, count(*) AS n_sampled
      |      FROM documents d JOIN r ON d.lang = r.lang
      |      WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
      |              ::BIGINT % 1000000 < r.thr
      |      GROUP BY 1)
      |SELECT r.lang, r.n_docs, r.target_docs, r.thr,
      |  coalesce(k.n_sampled, 0) AS n_sampled,
      |  floor(CAST(coalesce(k.n_sampled, 0) AS DOUBLE) / r.n_docs
      |    * 10000 + 0.5) / 10000 AS keep_rate
      |FROM r LEFT JOIN k USING (lang) ORDER BY lang""".stripMargin) { (s, d) =>
    // n_langs rows; materialized once so the totals agg, the rate table
    // and the final report all reuse it instead of re-scanning the corpus
    val perLang = Tables.documents(s, d)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs")) * 1000000).cast("long"))
      .materialized
    val totals = perLang.agg(sum("w").as("w_total"),
      sum("n_docs").as("total"))
    val rates = perLang.crossJoin(broadcast(totals))
      .withColumn("target_docs", expr("(w * total) div w_total"))
      .withColumn("thr",
        least(lit(1000000L), expr("target_docs * 1000000 div n_docs")))
      .select("lang", "n_docs", "target_docs", "thr")
    val sampled = Tables.documents(s, d)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(1000000L)))
      .join(broadcast(rates), "lang")
      .filter(col("bucket") < col("thr"))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    rates.join(broadcast(sampled), Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("target_docs"), col("thr"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        StableRound.r4(coalesce(col("n_sampled"), lit(0L)).cast("double")
          / col("n_docs")).as("keep_rate"))
      .orderBy("lang")
  }

  /** Training-manifest builder — the end product a curation run hands to
    * the training job: exact-dedup survivors that pass the tx14 Gopher
    * gate, assigned to pipe02's hash split and pipe08's md5 shard (the
    * SAME formulas, so a doc's placement here always agrees with those
    * operators), rolled up per (split, shard) with doc/token counts and
    * an order-independent content hash (check_content_hash's sum-of-
    * md5-prefix fold) — the manifest line a trainer checks before and
    * after a data handoff.
    *
    * Scale shape: one corpus scan; the only wide exchange is the dd01
    * content-hash window (the dedup criterion), then the per-(split,
    * shard) rollup is a ≤24-group combine-heavy groupBy riding a
    * map-side partial. No joins at all. */
  val pipe16TrainManifest: Q = Q(
    "pipe16_train_manifest",
    s"""WITH w AS (SELECT doc_id, md5(text) AS h,
      |    ${TextAnalysis.tokListSql} AS l,
      |    ${TextAnalysis.nSymbolsSql} AS n_symbols
      |  FROM documents),
      |m AS (SELECT doc_id, h, n_symbols, ${TextAnalysis.gopherMetricsSql},
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |  FROM w),
      |surv AS (SELECT doc_id, h, n_words FROM m
      |  WHERE rn = 1 AND ${TextAnalysis.gopherPassSql}),
      |a AS (SELECT n_words, h,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |      AS dh
      |  FROM surv)
      |SELECT CASE WHEN dh % 100 < 80 THEN 'train'
      |            WHEN dh % 100 < 90 THEN 'val' ELSE 'test' END AS split,
      |  CAST(dh % 8 AS BIGINT) AS shard,
      |  count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens,
      |  CAST(sum(('0x' || substr(h, 1, 8))::BIGINT) AS BIGINT)
      |    AS content_hash
      |FROM a GROUP BY 1, 2 ORDER BY split, shard""".stripMargin) { (sp, d) =>
    val m = TextAnalysis.withGopherMetrics(
        Tables.documents(sp, d).withColumn("h", md5(col("text"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id")))
    val surv = m.filter(col("rn") === 1 && TextAnalysis.gopherPassCol)
    surv
      .withColumn("dh",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("split",
        when(pmod(col("dh"), lit(100)) < 80, "train")
          .when(pmod(col("dh"), lit(100)) < 90, "val")
          .otherwise("test"))
      .withColumn("shard", pmod(col("dh"), lit(8)))
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"),
        sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
          .as("content_hash"))
      .orderBy("split", "shard")
  }

  /** Length-based curriculum schedule over pipe08's shards: rank the 8
    * training shards by mean token count, shortest first — the classic
    * curriculum (easy/short examples early, long-tail later), expressed
    * as the shard consumption order a trainer reads. Reuses pipe08's
    * exact md5 shard formula so the schedule can never disagree with the
    * shard assignment it orders; the ranking key is the UNROUNDED mean
    * (identical double on both engines), shard id as tiebreak.
    *
    * Scale shape: one corpus scan folding per-shard doc/token counts
    * map-side into 8 groups; the rank window runs over the 8-row
    * aggregate. The schedule costs the scan, nothing more. */
  val pipe18CurriculumOrder: Q = Q(
    "pipe18_curriculum_order",
    """WITH t AS (SELECT doc_id,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
      |      AS shard,
      |    len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS n_tokens
      |  FROM documents)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  floor(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 100 + 0.5) / 100
      |    AS mean_tokens,
      |  row_number() OVER (ORDER BY CAST(sum(n_tokens) AS DOUBLE)
      |    / count(*), shard) AS curriculum_rank
      |FROM t GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
    val shard = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(8))
    Tables.documents(s, d)
      .select(shard.as("shard"),
        size(graft.functions.Shingles.ngramsCol(col("text"), 1, skipEmpty = true, distinct = false)).as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"))
      .withColumn("mean_u",
        col("total_tokens").cast("double") / col("n_docs"))
      .withColumn("curriculum_rank", row_number().over(
        Window.orderBy(col("mean_u"), col("shard"))))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        StableRound.r2(col("mean_u")).as("mean_tokens"),
        col("curriculum_rank"))
      .orderBy("shard")
  }

  val queries: Seq[Q] = Seq(pipe02TrainSplit, pipe03MixtureWeights,
    pipe04Decontaminate, pipe05PackChunks, pipe06StratifiedSample,
    pipe07PackBins, pipe08ShardShuffle, pipe09CorpusCard, pipe11EpochPlan,
    pipe14TemperatureMix, pipe16TrainManifest, pipe18CurriculumOrder)
}
