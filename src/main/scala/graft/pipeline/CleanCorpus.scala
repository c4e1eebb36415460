package graft.pipeline

import graft.tables.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables

/** The composed training-data cleaning pipeline — the workload a user of
  * this library actually runs, as ONE oracle-checked chain
  * (north-star surface; stages are the individually-verified operators):
  *
  *   documents → exact dedup (dd01's keep-min-per-content-hash)
  *             → quality filter (tx02's score ≥ 0.35, the bottom ~15%)
  *             → near-dup removal (dd03's LSH buckets, keep the smallest
  *               doc per bucket)
  *             → per-stage survivor counts
  *
  * Scale shape: the three stages are computed as per-doc SURVIVAL FLAGS
  * over one shared frame (content-hash window + quality groupBy + minhash
  * signature, each touched once) rather than as chained filtered frames —
  * chained frames recompute the whole upstream per downstream consumer
  * (measured 4× = 7.5 s at sf0.1; flags + one persist = 2.1 s). The
  * near-dup stage still buckets only s2 SURVIVORS, so its groupBy sees the
  * shrunk corpus. The flags frame persists because two consumers need it:
  * the bucket branch and the final aggregate. Nothing quadratic, nothing
  * driver-side.
  */
object CleanCorpus {

  // the tx02 lexicon — ONE definition (TextAnalysis), echoed into the SQL
  private def stopwords: Seq[String] =
    TextAnalysis.lexicon.map(_._2).distinct

  /** The oracle's stage chain (shared by pipe01 and pipe10): d1 = exact
    * survivors, d2 = quality survivors, d3 = near-dup survivors. */
  private def cleanChainCtes: String =
    s"""keep1 AS (SELECT min(doc_id) AS doc_id FROM documents
       |               GROUP BY md5(text)),
       |d1 AS (SELECT d.* FROM documents d JOIN keep1 k ON d.doc_id = k.doc_id),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d1),
       |lex(w) AS (VALUES ${stopwords.map(w => s"('$w')").mkString(", ")}),
       |tstats AS (
       |  SELECT t.doc_id, count(*) AS n_tokens,
       |    count(DISTINCT t.tok) AS n_distinct, count(l.w) AS n_stop
       |  FROM toks t LEFT JOIN lex l ON t.tok = l.w GROUP BY 1),
       |d2 AS (
       |  SELECT d1.* FROM d1 JOIN tstats t ON t.doc_id = d1.doc_id
       |  WHERE 0.4 * (CAST(t.n_distinct AS DOUBLE) / t.n_tokens)
       |      + 0.3 * least(1.0, t.n_tokens / 100.0)
       |      + 0.3 * (CAST(t.n_stop AS DOUBLE) / t.n_tokens) >= 0.35),
       |l2 AS (SELECT doc_id, string_split(text, ' ') AS l FROM d2),
       |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(
       |         range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS tok FROM l2),
       |seeds AS (SELECT unnest(range(8)) AS seed),
       |sig AS (SELECT doc_id, seed,
       |          min(md5(seed::VARCHAR || '|' || tok)) AS mh
       |        FROM sh, seeds GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, seed // 4 AS band,
       |            string_agg(mh, '|' ORDER BY seed) AS band_key
       |          FROM sig GROUP BY doc_id, seed // 4),
       |dup AS (SELECT DISTINCT b.doc_id
       |        FROM bands a JOIN bands b
       |          ON a.band = b.band AND a.band_key = b.band_key
       |          AND a.doc_id < b.doc_id),
       |d3 AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM dup))""".stripMargin

  val pipe01CleanCorpus: Q = Q(
    "pipe01_clean_corpus",
    s"""WITH $cleanChainCtes
       |SELECT (SELECT count(*) FROM documents) AS n_input,
       |       (SELECT count(*) FROM d1) AS n_after_exact,
       |       (SELECT count(*) FROM d2) AS n_after_quality,
       |       (SELECT count(*) FROM d3) AS n_clean""".stripMargin) { (s, d) =>
    survivalFlags(s, d).agg(
      count(lit(1)).as("n_input"),
      count(when(col("s1"), 1)).as("n_after_exact"),
      count(when(col("s2"), 1)).as("n_after_quality"),
      count(when(col("s3"), 1)).as("n_clean"))
  }

  /** The chain extended with a CHARACTER-level stage: winnow-pair removal
    * (dd07's primitive) over the near-dup survivors — catches mangled
    * copies whose word bigrams no longer agree (whitespace/punctuation
    * damage) that the MinHash stage passed. Policy mirrors the LSH
    * stage's keep-min: a doc with any smaller winnow partner is dropped.
    * Stage cost: one fingerprint pass over the (already shrunk) d3
    * corpus — the winnow stage prices at O(survivors), not O(input). */
  val pipe10CleanWinnow: Q = Q(
    "pipe10_clean_winnow",
    s"""WITH $cleanChainCtes,
       |${TextAnalysis.winnowMinimaCteOver("d3")},
       |pieces AS (SELECT DISTINCT doc_id, mn AS piece FROM m
       |           WHERE i <= n_h - 16),
       |rare AS (SELECT piece FROM pieces
       |         GROUP BY piece HAVING count(*) BETWEEN 2 AND 20),
       |wpairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pieces a JOIN rare r ON a.piece = r.piece
       |  JOIN pieces b ON a.piece = b.piece AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |wlosers AS (SELECT DISTINCT doc_b AS doc_id FROM wpairs)
       |SELECT (SELECT count(*) FROM documents) AS n_input,
       |       (SELECT count(*) FROM d1) AS n_after_exact,
       |       (SELECT count(*) FROM d2) AS n_after_quality,
       |       (SELECT count(*) FROM d3) AS n_after_neardup,
       |       (SELECT count(*) FROM d3
       |        WHERE doc_id NOT IN (SELECT doc_id FROM wlosers))
       |         AS n_clean""".stripMargin) { (s, d) =>
    val flags = survivalFlags(s, d)
    val losers = Dedup.winnowPairs(
        Tables.spread(s, flags.filter(col("s3")).select("doc_id", "text"),
          "doc_id"))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("wl", lit(true))
    flags.join(losers, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_input"),
        count(when(col("s1"), 1)).as("n_after_exact"),
        count(when(col("s2"), 1)).as("n_after_quality"),
        count(when(col("s3"), 1)).as("n_after_neardup"),
        count(when(col("s3") && col("wl").isNull, 1)).as("n_clean"))
  }

  /** One row per input doc with its per-stage survival flags: s1 = kept by
    * exact dedup, s2 = s1 ∧ quality ≥ 0.35, s3 = s2 ∧ no smaller LSH
    * bucket-mate among s2 survivors. Persisted — the near-dup branch and
    * the caller both consume it.
    *
    * The s3 policy is BUCKET-level keep-min (drop any doc with a smaller
    * bucket-mate) — self-consistent and oracle-checked, but on a chain
    * a-b, b-c it drops both b and c. The stricter cluster-level policy
    * (keep exactly one doc per CONNECTED near-dup component) is
    * [[Dedup.dd06DupClusters]]; swap the dupIds branch for its cluster
    * frame when that semantics is wanted. */
  def survivalFlags(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.spread(s, Tables.documents(s, d), "doc_id")
    // The persist is reclaimed by Spark's ContextCleaner once the frame
    // becomes unreachable (method-local) — it is not pinned for the
    // session lifetime.
    // LEFT join: minhashSig emits no row for a <2-token doc (no bigram
    // shingles), and an inner join would silently drop such docs from the
    // flags frame — undercounting every stage and discarding
    // quality-passing short docs from the cleaned corpus. A sig-less doc
    // keeps null m0..m7, is excluded from banding below (it must not land
    // in a shared '' band_key bucket), and passes s3 whenever s2 holds —
    // a doc with no shingles has no near-duplicates.
    // exact-dup keep flag via groupBy(min) + join back, not a window
    // over the hash groups: a mass-duplicated page (the mega-pile every
    // web corpus has) collapses map-side in the partial aggregation
    // instead of landing on one window reducer; the join back is
    // AQE-skew-splittable, which a window never is
    val withH = docs.withColumn("h", md5(col("text")))
    val keeps = withH.groupBy("h").agg(min("doc_id").as("keep"))
    val flags = withH
      .join(keeps, "h")
      .withColumn("s1", col("doc_id") === col("keep"))
      .drop("h", "keep")
      .join(TextAnalysis.qualityScores(s, docs), "doc_id")
      .withColumn("s2", col("s1") && col("quality") >= 0.35)
      .join(Dedup.minhashSig(docs), Seq("doc_id"), "left")
      .persist()
    val bands = flags.filter(col("s2") && col("m0").isNotNull)
      .select(col("doc_id"), Dedup.bandStack)
    val dupIds = bands.groupBy("band", "band_key")
      .agg(min("doc_id").as("keep"), collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("keep"))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id").distinct()
      .withColumn("is_dup", lit(true))
    flags.join(dupIds, Seq("doc_id"), "left")
      .withColumn("s3", col("s2") && col("is_dup").isNull)
  }

  /** The cleaned corpus — what a caller writes back to the lake. */
  def cleaned(s: SparkSession, d: String): DataFrame =
    survivalFlags(s, d).filter(col("s3"))
      .select("doc_id", "text")

  /** CLUSTER-level near-dup removal: exactly one survivor per CONNECTED
    * component of the bucket graph, via [[Dedup.connectedComponents]].
    *
    * Stricter than `cleaned`'s bucket-level keep-min, which keeps a doc
    * that is the min of every bucket IT is in even when a smaller
    * near-dup sits elsewhere in the same component — e.g. buckets {a,c}
    * and {b,c} with a<b<c: bucket-level keeps BOTH a and b (they never
    * meet in a bucket), cluster-level keeps only a. The bucket stars
    * (bucket-min → member edges) carry exactly the connectivity the
    * components need. */
  def cleanedStrict(s: SparkSession, d: String): DataFrame = {
    val flags = survivalFlags(s, d)
    val bands = flags.filter(col("s2") && col("m0").isNotNull)
      .select(col("doc_id"), Dedup.bandStack)
    val starEdges = bands.groupBy("band", "band_key")
      .agg(min("doc_id").as("doc_a"), collect_list(col("doc_id")).as("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val losers = Dedup.connectedComponents(starEdges)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    flags.filter(col("s2"))
      .join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
  }

  /** Filter funnel report — the per-stage attrition table every curation
    * run publishes (which rule kills how many docs, in pipeline order):
    * exact dedup first (pipe01's stage order), then the five tx14 Gopher
    * rules. Each document is attributed to its FIRST failing stage (a
    * CASE cascade — the funnel semantics: a doc both duplicated and
    * too short counts against dedup, the stage that would actually have
    * removed it), so stage kill counts are disjoint and n_in/n_out chain
    * exactly.
    *
    * Scale shape: per-doc verdicts are one corpus scan whose only wide
    * exchange is the content-hash window (dd01's dup criterion); the
    * funnel itself is a 6-row stage dimension left-joined to the
    * first-fail counts with a 6-row running-sum window — driver-trivial
    * relations at any corpus size. The empty-partition Window warning
    * this emits is a 6-row frame, not a data path. */
  val pipe15FilterFunnel: Q = Q(
    "pipe15_filter_funnel",
    s"""WITH w AS (SELECT doc_id, md5(text) AS h,
      |    ${TextAnalysis.tokListSql} AS l,
      |    ${TextAnalysis.nSymbolsSql} AS n_symbols
      |  FROM documents),
      |m AS (SELECT doc_id, n_symbols, ${TextAnalysis.gopherMetricsSql},
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |  FROM w),
      |f AS (SELECT CASE
      |    WHEN rn > 1 THEN 1
      |    WHEN NOT (${TextAnalysis.gopherRulesSql(0)}) THEN 2
      |    WHEN NOT (${TextAnalysis.gopherRulesSql(1)}) THEN 3
      |    WHEN NOT (${TextAnalysis.gopherRulesSql(2)}) THEN 4
      |    WHEN NOT (${TextAnalysis.gopherRulesSql(3)}) THEN 5
      |    WHEN NOT (${TextAnalysis.gopherRulesSql(4)}) THEN 6
      |    ELSE 0 END AS fs
      |  FROM m),
      |killed AS (SELECT fs, count(*) AS nk FROM f WHERE fs > 0 GROUP BY 1),
      |stages(stage_order, stage) AS (VALUES (1, 'exact_dup'),
      |  (2, 'word_count'), (3, 'mean_word_len'), (4, 'alpha_ratio'),
      |  (5, 'symbol_ratio'), (6, 'stop_words')),
      |tot AS (SELECT count(*) AS n FROM f)
      |SELECT CAST(s.stage_order AS BIGINT) AS stage_order, s.stage,
      |  CAST(tot.n - coalesce(sum(coalesce(k.nk, 0))
      |    OVER (ORDER BY s.stage_order
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS n_in,
      |  CAST(coalesce(k.nk, 0) AS BIGINT) AS n_killed,
      |  CAST(tot.n - sum(coalesce(k.nk, 0))
      |    OVER (ORDER BY s.stage_order
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS n_out
      |FROM stages s LEFT JOIN killed k ON k.fs = s.stage_order
      |CROSS JOIN tot ORDER BY stage_order""".stripMargin) { (sp, d) =>
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    // rn > 1 ⟺ not the group-min doc: same groupBy+join recipe as
    // pipe01's keep flag (no window over the exact-dup hash groups)
    val withH = Tables.documents(sp, d).withColumn("h", md5(col("text")))
    val keeps = withH.groupBy("h").agg(min("doc_id").as("keep"))
    val m = TextAnalysis.withGopherMetrics(withH.join(keeps, "h"))
    val rules = TextAnalysis.gopherRuleCols
    val fs = when(col("doc_id") =!= col("keep"), 1)
      .when(!rules(0), 2)
      .when(!rules(1), 3)
      .when(!rules(2), 4)
      .when(!rules(3), 5)
      .when(!rules(4), 6)
      .otherwise(0)
    // ONE corpus consumer: the ≤7-row first-fail counts carry both the
    // kill table and (summed) the total; checkpointed (pipe14's pattern)
    // so the kill/total consumers replay 7 rows, not the corpus scan
    val counts = m.select(fs.as("fs"))
      .groupBy("fs").agg(count(lit(1)).as("nk"))
      .materialized
    val killed = counts.filter(col("fs") > 0)
    val tot = counts.agg(sum("nk").as("n"))
    val stages = Seq(1L -> "exact_dup", 2L -> "word_count",
      3L -> "mean_word_len", 4L -> "alpha_ratio", 5L -> "symbol_ratio",
      6L -> "stop_words").toDF("stage_order", "stage")
    // 6-row frame: the un-partitioned windows are intentional
    val cumBefore = Window.orderBy("stage_order")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumThrough = Window.orderBy("stage_order")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stages
      .join(broadcast(killed), col("stage_order") === col("fs"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n_killed", coalesce(col("nk"), lit(0L)))
      .select(col("stage_order"), col("stage"),
        (col("n") - coalesce(sum("n_killed").over(cumBefore), lit(0L)))
          .as("n_in"),
        col("n_killed"),
        (col("n") - sum("n_killed").over(cumThrough)).as("n_out"))
      .orderBy("stage_order")
  }

  val queries: Seq[Q] = Seq(pipe01CleanCorpus, pipe10CleanWinnow,
    pipe15FilterFunnel)
}
