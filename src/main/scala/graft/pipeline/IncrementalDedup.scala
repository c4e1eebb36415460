package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.tables.Checkpoints.CheckpointOps
import graft.tables.Tables

/** INCREMENTAL near-dup detection for ARRIVING data — the dedup analog
  * of the incremental integrity tier (scheduler.IncrementalScheduler,
  * ref README.md:2 resumability): a production corpus is not deduped
  * once, it GROWS, and re-running the full LSH chain over 100 TB because
  * 100 GB arrived is the anti-pattern. This module persists the minhash
  * signature state between batches and, per arriving batch, emits
  * EXACTLY the pairs the full-corpus chain (dd03's [[Dedup.lshPairsOf]])
  * would emit that involve at least one new document — proven by the
  * dd16 oracle (full-corpus SQL restricted to new-involving pairs) and
  * by IncrementalDedupSpec's property test against the batch chain.
  *
  * Scale shape — the whole point is work ∝ BATCH, not corpus:
  *  - signatures are computed for NEW docs only; old signatures come
  *    from the store (one narrow scan, never re-derived from text);
  *  - the exact-signature star collapse re-groups ONLY the signature
  *    classes the batch touches (store side joined on the broadcastable
  *    batch key set — bucket the store by sig_key on a real lake and
  *    the join reads matching buckets without a store shuffle);
  *  - LSH banding expands ONLY buckets containing a NEW-doc
  *    representative: the batch reps' band keys form a (tiny) broadcast
  *    set, untouched-class reps semi-join into exactly those buckets,
  *    and the expansion runs through the SAME guarded path as the batch
  *    chain ([[Dedup.lshPairsFromRep]] — cap/truncate semantics
  *    preserved; a touched bucket sees its FULL membership, so throw
  *    thresholds and the deterministic truncate sample match the full
  *    run bit-for-bit). Buckets no new doc landed in are never listed,
  *    never collected, never expanded.
  *
  * Restriction equality, the contract the spec pins: for every split
  * old ∪ new, `ingest(store(old), sigs(new)).pairs` equals
  * `lshPairsOf(sigs(old ∪ new))` filtered to pairs with ≥1 new doc —
  * including representative CHANGES (a new doc with a smaller id than
  * its class rep becomes the rep, and both its star edges and its
  * banding pairs surface as the full run would emit them). The one
  * deliberate divergence: an OVERSIZE bucket no new doc touches is not
  * re-policed (it was policed when its docs arrived).
  */
object IncrementalDedup {

  /** Result of one batch: the new-involving pair stream plus the store
    * frame for the NEXT batch (old ∪ new signatures with refreshed
    * class representatives — byte-equal to [[Dedup.sigWithRep]] over
    * the union, which the spec pins). */
  final case class IngestResult(pairs: DataFrame, updatedStore: DataFrame)

  private def mCols = (0 until 8).map(k => col(s"m$k"))
  private def sigCols =
    col("sig_key") +: col("doc_id") +: mCols

  /** Bootstrap a store from an initial corpus's signature frame
    * ((doc_id, m0..m7) — [[Dedup.minhashSig]]'s layout). */
  def initialStore(sigFrame: DataFrame): DataFrame =
    Dedup.sigWithRep(sigFrame)

  /** One arriving batch against the persisted signature state. */
  def ingest(store: DataFrame, newSigs: DataFrame,
      maxBucket: Int = 1000): IngestResult = {
    val newKeyed = newSigs
      .withColumn("sig_key", concat_ws("|", mCols: _*))
      .select(sigCols: _*).materialized
    // the batch's signature-class key set: broadcastable by definition
    // (≤ one key per arriving doc)
    val touchedKeys = newKeyed.select("sig_key").distinct()
    val storeTouched = store.join(broadcast(touchedKeys), "sig_key")
    // full membership of every touched class, with the representative
    // RECOMPUTED over old ∪ new (a new doc with a smaller id takes over
    // as rep, exactly as the full-corpus groupBy would decide).
    // dropDuplicates: a RE-ARRIVING doc (an at-least-once replay — same
    // doc_id, same text, so the identical signature row on both sides
    // of the union) collapses to one membership row, which makes a
    // replayed batch produce byte-identical pairs and an unchanged
    // store instead of duplicated star edges. doc_id is an immutable
    // content id by contract — the dedup is over touched classes only,
    // never the corpus.
    val members = storeTouched.select(sigCols: _*)
      .unionByName(newKeyed)
      .dropDuplicates("sig_key", "doc_id")
    val reps2 = members.groupBy("sig_key").agg(min("doc_id").as("rep"))
    val touchedWithRep = members.join(reps2, "sig_key").materialized
    val newIds = newKeyed.select("doc_id").distinct().materialized
    // buckets worth expanding = buckets containing a NEW-DOC rep; their
    // (band, band_key) set is batch-sized -> broadcast
    val newRepRows = touchedWithRep
      .filter(col("doc_id") === col("rep"))
      .join(newIds, Seq("doc_id"), "left_semi")
    val b0 = concat_ws("|", col("m0"), col("m1"), col("m2"), col("m3"))
    val b1 = concat_ws("|", col("m4"), col("m5"), col("m6"), col("m7"))
    val tb0 = newRepRows.select(b0.as("bk0")).distinct()
    val tb1 = newRepRows.select(b1.as("bk1")).distinct()
    // untouched-class reps that share a touched bucket (either band):
    // the only old state the banding needs. Semi-join per band, then
    // doc-level dedup (a rep can hit on both bands).
    val untouchedReps = store.filter(col("doc_id") === col("rep"))
      .join(broadcast(touchedKeys), Seq("sig_key"), "left_anti")
    val hit0 = untouchedReps.withColumn("bk0", b0)
      .join(broadcast(tb0), Seq("bk0"), "left_semi").drop("bk0")
    val hit1 = untouchedReps.withColumn("bk1", b1)
      .join(broadcast(tb1), Seq("bk1"), "left_semi").drop("bk1")
    val pruned = hit0.unionByName(hit1).dropDuplicates("doc_id")
    // the SAME guarded expansion as the batch chain: star edges from the
    // touched classes, banding over touched buckets at full membership
    // (cap/truncate bit-identical to the full run there)
    val all = Dedup.lshPairsFromRep(
      touchedWithRep.select((sigCols :+ col("rep")): _*)
        .unionByName(pruned.select((sigCols :+ col("rep")): _*))
        .materialized,
      maxBucket)
    // restriction: keep pairs with >= 1 NEW endpoint (drops the old-old
    // edges touched classes/buckets also contain — those were emitted
    // when their docs arrived). Truncate mode's bucket_truncated audit
    // flag rides through untouched — the loss-auditing contract of the
    // batch chain holds for arrivals too.
    val outCols =
      if (all.columns.contains("bucket_truncated"))
        Seq("doc_a", "doc_b", "bucket_truncated")
      else Seq("doc_a", "doc_b")
    val na = newIds.select(col("doc_id").as("doc_a"))
      .withColumn("na", lit(1))
    val nb = newIds.select(col("doc_id").as("doc_b"))
      .withColumn("nb", lit(1))
    val pairs = all.select(outCols.map(col): _*)
      .join(broadcast(na), Seq("doc_a"), "left")
      .join(broadcast(nb), Seq("doc_b"), "left")
      .filter(col("na").isNotNull || col("nb").isNotNull)
      .select(outCols.map(col): _*)
    val updated = store
      .join(broadcast(touchedKeys), Seq("sig_key"), "left_anti")
      .select((sigCols :+ col("rep")): _*)
      .unionByName(touchedWithRep.select((sigCols :+ col("rep")): _*))
    IngestResult(pairs, updated)
  }

  /** Parquet-backed signature store with the StateStore swap discipline
    * (tmp -> rename, crash-safe newest-complete-generation load;
    * single-writer by contract — the arrival pipeline owns its store the
    * way the nightly scheduler owns its state path). */
  final class SigStore(spark: SparkSession, path: String) {
    private def fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def load(): Option[DataFrame] = {
      val tmp = new Path(path + ".tmp")
      val src =
        if (fs.exists(new Path(tmp, "_SUCCESS"))) Some(path + ".tmp")
        else if (fs.exists(new Path(path))) Some(path)
        else if (fs.exists(new Path(path + ".old"))) Some(path + ".old")
        else None
      src.map(spark.read.parquet(_))
    }

    def save(storeFrame: DataFrame): Unit = {
      val tmp = path + ".tmp"
      val old = path + ".old"
      storeFrame.write.mode(SaveMode.Overwrite).parquet(tmp)
      val p = new Path(path)
      val pOld = new Path(old)
      if (fs.exists(pOld)) fs.delete(pOld, true)
      if (fs.exists(p)) fs.rename(p, pOld)
      fs.rename(new Path(tmp), p)
      fs.delete(pOld, true)
      ()
    }
  }

  /** dd16: the incremental chain, oracle-gated. The fixture corpus is
    * split deterministically (md5 bucket % 5 == 0 → the "arriving" 20%);
    * the Spark side builds the store from the old 80%, ingests the new
    * 20%, and must reproduce the FULL-corpus dd03 pair set restricted to
    * pairs involving an arriving doc — the restriction-equality contract
    * stated in the class doc, checked here against an oracle that runs
    * the whole chain monolithically. */
  val dd16IncrementalLsh: Q = Q(
    "dd16_incremental_lsh",
    s"""WITH ${Dedup.lshPairsCte},
       |newdocs AS (SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |    % 5 = 0)
       |SELECT doc_a, doc_b FROM lsh_pairs
       |WHERE doc_a IN (SELECT doc_id FROM newdocs)
       |   OR doc_b IN (SELECT doc_id FROM newdocs)
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val all = Tables.spread(s, Tables.documents(s, d), "doc_id")
    val isNew = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(5)) === 0
    val store = initialStore(Dedup.minhashSig(all.filter(!isNew)))
    val inc = ingest(store, Dedup.minhashSig(all.filter(isNew)))
    inc.pairs.orderBy("doc_a", "doc_b")
  }

  val queries: Seq[Q] = Seq(dd16IncrementalLsh)
}
