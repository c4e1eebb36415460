package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Checkpoints.CheckpointOps
import graft.tables.Tables

/** Multimodal-column plumbing (north-star surface): image/audio/video as
  * opaque `binary` columns with typed metadata. The image/audio codec libs
  * are not in this container, so the DECODE step is a clearly-marked
  * deterministic fake — but the Spark-side plumbing is real and tested:
  * binary payloads, per-partition batch iteration (the Scala analog of a
  * Pandas-UDF `mapInPandas` batch), an explicit output schema, and a
  * frame-sampling explode.
  *
  * Scale shape: decode is embarrassingly parallel per partition (no
  * shuffle); frame sampling is a generator (one explode), so downstream
  * operators see rows, not blobs.
  */
/** Decoded-media metadata row. Top-level + public so Spark's generated
  * code (whole-stage codegen / encoder) can instantiate it — a private
  * nested case class forces interpreted-mode fallback. */
case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
    width: Int, height: Int, n_frames: Int)

object Multimodal {

  private val md5 = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** DETERMINISTIC FAKE decoder — stands in for an image/video codec.
    * Derives pseudo-metadata from payload bytes only, so results are
    * stable across engines/runs. A real deployment swaps this body for
    * JNI/codec calls; the partition-batch shape stays identical.
    *
    * The checksum is the first 4 bytes of md5(payload) read big-endian —
    * chosen over a rolling hash because it is reproducible in portable SQL
    * (`CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)`), which makes the
    * metadata queries mm01-mm03 ORACLE-CHECKABLE instead of rows-only. */
  private def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val d = md5.get().digest(payload)
    val checksum = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val fmt = (checksum % 3) match {
      case 0L => "jpeg"; case 1L => "png"; case _ => "webm"
    }
    MediaMeta(docId, n, fmt,
      width = 16 + (checksum % 64).toInt,
      height = 16 + ((checksum / 64) % 64).toInt,
      n_frames = if (fmt == "webm") 1 + (n % 5) else 1)
  }

  /** The fake decoder's metadata, spelled in oracle SQL over `documents`
    * (payload = utf-8 bytes of `text`, so `md5(text)` IS md5(payload)). */
  private val oracleMetaCte =
    """meta AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |    CASE h % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webm' END
      |      AS format,
      |    16 + h % 64 AS width, 16 + (h // 64) % 64 AS height,
      |    CASE WHEN h % 3 = 2 THEN 1 + octet_length(encode(text)) % 5
      |         ELSE 1 END AS n_frames
      |  FROM (SELECT doc_id, text,
      |          CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS h
      |        FROM documents))""".stripMargin

  /** Decode/feature-extract over an opaque binary column via typed
    * mapPartitions (batched per partition — no per-row task overhead). */
  val mm01DecodeMeta: Q = Q(
    "mm01_decode_meta",
    s"""WITH $oracleMetaCte
       |SELECT doc_id, n_bytes, format, width, height, n_frames
       |FROM meta ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val bin = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { batch =>
      // one iterator per partition == one "batch" in mapInPandas terms
      batch.map { case (id, payload) => fakeDecode(id, payload) }
    }.toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: one row per sampled frame (explode over the decoded
    * frame count) with a deterministic per-frame timestamp/offset. */
  val mm02FrameSample: Q = Q(
    "mm02_frame_sample",
    s"""WITH $oracleMetaCte
       |SELECT doc_id, format, frame_idx, frame_idx * 40 AS frame_ts_ms
       |FROM (SELECT doc_id, format, unnest(range(n_frames)) AS frame_idx
       |      FROM meta WHERE n_frames > 1)
       |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => fakeDecode(id, p) })
      .toDF()
    meta.filter(col("n_frames") > 1)
      .select(col("doc_id"), col("format"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * 40) // 25 fps fake
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize plumbing: metadata-level resize planning (target boxes per
    * aspect ratio) — the shape of a batched image transform without the
    * codec. Rounding is the stable floor(x+0.5) formula on both engines
    * ([[graft.functions.StableRound]] doctrine). */
  val mm03ResizePlan: Q = Q(
    "mm03_resize_plan",
    s"""WITH $oracleMetaCte,
       |sc AS (SELECT doc_id, width, height,
       |         least(224.0 / width, 224.0 / height) AS scale
       |       FROM meta)
       |SELECT doc_id, width, height,
       |  CAST(floor(width * scale + 0.5) AS INTEGER) AS out_w,
       |  CAST(floor(height * scale + 0.5) AS INTEGER) AS out_h
       |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => fakeDecode(id, p) })
      .toDF()
    meta.withColumn("scale",
        least(lit(224.0) / col("width"), lit(224.0) / col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale") + 0.5).cast("int").as("out_w"),
        floor(col("height") * col("scale") + 0.5).cast("int").as("out_h"))
      .orderBy("doc_id")
  }

  /** Feature extraction: opaque payload → fixed-dim Float vector (the
    * hand-off from the multimodal tier into the similarity tier). The
    * FEATURE function is a deterministic fake (folded byte histogram — a
    * codec would emit pooled embeddings instead); the plumbing is the real
    * contract: typed mapPartitions batches, an `Array[Float]` feature
    * column with an explicit schema, then the same codegen'd FloatDot
    * kernel the sim* queries use, scoring against a broadcast-literal
    * probe vector. Embarrassingly parallel; one top-k at the end. */
  val mm04FeatureExtract: Q = Q.noOracle("mm04_feature_extract") { (s, d) =>
    import s.implicits._
    import graft.functions.VectorOps
    val feats = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        // FAKE 8-bin byte histogram, L1-normalized — stands in for a
        // pooled image/audio embedding
        val h = new Array[Float](8)
        p.foreach(b => h((b & 0xff) >> 5) += 1f)
        val n = math.max(1, p.length).toFloat
        (id, h.map(_ / n))
      })
      .toDF("doc_id", "features")
    val probe = array((0 until 8).map(i => lit(0.35355339f)): _*) // unit v
    val nrm = VectorOps.norm(col("features"))
    feats
      // zero-byte payload → all-zero features → 0/0 = NaN, and NaN sorts
      // ABOVE every number under desc; score empty media as 0 instead
      .withColumn("score",
        when(nrm > 0, VectorOps.dot(col("features"), probe) / nrm)
          .otherwise(lit(0.0)))
      .select(col("doc_id"), round(col("score"), 4).as("probe_cosine"))
      .orderBy(col("probe_cosine").desc, col("doc_id")).limit(20)
  }

  /** mm04's ORACLE-CHECKABLE twin: same typed-mapPartitions batch shape
    * over the binary payload, but the features are exact byte-class
    * COUNTS kept in double, and the probe score is a FIXED-ORDER
    * expression chain — (((h0·p0 + h1·p1) + …) + h7·p7) / ‖h‖ with
    * p_i = (i+1)/√204 — so both engines execute the identical sequence of
    * double operations and the result hash-matches bit-exactly (mm04's
    * Float pipeline can't: no SQL twin reproduces float32 rounding).
    * Oracle caveat (same as the winnow oracle): byte class == char class
    * only for ASCII text, which the fixture is; the Spark side computes
    * from real payload bytes either way. */
  val mm05FeatureProbe: Q = {
    def pSql(i: Int) = s"(${i + 1} / sqrt(204.0))"
    val numSql = (0 until 8).map(i => s"h$i * ${pSql(i)}").mkString(" + ")
    val denSql = (0 until 8).map(i => s"h$i * h$i").mkString(" + ")
    def cls(i: Int) = f"[^\\x${i * 32}%02x-\\x${i * 32 + 31}%02x]"
    val histSql = (0 until 4).map(i =>
      s"""CAST(length(regexp_replace(text, '${cls(i)}', '', 'g')) AS DOUBLE)
         |    AS h$i""".stripMargin).mkString(",\n  ") +
      ",\n  " + (4 until 8).map(i =>
        s"CAST(0 AS DOUBLE) AS h$i /* non-ASCII byte classes: empty here */")
        .mkString(",\n  ")
    Q(
      "mm05_feature_probe",
      s"""WITH f AS (SELECT doc_id,
         |  $histSql
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN $denSql > 0 THEN
         |    floor(($numSql) / sqrt($denSql) * 10000 + 0.5) / 10000
         |  ELSE 0.0 END AS probe_cosine
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions.sqrt
      val feats = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val h = new Array[Double](8)
          p.foreach(b => h((b & 0xff) >> 5) += 1.0)
          (id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
        })
        .toDF("doc_id", "h0", "h1", "h2", "h3", "h4", "h5", "h6", "h7")
      val num = (0 until 8)
        .map(i => col(s"h$i") * (lit((i + 1).toDouble) / sqrt(lit(204.0))))
        .reduce(_ + _) // left fold == the oracle's explicit chain order
      val den = (0 until 8).map(i => col(s"h$i") * col(s"h$i")).reduce(_ + _)
      feats.select(col("doc_id"),
        when(den > 0,
          graft.functions.StableRound.r4(num / sqrt(den)))
          .otherwise(lit(0.0)).as("probe_cosine"))
        .orderBy("doc_id")
    }
  }

  /** Audio segmentation (VAD-shaped): the audio path the tier was
    * missing — fake-decode the payload into 25 ms PCM frames (40 bytes
    * each), score per-frame energy, and roll contiguous above-threshold
    * frames into speech segments (the pos − row_number island trick,
    * dd12's discipline). The DECODE is the marked deterministic fake
    * (per-frame energy = md5-derived integer in [0, 1000), reproducible
    * in portable SQL like mm01's checksum); a real deployment swaps the
    * frame-energy lambda for a codec + RMS window and the plumbing —
    * typed per-partition batch decode, frame generator, island rollup —
    * is unchanged.
    *
    * Scale shape: decode + frame generation are per-partition (no
    * shuffle); the only wide exchange is the per-doc island window, and
    * the segment rollup rides it (partial-key subset). Mean energy stays
    * an integer sum until one r2 division. */
  val mm06AudioSegments: Q = Q(
    "mm06_audio_segments",
    """WITH f AS (SELECT doc_id, md5(text) AS h,
      |    unnest(range(octet_length(encode(text)) // 40)) AS frame_idx
      |  FROM documents WHERE octet_length(encode(text)) >= 40),
      |e AS (SELECT doc_id, frame_idx,
      |    ('0x' || substr(md5(h || ':' || frame_idx::VARCHAR), 1, 8))::BIGINT
      |      % 1000 AS energy
      |  FROM f),
      |sp AS (SELECT doc_id, frame_idx, energy,
      |    frame_idx - row_number() OVER (PARTITION BY doc_id
      |      ORDER BY frame_idx) AS grp
      |  FROM e WHERE energy >= 200)
      |SELECT doc_id, CAST(min(frame_idx) AS BIGINT) AS seg_start,
      |  count(*) AS seg_frames,
      |  floor(CAST(sum(energy) AS DOUBLE) / count(*) * 100 + 0.5) / 100
      |    AS avg_energy
      |FROM sp GROUP BY doc_id, grp
      |ORDER BY doc_id, seg_start""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.StableRound
    val frames = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val dig = java.security.MessageDigest.getInstance("MD5")
        batch.flatMap { case (id, payload) =>
          val nFrames = payload.length / 40
          if (nFrames == 0) Iterator.empty
          else {
            // DETERMINISTIC FAKE frame energy: md5(hex(md5(payload)) +
            // ":" + idx) first 4 bytes big-endian, mod 1000 — the SQL
            // twin is md5(md5(text) || ':' || idx)
            val h = dig.digest(payload).map("%02x".format(_)).mkString
            (0 until nFrames).iterator.map { fi =>
              val d2 = dig.digest(s"$h:$fi".getBytes("UTF-8"))
              val v = ((d2(0) & 0xffL) << 24) | ((d2(1) & 0xffL) << 16) |
                ((d2(2) & 0xffL) << 8) | (d2(3) & 0xffL)
              (id, fi, v % 1000)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "energy")
    frames
      .filter(col("energy") >= 200)
      .withColumn("grp", col("frame_idx") - row_number().over(
        Window.partitionBy("doc_id").orderBy("frame_idx")))
      .groupBy("doc_id", "grp")
      .agg(min("frame_idx").cast("long").as("seg_start"),
        count(lit(1)).as("seg_frames"),
        StableRound.r2(sum("energy").cast("double") / count(lit(1)))
          .as("avg_energy"))
      .select("doc_id", "seg_start", "seg_frames", "avg_energy")
      .orderBy("doc_id", "seg_start")
  }

  /** Image near-duplicate groups by perceptual hash — the multimodal
    * dedup operator: hash every decoded image (a real deployment: 8×8
    * luma downsample → DCT → 64 sign bits, i.e. classic pHash), group
    * by hash, report every group of 2+. The DECODE+HASH step is the
    * marked deterministic fake (first 64 bits of md5(payload), hex —
    * reproducible in SQL, which keeps the query strict-oracled); a real
    * pHash swaps the per-partition lambda without touching the plan.
    *
    * With a real pHash, NEAR-duplicates (hamming ≤ 2 over 64 bits)
    * compose via dd04's pigeonhole banding on hash segments — the fake
    * hash has no near-collisions by construction, so this query ships
    * the exact-group tier and documents the banding as the extension.
    *
    * Scale shape: per-partition hash (no shuffle), ONE combine-heavy
    * groupBy on the 16-char hash — dd01's exact-dedup shape with the
    * hash computed from bytes instead of text. The member list is
    * CAPPED at 20 sample docs (rank window before the agg — dd07's
    * bounded-bucket discipline), so a boilerplate image repeated 10⁸
    * times costs a 20-entry buffer, never a mega-group; the full count
    * still reports. The rank window and the groupBy share one phash
    * exchange. */
  /** MARKED FAKE luma decode — a deterministic W×H grayscale plane
    * derived from the payload (a smooth two-tone gradient whose
    * parameters come from the payload hash, so near-identical payloads
    * give near-identical planes). Stands in for a codec's luma output;
    * a real deployment swaps this body for libjpeg/ffmpeg calls and the
    * downstream [[graft.functions.PHash]] kernel — which IS production
    * code — consumes the same (w, h, bytes) contract unchanged. */
  private[graft] def fakeLumaDecode(payload: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val d = md5.get().digest(payload)
    val fx = 1 + (d(4) & 0x3)          // low horizontal frequency
    val fy = 1 + (d(5) & 0x3)          // low vertical frequency
    val phase = (d(6) & 0xff) / 255.0 * 2 * math.Pi
    val amp = 40 + (d(7) & 0x3f)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128 + amp * math.sin(
          2 * math.Pi * (fx * x.toDouble / w + fy * y.toDouble / h) + phase)
        out(y * w + x) = math.max(0, math.min(255, v.round.toInt)).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** The decoder contract's LUMA entry: REAL decode when the payload is
    * a binary PPM/PGM ([[Ppm.tryDecodeLuma]] — pure Scala, no codec
    * libs, the one format this container can decode end-to-end for
    * real), marked-fake plane otherwise. A corpus whose `text` carries
    * ASCII-safe PPM bytes (maxval ≤ 127 survives the utf-8 round trip)
    * therefore flows REAL PIXELS through every consumer of this entry
    * with zero plumbing change; PHashSpec's banding-recall case runs on
    * exactly such truly-decoded planes. */
  private[graft] def decodeLuma(docId: Long,
      payload: Array[Byte]): (Int, Int, Array[Byte]) =
    Ppm.tryDecodeLuma(payload).getOrElse {
      val meta = fakeDecode(docId, payload)
      (meta.width, meta.height,
        fakeLumaDecode(payload, meta.width, meta.height))
    }

  /** Decoder-contract metadata with the REAL path first: PPM/PGM
    * payloads report their actual dimensions and format; everything else
    * falls back to the marked fake (which the mm01 ORACLE mirrors — the
    * driver fixtures carry no PPM bytes, so the gated path is the fake
    * on both engines). */
  private[graft] def realDecodeMeta(docId: Long,
      payload: Array[Byte]): MediaMeta =
    Ppm.tryDecodeLuma(payload) match {
      case Some((w, h, _)) =>
        MediaMeta(docId, payload.length,
          if (payload(1) == '5') "pgm" else "ppm", w, h, n_frames = 1)
      case None => fakeDecode(docId, payload)
    }

  /** REAL-pHash frame (doc_id, 16-hex phash) behind the decoder
    * contract: the same per-partition batch pass as [[fakePhash]], but
    * the hash is [[graft.functions.PHash]]'s 8×8 luma-DCT sign bits over
    * the [[decodeLuma]] plane — REAL pixels for PPM/PGM payloads, the
    * marked fake otherwise. Spec-gated (PHashSpec proves the kernel's
    * affine invariance + banding recall on truly decoded images, and
    * this frame's plumbing); the mm07/mm09 ORACLE path keeps the md5
    * fake so DuckDB can mirror the hash exactly. */
  private[graft] def realPhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val (w, h, luma) = decodeLuma(id, payload)
        (id, graft.functions.PHash.hex(
          graft.functions.PHash.phash64(luma, w, h)))
      })
      .toDF("doc_id", "phash")
  }

  /** The fake-pHash frame (doc_id, 16-hex phash) shared by mm07/mm09:
    * per-partition decode+hash over the byte payload — a real pHash swaps
    * this lambda without touching either consumer's plan. */
  private def fakePhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        // FAKE pHash (see mm07 doc comment): hex of md5(payload)[0..7]
        val dg = md5.get().digest(payload)
        (id, dg.take(8).map(b => f"${b & 0xff}%02x").mkString)
      })
      .toDF("doc_id", "phash")
  }

  val mm07PhashDup: Q = Q(
    "mm07_phash_dup",
    """WITH h AS (SELECT doc_id, substr(md5(text), 1, 16) AS phash
      |           FROM documents),
      |r AS (SELECT phash, doc_id, row_number() OVER (
      |        PARTITION BY phash ORDER BY doc_id) AS rk FROM h)
      |SELECT phash, count(*) AS n_images,
      |  min(doc_id) AS rep_doc,
      |  string_agg(CASE WHEN rk <= 20 THEN CAST(doc_id AS VARCHAR) END,
      |    ',' ORDER BY doc_id) AS sample_docs
      |FROM r GROUP BY phash HAVING count(*) >= 2
      |ORDER BY phash""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // Two consumers of the phash frame: full-group counts (partial-agg,
    // skew-safe on a mega-dup pile) and the top-20 sample, whose rank
    // filter is a LITERAL so Spark prunes it with a PARTIAL
    // WindowGroupLimit — each mapper keeps ≤20 rows per phash BEFORE the
    // exchange. The old form computed rk for every row (the when() hid
    // the limit from the optimizer), putting the whole pile through one
    // window reducer. Group-level join reassembles (|groups|-sized).
    val ph = fakePhash(s, d).materialized
    val counts = ph.groupBy("phash")
      .agg(count(lit(1)).as("n_images"), min("doc_id").as("rep_doc"))
      .filter(col("n_images") >= 2)
    val sample = ph
      .withColumn("rk", row_number().over(
        Window.partitionBy("phash").orderBy("doc_id")))
      .filter(col("rk") <= 20)
      .groupBy("phash")
      .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("sample_docs"))
    counts.join(sample, "phash")
      .select("phash", "n_images", "rep_doc", "sample_docs")
      .orderBy("phash")
  }

  /** Modality-coverage audit: which documents have a paired embedding
    * (vec_id aligned to doc_id) and which vectors are orphans — the
    * alignment check a multimodal training set needs before any joint
    * text+vector training run (the sf0.1 fixture really is partial:
    * 5000 docs, 2000 vectors). Per source: doc count, paired count,
    * missing count, coverage ratio; orphan vectors report under the
    * '(orphan)' pseudo-source.
    *
    * Scale shape: one id-keyed full outer join (both sides shuffle once
    * on the join key — unavoidable for an alignment audit) feeding a
    * |sources|-group rollup with map-side partials. Nothing wider than
    * (id, source) ever moves. */
  val mm08ModalityCoverage: Q = Q(
    "mm08_modality_coverage",
    """WITH j AS (SELECT coalesce(d.source, '(orphan)') AS source,
      |    d.doc_id, e.vec_id
      |  FROM documents d FULL JOIN embeddings e ON e.vec_id = d.doc_id)
      |SELECT source,
      |  CAST(count(doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
      |    THEN 1 END) AS BIGINT) AS n_paired,
      |  CAST(count(doc_id) - count(CASE WHEN doc_id IS NOT NULL
      |    AND vec_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_missing,
      |  floor(CAST(count(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT
      |    NULL THEN 1 END) AS DOUBLE) / nullif(count(doc_id), 0)
      |    * 10000 + 0.5) / 10000 AS coverage
      |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    import graft.functions.StableRound
    val j = Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(Tables.embeddings(s, d).select(col("vec_id")),
        col("vec_id") === col("doc_id"), "full")
      .select(coalesce(col("source"), lit("(orphan)")).as("source"),
        col("doc_id"), col("vec_id"))
    val paired = count(when(
      col("doc_id").isNotNull && col("vec_id").isNotNull, 1))
    j.groupBy("source")
      .agg(count(col("doc_id")).as("n_docs"), paired.as("n_paired"),
        (count(col("doc_id")) - paired).as("n_missing"),
        StableRound.r4(paired.cast("double") /
          nullif(count(col("doc_id")), lit(0))).as("coverage"))
      .orderBy("source")
  }

  /** Per-hex-char hamming distance between two 16-hex pHashes, as an
    * in-row integer fold both engines replay exactly. */
  private def hammingSql(pa: String, pb: String): String =
    s"""aggregate(transform(sequence(1, 16), i ->
       |  bit_count((instr('0123456789abcdef', substring($pa, i, 1)) - 1)
       |          ^ (instr('0123456789abcdef', substring($pb, i, 1)) - 1))),
       |  0, (acc, x) -> acc + x)""".stripMargin

  /** Image NEAR-duplicate pairs by perceptual-hash hamming distance — the
    * banding extension mm07's doc comment promises, shipped: the 64-bit
    * pHash splits into 4×16-bit segments; hamming ≤ 2 can corrupt at most
    * 2 segments, so every qualifying pair agrees EXACTLY on ≥2 (a fortiori
    * ≥1) segments — dd04's pigeonhole argument at the image tier.
    * Candidates form by the segment-bucket groupBy (in-row pair expansion,
    * never a corpus self-join), are deduped across the 4 bands by one
    * candidate-sized exchange, and the exact hamming verdict is an in-row
    * integer fold over the hex chars (bit_count of per-char XOR) — no
    * float, both engines bit-agree. The hash is the same marked
    * deterministic fake as mm07 (md5-derived, so near-collisions are
    * structurally rare: expect exact-dup pairs at hamming 0); a real DCT
    * pHash swaps the per-partition lambda and populates the 1-2 band.
    *
    * Scale shape: per-partition hash, one (band, seg) exchange with tiny
    * buckets (65536 buckets per band), candidate-sized dedup + verify —
    * O(candidates), the dd08 discipline. */
  val mm09PhashNearDup: Q = Q(
    "mm09_phash_near_dup",
    """WITH h AS (SELECT doc_id, substr(md5(text), 1, 16) AS phash
      |           FROM documents),
      |segs AS (
      |  SELECT doc_id, CAST(o AS INTEGER) AS band,
      |    substr(phash, CAST(o * 4 + 1 AS INTEGER), 4) AS seg
      |  FROM h, range(4) AS t(o)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM segs a JOIN segs b
      |    ON a.band = b.band AND a.seg = b.seg AND a.doc_id < b.doc_id),
      |d AS (
      |  SELECT c.doc_a, c.doc_b,
      |    list_sum(list_transform(range(1, 17), i ->
      |      bit_count(xor(
      |        strpos('0123456789abcdef',
      |          substr(ha.phash, CAST(i AS INTEGER), 1)) - 1,
      |        strpos('0123456789abcdef',
      |          substr(hb.phash, CAST(i AS INTEGER), 1)) - 1))))
      |      AS hamming
      |  FROM cand c
      |  JOIN h ha ON ha.doc_id = c.doc_a
      |  JOIN h hb ON hb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming,
      |  hamming = 0 AS is_exact
      |FROM d WHERE hamming <= 2
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // three consumers (banding + both verify sides): hash once
    val h = fakePhash(s, d).materialized
    val cand = h
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 3), i -> substring(phash, i * 4 + 1, 4))"))
        .as(Seq("band", "seg")))
      .groupBy("band", "seg")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      // kernel i<j pair expansion (PairExpandSpec pins vs the HOF twin)
      .select(explode(graft.functions.PairExpand.pairsCol(col("ids")))
        .as("p"))
      .select("p.doc_a", "p.doc_b")
      // a pair agreeing on several bands surfaces once per band — one
      // candidate-sized dedup exchange
      .distinct()
    cand
      .join(h.select(col("doc_id").as("doc_a"), col("phash").as("pa")),
        "doc_a")
      .join(h.select(col("doc_id").as("doc_b"), col("phash").as("pb")),
        "doc_b")
      .withColumn("hamming", expr(hammingSql("pa", "pb")).cast("long"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        (col("hamming") === 0).as("is_exact"))
      .orderBy("doc_a", "doc_b")
  }

  val queries: Seq[Q] = Seq(mm01DecodeMeta, mm02FrameSample, mm03ResizePlan,
    mm04FeatureExtract, mm05FeatureProbe, mm06AudioSegments, mm07PhashDup,
    mm08ModalityCoverage, mm09PhashNearDup)
}
