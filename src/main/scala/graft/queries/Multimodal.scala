package graft.queries

import graft.NamedQuery
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pack: image/audio/video handled as opaque `binary`
  * columns with typed metadata — the large-scale-training-pipeline pattern
  * where media bytes travel through Spark untouched and only
  * decode/feature-extract kernels interpret them.
  *
  * This container ships no image/audio codecs, so the DECODE KERNELS ARE
  * DETERMINISTIC STUBS (clearly marked below): they synthesize metadata and
  * features from the bytes alone. Everything around them — the binary
  * column plumbing, the blob schema, batch-shaped kernel application via
  * `mapPartitions` on a typed Dataset, partition sizing, and the
  * downstream relational ops — is real Spark and is what these queries
  * exercise. Swapping a stub for a real JNI/codec call changes only the
  * kernel body.
  *
  * Since no testdata table carries media, blobs are synthesized from
  * `documents.text` bytes (UTF-8) — stable, reproducible, and
  * SQL-reachable, which lets the metadata path be oracle-checked.
  */
object Multimodal {

  /** Typed blob row: the schema a media lake table would have. */
  final case class Blob(doc_id: Long, media_type: String, bytes: Array[Byte])
  final case class Decoded(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, fp: Long, features: Array[Double])

  /** documents → opaque binary blobs with a media_type tag. */
  def blobs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"),
        // deterministic media-type assignment (plumbing only)
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("bytes"))

  /** ======== STUB KERNEL ========
    * Stands in for a real image/audio decoder. Deterministic: derives
    * "dimensions", a content fingerprint and an 8-dim "feature vector"
    * purely from byte content.  Runs per-partition over the typed
    * Dataset — the exact call shape a real vectorized decode (JNI
    * ffmpeg/turbojpeg, or Arrow-batched python) would use: one kernel
    * instance per partition, streaming iterator in/out, no per-row setup
    * cost.  The arithmetic is mod-prime (like t7's fold) rather than
    * wrapping-64-bit precisely so the whole kernel is replayable as
    * DuckDB SQL — which promotes m2 from a rows-only check to a full
    * value oracle over the mapPartitions path. */
  private val FpPrime = 1000000007L

  def decodePartition(rows: Iterator[Blob]): Iterator[Decoded] = {
    // per-partition "codec init" happens here (once, not per row)
    rows.map { b =>
      val n = b.bytes.length
      var h = 7L
      var i = 0
      while (i < n) { h = (h * 31 + (b.bytes(i) & 0xFF)) % FpPrime; i += 1 }
      val feats = Array.tabulate(8) { d =>
        (h * (2 * d + 3) % FpPrime).toDouble / FpPrime.toDouble
      }
      Decoded(b.doc_id, b.media_type, n, n % 640, n % 480, h, feats)
    }
  }

  // ---------------------------------------------------------------- m1
  /** Metadata path (oracle-checked): the blob plumbing + the parts of
    * "decode" that are pure byte arithmetic, aggregated per media type. */
  val m1BlobMetadata = NamedQuery(
    "m1_blob_metadata",
    (s, dir) => {
      blobs(s, dir)
        .withColumn("n_bytes", length(col("bytes")))
        .withColumn("width", col("n_bytes") % 640)
        .withColumn("height", col("n_bytes") % 480)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_blobs"),
          sum(col("n_bytes")).as("total_bytes"),
          graft.queries.Exact.avg4(col("width"), 0).as("avg_width"),
          graft.queries.Exact.avg4(col("height"), 0).as("avg_height"))
        .orderBy(col("media_type"))
    },
    Some("""SELECT media_type, count(*) AS n_blobs,
        CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        floor(round(sum(n_bytes % 640)) / count(*) * 10000) / 10000.0 AS avg_width,
        floor(round(sum(n_bytes % 480)) / count(*) * 10000) / 10000.0 AS avg_height
      FROM (SELECT
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        octet_length(CAST(text AS BLOB)) AS n_bytes
        FROM documents WHERE text IS NOT NULL AND text <> '') t
      GROUP BY media_type ORDER BY media_type"""),
    doc = "binary-column plumbing + byte-level metadata, oracle-checked")

  // ---------------------------------------------------------------- m2
  /** Full stubbed decode via mapPartitions (typed kernel application),
    * then a relational summary.  Oracle-checked: the kernel's mod-prime
    * fold is replayed character-by-character in DuckDB (`documents.text`
    * is pure ASCII at every SF, so code points == bytes), and the feature
    * aggregates ride on the exact INTEGER residues (`fp`), never on float
    * accumulation order. */
  val m2DecodeFeatures = NamedQuery(
    "m2_decode_features",
    (s, dir) => {
      import s.implicits._
      val decoded = blobs(s, dir).as[Blob].mapPartitions(decodePartition)
      decoded.toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          graft.queries.Exact.avg4(col("width"), 0).as("avg_width"),
          graft.queries.Exact.avg4(col("height"), 0).as("avg_height"),
          sum(col("fp")).as("fp_sum"),
          min(col("fp")).as("fp_min"),
          max(col("fp")).as("fp_max"))
        .orderBy(col("media_type"))
    },
    Some("""SELECT media_type, count(*) AS n,
        floor(round(sum(width)) / count(*) * 10000) / 10000.0 AS avg_width,
        floor(round(sum(height)) / count(*) * 10000) / 10000.0 AS avg_height,
        CAST(sum(fp) AS BIGINT) AS fp_sum, min(fp) AS fp_min, max(fp) AS fp_max
      FROM (SELECT
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        octet_length(CAST(text AS BLOB)) % 640 AS width,
        octet_length(CAST(text AS BLOB)) % 480 AS height,
        list_reduce(
          list_prepend(CAST(7 AS BIGINT), list_transform(
            range(1, length(text) + 1),
            i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        FROM documents WHERE text IS NOT NULL AND text <> '') t
      GROUP BY media_type ORDER BY media_type"""),
    doc = "stubbed decode kernel via mapPartitions over typed Dataset; " +
      "mod-prime fold replayed in SQL → full value oracle")

  // ---------------------------------------------------------------- m3
  /** Frame sampling for "video" blobs: fixed-size frame slicing of the byte
    * stream + every-Nth-frame selection — pure array ops, oracle-checked.
    * (Real pipeline: keyframe extraction; here: 64-byte frames, every 4th.) */
  val m3FrameSample = NamedQuery(
    "m3_frame_sample",
    (s, dir) => {
      blobs(s, dir)
        .filter(col("media_type") === "video")
        .withColumn("n_bytes", length(col("bytes")))
        .withColumn("n_frames", ceil(col("n_bytes") / 64.0).cast("long"))
        .withColumn("sampled_frames",
          size(filter(sequence(lit(0), col("n_frames") - 1),
            i => i % 4 === 0)))
        .select(col("doc_id"), col("n_bytes"), col("n_frames"), col("sampled_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS BIGINT) AS n_frames,
        CAST(ceil(ceil(octet_length(CAST(text AS BLOB)) / 64.0) / 4.0) AS INT) AS sampled_frames
      FROM documents
      WHERE text IS NOT NULL AND text <> '' AND CAST(doc_id % 3 AS INT) = 2
      ORDER BY doc_id"""),
    doc = "video frame slicing + every-Nth sampling (array ops), oracle-checked")

  // ---------------------------------------------------------------- m4
  /** Resize planning + batch padding accounting for "image" blobs — the
    * preprocessing arithmetic a vision-training pipeline runs before the
    * actual pixel kernel: aspect-preserving fit into a 224×224 target
    * (`out = dim·224 DIV max(w,h)`, all integer — floor semantics match
    * in both engines), then fixed id-range batching (`doc_id DIV 96` ≈ 32
    * images/batch at the 1-in-3 image rate) and the per-batch padded-
    * tensor waste: a batch materializes as n·max_w·max_h pixels, of which
    * everything beyond Σ out_w·out_h is letterbox padding.  Id-range
    * batching instead of a row_number window is deliberate — it needs no
    * global sort, so the same plan holds at 100 TB (one shuffle on the
    * batch key, map-side combined).  The resize itself stays a stub (no
    * codecs in this container, see the pack doc); the PLAN — dims, batch
    * shape, waste — is the real, oracle-checked product. */
  val m4ResizeBatches = NamedQuery(
    "m4_resize_batches",
    (s, dir) => {
      val fit = blobs(s, dir)
        .filter(col("media_type") === "image")
        .withColumn("n_bytes", length(col("bytes")))
        // stub dims (+16 keeps them nonzero); a real decoder fills these
        .withColumn("w0", col("n_bytes") % 640 + 16)
        .withColumn("h0", col("n_bytes") % 480 + 16)
        // long dims: DuckDB's octet_length arithmetic is BIGINT (schema parity)
        .withColumn("out_w", expr("(w0 * 224) DIV greatest(w0, h0)").cast("long"))
        .withColumn("out_h", expr("(h0 * 224) DIV greatest(w0, h0)").cast("long"))
        .withColumn("batch", expr("doc_id DIV 96"))
      fit.groupBy(col("batch"))
        .agg(count(lit(1)).as("n_imgs"),
          max(col("out_w")).as("max_w"),
          max(col("out_h")).as("max_h"),
          sum(col("out_w") * col("out_h")).as("content_px"))
        .withColumn("pad_waste_px",
          col("n_imgs") * col("max_w") * col("max_h") - col("content_px"))
        .select(col("batch"), col("n_imgs"), col("max_w"), col("max_h"),
          col("content_px"), col("pad_waste_px"))
        .orderBy(col("batch"))
    },
    Some("""WITH fit AS (
        SELECT doc_id // 96 AS batch,
          (w0 * 224) // greatest(w0, h0) AS out_w,
          (h0 * 224) // greatest(w0, h0) AS out_h
        FROM (SELECT doc_id,
                octet_length(CAST(text AS BLOB)) % 640 + 16 AS w0,
                octet_length(CAST(text AS BLOB)) % 480 + 16 AS h0
              FROM documents
              WHERE text IS NOT NULL AND text <> ''
                AND CAST(doc_id % 3 AS INT) = 0) t)
      SELECT batch, count(*) AS n_imgs,
        max(out_w) AS max_w, max(out_h) AS max_h,
        CAST(sum(out_w * out_h) AS BIGINT) AS content_px,
        CAST(count(*) * max(out_w) * max(out_h) - sum(out_w * out_h) AS BIGINT)
          AS pad_waste_px
      FROM fit GROUP BY batch ORDER BY batch"""),
    doc = "aspect-preserving 224-fit resize plan + id-range batch padding " +
      "waste (integer arithmetic end to end), oracle-checked")

  // ---------------------------------------------------------------- m5
  /** All C(8,2) = 28 ordered band pairs of an 8-band split, as an array
    * literal for [[pairBandKeys]]. */
  private val BandPairsExpr: String =
    (for { i <- 0 until 8; j <- i + 1 until 8 }
      yield s"named_struct('b1', $i, 'b2', $j)").mkString("array(", ", ", ")")

  /** PAIR-band LSH keys for a 62-bit perceptual hash in column `ph`:
    * explodes each row into 28 rows, one per pair of 8-bit bands, keyed by
    * a single packed BIGINT `pk = pairId·2¹⁶ + bv(b1)·2⁸ + bv(b2)`.
    *
    * Bucket math (why pairs, not single bands): a single 8-bit band key
    * has only 256 possible values, so buckets hold ~n/256 rows and the
    * band self-join produces Θ(8·(n/256)²) candidate pairs — quadratic
    * with a tiny constant, a scale-killer on a LAION-sized corpus.  A
    * band PAIR key has 2¹⁶ values (28·65536 ≈ 1.8M distinct `pk`s), so
    * buckets shrink ×256 and candidates are Θ(28·(n/65536)²) — ~585×
    * fewer pairs at equal n, same single equi-join shuffle shape.
    * Recall is IDENTICAL by pigeonhole: hamming ≤ 6 over 8 bands leaves
    * ≥ 2 bands intact, and any 2 intact bands form one of the 28 pairs
    * (Manku WWW'07 §3, the multi-block generalization).
    * MultimodalBandingSpec sweeps planted variants at hamming 1–8 to pin
    * exactly this guarantee. */
  def pairBandKeys(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("ph"), explode(expr(BandPairsExpr)).as("bp"))
      .select(col("doc_id"), col("ph"),
        expr("CAST((bp.b1 * 8 + bp.b2) AS BIGINT) * 65536" +
          " + ((ph div shiftleft(CAST(1 AS BIGINT), CAST(bp.b1 * 8 AS INT))) % 256) * 256" +
          " + ((ph div shiftleft(CAST(1 AS BIGINT), CAST(bp.b2 * 8 AS INT))) % 256)").as("pk"))

  /** Exact-verified near-dup pairs from pair-band candidates: one
    * equi-join shuffle on `pk`, then `bit_count(xor) ≤ maxHamming` over
    * candidates only — never all-pairs.  Shared by m5 and the banding
    * recall spec so the spec exercises the production path. */
  def phashCandidatePairs(all: DataFrame, maxHamming: Int): DataFrame = {
    val banded = pairBandKeys(all)
    banded.as("x").join(banded.as("y"),
        col("x.pk") === col("y.pk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.ph").as("ph_a"), col("y.ph").as("ph_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Perceptual-hash image near-dup — the image-dedup stage every large
    * vision/multimodal corpus build runs (pHash banding over re-encoded /
    * resized copies; the public LAION-style dedup).  Each "image" blob
    * gets a 62-bit perceptual hash (STUB: 16+16+16+14-bit chunks off the
    * mod-prime content fold — a real pipeline computes a DCT pHash inside
    * the decode kernel; the BANDING + VERIFY plumbing is the product
    * here), candidates come from the 28-pair-band LSH equi-join of
    * [[pairBandKeys]] (see its scaladoc for the bucket math and the
    * pigeonhole recall proof), and the exact `bit_count(xor) ≤ 6` verify
    * runs over candidates only — never all-pairs, one shuffle on `pk`.
    *
    * The corpus has no re-encoded copies (and the stub fold is not
    * locality-sensitive), so every 7th image also emits a PLANTED variant
    * blob at hamming 1 (doc_id + 10⁷, one flipped bit chosen by doc_id —
    * the t11 plant-then-find convention): the pairs the query must
    * recover are known by construction, and every step replays in DuckDB
    * on the integer grid. */
  val m5PhashDedup = NamedQuery(
    "m5_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val VariantOffset = 10000000L
      val fps = blobs(s, dir).as[Blob].mapPartitions(decodePartition)
        .toDF().filter(col("media_type") === "image")
        .select(col("doc_id"), col("fp"))
      val ph0 = fps.select(col("doc_id"),
        (expr(s"fp * 3 % $FpPrime % 65536") +
          expr(s"fp * 5 % $FpPrime % 65536") * lit(65536L) +
          expr(s"fp * 7 % $FpPrime % 65536") * lit(65536L * 65536L) +
          expr(s"fp * 11 % $FpPrime % 16384") * lit(65536L * 65536L * 65536L))
          .as("ph"))
      val variants = ph0.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + VariantOffset).as("doc_id"),
          expr("ph ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 62 AS INT))").as("ph"))
      val all = ph0.unionAll(variants)
      phashCandidatePairs(all, maxHamming = 6)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH img AS (
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(7 AS BIGINT), list_transform(
              range(1, length(text) + 1),
              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
            (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        FROM documents
        WHERE text IS NOT NULL AND text <> '' AND CAST(doc_id % 3 AS INT) = 0),
      ph0 AS (
        SELECT doc_id,
          fp * 3 % 1000000007 % 65536
          + (fp * 5 % 1000000007 % 65536) * 65536
          + (fp * 7 % 1000000007 % 65536) * 65536 * 65536
          + (fp * 11 % 1000000007 % 16384) * 65536 * 65536 * 65536 AS ph
        FROM img),
      allph AS (
        SELECT doc_id, ph FROM ph0
        UNION ALL
        SELECT doc_id + 10000000,
          xor(ph, CAST(1 AS BIGINT) << CAST(doc_id % 62 AS INT))
        FROM ph0 WHERE doc_id % 7 = 0),
      banded AS (
        SELECT doc_id, ph,
          CAST(p.b1 * 8 + p.b2 AS BIGINT) * 65536
            + ((ph // (CAST(1 AS BIGINT) << CAST(p.b1 * 8 AS INT))) % 256) * 256
            + ((ph // (CAST(1 AS BIGINT) << CAST(p.b2 * 8 AS INT))) % 256) AS pk
        FROM allph,
          (SELECT a.b AS b1, c.b AS b2 FROM range(8) a(b), range(8) c(b)
           WHERE a.b < c.b) p),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
          x.ph AS ph_a, y.ph AS ph_b
        FROM banded x JOIN banded y
          ON x.pk = y.pk AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
      ORDER BY doc_a, doc_b"""),
    doc = "perceptual-hash image near-dup: 28-pair-band (16-bit key) LSH " +
      "candidates + exact hamming<=6 verify over planted variants; never all-pairs")

  // ---------------------------------------------------------------- m6
  /** Per-sample audio QA row: all metrics exact integers. */
  final case class AudioStats(doc_id: Long, n_samples: Long, silent: Long,
      clipped: Long, peak: Long, energy: Long, active_frames: Long)

  /** ======== STUB KERNEL (audio) ========
    * Stands in for a real PCM decode (ffmpeg/libsndfile): each byte maps
    * to a signed 8-bit sample via the affine spread `((b·31+7) mod 256) −
    * 128` so the ASCII byte range exercises the full [−128, 127] sample
    * space.  One pass computes the audio-curation signals a speech/audio
    * corpus build filters on: silence (|s| ≤ 3), clipping (|s| ≥ 120 — the top ~2% of the reachable sample range),
    * peak amplitude, total energy Σs², and 64-sample frame activity
    * (frame energy > 64·5500 ≈ the mid-energy RMS cut) — everything a
    * silence-trim / clipped-upload triage needs, all in int64 so the
    * whole kernel replays in DuckDB. */
  def audioStatsPartition(rows: Iterator[Blob]): Iterator[AudioStats] = {
    val FrameLen = 64
    val FrameEnergyCut = 64L * 5500L
    rows.map { b =>
      val n = b.bytes.length
      var silent = 0L; var clipped = 0L; var peak = 0L; var energy = 0L
      var frames = 0L; var frameE = 0L
      var i = 0
      while (i < n) {
        val s = (((b.bytes(i) & 0xFF) * 31 + 7) % 256) - 128
        val a = math.abs(s)
        if (a <= 3) silent += 1
        if (a >= 120) clipped += 1
        if (a > peak) peak = a
        energy += s.toLong * s
        frameE += s.toLong * s
        if (i % FrameLen == FrameLen - 1) { // full frame closed
          if (frameE > FrameEnergyCut) frames += 1
          frameE = 0L
        }
        i += 1
      }
      AudioStats(b.doc_id, n.toLong, silent, clipped, peak, energy, frames)
    }
  }

  /** Audio QA triage — the audio-modality complement of m5's image dedup:
    * decode every "audio" blob once (stub kernel above, same
    * `mapPartitions`-on-typed-Dataset shape as m2 — the call signature a
    * vectorized JNI decode would use) and surface the worst uploads:
    * most clipped first, then loudest.  The kernel is embarrassingly
    * parallel over blobs (zero shuffles before the final top-k), and the
    * top-20 is a TakeOrderedAndProject heap, never a global sort.  Every
    * metric is exact int64, so DuckDB replays the full decode→frame→rank
    * pipeline: a FULL value oracle over the mapPartitions path. */
  val m6AudioStats = NamedQuery(
    "m6_audio_stats",
    (s, dir) => {
      import s.implicits._
      blobs(s, dir).as[Blob]
        .filter(col("media_type") === "audio")
        .mapPartitions(audioStatsPartition)
        .toDF()
        .orderBy(col("clipped").desc, col("energy").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH audio AS (
        SELECT doc_id, text FROM documents
        WHERE text IS NOT NULL AND text <> '' AND CAST(doc_id % 3 AS INT) = 1),
      s AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_samples,
          list_transform(range(1, length(text) + 1),
            k -> ((ascii(substr(text, CAST(k AS INT), 1)) * 31 + 7) % 256) - 128) AS smp
        FROM audio),
      m AS (
        SELECT doc_id, n_samples,
          CAST(len(list_filter(smp, x -> abs(x) <= 3)) AS BIGINT) AS silent,
          CAST(len(list_filter(smp, x -> abs(x) >= 120)) AS BIGINT) AS clipped,
          CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak,
          CAST(list_sum(list_transform(smp, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS energy,
          CAST(coalesce(list_sum(list_transform(
            range(0, n_samples // 64),
            f -> CASE WHEN list_sum(list_transform(
                   range(f * 64 + 1, f * 64 + 65),
                   k -> CAST(smp[k] AS BIGINT) * smp[k])) > 64 * 5500
                 THEN 1 ELSE 0 END)), 0) AS BIGINT) AS active_frames
        FROM s)
      SELECT doc_id, n_samples, silent, clipped, peak, energy, active_frames
      FROM m ORDER BY clipped DESC, energy DESC, doc_id LIMIT 20"""),
    doc = "audio QA triage: stub PCM decode via mapPartitions, per-sample " +
      "silence/clipping/peak/energy + 64-sample frame activity, worst-20 " +
      "ranking; FULL value oracle over the kernel path")

  def all: Seq[NamedQuery] = Seq(m1BlobMetadata, m2DecodeFeatures, m3FrameSample,
    m4ResizeBatches, m5PhashDedup, m6AudioStats)
}
