package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Mime

/** Multimodal-column family (north-star extension): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode/feature-extraction as batched per-partition functions.
  *
  * The container has no media codecs, so the decode step is a clearly
  * marked deterministic fake ([[fakeDecode]]); everything around it — the
  * binary column derivation, the typed `Dataset` boundary, partition-batched
  * processing, and the output schema — is the real Spark plumbing a
  * production decoder (JNI/FFmpeg per partition, or `mapInPandas` from
  * PySpark) would slot into.
  *
  * Scale notes: decode is per-row CPU work with no shuffle —
  * embarrassingly parallel; `mapPartitions` amortizes any per-task decoder
  * initialization (model load, codec context) across the partition,
  * exactly why the batched form beats a per-row UDF at 100 TB.
  */
object Multimodal {

  /** A binary payload row (fixture: utf-8 bytes of `documents.text`
    * standing in for media bytes). */
  case class MediaBlob(doc_id: Long, filename: String, content: Array[Byte])

  /** Extracted features: fake "image" dims, 16-bucket byte histogram,
    * stride-sampled "frames". */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      histogram: Array[Long],
      frame_samples: Array[Int])

  private def synthFilename = concat(lit("media_"), col("doc_id"),
    element_at(typedlit(Seq(".png", ".jpg", ".wav", ".mp4")),
      (col("doc_id") % 4 + 1).cast("int")))

  /** Metadata projection over the binary column (oracle-checked):
    * byte length, content hash, filename-derived MIME class. */
  def qMultimodalMeta(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), synthFilename.as("filename"),
        col("text").cast("binary").as("content"))
      .select(col("doc_id"), col("filename"),
        octet_length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"),
        Mime.mimeOf(col("filename")).as("mime_type"))
      .orderBy("doc_id")

  /** STUB decoder — deterministic stand-in for a real image/audio decode
    * (no codec libraries in this container). Treats the payload as a
    * 16-px-wide "image", builds a high-nibble byte histogram and samples
    * one "frame" byte every 64 bytes. A real implementation replaces ONLY
    * this function. */
  def fakeDecode(blob: MediaBlob): MediaFeatures = {
    val bytes = blob.content
    val hist = new Array[Long](16)
    bytes.foreach(b => hist((b & 0xFF) >> 4) += 1)
    val frames = bytes.indices.by(64).take(8).map(i => bytes(i) & 0xFF).toArray
    MediaFeatures(blob.doc_id, bytes.length, 16,
      (bytes.length + 15) / 16, hist, frames)
  }

  /** Partition-batched decode over the typed Dataset boundary
    * (oracle-checked; semantics also covered by MultimodalSpec).
    *
    * The array-valued features are serialized to CSV strings at the output
    * boundary: the driver's rows-check sorts/hashes every column and cannot
    * handle raw array cells, and a scalar form is also what a downstream
    * non-columnar consumer would want. The typed [[MediaFeatures]] Dataset
    * remains the internal representation. */
  def qMultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs: Dataset[MediaBlob] = documents(s, dir)
      .select(col("doc_id"), synthFilename.as("filename"),
        col("text").cast("binary").as("content"))
      .as[MediaBlob]
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec context, model load)
      it.map(fakeDecode)
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        concat_ws(",", col("histogram").cast("array<string>")).as("histogram_csv"),
        concat_ws(",", col("frame_samples").cast("array<string>")).as("frames_csv"))
      .orderBy("doc_id")
  }

  /** STUB resize — deterministic stand-in for an image downsample (the
    * sibling of [[fakeDecode]]): the payload is read as a 16-px-wide
    * "image" and block-averaged to a fixed `outW`×`outH` thumbnail.
    * Empty source blocks (payload shorter than the grid) resolve to 0 by
    * rule. A real implementation replaces ONLY this function. */
  def fakeResize(blob: MediaBlob, outW: Int = 4, outH: Int = 4): Array[Int] = {
    val bytes = blob.content
    val w = 16
    val h = (bytes.length + w - 1) / w
    val out = new Array[Int](outW * outH)
    if (bytes.isEmpty) return out
    for (ry <- 0 until outH; rx <- 0 until outW) {
      val y0 = ry * h / outH; val y1 = math.max(y0 + 1, (ry + 1) * h / outH)
      val x0 = rx * w / outW; val x1 = math.max(x0 + 1, (rx + 1) * w / outW)
      var sum = 0L; var n = 0
      for (y <- y0 until y1; x <- x0 until x1) {
        val i = y * w + x
        if (i < bytes.length) { sum += (bytes(i) & 0xFF); n += 1 }
      }
      out(ry * outW + rx) = if (n == 0) 0 else (sum / n).toInt
    }
    out
  }

  /** Two-stage typed pipeline decode→resize, each partition-batched
    * (oracle-checked; exact values also covered by MultimodalSpec).
    * The thumbnail ships as CSV for the same driver-hashability reason as
    * the decode features. */
  def qMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs: Dataset[MediaBlob] = documents(s, dir)
      .select(col("doc_id"), synthFilename.as("filename"),
        col("text").cast("binary").as("content"))
      .as[MediaBlob]
    blobs.mapPartitions { it =>
      // per-partition init would go here (scaler context, SIMD planning)
      it.map(b => (b.doc_id, b.content.length, fakeResize(b)))
    }.toDF("doc_id", "n_bytes", "thumb")
      .select(col("doc_id"), col("n_bytes"),
        concat_ws(",", col("thumb").cast("array<string>")).as("thumb_csv"))
      .orderBy("doc_id")
  }

  /** STUB embedding extractor — deterministic stand-in for a media
    * encoder (CLIP-style image/audio embedding): the unit-normalized
    * high-nibble byte histogram as a 16-dim vector. A real implementation
    * replaces ONLY this function. */
  def fakeEmbed(blob: MediaBlob): Array[Double] = {
    val hist = new Array[Double](16)
    blob.content.foreach(b => hist((b & 0xFF) >> 4) += 1d)
    val norm = math.sqrt(hist.map(x => x * x).sum)
    if (norm == 0) hist else hist.map(_ / norm)
  }

  /** Binary → embedding → ANN, end-to-end: the partition-batched stub
    * encoder feeds the similarity stack directly — probe set broadcast,
    * map-side bounded top-k ([[graft.functions.TopKAgg]]) so only
    * k·partitions candidate rows per probe ever cross the wire. This is
    * the image-dedup / cross-modal-retrieval pipeline shape with the
    * encoder as the single swappable stub. Oracle-checked; MultimodalSpec
    * also re-derives the full top-k in memory and compares exactly. */
  def qMultimodalEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cache at the fan-out: the probe branch filters AFTER the typed
    // encode (a Column filter can't push through MapPartitions), so
    // without the cache the encoder — the expensive stage once a real
    // model replaces the stub — runs over the whole corpus twice
    val embs = documents(s, dir)
      .select(col("doc_id"), synthFilename.as("filename"),
        col("text").cast("binary").as("content"))
      .as[MediaBlob]
      .mapPartitions { it =>
        // per-partition init would go here (encoder weights, ONNX session)
        it.map(b => (b.doc_id, fakeEmbed(b)))
      }.toDF("doc_id", "emb")
      .cache()
    val probes = embs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("probe_id"), col("emb").as("probe_emb"))
    // cos rounds to 6 dp BEFORE ranking: near-duplicate payloads put many
    // candidates at cos ≈ 1.0, where the kernel's dot/(√na·√nb) tree and
    // DuckDB's list_cosine_similarity differ by an ulp — ranking raw
    // values would order such near-ties differently per engine, while
    // ranking the rounded score ties them and the id tie-break decides
    // identically everywhere.
    embs.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id").as("neighbor_id"),
        round(graft.functions.Similarity.cosine(
          col("probe_emb"), col("emb")), 6).as("cos"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopK.topK(5)(col("cos"), col("neighbor_id")).as("tk"))
      .select(col("probe_id"), posexplode(col("tk")))
      .select(col("probe_id"), col("col._2").as("neighbor_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy("probe_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_decode" -> qMultimodalDecode,
    "q_multimodal_resize" -> qMultimodalResize,
    "q_multimodal_embed" -> qMultimodalEmbed,
  )

  // The stub decode/resize/embed kernels are deterministic integer (or
  // exact-double) arithmetic over the payload bytes, and the fixture
  // corpus is ASCII (SQL char positions = UTF-8 byte positions), so all
  // three are reproducible in DuckDB: the nibble histogram / frame
  // sampling / block-average as list comprehensions, and the embedding
  // cosine via list_cosine_similarity (bit-parity with the codegen
  // kernel already proven by q_sim_topk). A real codec would demote
  // decode/resize/embed back to rows-only — the oracle checks the
  // PLUMBING'S determinism, not the stub's realism.
  private val codesCte =
    """WITH c AS (
      |  SELECT doc_id, length(text) AS n,
      |    (length(text) + 15) // 16 AS h,
      |    list_transform(range(1, length(text) + 1),
      |      i -> unicode(substr(text, CAST(i AS INT), 1))) AS codes
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  concat('media_', CAST(doc_id AS VARCHAR),
        |    CASE doc_id % 4 WHEN 0 THEN '.png' WHEN 1 THEN '.jpg' WHEN 2 THEN '.wav' ELSE '.mp4' END) AS filename,
        |  strlen(text) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |       WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS mime_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_decode" ->
      (codesCte + """
        |SELECT doc_id,
        |  CAST(n AS INT) AS n_bytes,
        |  16 AS width,
        |  CAST(h AS INT) AS height,
        |  array_to_string(list_transform(range(0, 16),
        |    k -> len(list_filter(codes, c -> c // 16 = k))), ',') AS histogram_csv,
        |  array_to_string(list_transform(list_filter(range(0, 8), k -> k * 64 < n),
        |    k -> codes[CAST(k * 64 + 1 AS INT)]), ',') AS frames_csv
        |FROM c ORDER BY doc_id""".stripMargin),
    "q_multimodal_resize" ->
      (codesCte + """,
        |v AS (
        |  SELECT doc_id, n,
        |    list_transform(range(0, 16), p ->
        |      list_transform(
        |        list_filter(flatten(list_transform(
        |            range((p // 4) * h // 4,
        |                  greatest((p // 4) * h // 4 + 1, ((p // 4) + 1) * h // 4)),
        |            y -> list_transform(range((p % 4) * 4, (p % 4) * 4 + 4),
        |                 x -> y * 16 + x))),
        |          i -> i < n),
        |        i -> codes[CAST(i + 1 AS INT)])) AS blocks
        |  FROM c)
        |SELECT doc_id, CAST(n AS INT) AS n_bytes,
        |  array_to_string(list_transform(blocks,
        |    b -> CASE WHEN len(b) = 0 THEN 0 ELSE list_sum(b) // len(b) END), ',') AS thumb_csv
        |FROM v ORDER BY doc_id""".stripMargin),
    "q_multimodal_embed" ->
      (codesCte + """,
        |hh AS (
        |  SELECT doc_id, list_transform(range(0, 16),
        |    k -> CAST(len(list_filter(codes, c -> c // 16 = k)) AS DOUBLE)) AS hist
        |  FROM c),
        |e AS (
        |  SELECT doc_id,
        |    CASE WHEN list_dot_product(hist, hist) = 0 THEN hist
        |         ELSE [x / sqrt(list_dot_product(hist, hist)) FOR x IN hist] END AS emb
        |  FROM hh),
        |p AS (SELECT doc_id AS probe_id, emb AS probe_emb FROM e WHERE doc_id % 100 = 0),
        |scored AS (SELECT probe_id, e.doc_id AS neighbor_id,
        |    round(list_cosine_similarity(probe_emb, e.emb), 6) AS cos
        |  FROM e, p WHERE e.doc_id <> p.probe_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
        |SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin),
  )
}
