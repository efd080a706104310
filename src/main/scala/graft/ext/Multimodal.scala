package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` payload columns plus typed metadata, processed by batched
  * per-partition decoders.
  *
  * The container has no media codecs, so the DECODE step is a
  * deterministic fake (sha-256-derived features — clearly marked below);
  * everything around it — schema, encoders, partition batching, the
  * typed mapPartitions pipeline — is real and is exactly the shape a
  * real decoder (JNI/FFmpeg/JPEG) would plug into.
  *
  * Scale notes: payloads never pass through a shuffle (decode is a narrow
  * map over the scan); batching amortizes per-call setup the way Arrow
  * batches do for Pandas UDFs; features (small) are what flows downstream,
  * not payloads (large).
  */
object Multimodal {

  /** Binary payload + metadata extraction, all builtins (oracle-verified):
    * byte length, sha2-256 digest, base64 prefix. The payload here is the
    * utf-8 encoding of `text` standing in for real media bytes.
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("digest"),
        substring(base64(col("payload")), 1, 24).as("b64_prefix"))
      .orderBy(col("doc_id"))

  case class DocBin(doc_id: Long, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      feature: Array[Float])

  /** Batched per-partition "decode + feature extraction" over binary
    * payloads — the mapInPandas/mapPartitions pattern. The decoder below
    * is a STUB: a real implementation would parse the media container and
    * run a feature net; this one derives deterministic pseudo-features
    * from the sha-256 digest so the pipeline is testable end-to-end.
    * Returns the typed `array<float>` feature form (spec-covered).
    */
  def decodeFeaturesRaw(s: SparkSession, d: String): Dataset[MediaFeature] = {
    import s.implicits._
    val bin = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[DocBin]
    bin.mapPartitions { it =>
      // one digest instance per partition (the "model handle"); rows are
      // processed in batches of 64 like an Arrow-batched UDF would be
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val h = md.digest(r.payload) // STUB decode: digest stands in for pixels
          val w = 16 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 1920)
          val ht = 16 + (((h(2) & 0xff) << 8 | (h(3) & 0xff)) % 1080)
          val feat = h.take(8).map(b => (b & 0xff) / 255.0f)
          MediaFeature(r.doc_id, r.payload.length, w, ht, feat)
        }
      }
    }
  }

  /** Declared form of [[decodeFeaturesRaw]]: scalar columns only — the
    * driver's pandas compare can't sort an `array<float>` column, so the
    * feature vector is flattened to its byte signature (exact: features
    * are b/255f, so round(f*255) recovers b losslessly). Because the stub
    * decode is sha-256-derived, this is fully oracle-verifiable, not just
    * rows-only.
    */
  def decodeFeatures(s: SparkSession, d: String): DataFrame =
    decodeFeaturesRaw(s, d).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        concat_ws(",",
          expr("transform(feature, f -> CAST(round(f * 255) AS INT))"))
          .as("feat_sig"))
      .orderBy(col("doc_id"))

  /** Resize planning over the decoded dimensions: fit each media item
    * into a 224×224 model input box preserving aspect ratio (the
    * standard vision-model preprocessing contract) — scale =
    * 224/max(w,h), target dims rounded. A real pipeline hands
    * (payload, tgt_w, tgt_h) to the batched decoder of
    * [[decodeFeaturesRaw]]; the GEOMETRY is pure closed-form arithmetic
    * on the decoded dims, so it is oracle-verified end-to-end even with
    * the decode stubbed.
    */
  def resizePlan(s: SparkSession, d: String): DataFrame =
    decodeFeaturesRaw(s, d).toDF()
      .withColumn("scale",
        lit(224.0) / greatest(col("width"), col("height")).cast("double"))
      .select(col("doc_id"), col("width"), col("height"),
        expr("CAST(round(width * scale) AS INT)").as("tgt_w"),
        expr("CAST(round(height * scale) AS INT)").as("tgt_h"))
      .orderBy(col("doc_id"))

  /** Frame-sampling plumbing: treat the payload as a "video" of N fixed-
    * size chunks and emit every k-th chunk with its index — posexplode
    * over a computed chunk array (a real pipeline would emit decoded
    * frames). Oracle-verified since chunking is pure string/binary math.
    */
  def frameSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      // guard empty text: sequence(0,-1) would yield a descending [0,-1]
      .filter(length(col("text")) >= 1)
      .withColumn("chunk", expr(
        "transform(sequence(0, CAST(floor((length(text)-1)/32) AS INT)), i -> substring(text, i*32+1, 32))"))
      .select(col("doc_id"), posexplode(col("chunk")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
      .withColumn("frame_idx", col("frame_idx").cast("long"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Real media-file ingest: `spark.read.format("binaryFile")` over a
    * directory of payload files, filename carrying the doc_id
    * (`<doc_id>.bin`), joined back to the documents metadata — the shape
    * of a production media lake (payload bytes in an object store,
    * metadata in tables). Filters on path/length are pushed by the
    * binaryFile source; `content` stays out of the join (only digest +
    * length flow downstream), so payloads never shuffle here either.
    */
  def binaryIngest(s: SparkSession, dir: String, docs: DataFrame): DataFrame =
    s.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("digest"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> binaryMeta,
    "mm_decode_features" -> decodeFeatures,
    "mm_resize" -> resizePlan,
    "mm_frame_sample" -> frameSample
  )

  /** DuckDB replay of the stub decode: byte i of sha256(text) is
    * `CAST('0x'||substr(hex, 2i+1, 2) AS INT)`.
    */
  private def sqlByte(i: Int): String =
    s"CAST('0x' || substr(sha256(text), ${2 * i + 1}, 2) AS INT)"

  val oracle: Map[String, String] = Map(
    "mm_decode_features" ->
      s"""SELECT doc_id,
         |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |       16 + ((${sqlByte(0)} * 256 + ${sqlByte(1)}) % 1920) AS width,
         |       16 + ((${sqlByte(2)} * 256 + ${sqlByte(3)}) % 1080) AS height,
         |       concat_ws(',', ${(0 until 8).map(sqlByte).mkString(", ")}) AS feat_sig
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""WITH dims AS (
         |  SELECT doc_id,
         |         16 + ((${sqlByte(0)} * 256 + ${sqlByte(1)}) % 1920) AS width,
         |         16 + ((${sqlByte(2)} * 256 + ${sqlByte(3)}) % 1080) AS height
         |  FROM documents)
         |SELECT doc_id, width, height,
         |       CAST(round(width * (224.0 / greatest(width, height))) AS INT) AS tgt_w,
         |       CAST(round(height * (224.0 / greatest(width, height))) AS INT) AS tgt_h
         |FROM dims ORDER BY doc_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS digest,
        |       substring(to_base64(encode(text)), 1, 24) AS b64_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       substring(text, CAST(i*32+1 AS INT), 32) AS frame
        |FROM documents,
        |     unnest(range(0, CAST(floor((length(text)-1)/32) AS BIGINT) + 1)) AS t(i)
        |WHERE length(text) >= 1 AND i % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
