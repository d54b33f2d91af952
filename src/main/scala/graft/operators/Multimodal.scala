package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extracted per-asset features (the output of the stub "decoder"). */
case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    mean_byte: Double,
    byte_entropy: Double,
    checksum: Long)

/** Pluggable batch decoder: the seam where a real image/audio/video
  * library (JNI, Arrow-batched) plugs into the multimodal plumbing. One
  * call per [[Multimodal.DecodeBatchSize]] assets inside `mapPartitions`,
  * so implementations amortize per-core setup across a batch.
  * Serializable: instances ship to executors inside the partition lambda.
  */
trait FrameDecoder extends Serializable {
  /** Decode one batch of raw payloads into per-asset byte tensors
    * (positionally aligned with the input).
    */
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]]
}

/** The container-safe default (no media libraries here): "decodes" each
  * payload to its own bytes — deterministic, so features/frames are
  * spec-checkable end to end.
  */
object IdentityDecoder extends FrameDecoder {
  override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] = payloads
}

/** SURVEY §2.7 — multimodal column plumbing.
  *
  * Pattern for a 100 TB training-data pipeline: media assets ride through
  * Spark as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batch-wise inside `mapPartitions` so each executor
  * core amortizes decoder setup over a batch of assets (the shape a real
  * image/audio decoder — JNI or Arrow-batched — needs).
  *
  * The decode step itself is a DETERMINISTIC STUB (this container has no
  * image/audio libraries): it "decodes" the payload into its own bytes and
  * extracts byte-level statistics. Everything around it — schema, batch
  * iteration, partitioning, typed output — is the real plumbing and is
  * spec-tested.
  */
object Multimodal {

  /** Rows per decoder batch inside a partition (amortizes decoder init;
    * bounds peak memory to batchSize × max asset size per core).
    */
  val DecodeBatchSize = 64

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a synthetic binary payload + typed metadata struct to the
    * documents table — stands in for reading real (id, bytes, meta) media
    * parquet, which carries exactly this shape.
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast(IntegerType))
    val payload = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id"),
      payload.as("payload"),
      struct(
        modality.as("modality"),
        (col("doc_id") % 640 + 32).cast(IntegerType).as("width"),
        (col("doc_id") % 480 + 32).cast(IntegerType).as("height"),
        when(modality === "audio", 16000).otherwise(0).cast(IntegerType).as("sample_rate"),
        length(payload).cast(LongType).as("n_bytes")
      ).as("meta"))
  }

  /** Batch-wise feature extraction over the (payload, meta) columns.
    *
    * Runs as `mapPartitions` so the decoder sees `DecodeBatchSize`
    * assets at a time — the partition stays streaming (no full-partition
    * materialization), so executor memory is bounded regardless of
    * partition size. The decoder is pluggable ([[FrameDecoder]]); the
    * default is the deterministic container-safe stub.
    */
  def extractFeatures(withPayloads: DataFrame,
      decoder: FrameDecoder = IdentityDecoder): Dataset[MediaFeatures] = {
    val spark = withPayloads.sparkSession
    import spark.implicits._
    withPayloads
      .select(col("doc_id"), col("payload"), col("meta.modality").as("modality"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]]("payload")))
          batch.zip(decoded).map { case (row, bytes) =>
            var sum = 0L
            var crc = 0xcbf29ce484222325L // FNV-1a 64 offset basis
            val hist = new Array[Long](256)
            bytes.foreach { b =>
              val u = b & 0xff
              sum += u
              hist(u) += 1
              crc = (crc ^ u) * 0x100000001b3L
            }
            val n = bytes.length.toDouble
            val entropy =
              if (bytes.isEmpty) 0.0
              else -hist.filter(_ > 0).map { c =>
                val p = c / n; p * math.log(p) / math.log(2.0)
              }.sum
            MediaFeatures(
              row.getAs[Long]("doc_id"),
              row.getAs[String]("modality"),
              bytes.length.toLong,
              if (bytes.isEmpty) 0.0 else sum / n,
              entropy,
              crc)
          }
        }
      }
  }

  /** Frame sampling: `nFrames` evenly-spaced fixed-size windows per
    * asset, each emitted as its own typed row. This is the video/audio
    * curation shape — seek positions are computed from METADATA
    * (`meta.n_bytes`), never by decoding the whole asset, so per-asset
    * cost is nFrames × frameBytes regardless of asset size; a real
    * decoder would `seek(offset)` per frame exactly where the stub
    * slices. Short assets yield fewer frames (never fabricate bytes);
    * the explode happens inside the partition iterator, so executor
    * memory holds one decode batch, not one asset list.
    */
  def sampleFrames(withPayloads: DataFrame, nFrames: Int = 4,
      frameBytes: Int = 256,
      decoder: FrameDecoder = IdentityDecoder): Dataset[FrameSample] = {
    val spark = withPayloads.sparkSession
    import spark.implicits._
    withPayloads
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]]("payload")))
          batch.zip(decoded).flatMap { case (row, bytes) =>
            val id = row.getAs[Long]("doc_id")
            val frames = math.min(nFrames, math.max(bytes.length / frameBytes, 0))
            (0 until frames).map { i =>
              // evenly spaced: frame i starts at i/frames of the asset
              val offset = (bytes.length.toLong - frameBytes) * i /
                math.max(frames - 1, 1)
              val crc = graft.functions.Hashing.fnv1a64(
                bytes, offset.toInt, offset.toInt + frameBytes)
              FrameSample(id, i, offset, frameBytes.toLong, crc)
            }
          }
        }
      }
  }
}

/** One sampled frame: where it came from and what the stub decoded. */
case class FrameSample(
    doc_id: Long,
    frame_idx: Int,
    offset: Long,
    n_bytes: Long,
    checksum: Long)
