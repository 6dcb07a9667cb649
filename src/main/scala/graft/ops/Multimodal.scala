package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-wise batch transforms.
  *
  * The actual codecs (JPEG/PNG decode, audio resample, video demux) are
  * STUBBED — this container ships no image/audio libraries — behind
  * [[decodeStub]], a deterministic fake. Everything Spark-side is real
  * and tested: the schema contract, the mapPartitions batch shape (one
  * codec init per partition, streamed rows), and the pure-column frame
  * sampler. Swapping the stub for a real codec changes one function.
  */
object Multimodal {

  /** Canonical media-row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** STUB codec: deterministic pseudo-decode of a payload into an 8-dim
    * feature vector + dimensions, derived from the bytes alone. A real
    * implementation would decode pixels here; the signature and the
    * per-partition init/stream shape are what production code keeps. */
  def decodeStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) return (0, 0, Array.fill(8)(0f))
    val h = java.util.Arrays.hashCode(content)
    val w = 16 + math.abs(h % 1024)
    val ht = 16 + math.abs((h / 1024) % 1024)
    val feat = Array.tabulate(8) { i =>
      val b = content(i % content.length) & 0xff
      ((b ^ (h >>> (i * 4))) & 0xff) / 255.0f
    }
    (w, ht, feat)
  }

  /** Partition-wise feature extraction: one "codec" init per partition
    * (the expensive part for real codecs), rows streamed through it —
    * the Scala shape of a `mapInPandas` batch UDF. Output keeps the id
    * plus extracted width/height/features. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = Encoders.row(outSchema)
    df.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        // real code: codec/session init here, once per partition
        rows.map { r =>
          val (w, h, feat) = decodeStub(
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w, h, feat.toSeq)
        }
      }
  }

  /** Frame sampling: pure column expressions — slice the payload into
    * `frameSize`-byte frames and keep every `stride`-th one. For real
    * video this is the keyframe-stride pattern; the byte-slicing
    * plumbing (offsets, tail handling) is identical. */
  def frameSample(contentCol: String, frameSize: Int,
                  stride: Int): org.apache.spark.sql.Column =
    expr(
      s"""filter(
            transform(
              sequence(0, greatest(cast((length($contentCol) + ${frameSize - 1})
                                        / $frameSize as int) - 1, 0)),
              i -> case when i % $stride = 0
                        then substring($contentCol, i * $frameSize + 1, $frameSize)
                   end),
            f -> f is not null)""")

  /** Media near-duplicates: extracted feature vectors → exact cosine
    * pairs (swap in [[VectorOps.lshBuckets]] candidates at corpus
    * scale). The cross-modal composition point: once media becomes a
    * feature column, every embedding operator (ANN, SemDeDup, outlier
    * gates) applies unchanged. */
  def mediaNearDups(df: DataFrame, threshold: Double): DataFrame =
    VectorOps.cosineNearDup(
      extractFeatures(df).select(col("media_id"), col("features")),
      "media_id", "features", threshold)

  /** Resize metadata transform (stub): the metadata math is real, the
    * pixel work is the codec's. */
  def resizeMeta(meta: org.apache.spark.sql.Column, maxDim: Int): org.apache.spark.sql.Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    struct(meta.getField("format").as("format"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"))
  }
}
