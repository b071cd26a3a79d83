package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-batched
  * transforms so a decoder library initializes once per partition, not
  * per row (the Scala analog of `mapInPandas` batching).
  *
  * The actual codec work is STUBBED (no image/audio libraries exist in
  * this environment — see builder brief): `FakeCodec` derives
  * deterministic pseudo-decodes from the bytes. The Spark-side contract
  * — schema shape, per-partition batching, metadata propagation,
  * partition-parallel execution — is real and tested.
  */
object Multimodal {

  /** metadata struct carried beside every media payload */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  def mediaSchema(idType: DataType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** STUB decoder: deterministic pseudo-decode derived from payload
    * bytes. Replace with a real codec (e.g. TwelveMonkeys/JavaCV) —
    * only this object changes; the pipeline shape stays.
    *
    * All fakes are md5-derived so the DuckDB oracle can replay them
    * (`md5_number_lower` = little-endian u64 of digest bytes 8..16,
    * matching [[md5Lower64]]), turning the multimodal gate queries from
    * rows-only checks into full hash-matched ones. */
  object FakeCodec {
    private def digest(parts: Array[Byte]*): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(md.update)
      md.digest()
    }

    /** little-endian long over md5 digest bytes 8..15 (DuckDB
      * md5_number_lower); treat as unsigned via remainderUnsigned. */
    def md5Lower64(parts: Array[Byte]*): Long = {
      val d = digest(parts: _*)
      var h = 0L
      var i = 15
      while (i >= 8) { h = (h << 8) | (d(i) & 0xFFL); i -= 1 }
      h
    }

    /** "decode" → (width, height, meanLuma): stable function of bytes */
    def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
      val h = md5Lower64(payload)
      val w = 16 + java.lang.Long.remainderUnsigned(h, 1024L).toInt
      val ht = 16 + java.lang.Long.remainderUnsigned(h >>> 10, 1024L).toInt
      val luma = java.lang.Long.remainderUnsigned(h >>> 20, 256L).toDouble / 255.0
      (w, ht, luma)
    }

    /** "resize": new payload is a stable digest of (payload, w, h) */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      digest(payload, s"r${w}x$h".getBytes("UTF-8"))

    /** "frame sample": n digests standing in for n sampled frames */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
      (0 until n).map(i => digest(payload, s"f$i".getBytes("UTF-8")))

    /** "feature extraction": fixed-size float vector from the bytes */
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val h = md5Lower64(payload, s"e$i".getBytes("UTF-8"))
        out(i) = java.lang.Long.remainderUnsigned(h, 1000L).toFloat / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Decode pass: adds (decoded_width, decoded_height, mean_luma).
    * Partition-batched: the codec (stub) is instantiated once per
    * partition; rows stream through without driver involvement. */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("decoded_width", IntegerType),
      StructField("decoded_height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition decoder init goes here (stub has none)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h, luma) =
          if (payload == null) (0, 0, 0.0) else FakeCodec.decodeImage(payload)
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, luma))
      }
    }(enc)
  }

  /** Resize pass: replaces the payload with the (stub) resized bytes,
    * carrying the target dims in the metadata struct. */
  def resizeImages(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized_payload", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val out = if (payload == null) null else FakeCodec.resize(payload, w, h)
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Feature-extraction pass: embedding column from the payload. */
  def embedMedia(df: DataFrame, payloadCol: String, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_embedding", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val emb = if (payload == null) Array.empty[Float] else FakeCodec.embed(payload, dim)
        Row.fromSeq(r.toSeq :+ emb.toSeq)
      }
    }(enc)
  }

  /** Frame-sample pass (video): one output row per sampled frame. */
  def sampleFrames(df: DataFrame, payloadCol: String, idCol: String, n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("frame_payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) Iterator.empty
        else FakeCodec.sampleFrames(payload, n).iterator.zipWithIndex.map {
          case (frame, i) => Row(r.get(iIdx), i, frame)
        }
      }
    }(enc)
  }

  /** Test fixture: derive a deterministic media table from any table's
    * string column (bytes = UTF-8 of the text). */
  def syntheticMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        lit("image").as("media_type"), lit("fake").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
}
