package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization — the STORAGE-side
  * similarity lever: a float32 embedding table at 100 TB is 4× the
  * bytes of its int8 form, and every ANN path here (brute sample, LSH
  * buckets, IVF cells) is scan-bound at corpus scale, so quantization
  * buys back that factor on the dominant cost while the compute path
  * stays the differential-tested float machinery (codes dequantize on
  * read — [[topKCosine]] routes through [[Similarity.bruteForceTopK]]
  * unchanged).
  *
  * Codes are per-vector symmetric: scale = max|x| / 127,
  * code = round(x / scale) clamped to [-127, 127] — no calibration
  * pass, no clipping error (the max is in range by construction),
  * fully deterministic. Per-element reconstruction error is bounded
  * by scale/2; QuantizeSpec pins the bound and the recall@k
  * differential vs the float path, and q111 gates the code/scale
  * arithmetic against a DuckDB oracle.
  *
  * All quantization math runs in DOUBLE (cast from the float input):
  * float division would admit a code of 128 when rounding the
  * max-element quotient up — the clamp plus double math keeps every
  * code an exact int8 value in both engines.
  */
object Quantize {

  import org.apache.spark.sql.Column

  /** Per-vector symmetric scale over a double-array column. */
  private[ml] def scaleCol(v: Column): Column =
    array_max(transform(v, x => abs(x))) / 127.0

  /** Int8 codes for a double-array column at `scale` (0 ⇒ all-zero). */
  private[ml] def codesCol(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0).cast("byte")))
      .otherwise(transform(v, x =>
        least(lit(127.0), greatest(lit(-127.0), round(x / scale, 0)))
          .cast("byte")))

  /** Decoded double-array column from codes at `scale`. */
  private[ml] def decodeCol(q: Column, scale: Column): Column =
    transform(q, c => c.cast("double") * scale)

  /** (vec_id, label, scale, q array<byte>) from (vec_id, label,
    * embedding array<float>). All-zero vectors keep scale 0 and
    * all-zero codes. */
  def quantize(embs: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    embs
      .select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("scale", scaleCol(col("v")))
      .select(col("vec_id"), col("label"), col("scale"),
        codesCol(col("v"), col("scale")).as("q"))
  }

  /** Reconstructed float embeddings from (vec_id, label, scale, q) —
    * the read-side inverse; error per element ≤ scale/2. */
  def dequantize(qdf: DataFrame): DataFrame =
    qdf.select(col("vec_id"), col("label"),
      transform(col("q"), c => (c.cast("double") * col("scale")).cast("float"))
        .as("embedding"))

  /** Brute-force cosine top-k served FROM the quantized table: codes
    * dequantize per row into the existing float scoring path — the
    * compute plan is identical to the float baseline, only the scanned
    * bytes shrink 4×. QuantizeSpec pins recall@k against the float
    * path on seeded data. */
  def topKCosine(qdf: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.bruteForceTopK(Similarity.prepared(queries),
      Similarity.prepared(dequantize(qdf)), k)
}
