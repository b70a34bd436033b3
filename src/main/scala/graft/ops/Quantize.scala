package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding quantization for billion-vector storage: per-vector symmetric
 * int8 (max-abs scaling, the FAISS-SQ8-style storage layout) — 4×
 * compression of float32 embedding tables with bounded reconstruction
 * error, the knob that turns a 100 TB embedding store into 25 TB.
 *
 * Fully declarative (one narrow projection, zero shuffle): `transform` /
 * `zip_with` / `aggregate` over the array column inside whole-stage
 * codegen. Float determinism with the SQL oracle: elements are widened
 * float→double FIRST (exact) and every per-element expression is written
 * in the same association order both sides; the only reductions are `max`
 * (order-free) and an INTEGER checksum sum (exact in any order) — no
 * float folds at all.
 */
object Quantize {

  /**
   * Per-vector int8 quantization statistics: scale (max-abs), an
   * order-weighted integer checksum of the codes (position-sensitive, so
   * any mis-quantized element changes it), and the max absolute
   * reconstruction error.
   */
  def int8Stats(embeddings: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x)))
    val codes = when(scale === 0.0,
      transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => round(x / scale * 127).cast("long")))
    val checksum = aggregate(
      zip_with(codes, sequence(lit(1L), size(col("embedding")).cast("long")),
        (c, i) => c * i),
      lit(0L), (acc, x) => acc + x)
    val maxErr = when(scale === 0.0, lit(0.0))
      .otherwise(array_max(zip_with(v, codes,
        (x, c) => abs(x - c.cast("double") * scale / 127.0))))
    embeddings.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      round(scale, 6).as("scale"),
      checksum.as("code_checksum"),
      round(maxErr, 6).as("max_abs_err"))
  }
}
