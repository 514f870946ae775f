package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization: per-vector affine map onto
  * 0..255 — the standard 4× storage cut (float32 → uint8) for
  * petabyte-scale embedding stores, with the dequantization error kept
  * as a first-class quality metric.
  *
  * Everything is per-row map-only Column algebra (codegen'd, no UDFs,
  * no shuffle): quantize at ingest, store the codes + (vmin, scale)
  * pair, dequantize on read or score directly in the quantized domain.
  *
  * Rounding uses floor(x + 0.5) (half-up) rather than round() so the
  * codes are bit-identical across engines — SQL ROUND ties-to-even vs
  * half-away differs between engines on exact .5 grid points.
  */
object Quantize {

  /** Per-vector quantization parameters: (min, max, scale) with
    * scale = (max - min) / 255; constant vectors get scale 0 and are
    * handled exactly (all codes 0, dequantize back to vmin). */
  def params(v: Column): (Column, Column, Column) = {
    val vmin = array_min(v)
    val vmax = array_max(v)
    (vmin, vmax, (vmax - vmin) / lit(255.0))
  }

  /** uint8 codes (as array<int>, values 0..255). */
  def encode(v: Column, vmin: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0, lit(0))
        .otherwise(floor((x - vmin) / scale + lit(0.5)).cast("int")))

  /** Dequantized vector from codes + params. */
  def decode(codes: Column, vmin: Column, scale: Column): Column =
    transform(codes, q => vmin + q.cast("double") * scale)

  /** Mean squared dequantization error of one vector (sequential fold —
    * deterministic summation order). */
  def mse(v: Column, vmin: Column, scale: Column): Column = {
    val err = zip_with(v, decode(encode(v, vmin, scale), vmin, scale),
      (x, d) => (x - d) * (x - d))
    aggregate(err, lit(0.0), (acc, e) => acc + e) / size(v)
  }

  /** Quantization report frame: id, params, and per-vector MSE — the
    * quality gate a pipeline runs before committing to int8 storage. */
  def report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val (vmin, vmax, scale) = params(v)
    df.select(col(idCol).as("vec_id"),
      round(vmin, 6).as("v_min"),
      round(vmax, 6).as("v_max"),
      round(mse(v, vmin, scale), 12).as("mse"))
  }
}
