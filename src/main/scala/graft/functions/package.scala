package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the operators.
  *
  * Everything here composes Spark built-ins (codegen'd, stays inside
  * whole-stage codegen) — no UDFs in the hot path. Each helper encodes a
  * semantic pinned down in SURVEY.md §2/§7.3.
  */
package object functions {

  /** First non-EMPTY (not merely non-null) string — the reference's
    * `device_id = coalesce(user.id, site.id, device.ifa)` treats empty
    * strings as absent (/root/reference/main.go:431-438). Implemented as
    * `coalesce(nullif(c, ''), ...)` so it stays declarative.
    */
  def coalesceNonEmpty(cols: Column*): Column =
    coalesce(cols.map(c => nullif(c, lit(""))): _*)

  /** Epoch milliseconds reconstructed the way the reference's SQL does it:
    * `((seconds*1000)+(nanos/1000000))::BIGINT` (/root/reference/main.go:105)
    * — DuckDB `/` on integers is FLOAT division, and the cast truncates the
    * whole sum. Replicate with double math then one truncating cast.
    */
  def epochMsFromParts(seconds: Column, nanos: Column): Column =
    (seconds.cast("double") * lit(1000.0) +
      nanos.cast("double") / lit(1000000.0)).cast("long")

  /** OUTER explode with the reference's exact NULL semantics: one output
    * row per element, or a single NULL row when the array is empty/null
    * (/root/reference/main.go:362-380 appends an explicit NULL deal).
    * `explode_outer` already does exactly this; the helper exists so the
    * semantics are named and testable in one place.
    */
  def explodeOuter(arr: Column): Column = explode_outer(arr)

  /** Lowercase single-space tokenization used across the text operators.
    * Splits on ' ' (not \s+) to stay byte-identical with the DuckDB
    * oracle's string_split(text, ' ') and with Dedup.shingles. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " ", -1), t => length(t) > lit(0))

  /** Word n-grams as space-joined strings: one entry per window of n
    * consecutive tokens (empty array when there are fewer than n tokens).
    * Built from `sequence` + `transform` so it is pure Catalyst.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < lit(n), array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))

  /** A deterministic uniform-[0,1) value per key, identical on the
    * DuckDB oracle side: first 8 hex chars of md5(seed || key) as a
    * 32-bit integer over 2³². The engine's reproducible `rand()` — used
    * for sampling, salting and the SRP hyperplanes.
    */
  def hashFraction(seed: String, key: Column): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), key)), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Dot product of two double arrays — sequential left-fold so the
    * summation order matches a scalar loop (and the DuckDB oracle). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a double array. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity between two double arrays. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
