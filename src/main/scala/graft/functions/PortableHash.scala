package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for the dedup/similarity
  * pipeline (SURVEY.md §7.2 step 10).
  *
  * Spark's `hash()`/`xxhash64` and DuckDB's `hash()` use different
  * algorithms, so oracle-checked dedup needs a hash both engines can
  * compute identically. This is a polynomial rolling hash over
  * characters evaluated with Catalyst higher-order functions
  * (`transform`/`aggregate` — codegen'd, no UDF):
  *
  *   H(w) = fold(chars(w), 0, (acc, c) => (acc * 31 + ascii(c)) mod P)
  *
  * with P = 1e9+7 (< 2^30, so 31*H fits comfortably in a long). The
  * DuckDB mirror is `list_reduce(list_prepend(CAST(0 AS BIGINT),
  * list_transform(string_split(w, ''), x -> ascii(x))), ...)`.
  *
  * MinHash permutations are the classic (a*H + b) mod P family with
  * odd `a` — seeds fixed below and mirrored in the oracle SQL.
  */
object PortableHash {
  val P = 1000000007L

  /** Number of MinHash permutations and the LSH banding layout. */
  val NumPerms = 16
  val BandSize = 4
  val NumBands: Int = NumPerms / BandSize

  def permA(k: Int): Long = 2L * k + 1
  def permB(k: Int): Long = 7919L * k

  /** Positional weights that fuse one band's 4 signature values into a
    * single join key (base-31 positional combine; max value ~1.2e14).
    */
  val BandPow: Array[Long] = Array(29791L, 961L, 31L, 1L)

  /** Portable polynomial hash of a string column -> long in [0, P). */
  def wordHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % P)

  /** The DuckDB-side expression for the same hash, for oracle SQL. */
  def wordHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), x -> ascii(x))), " +
      s"(a, b) -> (a * 31 + b) % $P)"

  /** k-th MinHash permutation applied to a hash column. */
  def perm(k: Int, h: Column): Column =
    (lit(permA(k)) * h + lit(permB(k))) % P
}
