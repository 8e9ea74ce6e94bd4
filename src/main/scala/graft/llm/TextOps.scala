package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators (dedup,
  * similarity, text analysis) — the 100 TB extension surface the reference
  * warehouse doesn't have (BASELINE "north star"; SURVEY §7.2 step 4).
  *
  * Everything here is a pure Catalyst `Column` expression (no UDFs) so the
  * whole pipeline stays inside whole-stage codegen, and every function has an
  * exact DuckDB mirror in [[LlmSql]] — the constants below are embedded as
  * literals on BOTH sides so the oracle can hash-match bit-for-bit.
  *
  * Portable hashing: `hash60(s)` = the first 15 hex digits of md5 as a 60-bit
  * non-negative long. Spark `conv(substring(md5(s),1,15),16,10)` and DuckDB
  * `('0x' || substr(md5(s),1,15))::BIGINT` agree exactly (verified), unlike
  * the engines' native `hash()` functions which use different algorithms.
  */
object TextOps {

  /** Modulus for MinHash permutations: 2^31 - 1 (Mersenne prime). Keeps
    * `a*x + b` inside 62 bits — no int64 overflow in either engine. */
  val P: Long = 2147483647L

  /** MinHash permutation count / LSH banding: 16 hashes = 4 bands x 4 rows.
    * Collision prob for Jaccard j is 1-(1-j^4)^4: ~0.95 at j=0.8, ~0.04 at
    * j=0.3 — tuned for the >=0.8 near-dup threshold used by q21. */
  val NumPerms = 16
  val Bands = 4
  val Rows = 4

  /** (a, b) coefficients for the MinHash permutations h_i(x) = (a*x+b) mod P.
    * Fixed seed so Spark and the generated DuckDB SQL share the values. */
  val perms: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(NumPerms)((1L + rng.nextInt((P - 1).toInt).toLong,
      rng.nextInt(P.toInt).toLong))
  }

  /** SimHash fingerprint width (bits) and banding (4 bands x 8 bits). */
  val SimBits = 32
  val SimBands = 4
  val SimBandBits = 8

  /** Stopword list for quality stats (tiny, matches the synthetic corpus). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "is", "in", "it")

  /** char-trigram profiles for the n-gram language-ID heuristic. Priority
    * order = tie-break order (first match wins on equal scores). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "he ", " th"),
    "es" -> Seq(" de", "os ", "la "),
    "fr" -> Seq(" le", "es ", "que"),
    "de" -> Seq("er ", "ein", "sch"),
    "zh" -> Seq("zh_", "hi_", "ng_"))

  // -------------------------------------------------------------------------
  // Core expressions
  // -------------------------------------------------------------------------

  /** Whitespace tokenization after trim+lower. DuckDB mirror:
    * regexp_split_to_array(trim(lower(x)), '\s+'). */
  def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Canonical normalization for exact dedup: lower, trim, collapse runs of
    * whitespace. */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** 60-bit non-negative hash from the md5 hex prefix — engine-portable.
    * Native digest-byte implementation (graft.expr.Hash60); exactly equal to
    * `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def hash60(s: Column): Column = graft.expr.Hash60(s)

  /** Positional (non-distinct) word k-gram hashes mod P — order preserved for
    * winnowing windows.
    *
    * NOTE for callers: alias this into its own projection before referencing
    * it more than once. Referencing the raw expression N times in one select
    * evaluates the md5 chain N times per row (codegen does not CSE inside
    * higher-order-function lambdas) — materializing via a separate aliased
    * projection is what keeps downstream window scans O(n), not O(n*md5). */
  def shingleHashSeq(tokens: Column, k: Int): Column =
    graft.expr.ShingleHashSeq(tokens, k, P)

  /** MinHash signature: array of NumPerms minima of (a*x+b) mod P over a
    * base-hash array (typically shingleHashSeq output) — the native one-pass
    * kernel (graft.expr.MinhashSig; the HOF spelling ran its lambdas
    * interpreted). Duplicate-insensitive, so positional (non-distinct)
    * hashes give the same signature as the distinct set. A narrow map at
    * any scale, no shuffle. */
  def minhashSignature(baseHashes: Column): Column =
    graft.expr.MinhashSig(baseHashes, perms, P)

  /** LSH band structs [(band_idx, band_hash)] from a MinHash signature:
    * band_hash = md5 of the comma-joined row values. Docs agreeing on ANY
    * band become candidate pairs. */
  def lshBands(sig: Column): Column =
    array((0 until Bands).map { b =>
      struct(
        lit(b).as("band_idx"),
        md5(concat_ws(",",
          (0 until Rows).map(r => sig.getItem(b * Rows + r).cast("string")): _*))
          .as("band_hash"))
    }: _*)

  /** Token-stream hashes for SimHash (native array-wide pass). */
  def tokenHashes(tokens: Column): Column = graft.expr.Hash60Array(tokens)

  /** 32-bit SimHash over a PRE-MATERIALIZED token-hash array: per bit j, sum
    * +1/-1 by whether bit j of the token hash is set; fingerprint sets bit j
    * iff the sum is positive. Native kernel (graft.expr.Simhash32). */
  def simhash(tokenHashes: Column): Column =
    graft.expr.Simhash32(tokenHashes)
}
