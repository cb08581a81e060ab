package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level helpers shared by every graft operator.
  *
  * Design rules (100 TB discipline):
  *   - everything here is a plain Catalyst column expression (codegen'd,
  *     no Scala UDF closures in hot paths);
  *   - all floating-point aggregates route through exact DECIMAL sums so the
  *     result is a deterministic IEEE value regardless of partition order —
  *     a 1000-executor shuffle must produce the same bytes as local[1]
  *     (also required for the DuckDB-oracle hash compare).
  */
object GraftFunctions {

  private val registeredSessions =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register graft's custom Catalyst expressions for SQL use. Idempotent
    * AND once-per-session (re-registration would log a replaced-function
    * warning on every call site). */
  def register(spark: SparkSession): Unit = synchronized {
    if (registeredSessions.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "iso_duration_seconds", exprs => ParseIso8601Duration(exprs.head), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nanos_to_micros", exprs => NanosToMicros(exprs.head), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "hyperplane_bands", { exprs =>
          require(exprs.length == 3,
            s"hyperplane_bands(vector, planes, bands) takes 3 arguments, got ${exprs.length}")
          HyperplaneBands(exprs.head, litInt(exprs(1), "planes"), litInt(exprs(2), "bands"))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "simhash_bits", { exprs =>
          require(exprs.length == 2,
            s"simhash_bits(token_hashes, bits) takes 2 arguments, got ${exprs.length}")
          SimHashBits(exprs.head, litInt(exprs(1), "bits"))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_sigs", { exprs =>
          require(exprs.length == 2,
            s"minhash_sigs(shingle_hashes, num_hashes) takes 2 arguments, got ${exprs.length}")
          MinhashSigs(exprs.head, litInt(exprs(1), "num_hashes"))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "intersect_count", { exprs =>
          require(exprs.length == 2,
            s"intersect_count(a, b) takes 2 arguments, got ${exprs.length}")
          IntersectCount(exprs.head, exprs(1))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "intersect_count_distinct", { exprs =>
          require(exprs.length == 2,
            s"intersect_count_distinct(a, b) takes 2 arguments, got ${exprs.length}")
          IntersectCountDistinct(exprs.head, exprs(1))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "distinct_count", { exprs =>
          require(exprs.length == 1,
            s"distinct_count(a) takes 1 argument, got ${exprs.length}")
          DistinctCount(exprs.head)
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "intersect_count_sorted", { exprs =>
          require(exprs.length == 2,
            s"intersect_count_sorted(a, b) takes 2 arguments, got ${exprs.length}")
          IntersectCountSorted(exprs.head, exprs(1))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "morton_interleave", { exprs =>
          require(exprs.length == 3,
            s"morton_interleave(x, y, bits) takes 3 arguments, got ${exprs.length}")
          MortonInterleave(exprs.head, exprs(1), litInt(exprs(2), "bits"))
        }, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_dot", { exprs =>
          require(exprs.length == 2,
            s"vec_dot(a, b) takes 2 arguments, got ${exprs.length}")
          VecDot(exprs.head, exprs(1))
        }, "scala_udf")
    }
  }

  private def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"hyperplane_bands: $what must be an integer literal, got $other")
  }

  /** LSH band bucket values for an embedding column — one fused pass over
    * the vector for ALL hyperplane projections ([[HyperplaneLsh]]). */
  def hyperplaneBands(spark: SparkSession, c: Column, planes: Int, bands: Int): Column = {
    register(spark)
    call_function("hyperplane_bands", c, lit(planes), lit(bands))
  }

  /** SimHash signature for a token-hash array — one fused pass over the
    * array for ALL signature bits ([[SimHashLsh]]). */
  def simhashBits(spark: SparkSession, c: Column, bits: Int): Column = {
    register(spark)
    call_function("simhash_bits", c, lit(bits))
  }

  /** MinHash signature for a shingle-hash array — one fused pass over the
    * array for ALL hash functions ([[MinhashLsh]]). */
  def minhashSigs(spark: SparkSession, c: Column, numHashes: Int): Column = {
    register(spark)
    call_function("minhash_sigs", c, lit(numHashes))
  }

  /** Morton (Z-order) interleave of two long columns' low `bits` bits —
    * one fused loop for the whole key ([[Morton]]). */
  def mortonInterleave(spark: SparkSession, x: Column, y: Column, bits: Int): Column = {
    register(spark)
    call_function("morton_interleave", x, y, lit(bits))
  }

  /** Sequential-fold dot product of two float/double array columns — the
    * codegen'd cosine kernel ([[VecOps]]; bit-identical to the interpreted
    * `aggregate(zip_with(…))` stack it replaces). Session-less on purpose:
    * the expression-tree helpers (`l2norm`, the per-pair cosines) build
    * columns with no SparkSession parameter in scope, and registration only
    * needs to land before ANALYSIS — the active/default session at
    * construction time is that session. */
  def vecDot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)
    call_function("vec_dot", a, b)
  }

  /** Set-intersection cardinality of two long-array SETS — the Jaccard
    * verify counting kernel ([[SetOps.intersectCount]]); inputs must hold
    * distinct elements (every builder in the repo guarantees it). */
  def intersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("intersect_count", a, b)
  }

  /** Sorted-set intersection cardinality ([[SetOps.intersectCountSorted]]):
    * both arrays must be ascending-sorted (`array_sort` order). Sort each
    * set once at materialization; every probe is then one linear merge with
    * no per-pair scratch buffer — the verify kernel for similarity joins
    * that probe the same sets millions of times. */
  def intersectCountSorted(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("intersect_count_sorted", a, b)
  }

  /** Floor-division nanos→micros via the named [[NanosToMicros]] expression —
    * the node [[graft.plans.NanosDatePushdown]] keys its rewrite on. */
  def nanosToMicros(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("nanos_to_micros", c)
  }

  /** ISO-8601 duration string → seconds (custom Catalyst expression, §2.8 F1). */
  def isoDurationSeconds(c: Column): Column = call_function("iso_duration_seconds", c)

  /** Deterministic, cross-engine 64-bit content hash: first 15 hex chars of
    * md5 → non-negative long in [0, 2^60). Chosen because DuckDB computes the
    * identical value via `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`, which
    * lets every hash-based operator (dedup, MinHash, LSH) be oracle-checked
    * exactly. md5 here is a *partitioner/fingerprint*, not security.
    */
  def hash64(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 31-bit variant for modular MinHash arithmetic that cannot overflow a
    * signed 64-bit product: h ∈ [0, 2^31-1); a*h+b stays < 2^62.
    */
  def hash31(c: Column): Column = pmod(hash64(c), lit(IntModulus))

  /** Prime modulus for the universal-hash family (2^31 - 1, Mersenne). */
  val IntModulus: Long = 2147483647L

  /** Exact partition-order-independent sum of a double column: cast each value
    * to DECIMAL(28,6) (exact for inputs with ≤6 meaningful decimals), sum
    * exactly, cast back to double (a single deterministic rounding).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  /** Deterministic mean built from [[dsum]]: exact-sum → double → one IEEE
    * division. Identical bytes in Spark and DuckDB. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** The pinned 2-dp HALF-EVEN mean (reference `round(mean, 2)` semantics):
    * exact decimal sum, decimal division, bround while still decimal — never
    * round the double (engines disagree on binary-vs-shortest-repr ties).
    *
    * PRECONDITION (ENFORCED): Spark's decimal division keeps scale 6 here,
    * so the pre-bround value is the true mean rounded at the 6th decimal.
    * For ≤2-dp inputs that intermediate rounding cannot cross a .xx5
    * boundary while groups stay under ~10⁷ rows (mean granularity
    * 1/(100·n) > 5e-7). Beyond [[Avg2GroupLimit]] the group RAISES instead
    * of silently diverging from the exact half-even oracle — at that size
    * compute the mean via the exact integer formulation (see the
    * q_daily_agg_rounded ORACLE's HUGEINT floor/mod form); Spark decimal
    * ops alone cannot hold the exact rational. The guard is one comparison
    * per GROUP (not per row) — free at any scale. */
  val Avg2GroupLimit: Long = 10000000L

  def avg2(c: Column): Column = {
    val n = count(lit(1))
    when(n <= Avg2GroupLimit,
        bround(sum(c.cast("decimal(28,6)")) / n, 2).cast("double"))
      .otherwise(raise_error(lit(
        s"avg2: group exceeds $Avg2GroupLimit rows — the scale-6 decimal mean is no " +
          "longer exact at 2dp half-even; use the exact integer formulation")).cast("double"))
  }

  /** Whitespace tokenization shared by the text operators — `trim` first so
    * leading blanks don't produce an empty token (DuckDB's
    * regexp_split_to_array(trim(x),'\s+') matches exactly). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

}
