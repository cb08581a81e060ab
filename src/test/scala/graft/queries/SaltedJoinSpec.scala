package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.operators.SaltedJoin

/** [[SaltedJoin]] + `e_salted_join` — salting must be invisible in the
  * result and visible in the load distribution. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted join result is row-identical to the plain join") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val stats = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_lang"), sum(col("n_chars")).as("chars_lang"))
    val plain = docs.join(stats, Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("n_docs_lang"), col("chars_lang"))
      .collect().toSet
    val salted = ExtQueries.saltedJoin(spark, dir).collect().toSet
    assert(salted == plain)
  }

  test("salting spreads the hot key: worst partition load shrinks") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val salt = pmod(graft.functions.GraftFunctions
      .hash64(col("doc_id").cast("string")), lit(ExtQueries.JoinSalts.toLong))
    def worstLoad(keyed: org.apache.spark.sql.DataFrame): Long = keyed
      .groupBy(spark_partition_id().as("p")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect().head.getLong(0)
    val parts = 16
    val unsalted = worstLoad(docs.repartition(parts, col("lang")))
    val salted = worstLoad(docs.repartition(parts, col("lang"), salt))
    // the dominant language (~44% of the corpus) lands on ONE partition
    // unsalted; salted over 8 buckets the worst partition must shed most
    // of that load
    assert(salted * 2 < unsalted,
      s"worst partition: salted=$salted unsalted=$unsalted")
  }

  test("plan: shuffle join keys carry the salt; no broadcast on the forced path") {
    val plan = ExtQueries.saltedJoin(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(plan.contains("SortMergeJoin"), plan.take(600))
    assert(plan.contains("__salt"),
      "the join must key on (lang, __salt) — a salt-free join re-creates " +
        "the hot reducer this operator exists to prevent")
  }

  test("null bigId salts to bucket 0 — the row joins like the unsalted join " +
      "instead of vanishing through a null join key") {
    val a = spark.range(0, 10).select(
      when(col("id") < 5, col("id")).as("id"),   // ids 5..9 become null
      (col("id") % 3).as("k"))
    val b = spark.range(0, 3).select(col("id").as("k"), (col("id") * 10).as("v"))
    val got = SaltedJoin.saltedEquiJoin(a, b, "k", col("id"), 4)
      .select(col("k"), col("v")).collect().toSeq.sortBy(r => (r.getLong(0)))
    val want = a.join(b, Seq("k")).select(col("k"), col("v"))
      .collect().toSeq.sortBy(r => (r.getLong(0)))
    assert(got == want, "all 10 rows must survive, null-id rows included")
    assert(got.size == 10)
  }

  test("a pre-existing __salt column on either input fails loudly") {
    val a = spark.range(0, 4).select(col("id"), (col("id") % 2).as("k"),
      lit(0L).as("__salt"))
    val b = spark.range(0, 2).select(col("id").as("k"), col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      SaltedJoin.saltedEquiJoin(a, b, "k", col("id"), 4)
    }
    assert(e.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      SaltedJoin.saltedEquiJoin(b, a, "k", col("id"), 4)
    }
    assert(e2.getMessage.contains("__salt"))
  }

  test("degenerate salts=1 is exactly the plain join shape") {
    val a = spark.range(0, 100).select(col("id"), (col("id") % 3).as("k"))
    val b = spark.range(0, 3).select(col("id").as("k"), (col("id") * 10).as("v"))
    val got = SaltedJoin.saltedEquiJoin(a, b, "k", col("id"), 1)
      .select(col("id"), col("k"), col("v")).collect().toSet
    val want = a.join(b, Seq("k")).select(col("id"), col("k"), col("v"))
      .collect().toSet
    assert(got == want)
  }
}
