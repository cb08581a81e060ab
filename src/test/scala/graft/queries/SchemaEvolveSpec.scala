package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_schema_evolve` — the column-mapping merged read. Pins:
  *
  *  - NULL-FILL: `quality_tag` is NULL exactly on generation-0 rows (the
  *    added column back-fills as NULL, never as a default that would
  *    require rewriting old files);
  *  - RENAME RESOLVED: the output carries the logical `length_chars` (no
  *    `n_chars` column survives), and its values equal the base table's
  *    `n_chars` for every row of BOTH generations;
  *  - NO REWRITE: the merged read's plan is scan → project → union — no
  *    join and no shuffle before the output sort, so old files are read
  *    as-is (the whole point of storing a mapping instead of rewriting).
  */
class SchemaEvolveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("null-fill lands exactly on generation 0; the rename resolves") {
    val out = ExtQueries.schemaEvolve(spark, dir)
    assert(out.columns.toSeq == Seq("doc_id", "generation", "text", "lang",
      "source", "length_chars", "quality_tag"))
    assert(!out.columns.contains("n_chars"), "the physical name leaked")

    val rows = out.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val gen = r.getLong(1)
      assert(gen == r.getLong(0) % ExtQueries.SchemaEvolveGenMod)
      assert((gen == 0L) == r.isNullAt(6),
        s"doc ${r.getLong(0)}: quality_tag null-fill must track generation")
    }

    // rename: length_chars == the base table's n_chars on every row
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getLong(5) == base(r.getLong(0)),
        s"doc ${r.getLong(0)}: renamed column lost its values")

    // both generations present and the tag rule holds on generation 1
    val gen1 = rows.filter(_.getLong(1) == 1L)
    assert(gen1.nonEmpty && rows.exists(_.getLong(1) == 0L))
    for (r <- gen1) {
      val want = if (r.getLong(5) >= ExtQueries.SchemaEvolveLongMin) "long"
        else "short"
      assert(r.getString(6) == want)
    }
  }

  test("the merged read rewrites nothing: no join, no pre-sort shuffle") {
    val plan = ExtQueries.schemaEvolve(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(!plan.contains("Join"), "a column-mapping read must not join")
    // the only exchange NODE is the output sort's range partitioning
    // (formatted mode prints each node id in the tree and the detail
    // section — count distinct ids, the PlanSpec parquetScans device)
    val exchangeIds = """\((\d+)\) Exchange""".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchangeIds.size == 1,
      s"pre-sort shuffle appeared (old files would be rewritten/moved):\n" +
        plan.take(800))
    assert(plan.toLowerCase.contains("rangepartitioning"),
      "the single exchange must be the output sort's")
  }
}
