package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The injected optimizer rule must add the implied length-difference
  * conjunct to edit-distance filters without changing results. */
class LevenshteinPrefilterSpec extends SparkSpec {

  private def names = {
    import spark.implicits._
    Seq("red bolt", "xed bolt", "old gear", "golden gear wheel", "bolt")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
  }

  test("levenshtein <= k filter gains the implied abs-length-diff conjunct") {
    val a = names.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = names.select(col("id").as("b_id"), col("name").as("b_name"))
    val fuzzy = a.crossJoin(b)
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
    val optimized = fuzzy.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") && optimized.contains("length("),
      s"implied length bound missing from optimized plan:\n$optimized")
  }

  /** Independent reference implementation (Wagner-Fischer DP). */
  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("flipped, long-literal, and cast predicate spellings also gain the bound") {
    val a = names.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = names.select(col("id").as("b_id"), col("name").as("b_name"))
    def planOf(c: org.apache.spark.sql.Column): String =
      a.crossJoin(b).filter(c).queryExecution.optimizedPlan.toString
    assert(planOf(lit(2) > levenshtein(col("a_name"), col("b_name")))
      .contains("abs("), "k > lev spelling missed")
    assert(planOf(levenshtein(col("a_name"), col("b_name")).cast("long") <= 1L)
      .contains("abs("), "cast-to-long spelling missed")
  }

  test("rule is semantics-preserving and idempotent") {
    val a = names.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = names.select(col("id").as("b_id"), col("name").as("b_name"))
    val withRule = a.crossJoin(b)
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
      .select("a_id", "b_id")
    // independent oracle: the same pairs by a driver-side DP
    val local = names.collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = (for {
      (ai, an) <- local; (bi, bn) <- local if editDist(an, bn) <= 1
    } yield (ai, bi)).toSet
    val got = withRule.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got $got expected $expected")
    // idempotence: exactly one injected bound per predicate, not one per
    // optimizer fixed-point iteration
    val plan = withRule.queryExecution.optimizedPlan.toString
    assert(plan.sliding("abs(".length).count(_ == "abs(") == 1,
      s"expected exactly one injected abs() bound:\n$plan")
  }
}
