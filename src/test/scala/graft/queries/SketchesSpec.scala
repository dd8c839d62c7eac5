package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx aggregates land within tolerance of exact values") {
    val rows = Sketches.approxAgg(spark, dir)
      .select("approx_users_ok", "approx_p50_ok").as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (usersOk, p50Ok) =>
      assert(usersOk, "approx_count_distinct outside its 3-sigma bound")
      assert(p50Ok, "approx_percentile p50 outside the exact p40..p60 band")
    }
  }

  test("KMV estimate stays near the exact distinct count on real data") {
    val rows = Sketches.kmvDistinct(spark, dir)
      .select("est_distinct_users", "exact_distinct_users").as[(Double, Long)].collect()
    rows.foreach { case (est, exact) =>
      // k=64 → ~12.6% std error; allow 3 sigma
      assert(math.abs(est - exact) / exact < 0.4, s"est $est vs exact $exact")
    }
  }

  test("salted aggregation equals the plain aggregation") {
    val salted = Sketches.saltedAgg(spark, dir).as[(String, Long, Long)].collect().toSeq
    val plain = graft.ops.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast("long")).as("sum_value_floor"))
      .orderBy("event_type").as[(String, Long, Long)].collect().toSeq
    assert(salted === plain)
  }

  test("salted join equals the plain unsalted join and actually shuffles (no broadcast)") {
    val got = Sketches.saltedJoin(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    val dim = Sketches.TypeWeights.toDF("event_type", "weight")
    val plain = graft.ops.Tables.events(spark, dir)
      .join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(graft.ops.Num.cents(col("value")) * col("weight")).as("weighted_cents"))
      .orderBy("event_type").as[(String, Long, Long)].collect().toSeq
    assert(got === plain)
    // the demonstration is only honest if the dim is NOT broadcast: the
    // salted key must reach a shuffled hash join
    val phys = Sketches.saltedJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(phys.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin in:\n$phys")
    assert(!phys.contains("BroadcastHashJoin"), "dim was broadcast — salt is moot")
  }
}
