package graft

/** Plan contracts: the scale properties the operators are designed around,
  * asserted on the optimized/executed plans so a refactor that silently
  * loses pushdown, broadcast, codegen participation, or salting fails here
  * rather than at cluster scale.
  */
class PlanSpec extends SparkSpec {

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("scan_docs prunes the read schema to the selected columns") {
    val plan = executed("scan_docs")
    val read = plan.split("\n").find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("n_chars"))
    assert(!read.contains("text"), "unprojected text column must not be read")
  }

  test("join_equi broadcasts the nation dimension, no cartesian product") {
    val plan = executed("join_equi")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("assign_nearest runs the native argmin inside whole-stage codegen") {
    val plan = executed("assign_nearest")
    assert(plan.contains("nearestcenter"))
    // the projection row carrying the argmin must be inside a codegen span
    val line = plan.split("\n").find(_.contains("nearestcenter")).get
    assert(line.trim.startsWith("*"), s"not codegen'd: $line")
  }

  test("similarity_topk ranks within salted partitions first") {
    val plan = executed("similarity_topk")
    assert(plan.contains("pmod"), "salted first-phase window missing")
  }

  test("dedup_minhash joins on band keys — no cartesian product") {
    val plan = executed("dedup_minhash")
    assert(!plan.contains("CartesianProduct"))
  }

  test("join_bucketed consumes bucket layout with no exchange on the join") {
    val plan = executed("join_bucketed")
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("SelectedBucketsCount"), "bucketed scan not used")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      "join must not reshuffle bucketed sides")
  }

  test("dedup_ngram inverted-index side is a broadcast join") {
    val plan = executed("dedup_ngram")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
