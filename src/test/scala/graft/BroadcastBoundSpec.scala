package graft

/** Pins the broadcast-side bound contract (round-13 verdict ask #2 —
  * `DriverState.collectBounded`'s discipline extended to `broadcast()`
  * hints whose bound is an ARGUMENT, not a plan fact): the ANN
  * pipelines' construction-bounded broadcast sides must route through
  * `Broadcasts.bounded` with their derived bound, so a parameter or
  * geometry drift (wider shortlist, denser IVF cells, a centroid
  * table outgrowing its byte budget) fails loudly at test scale
  * instead of OOM-ing a driver at 10⁹ vectors.
  */
class BroadcastBoundSpec extends SparkSpec {

  test("bounded broadcasts when the side is under its bound") {
    import spark.implicits._
    val small = (1 to 10).map(i => (i, s"v$i")).toDF("k", "v")
    val big = spark.range(0, 1000L).selectExpr("cast(id % 10 + 1 as int) as k")
    val joined = big.join(
      Broadcasts.bounded(small, 10, "spec.under"), "k")
    assert(joined.count() == 1000)
    // the hint must survive into the executed plan: the whole point
    // is overriding a planner estimate that would pick sort-merge
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"bounded side did not plan as a broadcast join:\n$phys")
  }

  test("bounded fails loudly the moment the bound is exceeded") {
    import spark.implicits._
    val df = (1 to 11).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Broadcasts.bounded(df, 10, "spec.over")
    }
    assert(e.getMessage.contains("spec.over"))
    assert(e.getMessage.contains("construction bound"))
  }

  test("bounded caps the verification scan — a violation costs one " +
    "row, not the whole violation") {
    // a 1M-row "violation": limit(bound+1) keeps the count job at
    // bound+1 rows, so the guard protects the cluster even while
    // firing
    val df = spark.range(1000000L).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Broadcasts.bounded(df, 64, "spec.big")
    }
    assert(e.getMessage.contains("spec.big"))
  }

  test("knownRows path runs ZERO jobs — a memoized cardinality is " +
    "trusted, not re-counted") {
    // a frame that THROWS if any job evaluates it: the knownRows
    // fast path must neither scan on success nor on failure
    val trap = spark.range(1L)
      .selectExpr("assert_true(id < 0) as boom")
    Broadcasts.bounded(trap, 10, "spec.known.ok", knownRows = 5L)
    val e = intercept[IllegalArgumentException] {
      Broadcasts.bounded(trap, 10, "spec.known.over", knownRows = 11L)
    }
    assert(e.getMessage.contains("spec.known.over"))
  }

  test("rowBudget stays finite when auto-broadcast is disabled — an " +
    "explicit hint ignores -1, so 'disabled' must not read as " +
    "'unbounded'") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val b = Broadcasts.rowBudget(spark, 512L)
      assert(b == (10L << 20) / 512L, s"expected the 10 MB floor, got $b")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("every construction-bounded ANN broadcast site routes through " +
    "the guard (source-level pin)") {
    // the contract is structural, so the pin is structural (the
    // DriverStateSpec pattern): the shortlist, probe-cell, candidate
    // and centroid sides must name Broadcasts.bounded with their
    // derived bounds; a new bare `broadcast()` of an argument-bounded
    // side should be added HERE with its bound
    val sim = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/operators/Similarity.scala")))
    assert(sim.contains("Broadcasts.bounded(shortlist,"),
      "adcRerank shortlist broadcast no longer guarded")
    assert(sim.contains("Broadcasts.bounded(probeCells,"),
      "ivfPqTopK probeCells broadcast no longer guarded")
    assert(sim.contains("Broadcasts.bounded(candPairs,"),
      "ivfPqTopK candPairs broadcast no longer guarded")
    assert(sim.contains("Broadcasts.bounded(cents, graft.Broadcasts.rowBudget"),
      "IVF centroid broadcast no longer byte-budget guarded")
    // and the three IVF consumers all take the guarded centroid path
    assert(sim.contains("centsBroadcast(s, dir, \"ivfPqTopK.cents\")"))
    assert(sim.contains("centsBroadcast(s, dir, \"ivfAssignment.cents\")"))
    assert(sim.contains("centsBroadcast(s, dir, \"ivfProbeAssignment.cents\")"))
  }

  test("the guarded IVF-PQ pipeline still answers on a real fixture — " +
    "the bounds hold with production parameters") {
    val out = operators.Similarity.ivfPqTopK(spark, sfDir)
    assert(out.count() > 0)
  }
}
