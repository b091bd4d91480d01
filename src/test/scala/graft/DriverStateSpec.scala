package graft

/** Pins the driver-side state-bound contract (round-12 verdict ask
  * #6): the few operators that collect a constant-size table and
  * iterate on the driver must do so through
  * `DriverState.collectBounded` with a structurally-derived bound, so
  * a fixture/schema change can never silently turn a vocabulary-
  * bounded fixpoint into data-proportional driver state.
  */
class DriverStateSpec extends SparkSpec {

  test("collectBounded returns all rows when under the bound") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    val rows = DriverState.collectBounded(df, 10, "spec.exact")
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 10))
  }

  test("collectBounded fails loudly the moment the bound is exceeded") {
    import spark.implicits._
    val df = (1 to 11).toDF("x")
    val e = intercept[IllegalArgumentException] {
      DriverState.collectBounded(df, 10, "spec.over")
    }
    assert(e.getMessage.contains("spec.over"))
    assert(e.getMessage.contains("declared bound"))
  }

  test("collectBounded caps the scan itself — a violation costs one " +
    "row, not the whole violation") {
    import spark.implicits._
    // a 1M-row "violation": limit(bound+1) must keep the collect at
    // bound+1 rows, so the guard protects the driver even while firing
    val df = spark.range(1000000L).toDF("x")
    val e = intercept[IllegalArgumentException] {
      DriverState.collectBounded(df, 64, "spec.big")
    }
    assert(e.getMessage.contains("spec.big"))
  }

  test("every collect-then-iterate production site routes through the " +
    "guard (source-level pin)") {
    // the contract is structural, so the pin is structural: the two
    // current fixpoint sites (Bradley–Terry wins, classifier-weight
    // re-entry) must name collectBounded; a new bare `.collect()`
    // feeding a driver loop should be added HERE with its bound
    val learn = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Learn.scala")))
    assert(learn.contains("collectBounded(wins, 4096"),
      "bradleyTerry wins table no longer guarded")
    assert(learn.contains(
      "collectBounded(trainQualityClassifier(s, dir), 16"),
      "classifier weight collects no longer guarded")
  }

  test("the Bradley–Terry wins table is far inside its declared bound " +
    "on a real fixture") {
    val out = operators.Learn.bradleyTerry(spark, sfDir)
    // the query end-to-end (which trips the guard internally if the
    // pairing ever regresses) and the output's vocabulary grain
    assert(out.count() > 0)
    assert(out.count() <= 64, "output is per-language — single digits")
  }
}
