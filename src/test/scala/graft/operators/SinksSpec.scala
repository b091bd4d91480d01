package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SinksSpec extends SparkSpec {

  test("upsertByDate: dynamic overwrite of one partition preserves the rest") {
    val out = Sinks.upsertByDate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == want)
    // the overwritten day's directory exists exactly once
    val dirs = new java.io.File(s"/tmp/graft_sinks/${new java.io.File(sfDir)
      .getName}/daily_counts").listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName)
    assert(dirs.distinct.length == dirs.length)
    assert(dirs.contains("day=2024-01-15"))
  }

  test("versioned table: commits are immutable, as-of reads pin a " +
    "version, vacuum retracts the manifest before the data") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_versioned_${System.nanoTime()}"
    try {
      assert(Versioned.versions(s, t).isEmpty)
      Versioned.commit(Seq(1, 2).toDF("x"), t)
      Versioned.commit(Seq(1, 2, 3).toDF("x"), t)
      Versioned.commit(Seq(9).toDF("x"), t)
      assert(Versioned.versions(s, t) == Seq(1, 2, 3))
      // time travel: each as-of read returns that commit's content
      assert(Versioned.read(s, t, Some(1)).count() == 2)
      assert(Versioned.read(s, t, Some(2)).count() == 3)
      assert(Versioned.read(s, t).as[Int].collect().toSeq == Seq(9))
      // snapshot isolation: a reader resolved before a new commit
      // keeps reading its pinned version
      val pinned = Versioned.read(s, t)
      Versioned.commit(Seq(7, 7).toDF("x"), t)
      assert(pinned.count() == 1)
      assert(Versioned.read(s, t).count() == 2)
      // vacuum keeps the newest K and reports what it dropped
      assert(Versioned.vacuum(s, t, keep = 2) == Seq(1, 2))
      assert(Versioned.versions(s, t) == Seq(3, 4))
      assert(Versioned.read(s, t, Some(3)).count() == 1)
      intercept[IllegalArgumentException] {
        Versioned.read(s, t, Some(1))
      }
      // vacuumed data directories are really gone
      val dataDirs = new java.io.File(s"$t/data").listFiles().map(_.getName)
      assert(!dataDirs.exists(_.startsWith("v=1-")), dataDirs.mkString(","))
      assert(!dataDirs.exists(_.startsWith("v=2-")), dataDirs.mkString(","))
      // OPTIMIZE: compaction is just another commit — same rows,
      // fewer files, old layout still time-travel readable
      val scattered = Seq.tabulate(64)(i => (i.toLong, i * 2.0))
        .toDF("k", "x").repartition(16)
      Versioned.commit(scattered, t)
      val vOpt = Versioned.optimize(s, t, targetFiles = 2)
      val optDir = new java.io.File(s"$t/data").listFiles()
        .filter(_.getName.startsWith(s"v=$vOpt-")).head
      val nFiles = optDir.listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles <= 2, s"$nFiles files after optimize")
      assert(Versioned.read(s, t).count() == 64)
      assert(Versioned.read(s, t, Some(vOpt - 1)).count() == 64)

      // a failed publish leaves no orphan data: make the manifest
      // create fail (manifest path occupied by a plain file) and watch
      // commit throw AND delete its unique attempt directory
      val t2 = s"${t}_failpub"
      val mf = new org.apache.hadoop.fs.Path(s"$t2/_manifest")
      val fs2 = mf.getFileSystem(s.sparkContext.hadoopConfiguration)
      val o = fs2.create(mf, false); o.writeBytes("not a dir"); o.close()
      intercept[Throwable] { Versioned.commit(Seq(1).toDF("x"), t2) }
      val orphan = new java.io.File(s"$t2/data")
      assert(!orphan.exists() || orphan.listFiles().isEmpty)
      fs2.delete(new org.apache.hadoop.fs.Path(t2), true)

      // orphan GC: a data dir with no manifest (a commit that died
      // between write and publish) is reclaimed by vacuum once past
      // the grace window — and PROTECTED while inside it
      val orphanDir = new java.io.File(s"$t/data/v=99-deadbeef")
      orphanDir.mkdirs()
      val liveBefore = Versioned.versions(s, t)
      Versioned.vacuum(s, t, keep = 10) // default 24h grace: stays
      assert(orphanDir.exists(), "in-grace orphan must survive")
      Versioned.vacuum(s, t, keep = 10, orphanGraceMs = 0)
      assert(!orphanDir.exists(), "post-grace orphan must be reclaimed")
      assert(Versioned.versions(s, t) == liveBefore)
      liveBefore.foreach(v => Versioned.read(s, t, Some(v)).count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(t)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("versioned publish is atomic no-replace: a second racer to the " +
    "same version throws, the winner's manifest survives, no temp debris") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_vpublish_${System.nanoTime()}"
    try {
      Versioned.commit(Seq(1).toDF("x"), t) // the winner commits v1
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      intercept[java.nio.file.FileAlreadyExistsException] {
        Versioned.publish(fs, t, 1, "loser123",
          """{"version":1,"path":"data/bogus"}""")
      }
      // winner's manifest still resolves its own data dir
      assert(Versioned.read(s, t, Some(1)).as[Int].collect().toSeq == Seq(1))
      val mf = new java.io.File(s"$t/_manifest").listFiles().map(_.getName)
      assert(mf.toSeq == Seq("1"), mf.mkString(","))
    } finally {
      val p = new org.apache.hadoop.fs.Path(t)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("commitRetry: concurrent writers all land on distinct versions " +
    "with every data set readable; stale publish temps vacuum away") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_vocc_${System.nanoTime()}"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      Versioned.commit(Seq(0).toDF("x"), t) // v1 seeds the table
      // four writers race the head concurrently — OCC must serialize
      // them onto distinct versions without losing any payload
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 4).toList.map(i =>
          Future(i -> Versioned.commitRetry(Seq(i).toDF("x"), t)))),
        2.minutes)
      val vs = results.map(_._2)
      assert(vs.toSet.size == 4 && vs.forall(v => v >= 2 && v <= 5),
        s"versions: $results")
      results.foreach { case (payload, v) =>
        assert(Versioned.read(s, t, Some(v)).as[Int].collect().toSeq ==
          Seq(payload), s"v$v lost payload $payload")
      }
      // a dead writer's temp manifest is vacuumed once past grace
      val stale = new org.apache.hadoop.fs.Path(s"$t/_manifest/.tmp-9-dead")
      val o = fs.create(stale, true); o.writeBytes("{}"); o.close()
      Versioned.vacuum(s, t, keep = 10)
      assert(fs.exists(stale), "in-grace temp must survive")
      Versioned.vacuum(s, t, keep = 10, orphanGraceMs = 0)
      assert(!fs.exists(stale), "post-grace temp must be reclaimed")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(t), true)
    }
  }

  test("commitBatch: a replayed batch commits nothing — no duplicate " +
    "version, no second data dir, rollup unchanged (exactly-once)") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_vbatch_${System.nanoTime()}"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      assert(Versioned.commitBatch(Seq(1, 2).toDF("x"), t, 0L))
      assert(Versioned.commitBatch(Seq(3).toDF("x"), t, 1L))
      // the replay: same batchId, possibly different object identity
      assert(!Versioned.commitBatch(Seq(1, 2).toDF("x"), t, 0L))
      assert(Versioned.versions(s, t) == Seq(1, 2))
      val dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/data"))
      assert(dataDirs.length == 2, dataDirs.map(_.getPath.getName).toSeq)
      val all = Versioned.read(s, t, Some(1))
        .unionByName(Versioned.read(s, t, Some(2)))
      assert(all.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    } finally fs.delete(new org.apache.hadoop.fs.Path(t), true)
  }

  test("versionedDelete: erased rows gone at latest, still readable at " +
    "v1 (time-travel), physically gone only after vacuum; NULL " +
    "predicate rows survive (SQL DELETE semantics)") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_vdel_${System.nanoTime()}"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      Versioned.commit(Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
        .toDF("k", "tag"), t)
      // delete WHERE tag = 'a': row 1 TRUE (erased), row 2 NULL
      // (survives — SQL DELETE only removes TRUE), row 3 FALSE
      val v2 = Versioned.delete(s, t, org.apache.spark.sql.functions
        .col("tag") === "a")
      assert(v2 == 2)
      assert(Versioned.read(s, t).select("k").as[Long].collect().sorted
        .toSeq == Seq(2L, 3L))
      // time-travel: the erased row is still served at v1
      assert(Versioned.read(s, t, Some(1)).select("k").as[Long].collect()
        .sorted.toSeq == Seq(1L, 2L, 3L))
      // vacuum retires v1 → the erasure becomes physical
      Versioned.vacuum(s, t, keep = 1, orphanGraceMs = 0)
      intercept[IllegalArgumentException] {
        Versioned.read(s, t, Some(1))
      }
    } finally fs.delete(new org.apache.hadoop.fs.Path(t), true)
  }

  test("versionedMerge: MERGE lands as version 2, version 1 snapshot " +
    "is untouched underneath") {
    val merged = Versioned.versionedMerge(spark, sfDir)
    val nMerged = merged.count()
    val table = s"/tmp/graft_sinks/${new java.io.File(sfDir).getName}" +
      "/versioned_merge"
    assert(Versioned.versions(spark, table) == Seq(1, 2))
    val base = graft.Tables.orders(spark, sfDir)
    val nBase = base.count()
    // v1 is byte-stable: same rows as the raw snapshot
    assert(Versioned.read(spark, table, Some(1)).count() == nBase)
    // v2 reflects the batch: deletes removed, inserts added
    val nDel = base.filter(col("o_orderkey") % 11 === 0).count()
    val nIns = base.filter(col("o_orderkey") % 13 === 0).count()
    assert(nMerged == nBase - nDel + nIns, s"$nMerged vs $nBase-$nDel+$nIns")
  }

  test("jsonArchive layout: a day filter prunes to ONE partition " +
    "directory (PartitionFilters, not a full scan)") {
    Sinks.jsonArchive(spark, sfDir).collect() // materialize the archive
    val out = s"/tmp/graft_sinks/${new java.io.File(sfDir).getName}" +
      "/events_json"
    val df = spark.read.json(out).filter(col("day") === "2024-01-15")
    val p = df.queryExecution.executedPlan.toString
    // the day predicate must resolve against the hive-style directory
    // layout — a partition filter at the scan, zero data files read
    // from other days
    assert(p.contains("PartitionFilters"), p.take(1500))
    assert(p.contains("day") && !p.contains("PushedFilters: [IsNotNull(day)"),
      p.take(1500))
    val scannedDays = df.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).map(f => f.split("/day=")(1).split("/")(0)).toSet
    assert(scannedDays == Set("2024-01-15"), scannedDays.toString)
  }

  test("compact: 16 scattered files become ≤2, same content") {
    val row = Sinks.compact(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_rows") == Tables.orders(spark, sfDir).count())
    val root = s"/tmp/graft_sinks/${new java.io.File(sfDir).getName}"
    def parquets(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquets(s"$root/scattered") == 16)
    assert(parquets(s"$root/compacted") <= 2)
  }

  test("schemaEvolution: early-generation rows surface null priorities") {
    val out = Sinks.schemaEvolution(spark, sfDir).collect()
    val totalN = out.map(_.getAs[Long]("n")).sum
    val withPriority = out.map(_.getAs[Long]("n_with_priority")).sum
    assert(totalN == Tables.orders(spark, sfDir).count())
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) >= 1998).count()
    assert(withPriority == expected) // gen-1 rows read as null priority
    assert(withPriority < totalN)    // both generations present
  }

  test("zorderCluster: per-file ranges narrow on BOTH dims; content intact") {
    val roll = Sinks.zorderCluster(spark, sfDir)
    // round trip: the rollup read back from the clustered files equals
    // the same rollup straight off the source table
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val viaZ = roll.collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("n_events")).toMap
    assert(viaZ == direct)
    // the layout claim: average per-file (min,max) width is well under
    // the global width on BOTH clustering dimensions — the property
    // that lets parquet stats prune files for predicates on either
    val root = s"/tmp/graft_sinks/${new java.io.File(sfDir).getName}"
    val files = new java.io.File(s"$root/events_zorder").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4, s"${files.length} files")
    def ranges(c: org.apache.spark.sql.Column) = files.map { f =>
      val r = spark.read.parquet(f)
        .select(min(c).cast("long"), max(c).cast("long")).head
      (r.getLong(0), r.getLong(1))
    }
    val dayCol = datediff(col("ts").cast("date"),
      lit(java.sql.Date.valueOf("2024-01-01")))
    val userCol = pmod(col("user_id"), lit(1024))
    for ((c, name) <- Seq((dayCol, "day"), (userCol, "user"))) {
      val rs = ranges(c)
      val gLo = rs.map(_._1).min; val gHi = rs.map(_._2).max
      val avgWidth = rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.length
      assert(avgWidth < 0.75 * (gHi - gLo),
        s"$name: avg file width $avgWidth vs global ${gHi - gLo}")
    }
  }

  test("orcRoundTrip: values survive ORC; filter reaches the ORC scan") {
    val back = Sinks.orcRoundTrip(spark, sfDir)
    val direct = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") > 0)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey").collect()
    assert(back.collect().sameElements(direct))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.contains("Format: orc") ||
      plan.toLowerCase.contains("orc"), s"not an ORC scan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(s_acctbal), " +
      "GreaterThan(s_acctbal,0.0)]"), "filter not pushed to ORC scan")
  }

  test("multiFormatUnion: four format arms agree — 4x rows per " +
    "region, same distinct nations") {
    val got = Sinks.multiFormatUnion(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val want = graft.Tables.nation(spark, sfDir)
      .groupBy("n_regionkey")
      .agg((count(lit(1)) * 4).as("n_rows"),
        countDistinct(col("n_nationkey")).as("n_nations"))
      .orderBy("n_regionkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("changeFeed: classification counts follow the change law and " +
    "update rows carry exactly the merged delta") {
    val rows = Versioned.changeFeed(spark, sfDir).collect()
    val keys = Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0))
    val byType = rows.groupBy(_.getString(1))
    assert(byType("insert").map(_.getLong(0)).toSet ==
      keys.filter(_ % 13 == 0).map(k => -(k + 1)).toSet)
    assert(byType("delete").map(_.getLong(0)).toSet ==
      keys.filter(_ % 11 == 0).toSet)
    assert(byType("update").map(_.getLong(0)).toSet ==
      keys.filter(k => k % 7 == 0 && k % 11 != 0).toSet)
    byType("update").foreach { r =>
      assert(r.getString(3) == "R", "update postimage status")
      assert(r.getDouble(5) == r.getDouble(4) + 1000.0,
        "update postimage total")
    }
    byType("insert").foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(4), "insert must have no preimage")
    }
    byType("delete").foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(5), "delete must have no postimage")
    }
  }
}
