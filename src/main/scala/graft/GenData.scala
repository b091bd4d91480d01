package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-owned synthetic-data generator for scale factors the driver
  * does not ship (round-10 verdict ask #1: a measured THIRD decade).
  * Schema-compatible with `/root/testdata/sf*` (TESTDATA.md) — same
  * table names, column names, column types, categorical vocabularies
  * and date ranges — so every declared query and every DuckDB oracle
  * runs unmodified on the output. Output lands OUTSIDE the driver's
  * read-only tree (default `data/sf1.0/`, git-ignored) and is
  * documented as builder-generated in TESTDATA-sf1.md.
  *
  * Generation is DISTRIBUTED and SEEDED: every column derives from the
  * row id via xxhash64 with a per-column salt — no RNG state, no
  * driver-side loops, so the same (sf, seed) pair reproduces the same
  * bytes at any parallelism, and generating a 100 TB corpus with the
  * same code is just a bigger `spark.range`. Each table is re-packed
  * to a single `<name>.parquet` FILE (not a directory) because
  * `tools/check.py` points DuckDB's `read_parquet` at the same paths
  * the driver fixtures use.
  *
  * Fixture conventions preserved (the properties queries assume):
  *  - `events` is event-time-sorted with `event_id` = rank order, ts
  *    spans 30 days of Jan 2024, `value >= 0`, props = `{"k": N}`.
  *  - `orders` spans 1995-01-01..2001-08-01; `o_orderdate` is a pure
  *    function of `o_orderkey`, so `lineitem` recomputes it to place
  *    `l_shipdate` 1..94 days after the order without a join.
  *  - ~2 % of orders carry no lineitem (referential audits need a
  *    non-degenerate orphan class); lines per order 0..7, avg ~3.9.
  *  - `documents` keeps the 31 probe words (phrase / collocation /
  *    BM25 queries probe words like 'spark', 'scan') as the HEAD of a
  *    Zipf(1) rank distribution whose vocabulary size follows Heaps'
  *    law, V = ceil(30·√(total tokens)) — ~50k words at sf1.0. The
  *    round-11 fixture drew uniformly from ONLY the 31 words, which
  *    saturates the 3-gram shingle space (31³ = 29,791 shingles for
  *    2.5M instances at sf1.0: every posting list hot, ~8 % of all
  *    doc pairs sharing a shingle by the birthday bound) and
  *    mis-measures the exact-similarity family's top-decade curves;
  *    real corpora grow vocabulary by Heaps' law with Zipf-tailed
  *    document frequencies, which this mode reproduces. The rank draw
  *    is inverse-CDF: r = ⌊V^u⌋ gives P(r) ≈ 1/(r·ln V) — Zipf
  *    exponent 1, so rank-1 'a' lands at ~9 % of tokens (a stopword)
  *    and rank-25 'spark' at ~0.4 % — probe phrases stay hot enough
  *    for the BM25/phrase fixtures at every sf. Tail ranks map to
  *    letter-only synthetic words ('x' + digits→letters, e.g.
  *    x1097 → 'xbajh') so tokenizer/quality heuristics see word-like
  *    tokens. `--mode sat31` reproduces the round-11 31-word fixture
  *    byte-for-byte (kept so the r11 artifacts stay replayable).
  *    ~0.8 % of docs are exact copies and ~1.6 % near-copies of an
  *    earlier doc (the dedup family needs both classes present).
  *  - `embeddings` are unit-norm 64-d floats in 10 label clusters
  *    (centroid + noise, then exact normalization).
  */
object GenData {
  val vocab: Seq[String] = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the", "value",
    "vector", "window")

  /** Uniform [0, 1) from (id, salt) — 6 decimal digits of resolution. */
  private def u(idCol: String, salt: Int): String =
    s"pmod(xxhash64($idCol, ${salt}L), 1000000L) / 1000000.0d"

  /** Non-negative integer in [0, n) from (id, salt). */
  private def m(idCol: String, salt: Int, n: Long): String =
    s"pmod(xxhash64($idCol, ${salt}L), ${n}L)"

  /** o_orderdate as a pure function of the order key (shared with the
    * lineitem generator): 1995-01-01 + 0..2404 days = ..2001-08-01.
    */
  private def orderDateExpr(keyCol: String): String =
    s"cast(date_add(date'1995-01-01', " +
      s"cast(${m(keyCol, 11, 2405)} as int)) as timestamp)"

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val outDir = args.lift(1).getOrElse("data/sf1.0")
    val mode = args.lift(2).getOrElse("heaps")
    require(mode == "heaps" || mode == "sat31", s"unknown mode $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-gendata",
      // INT96 keeps timestamps tz-naive for pyarrow/DuckDB, matching
      // the driver fixtures (see Verify's note on the hash compare)
      Map("spark.sql.parquet.outputTimestampType" -> "INT96"))
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, sf, outDir, mode)
    spark.stop()
  }

  def generate(spark: SparkSession, sf: Double, outDir: String,
               mode: String = "heaps"): Unit = {
    val nCust = math.max(1, (150000 * sf).toLong)
    val nSupp = math.max(1, (10000 * sf).toLong)
    val nPart = math.max(1, (200000 * sf).toLong)
    val nOrd = math.max(1, (1500000 * sf).toLong)
    val nEv = math.max(1, (1000000 * sf).toLong)
    val nDoc = math.max(50, (50000 * sf).toLong)
    val nEmb = math.max(10, (8000 * sf).toLong)
    val nUser = math.max(1, nCust / 10)
    val par = spark.sparkContext.defaultParallelism

    /** Write as the single-FILE `<dir>/<name>.parquet` layout the
      * driver fixtures use (check.py's read_parquet needs files).
      */
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet written for $name"))
      val dst = new java.io.File(s"$outDir/$name.parquet")
      if (dst.exists()) dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dir.listFiles().foreach(_.delete())
      dir.delete()
      println(s"[gendata] $name -> $dst")
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    writeOne(spark.range(5).selectExpr(
      "cast(id as int) as r_regionkey",
      s"element_at(array(${regions.map("'" + _ + "'").mkString(",")}), " +
        "cast(id as int) + 1) as r_name"), "region")

    writeOne(spark.range(25).selectExpr(
      "cast(id as int) as n_nationkey",
      "concat('NATION_', id) as n_name",
      "cast(id % 5 as int) as n_regionkey"), "nation")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    writeOne(spark.range(0, nCust, 1, par).selectExpr(
      "id as c_custkey",
      "concat('Customer#', lpad(id, 9, '0')) as c_name",
      s"cast(${m("id", 1, 25)} as int) as c_nationkey",
      s"round(-1000.0d + ${u("id", 2)} * 11000.0d, 2) as c_acctbal",
      s"element_at(array(${segs.map("'" + _ + "'").mkString(",")}), " +
        s"cast(${m("id", 3, 5)} as int) + 1) as c_mktsegment"), "customer")

    writeOne(spark.range(0, nSupp, 1, par).selectExpr(
      "id as s_suppkey",
      "concat('Supplier#', lpad(id, 9, '0')) as s_name",
      s"cast(${m("id", 4, 25)} as int) as s_nationkey",
      s"round(-1000.0d + ${u("id", 5)} * 11000.0d, 2) as s_acctbal"),
      "supplier")

    val adjs = Seq("large", "hot", "blue", "red", "small", "green",
      "dark", "light", "cold", "shiny")
    val nouns = Seq("ring", "bolt", "screw", "nut", "washer", "gear",
      "axle", "wheel", "rod", "plate")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
      "STANDARD")
    writeOne(spark.range(0, nPart, 1, par).selectExpr(
      "id as p_partkey",
      s"concat(element_at(array(${adjs.map("'" + _ + "'").mkString(",")})," +
        s" cast(${m("id", 6, 10)} as int) + 1), ' ', " +
        s"element_at(array(${nouns.map("'" + _ + "'").mkString(",")}), " +
        s"cast(${m("id", 7, 10)} as int) + 1)) as p_name",
      s"concat('Brand#', ${m("id", 8, 25)} + 1L) as p_brand",
      s"element_at(array(${types.map("'" + _ + "'").mkString(",")}), " +
        s"cast(${m("id", 9, 6)} as int) + 1) as p_type",
      s"cast(${m("id", 10, 50)} + 1L as int) as p_size",
      "900.0d + (id % 1000) / 10.0d as p_retailprice"), "part")

    writeOne(spark.range(0, nOrd, 1, par).selectExpr(
      "id as o_orderkey",
      s"${m("id", 12, nCust)} as o_custkey",
      s"element_at(array('O','F','P'), cast(${m("id", 13, 3)} as int) + 1)" +
        " as o_orderstatus",
      s"round(1000.0d + ${u("id", 14)} * 499000.0d, 2) as o_totalprice",
      s"${orderDateExpr("id")} as o_orderdate",
      "element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED'," +
        s"'5-LOW'), cast(${m("id", 15, 5)} as int) + 1) as o_orderpriority"),
      "orders")

    // lineitem: 0..7 lines per order (avg ~3.9; the %9-capped-at-7 draw
    // leaves ~11 % of orders line-less → a real orphan class), line
    // attributes hashed from the (orderkey, linenumber) pair
    writeOne(spark.range(0, nOrd, 1, par)
      .selectExpr("id as l_orderkey",
        s"least(${m("id", 16, 9)}, 7L) as n_lines")
      // NOT sequence(1, n_lines): Spark's sequence(1, 0) is the
      // DESCENDING [1, 0] — a zero-line order would get two rows, one
      // with l_linenumber = 0. slice(…, 1, 0) is the empty array.
      .selectExpr("l_orderkey",
        "explode(slice(sequence(1, 7), 1, cast(n_lines as int))) " +
          "as l_linenumber")
      .selectExpr(
        "l_orderkey",
        "xxhash64(l_orderkey, l_linenumber) as lk",
        "l_linenumber")
      .selectExpr(
        "l_orderkey",
        s"${m("lk", 17, nPart)} as l_partkey",
        s"${m("lk", 18, nSupp)} as l_suppkey",
        "cast(l_linenumber as int) as l_linenumber",
        s"cast(${m("lk", 19, 50)} + 1L as double) as l_quantity",
        s"round(900.0d + ${u("lk", 20)} * 104100.0d, 2) as l_extendedprice",
        s"cast(${m("lk", 21, 11)} as double) / 100.0d as l_discount",
        s"cast(${m("lk", 22, 9)} as double) / 100.0d as l_tax",
        s"element_at(array('A','N','R'), cast(${m("lk", 23, 3)} as int) + 1)" +
          " as l_returnflag",
        s"element_at(array('F','O'), cast(${m("lk", 24, 2)} as int) + 1)" +
          " as l_linestatus",
        s"cast(date_add(cast(${orderDateExpr("l_orderkey")} as date), " +
          s"cast(${m("lk", 25, 94)} + 1L as int)) as timestamp) as l_shipdate"),
      "lineitem")

    // events: strictly increasing ts (base grid + sub-grid jitter keeps
    // monotonicity: gap + j(i+1) - j(i) >= 1 µs), event_id = ts rank
    val gapUs = (30L * 86400L * 1000000L) / nEv
    val epoch0 = 1704067200000000L // 2024-01-01T00:00:00Z in µs
    val evTypes = Seq("click", "error", "purchase", "signup", "view")
    writeOne(spark.range(0, nEv, 1, par).selectExpr(
      "id as event_id",
      s"timestamp_micros(${epoch0}L + id * ${gapUs}L + " +
        s"${m("id", 26, math.max(1L, gapUs))}) as ts",
      s"${m("id", 27, nUser)} as user_id",
      s"element_at(array(${evTypes.map("'" + _ + "'").mkString(",")}), " +
        s"cast(${m("id", 28, 5)} as int) + 1) as event_type",
      s"round(${u("id", 29)} * ${u("id", 30)} * 560.0d, 2) as value",
      s"concat('{\"k\": ', ${m("id", 31, 100)}, '}') as props"), "events")

    // documents: ~0.8 % exact copies and ~1.6 % near copies of an
    // earlier doc (content_id redirects; a near copy swaps ~1 word in 9
    // via a second hash stream), word salad from a Heaps-law Zipf
    // vocabulary headed by the 31 probe words (mode=heaps, default)
    // or from the 31 words uniformly (mode=sat31, the round-11 form)
    val vocabArr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    // Heaps' law: V = ceil(K·n^β) with K=30, β=1/2 over the expected
    // token mass (n_words averages 8 + 95/2 = 55.5) — ~50k words at
    // sf1.0, ~5k at sf0.01, never below 2× the probe head
    val vHeaps = math.max(62L,
      math.ceil(30.0 * math.sqrt(nDoc * 55.5)).toLong)
    // Zipf(1) by inverse CDF: u in (0,1) from the hash (half-open
    // +0.5 offset keeps u>0 so pow>=1), rank r = floor(V^u) in
    // [1, V-1], P(r) = ln(1+1/r)/ln(V) ~ 1/(r ln V); ranks 1..31 are
    // the probe vocabulary, the tail is 'x'+digits->letters
    def word(seed: String, salt: Int): String =
      if (mode == "sat31")
        s"element_at($vocabArr, cast(pmod(xxhash64($seed, i, ${salt}L), " +
          s"31L) as int) + 1)"
      else {
        val rank = s"cast(pow(${vHeaps}.0d, " +
          s"(pmod(xxhash64($seed, i, ${salt}L), 1000000L) + 0.5d) " +
          s"/ 1000000.0d) as bigint)"
        s"case when $rank <= 31 then " +
          s"element_at($vocabArr, cast($rank as int)) " +
          s"else concat('x', translate(cast($rank as string), " +
          s"'0123456789', 'abcdefghij')) end"
      }
    writeOne(spark.range(0, nDoc, 1, par)
      .selectExpr("id as doc_id",
        s"${m("id", 32, 500)} as dup_draw",
        s"${m("id", 33, 50)} + 1L as back")
      .selectExpr("doc_id",
        "case when doc_id >= 50 and dup_draw < 4 then doc_id - back " +
          "else doc_id end as content_id",
        "case when doc_id >= 50 and dup_draw >= 4 and dup_draw < 12 " +
          "then 1 else 0 end as mutate")
      .selectExpr("doc_id", "content_id", "mutate",
        s"8L + ${m("content_id", 34, 96)} as n_words")
      .selectExpr("doc_id",
        s"array_join(transform(sequence(1, cast(n_words as int)), i -> " +
          s"case when mutate = 1 and pmod(i, 9) = 0 then " +
          s"${word("doc_id", 35)} else " +
          s"${word("content_id", 36)} end), ' ') as text",
        s"case when ${m("doc_id", 37, 20)} < 8 then 'en' " +
          s"when ${m("doc_id", 37, 20)} < 11 then 'de' " +
          s"when ${m("doc_id", 37, 20)} < 14 then 'es' " +
          s"when ${m("doc_id", 37, 20)} < 17 then 'fr' else 'zh' end as lang",
        s"concat('src', ${m("doc_id", 38, 20)}) as source")
      .selectExpr("doc_id", "text", "lang", "source",
        "cast(length(text) as bigint) as n_chars"), "documents")

    // embeddings: 10 clusters — centroid(label, dim) in (-1, 1) plus
    // Irwin–Hall noise (3 uniforms − 1.5, sd 0.5) scaled 0.6, then
    // exact unit normalization; floats after the divide like the fixture
    writeOne(spark.range(0, nEmb, 1, par)
      .selectExpr("id as vec_id",
        s"cast(${m("id", 39, 10)} as int) as label")
      .selectExpr("vec_id", "label",
        "transform(sequence(0, 63), d -> " +
          "(pmod(xxhash64(label, d, 40L), 2001L) - 1000.0d) / 1000.0d + " +
          "0.6d * ((pmod(xxhash64(vec_id, d, 41L), 1000L) + " +
          "pmod(xxhash64(vec_id, d, 42L), 1000L) + " +
          "pmod(xxhash64(vec_id, d, 43L), 1000L)) / 1000.0d - 1.5d)) as raw")
      .selectExpr("vec_id", "label", "raw",
        "sqrt(aggregate(raw, 0.0d, (a, x) -> a + x * x)) as nrm")
      .selectExpr("vec_id",
        "transform(raw, x -> cast(x / nrm as float)) as embedding",
        "label"), "embeddings")
    // provenance stamp (ADVICE r12): Scale's same-regime Heaps curves
    // are only meaningful if every dir in the curve was generated with
    // the SAME documents mode — a stale sat31 tree silently mixing
    // into a heaps curve defeats the curve's whole purpose. Scale
    // refuses to emit *_h fields for an unstamped or wrong-mode dir.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/GENMODE"),
      s"mode=$mode sf=$sf\n".getBytes("UTF-8"))
    println(s"[gendata] sf=$sf -> $outDir (cust=$nCust ord=$nOrd " +
      s"ev=$nEv doc=$nDoc emb=$nEmb mode=$mode)")
  }
}
