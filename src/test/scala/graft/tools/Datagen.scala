package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic star-schema + documents/embeddings generator for scale
  * rungs the driver does not ship (sf1 and up).
  *
  * The driver provides sf0.001/sf0.01/sf0.1 read-only; every scale claim
  * above that extrapolates from 5k documents. This generator extends the
  * ladder with the SAME schemas and measured distributions (probed from
  * the sf0.1 tables: row ratios, value ranges, the 30-word vocabulary
  * with its ~3.3% near-uniform frequencies + the rare `dup` marker in 5%
  * of docs, uniform 10..100 words/doc, 0.16% planted exact-duplicate
  * pairs, iid unit-norm 64-dim embeddings with uniform labels, uniform
  * 30-day event window, ~4 lineitems/order) so per-family bench shapes
  * continue the sf0.01→sf0.1 curve rather than jumping generators.
  *
  * Everything is a PURE HASH of the row id (xxhash64 with a per-column
  * salt — no RNG, no driver loops): generation is one distributed
  * `spark.range` projection per table, reproducible bit-for-bit at any
  * parallelism, and O(rows) at any sf (sf100 would generate the same
  * way on a real cluster). Output is one parquet FILE per table (the
  * driver's layout) with 16 MiB row groups so scans still split.
  *
  * Usage: Test/runMain graft.tools.Datagen <outDir> [multiplier]
  * where multiplier scales the sf1 row counts (default 1 = sf1: 6M
  * lineitem / 50k documents / 1M events).
  */
object Datagen {

  private def u(salt: String, cols: Column*): Column =
    (pmod(xxhash64(lit(salt) +: cols: _*), lit(1000000L)).cast("double") + 0.5) / 1000000.0

  private def hmod(salt: String, m: Long, cols: Column*): Column =
    pmod(xxhash64(lit(salt) +: cols: _*), lit(m))

  private val Vocab = Seq("spark", "window", "merge", "table", "column", "vector",
    "stream", "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the", "row",
    "agg", "key", "query", "a", "scan", "batch")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/sf1")
    val mult = if (args.length > 1) args(1).toDouble else 1.0
    // optional third arg: comma-separated table subset (e.g.
    // "documents,embeddings") — the sf300 scan-family rung only needs the
    // text tables (~1.7 GB documents vs ~42 GB lineitem at mult 300), and
    // the full star schema would not fit the box's free disk at that rung
    val tables: Set[String] =
      if (args.length > 2) args(2).split(',').map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val spark = graft.SparkEntry.session("graft-datagen")
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, out, mult, tables) finally spark.stop()
  }

  def generate(spark: SparkSession, out: String, mult: Double = 1.0,
      tables: Set[String] = Set.empty): Unit = {
    onlyTables = tables
    val nCust = (150000 * mult).toLong
    val nSupp = (10000 * mult).toLong
    val nPart = (200000 * mult).toLong
    val nOrders = (1500000 * mult).toLong
    val nEvents = (1000000 * mult).toLong
    val nDocs = (50000 * mult).toLong
    val nVecs = (20000 * mult).toLong
    val nUsers = (15000 * mult).toLong

    import spark.implicits._

    write(out, "region", Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"))

    write(out, "nation", spark.range(25).select(
      $"id".cast("int").as("n_nationkey"),
      concat(lit("NATION_"), $"id").as("n_name"),
      ($"id" % 5).cast("int").as("n_regionkey")))

    write(out, "customer", spark.range(nCust).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      hmod("c_nat", 25, $"id").cast("int").as("c_nationkey"),
      round(lit(-999.99) + u("c_bal", $"id") * 10999.79, 2).as("c_acctbal"),
      element_at(typedLit(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")), hmod("c_seg", 5, $"id").cast("int") + 1).as("c_mktsegment")))

    write(out, "supplier", spark.range(nSupp).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      hmod("s_nat", 25, $"id").cast("int").as("s_nationkey"),
      round(lit(-999.99) + u("s_bal", $"id") * 10999.79, 2).as("s_acctbal")))

    write(out, "part", spark.range(nPart).select(
      $"id".as("p_partkey"),
      concat(
        element_at(typedLit(Seq("small", "large", "hot", "cold", "red", "blue",
          "old", "new")), hmod("p_adj", 8, $"id").cast("int") + 1),
        lit(" "),
        element_at(typedLit(Seq("widget", "gizmo", "bolt", "plate", "rod", "ring",
          "gear", "anvil")), hmod("p_noun", 8, $"id").cast("int") + 1)).as("p_name"),
      concat(lit("Brand#"), hmod("p_br", 25, $"id") + 1).as("p_brand"),
      element_at(typedLit(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
        "STANDARD")), hmod("p_ty", 6, $"id").cast("int") + 1).as("p_type"),
      (hmod("p_sz", 50, $"id").cast("int") + 1).as("p_size"),
      round(lit(900.0) + (hmod("p_rp", 1000, $"id").cast("double")) / 10.0, 1)
        .as("p_retailprice")))

    // orders over a 2404-day window (1995-01-01 .. 2001-08-01, the sf0.1
    // envelope), day-granular timestamps like the driver's
    val orders = spark.range(nOrders).select(
      $"id".as("o_orderkey"),
      hmod("o_cust", nCust, $"id").as("o_custkey"),
      element_at(typedLit(Seq("F", "O", "P")), hmod("o_st", 3, $"id").cast("int") + 1)
        .as("o_orderstatus"),
      round(lit(1000.0) + u("o_tp", $"id") * 499000.0, 2).as("o_totalprice"),
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        hmod("o_dt", 2404, $"id").cast("int"))).as("o_orderdate"),
      element_at(typedLit(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")), hmod("o_pr", 5, $"id").cast("int") + 1).as("o_orderpriority"))
    write(out, "orders", orders)

    // lineitem: 1..7 lines per order (mean 4 — the measured 4.075) via a
    // per-order explode; every column a hash of (orderkey, linenumber)
    val li0 = spark.range(nOrders).select(
      $"id".as("l_orderkey"),
      explode(sequence(lit(1), (hmod("l_n", 7, $"id") + 1).cast("int")))
        .as("l_linenumber"))
    val lk = Seq($"l_orderkey", $"l_linenumber")
    write(out, "lineitem", li0.select(
      $"l_orderkey",
      hmod("l_pk", nPart, lk: _*).as("l_partkey"),
      hmod("l_sk", nSupp, lk: _*).as("l_suppkey"),
      $"l_linenumber".cast("int").as("l_linenumber"),
      (hmod("l_q", 50, lk: _*).cast("double") + 1.0).as("l_quantity"),
      round((hmod("l_q", 50, lk: _*).cast("double") + 1.0) *
        (lit(900.0) + u("l_pr", lk: _*) * 1200.0), 2).as("l_extendedprice"),
      (hmod("l_d", 11, lk: _*).cast("double") / 100.0).as("l_discount"),
      (hmod("l_t", 9, lk: _*).cast("double") / 100.0).as("l_tax"),
      element_at(typedLit(Seq("A", "N", "R")), hmod("l_rf", 3, lk: _*).cast("int") + 1)
        .as("l_returnflag"),
      element_at(typedLit(Seq("F", "O")), hmod("l_ls", 2, lk: _*).cast("int") + 1)
        .as("l_linestatus"),
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        hmod("o_dt", 2404, $"l_orderkey").cast("int") +
          hmod("l_sd", 95, lk: _*).cast("int") + 1)).as("l_shipdate")))

    // events: µs-granular uniform 30-day window from 2024-01-01 UTC
    write(out, "events", spark.range(nEvents).select(
      $"id".as("event_id"),
      timestamp_micros(lit(1704067200000000L) +
        hmod("e_ts", 30L * 86400L * 1000000L, $"id")).as("ts"),
      hmod("e_u", nUsers, $"id").as("user_id"),
      element_at(typedLit(Seq("click", "error", "purchase", "signup", "view")),
        hmod("e_t", 5, $"id").cast("int") + 1).as("event_type"),
      round(u("e_v", $"id") * 560.0, 2).as("value"),
      format_string("{\"k\": %d}", hmod("e_k", 100, $"id")).as("props")))

    // documents: 10..100 words from the 30-word vocabulary (uniform, the
    // measured shape), one rare `dup` marker token in 5% of docs, and
    // 0.16% of docs planted as EXACT copies of a uniformly-chosen earlier
    // doc (text is a pure function of the source id, so the copy is just
    // generation from srcId)
    val vocabCol = typedLit(Vocab)
    val docs = spark.range(nDocs)
      .select($"id".as("doc_id"),
        when(u("dup?", $"id") < 0.0016 && $"id" > 0,
          pmod(xxhash64(lit("dupsrc"), $"id"), greatest($"id", lit(1L))))
          .otherwise($"id").as("src_id"))
      .select($"doc_id",
        (lit(10) + hmod("nw", 91, $"src_id").cast("int")).as("n_words"), $"src_id")
      .select($"doc_id",
        array_join(transform(sequence(lit(1), $"n_words"), i =>
          when(u("hasdup", $"src_id") < 0.05 &&
            i === pmod(xxhash64(lit("duppos"), $"src_id"), $"n_words".cast("long")) + 1,
            lit("dup"))
            .otherwise(element_at(vocabCol,
              hmod("w", 30, $"src_id", i).cast("int") + 1))), " ").as("text"),
        element_at(typedLit(Seq("en", "zh", "es", "fr", "de")),
          when(u("lang", $"doc_id") < 0.41, 1)
            .when(u("lang", $"doc_id") < 0.56, 2)
            .when(u("lang", $"doc_id") < 0.71, 3)
            .when(u("lang", $"doc_id") < 0.86, 4).otherwise(5)).as("lang"),
        concat(lit("src"), hmod("src", 20, $"doc_id")).as("source"))
      .select($"doc_id", $"text", $"lang", $"source", length($"text").cast("long").as("n_chars"))
    write(out, "documents", docs)

    // embeddings: iid unit-norm 64-dim float vectors (Box–Muller over
    // hash uniforms — the measured corpus is isotropic noise with
    // chance-level cosines), labels uniform over 10 classes
    val z = transform(sequence(lit(0), lit(63)), i =>
      sqrt(lit(-2.0) * log(u("bm1", $"id", i))) *
        cos(lit(2.0 * math.Pi) * u("bm2", $"id", i)))
    write(out, "embeddings", spark.range(nVecs)
      .select($"id".as("vec_id"), z.as("z"),
        hmod("lab", 10, $"id").cast("int").as("label"))
      .select($"vec_id",
        transform($"z", x =>
          (x / sqrt(aggregate($"z", lit(0.0), (acc, y) => acc + y * y)))
            .cast("float")).as("embedding"),
        $"label"))
  }

  /** Write one table as a single parquet FILE named `<name>.parquet`
    * (the driver's layout) with 16 MiB row groups so big tables still
    * split into parallel scan tasks.
    */
  /** Table subset for the current generate() call; empty = all. */
  @volatile private var onlyTables: Set[String] = Set.empty

  private def write(out: String, name: String, df: DataFrame): Unit = {
    if (onlyTables.nonEmpty && !onlyTables(name)) return
    val tmp = s"$out/.tmp_$name"
    df.repartition(1)
      .write.mode("overwrite")
      // 512 KiB row groups: splits can only land on row-group boundaries,
      // so the small tables (documents ~15 MiB, embeddings ~5 MiB at sf1)
      // need fine groups to scan at full parallelism under the session's
      // openCostInBytes split sizing (SparkEntry.pinnedConfs)
      .option("parquet.block.size", 512 * 1024)
      .parquet(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))(0).getPath
    val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    println(s"[datagen] wrote $out/$name.parquet")
  }
}
