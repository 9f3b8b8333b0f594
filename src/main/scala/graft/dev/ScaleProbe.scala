package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe: run the heavy operators on N×-unioned copies of
  * the fixtures (ids offset per copy so keys stay distinct) and report
  * how runtime scales. A sub-linear or linear curve supports the
  * 100 TB-survivability claims; super-linear growth flags a quadratic
  * term that small-SF benches hide.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    // optional kernel filter: remaining args are name prefixes; empty =
    // run everything (e.g. `sf0.1 100 ngram_pairs gini` probes two
    // kernels at ×100 without paying for the rest of the suite).
    val only: Seq[String] = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Amplification is a broadcast cross join with range(n), NOT n unions:
    // at ×100 a union tower is a 100-branch plan (analysis/codegen cost
    // scales with the multiplier — the probe would time the planner, not
    // the kernel), while the cross join keeps plan size CONSTANT in n and
    // scan cost linear. Ids offset per copy so keys stay distinct.
    def amp(df: DataFrame, n: Int, idCols: Seq[String], offset: Long): DataFrame =
      if (n == 1) df
      else {
        val copies = broadcast(spark.range(n).select(col("id").as("__copy")))
        val crossed = df.crossJoin(copies)
        idCols.foldLeft(crossed)((d, c) =>
          d.withColumn(c, col(c) + col("__copy") * lit(offset)))
          .drop("__copy")
      }
    def amplifyDocs(n: Int): DataFrame =
      amp(graft.Tables.documents(spark, sfDir).select("doc_id", "text"),
        n, Seq("doc_id"), 1000000L)
    def amplifyLineitem(n: Int): DataFrame =
      amp(graft.Tables.lineitem(spark, sfDir), n, Seq("l_orderkey"), 10000000L)
    def amplifyOrders(n: Int): DataFrame =
      amp(graft.Tables.orders(spark, sfDir), n, Seq("o_orderkey"), 10000000L)

    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.exists(p => name.startsWith(p))) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
      }

    for (n <- Seq(1, mult)) {
      println(s"--- amplification x$n ---")
      time(s"agg_cents x$n") {
        amplifyLineitem(n).groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(graft.Tables.cents(col("l_extendedprice"))).as("s"),
            count(lit(1)).as("c")).count()
      }
      val docs = amplifyDocs(n)
      time(s"minhash_pairs x$n") {
        import graft.operators.Dedup
        val sigs = docs.select(col("doc_id"),
          Dedup.minhashSignature(col("text")).as("sig"))
        sigs.select(col("doc_id"),
          posexplode(expr("transform(sequence(0, 15), b -> xxhash64(cast(slice(sig, b*4+1, 4) as string)))")))
          .groupBy(col("pos"), col("col")).count()
          .filter(col("count") > 1).count()
      }
      time(s"exact_dedup x$n") {
        docs.groupBy(md5(col("text").cast("binary"))).agg(count(lit(1))).count()
      }
      time(s"scrape_snapshot x$n") {
        // event-log compaction (q_scrape_snapshot): ~3.1 events/key,
        // partial-then-final max-struct — one exchange of one candidate
        // row per key per partition at any log volume
        graft.operators.Scrape.snapshotOfOrders(amplifyOrders(n)).count()
      }
      time(s"simhash_fp x$n") {
        import graft.operators.Dedup
        docs.select(Dedup.simhash(col("text")).as("fp"))
          .agg(count_distinct(col("fp"))).collect()(0).getLong(0)
      }
      time(s"ngram_pairs x$n") {
        // capped posting lists + sorted_pairs kernel: at higher
        // amplification more shingles cross the df cap and drop, so pair
        // counts must stay bounded (the anti-quadratic property itself)
        import graft.operators.Dedup
        val g = docs
          .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("gs"))
          .select(col("doc_id"), xxhash64(col("gs")).as("gram"))
        g.groupBy("gram")
          .agg(graft.functions.CappedCollect.cappedList(Dedup.maxDf)(col("doc_id")).as("docs"))
          .filter(size(col("docs")) >= 1)
          .select(explode(graft.plans.GraftExpressions.sorted_pairs(col("docs"))))
          .count()
      }
      time(s"ngram_containment x$n") {
        // the SHIPPED containment core (shares the posting-list pipeline
        // with ngram_pairs; only the closing score differs)
        graft.operators.Dedup.containmentOf(docs).count()
      }
      time(s"dedup_clusters x$n") {
        // shipped pair pipeline → shipped connected components. Amplified
        // copies push shingle df past the cap, so the PAIR set shrinks as
        // n grows (the anti-quadratic property); the probe times the
        // whole composite the production query runs.
        graft.operators.Dedup.clustersOf(spark,
          graft.operators.Dedup.pairsOf(docs).select(col("d1"), col("d2")))
          .count()
      }
      time(s"winnow x$n") {
        // shipped winnowing pipeline: fingerprint selection is a pure
        // per-doc projection (scales with the scan), and amplified
        // copies push fingerprint df past the cap so the PAIR set
        // shrinks as n grows — same anti-quadratic property as ngram
        graft.operators.Dedup.winnowPairsOf(docs).count()
      }
      time(s"substring_spans x$n") {
        // shipped repeated-span pipeline: position-gram df aggregate +
        // join-back + per-doc island window — STRICTLY LINEAR by
        // construction (no pair join anywhere), so the exponent should
        // track the scan
        graft.operators.Dedup.substringSpansOf(docs).count()
      }
      time(s"lpa_3round x$n") {
        // shipped LPA core per round: one edge join + (node,label)
        // count + top-1 window. Nodes must be CONTIGUOUS [0, N):
        // synthEdges targets (id² + 7k) mod N, so amplified SPARSE ids
        // (copy offset 1e6) would point ~90%+ of edges at phantom
        // nodes — a structurally different graph per n, not a scaled
        // one. The graph is id-defined, so a plain range scales the
        // SHIPPED shape exactly.
        val baseN = graft.Tables.documents(spark, sfDir).count()
        val nodes = spark.range(baseN * n).select(col("id"))
        graft.operators.Graph.lpa(nodes,
          graft.operators.Graph.synthEdges(nodes)).count()
      }
      time(s"entity_resolve x$n") {
        // shipped ER pipeline over n×-amplified customers; copies get a
        // per-copy name suffix (identical names across copies would
        // chain lev-0 clusters BY CONSTRUCTION — an amplification
        // artifact, not an algorithm property), variants injected the
        // same way as the registered query
        val base = amp(
          graft.Tables.customer(spark, sfDir).select(
            col("c_custkey").cast("bigint").as("ekey"),
            col("c_name").as("name"), col("c_nationkey").as("nation"),
            col("c_acctbal").as("acctbal")),
          n, Seq("ekey"), 10000000L)
          .withColumn("name", concat(col("name"), lit("~"),
            lpad((col("ekey") / 10000000L).cast("bigint").cast("string"),
              3, "0"))) // fixed width: variable-length suffixes ("~3" vs
                        // "~37") differ by one INSERTION and would chain
                        // cross-copy matches through the length-diff gate
        val variants = base.filter(col("ekey") % 3 === 0)
          .select((col("ekey") + 1099511627776L).as("ekey"),
            expr("concat(substring(name, 1, 10), substring(name, 12))").as("name"),
            col("nation"), (col("acctbal") + 37.5).as("acctbal"))
        graft.operators.Capstone.resolveEntities(
          spark, base.union(variants)).count()
      }
      time(s"basket_lift x$n") {
        // baskets duplicate ×n (orderkey offset): pair ROWS grow linearly
        // but distinct pairs/parts stay fixed, so the count-agg state and
        // the cached frame must stay constant-size while only the
        // exchange volume scales
        graft.operators.Relational.basketLiftOf(amplifyLineitem(n)).count()
      }
      time(s"gini_nation x$n") {
        // the shipped two-level ranked gini over an n×-amplified
        // customer-revenue frame (custkey offset per copy, synthetic
        // 25-way nation label): the ordered-window input must stay
        // ~1/256 of rows at every n
        val baseRev = graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"),
            graft.Tables.cents(col("l_extendedprice")).as("pc"))
          .join(graft.Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey")).agg(sum(col("pc")).as("rev"))
          .withColumn("n_name",
            concat(lit("N"), (col("o_custkey") % 25).cast("string")))
        graft.operators.Quant.giniOf(
          amp(baseRev, n, Seq("o_custkey"), 100000000L)).count()
      }
      time(s"contamination x$n") {
        // bench-gram set stays fixed-size while the corpus amplifies: the
        // probe must scale with the corpus scan (linear), since corpus
        // grams only flow through a broadcast semi-join, never a shuffle
        val bench = graft.Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 97 === 0)
          .select(explode(graft.plans.GraftExpressions.shingles(col("text"), 5)).as("g"))
          .select(xxhash64(col("g")).as("gram")).distinct()
        docs.select(col("doc_id"),
            explode(graft.plans.GraftExpressions.shingles(col("text"), 5)).as("g"))
          .select(col("doc_id"), xxhash64(col("g")).as("gram"))
          .join(broadcast(bench), Seq("gram"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .count()
      }
      time(s"quota_skew_window x$n") {
        // 90% of rows land in one stratum: the window form must sort the
        // whole hot stratum on a single reducer
        import org.apache.spark.sql.expressions.Window
        val st = docs.select(
          when(col("doc_id") % 10 < 9, "hot").otherwise("cold").as("st"),
          md5(col("doc_id").cast("string")).as("h"), col("doc_id"))
        val w = Window.partitionBy(col("st")).orderBy(col("h"), col("doc_id"))
        st.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).count()
      }
      time(s"quota_skew_heap x$n") {
        // bounded-heap form: each partition forwards at most 10 rows per
        // stratum, so the hot stratum never concentrates
        val st = docs.select(
          when(col("doc_id") % 10 < 9, "hot").otherwise("cold").as("st"),
          md5(col("doc_id").cast("string")).as("h"), col("doc_id"))
        st.groupBy("st").agg(graft.functions.TopK.minK(10)(col("h"), col("doc_id")).as("kept"))
          .select(explode(col("kept"))).count()
      }
      time(s"pack_prefix_sum x$n") {
        // segmented prefix sum with the SHIPPED r7 sizing: segment size
        // scales with the id domain so the single-partition offsets
        // window sees ≤4097 rows at ANY amplification (the r6 fixed-256
        // sizing grew it linearly with the corpus)
        import org.apache.spark.sql.expressions.Window
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val segSize = graft.operators.Pipeline.packSegSize(maxId)
        val toks = docs.select(col("doc_id"),
          size(graft.functions.TextAnalysis.tokens(col("text"))).cast("bigint").as("n_tokens"),
          expr(s"doc_id div $segSize").as("seg"))
        val withinW = Window.partitionBy(col("seg")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val within = toks.withColumn("cum", sum(col("n_tokens")).over(withinW))
        val segW = Window.orderBy(col("seg"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = toks.groupBy("seg").agg(sum("n_tokens").as("seg_sum"))
          .withColumn("seg_offset", coalesce(sum(col("seg_sum")).over(segW), lit(0L)))
          .select(col("seg"), col("seg_offset"))
        within.join(broadcast(offsets), "seg")
          .select(expr("(seg_offset + cum - n_tokens) div 2048").as("w"))
          .groupBy("w").count().count()
      }
      time(s"passage_dedup x$n") {
        // amplified copies repeat every passage n times: window groups on
        // the passage hash grow with n, per-doc aggregation stays bounded
        import org.apache.spark.sql.expressions.Window
        val chunks = docs
          .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, size(toks)-1, 32), st -> array_join(slice(toks, st+1, 32), ' '))")))
          .select(col("doc_id"),
            (col("doc_id") * 100000L + col("pos")).as("k"),
            md5(col("col").cast("binary")).as("h"))
        val w = Window.partitionBy(col("h"))
        chunks.withColumn("keep", col("k") === min(col("k")).over(w))
          .groupBy("doc_id")
          .agg(sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup")).count()
      }
      time(s"incr_bloom_route x$n") {
        // corpus and batch both amplify; the bloom is rebuilt per scale
        // and routing + exact verify must stay corpus-scan-linear
        val batch = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 400000000L).as("doc_id"), col("text"))
          .union(docs.filter(col("doc_id") % 5 === 1)
            .select((col("doc_id") + 500000000L).as("doc_id"),
              concat(lit("new material "), col("text")).as("text")))
        graft.operators.Incremental
          .novelAgainst(docs, batch, 70000L * n, 0.01).count()
      }
      time(s"rank_1window x$n") {
        // the naive global shuffle rank: ONE unpartitioned window — the
        // whole corpus sorts on a single reducer (the shape Selection
        // deliberately avoids); its growth curve is the argument
        import org.apache.spark.sql.expressions.Window
        val base = docs.select(col("doc_id"),
          md5(concat(lit("shf"), col("doc_id").cast("string"))).as("h"))
        val w = Window.orderBy(col("h"), col("doc_id"))
        base.withColumn("pos", row_number().over(w))
          .filter(col("pos") % 1000 === 0).count()
      }
      time(s"rank_2level x$n") {
        // Selection.twoLevelRank — the SHIPPED implementation (256
        // hash-prefix buckets, offsets broadcast back; no single-reducer
        // sort), measured directly
        val base = docs.select(col("doc_id"),
          md5(concat(lit("shf"), col("doc_id").cast("string"))).as("h"))
        graft.operators.Selection.twoLevelRank(base, "h", "doc_id", Nil, "pos")
          .filter(col("pos") % 1000 === 0).count()
      }
      time(s"canonical_minheap x$n") {
        // amplified copies make every content-hash group n× hotter; the
        // MinKAgg member heap caps per-partition state at 16 ids per group
        docs.groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(graft.functions.TopK.minK(16)(
            lpad(col("doc_id").cast("string"), 10, "0"), col("doc_id")).as("kept"),
            count(lit(1)).as("n"))
          .filter(col("n") > 1).count()
      }
      time(s"pagerank_3iter x$n") {
        // Graph.pagerank over Graph.synthEdges — the SHIPPED iteration
        // core, measured directly; node and edge counts both scale n×
        val nodes = docs.select(col("doc_id").as("id"))
        graft.operators.Graph.pagerank(nodes, graft.operators.Graph.synthEdges(nodes))
          .agg(sum(col("rank"))).collect()(0).getLong(0) % 1000
      }
      time(s"stats_moments x$n") {
        // power-sum moment kernel: exchanges carry 8 sums per group no
        // matter the row count — should stay scan-bound
        val li = amplifyLineitem(n)
        val x = col("l_quantity")
        li.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("c"), sum(x).as("s1"), sum(x * x).as("s2"),
            sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
          .count()
      }
      time(s"bm25 x$n") {
        // term filter before the (doc,term) count: exchanges carry only
        // matching-term rows, constants broadcast
        import graft.functions.TextAnalysis.tokens
        val d = docs.select(col("doc_id"), tokens(col("text")).as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
        val tf = d.select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
          .filter(col("tok").isin("hash", "spark", "window"))
          .groupBy(col("doc_id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy("tok").agg(count(lit(1)).as("df")).count() + tf.count()
      }
      time(s"triangle_census x$n") {
        // ordered-edge joins; edge count scales n× with the synthetic
        // graph, join keys stay single bigints
        val nodes = docs.select(col("doc_id").as("id"))
        val edges = graft.operators.Graph.synthEdges(nodes)
        val und = edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val bc = und.select(col("a").as("b"), col("b").as("c"))
        val ac = und.select(col("a"), col("b").as("c"))
        und.join(bc, "b").join(ac, Seq("a", "c"), "left_semi").count()
      }
      time(s"cdc_compact x$n") {
        // latest-row-per-key window over an n×-amplified event log
        val e = graft.Tables.events(spark, sfDir)
        val amp = (0 until n).map(i =>
          e.select((col("user_id") + lit(i * 1099511627776L)).as("user_id"),
            col("event_type"), col("ts"), col("event_id")))
          .reduce(_ union _)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        amp.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error").count()
      }
      time(s"ivf_assign x$n") {
        val cents = graft.functions.Similarity.ivfCentroids(64, 64)
        val e = graft.Tables.embeddings(spark, sfDir)
        (0 until n).map(i => e.select(
            (col("vec_id") + lit(i * 1099511627776L)).as("vec_id"), col("embedding")))
          .reduce(_ union _)
          .select(element_at(graft.plans.GraftExpressions.ivf_cells(
            col("embedding").cast("array<double>"), cents, 1), 1).as("cell"))
          .groupBy("cell").count().count()
      }
      time(s"emb_pca x$n") {
        // the one-pass MomentAgg moment matrix (VERDICT r10 #3): buffer
        // size is dimension-fixed (2 080 cells), so growth must be the
        // scan — exponent ~1.0, and the exchange stays one buffer per
        // partition at ANY n
        val e = graft.Tables.embeddings(spark, sfDir)
        val amp = (0 until n).map(i => e.select(
            (col("vec_id") + lit(i * 1099511627776L)).as("vec_id"), col("embedding")))
          .reduce(_ union _)
        graft.functions.Similarity.pcaOf(spark, amp).count()
      }
      time(s"ab_cuped x$n") {
        // one user-keyed aggregate + 1-row pooled broadcast: user count
        // scales n× (offset ids), exchanges carry 6 sums per user
        val e = graft.Tables.events(spark, sfDir)
        val amp = (0 until n).map(i =>
          e.select((col("user_id") + lit(i * 1099511627776L)).as("user_id"),
            col("ts"), col("value")))
          .reduce(_ union _)
        graft.operators.Stats.cupedOf(spark, amp).count()
      }
      time(s"capstone_corpus x$n") {
        // the full composite (gate → dedup → contamination → budget
        // select) end-to-end: amplified copies multiply every stage's
        // input but each stage's exchanges stay key-hashed and the
        // offsets window stays ≤33 rows — growth must track the scan
        val d = graft.Tables.documents(spark, sfDir)
        val amp = (0 until n).map(i => d.select(
            (col("doc_id") + lit(i * 1099511627776L)).as("doc_id"),
            col("text"), col("lang"), col("source")))
          .reduce(_ union _)
        val out = graft.operators.Capstone.corpusBuild(amp).count()
        spark.sharedState.cacheManager.clearCache()
        out
      }
      time(s"overlap_rewrite x$n") {
        // the RangeJoinRewrite plan on an n×-amplified point side: pair
        // volume grows n× (the interval side is fixed), so growth must
        // track the exchange volume, never the n×|intervals| product
        val li = amplifyLineitem(n)
          .filter(col("l_returnflag") === "R" && col("l_quantity") <= 2)
          .select(col("l_orderkey"), col("l_shipdate"))
        val o = graft.Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        val naive = li.join(o,
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 3 DAYS") &&
            col("o_orderdate") <= col("l_shipdate") + expr("INTERVAL 2 DAYS"))
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_overlap"))
        graft.plans.RangeJoinRewrite.applied(spark, naive, 4 * 86400.0).count()
      }
      time(s"release_gate x$n") {
        // the release capstone's spine (union → content-hash dedup
        // window → two-level k-anon aggregate) on n× docs: one hash
        // exchange scales with rows, the QI combination space does not
        val d = graft.Tables.documents(spark, sfDir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        // text salted per copy: amplified docs must be DISTINCT content
        // (otherwise the dedup collapses the amplification and the probe
        // times nothing)
        val amp = if (n == 1) d
          else d.crossJoin(broadcast(spark.range(n).select(col("id").as("__copy"))))
            .withColumn("doc_id", col("doc_id") + col("__copy") * lit(10000000L))
            .withColumn("text", concat(col("text"), lit(" zz"), col("__copy")))
            .drop("__copy")
        val c0 = amp.unionByName(amp.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 1099511627776L))
          .filter(col("n_chars") >= 100)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        c0.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .groupBy(col("source"), col("lang"),
            floor(col("n_chars") / 100).cast("long").as("qb"))
          .agg(count(lit(1)).as("nn"))
          .groupBy("source")
          .agg(sum("nn").as("n_released"), min("nn").as("min_k"))
          .count()
      }
    }
    spark.stop()
  }
}
