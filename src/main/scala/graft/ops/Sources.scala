package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** SURVEY.md §2.1: the csv/json format surface as a DRIVER-VISIBLE
  * oracle-gated query (the loaders themselves live in Tables and are
  * unit-tested in SourcesSpec; this pack proves the full read path —
  * explicit schema, header handling, type round-trip — produces
  * byte-identical analytics to the parquet originals).
  *
  * Scale notes: csv/json are splittable line formats, so the staged
  * reads parallelize per file-split exactly like the parquet scans;
  * schemas are always EXPLICIT (inference is a full extra pass and
  * yields driver-version-dependent types).
  */
object Sources extends QueryPack {

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  def queries: Map[String, Q] = Map(
    // ------------------------------------------------------------------
    // Stage orders→csv and customer→json in a per-run temp dir, read
    // both back through the explicit-schema loaders, then join+aggregate
    // FROM THE STAGED FORMATS. The oracle runs the same aggregation on
    // the parquet originals, so any loss in the csv/json round-trip
    // (type, precision, header, timestamp format) breaks the hash.
    "q74_sources" -> ((s, dir) => {
      val stage = Stage.dir("sources74")
      Tables.orders(s, dir).write.mode("overwrite")
        .option("header", "true").csv(s"$stage/orders_csv")
      Tables.customer(s, dir).write.mode("overwrite").json(s"$stage/customer_json")
      val o = Tables.readCsv(s, s"$stage/orders_csv", ordersSchema)
      val c = Tables.readJson(s, s"$stage/customer_json", customerSchema)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 6).as("revenue"),
          min(col("o_orderdate")).as("first_order"))
        .orderBy(col("c_mktsegment"), col("o_orderstatus"))
    }),
    // ------------------------------------------------------------------
    // The partitioned-parquet SINK surface: documents written
    // hive-partitioned by lang (the layout a 100 TB corpus store uses so
    // language slices are directory-prunable), read back, and aggregated
    // from a 2-lang slice. The lang filter must become PartitionFilters
    // on the read (asserted in SourcesSpec) — only those directories are
    // scanned. Oracle runs the same slice on the parquet originals, so
    // any loss in the partitioned round-trip breaks the hash.
    "q88_sink_partitioned" -> ((s, dir) => {
      val stage = Stage.dir("sink88")
      Tables.documents(s, dir).write.mode("overwrite")
        .partitionBy("lang").parquet(s"$stage/docs_by_lang")
      s.read.parquet(s"$stage/docs_by_lang")
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("source"))
    }),
    // ------------------------------------------------------------------
    // Schema evolution: two parquet generations of the same table (v1
    // lacks the `source` column) unioned by a mergeSchema read — the
    // standard long-lived-dataset surface. Legacy rows surface as NULL
    // source; the agg proves column alignment AND the null back-fill.
    // Oracle reconstructs the same split arithmetic on the base table.
    "q184_schema_evolution" -> ((s, dir) => {
      val stage = Stage.dir("evo184")
      val d = Tables.documents(s, dir)
      d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$stage/v1")
      d.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
        .write.mode("overwrite").parquet(s"$stage/v2")
      s.read.option("mergeSchema", "true").parquet(s"$stage/v1", s"$stage/v2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNull, 1).otherwise(0)).as("n_legacy_rows"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // ------------------------------------------------------------------
    // The ORC format surface as a declared round-trip: lineitem staged
    // to ORC (columnar like parquet — splittable, predicate-pushdown-
    // capable), read back, aggregated; oracle runs the same agg on the
    // parquet originals, so type/precision/timestamp loss in the ORC
    // round-trip breaks the hash.
    "q94_orc_roundtrip" -> ((s, dir) => {
      val stage = Stage.dir("orc94")
      Tables.lineitem(s, dir).write.mode("overwrite").orc(s"$stage/lineitem_orc")
      s.read.orc(s"$stage/lineitem_orc")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), 6).as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 6).as("sum_price"),
          min(col("l_shipdate")).as("first_ship"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ------------------------------------------------------------------
    // Write-side MERGE (upsert + delete) — the transactional-table
    // surface q85/q91 only READ: a staged base table and a CDC change
    // batch (op ∈ U/D/I, disjoint keys by mod-10 slice: %10=1 updates
    // acctbal, %10=2 deletes, %10=3 inserts under new keys) are merged
    // by ONE full-outer join on the key — matched+D drops, matched+U
    // takes the change row, unmatched+I inserts, unmatched base rows
    // pass through — then written, read back, and aggregated, so the
    // hash covers the POST-MERGE table content end-to-end. The join is
    // the scale shape (changes ⋈ base shuffles keys once; a small batch
    // broadcasts under AQE); update arithmetic runs in DECIMAL(18,2) so
    // both engines produce bit-identical balances. Oracle recomputes
    // the merge INDEPENDENTLY as (base ∖ changed-keys) ∪ upserts —
    // set algebra, not a join — so a merge bug can't cancel out.
    "q278_merge_upsert" -> ((s, dir) => {
      val stage = Stage.dir("merge278")
      val cust = Tables.customer(s, dir)
      cust.write.mode("overwrite").parquet(s"$stage/base")
      val upd = cust.filter(col("c_custkey") % 10 === 1)
        .withColumn("c_acctbal",
          (col("c_acctbal").cast("decimal(18,2)") + lit(100)).cast("double"))
        .withColumn("op", lit("U"))
      val del = cust.filter(col("c_custkey") % 10 === 2).withColumn("op", lit("D"))
      val ins = cust.filter(col("c_custkey") % 10 === 3)
        .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
        .withColumn("c_name", concat(lit("new|"), col("c_name")))
        .withColumn("op", lit("I"))
      upd.unionByName(del).unionByName(ins)
        .write.mode("overwrite").parquet(s"$stage/changes")
      val base = s.read.parquet(s"$stage/base").alias("b")
      val chg = s.read.parquet(s"$stage/changes").alias("c")
      val dataCols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      base.join(chg, col("b.c_custkey") === col("c.c_custkey"), "full_outer")
        .filter(col("c.op").isNull || col("c.op") =!= "D")
        .select(dataCols.map(x =>
          when(col("c.op").isNotNull, col(s"c.$x")).otherwise(col(s"b.$x")).as(x)): _*)
        .write.mode("overwrite").parquet(s"$stage/merged")
      s.read.parquet(s"$stage/merged")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 6).as("sum_bal"),
          min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"),
          sum(when(col("c_name").startsWith("new|"), 1L).otherwise(0L)).as("n_inserted"))
        .orderBy(col("c_mktsegment"))
    }),

    // ------------------------------------------------------------------
    // Custom DataSource V2 connector end-to-end (sources/GraftSeqSource
    // .scala): the full TableProvider → ScanBuilder → Batch →
    // InputPartition → PartitionReader chain behind
    // spark.read.format("graftseq"), with 8 independent range readers
    // (the multi-executor scan shape) and column pruning pushed into
    // the reader — this query touches only (bucket, tok), so the scan's
    // readSchema drops `id` entirely (asserted in DsV2Spec). The table
    // is deterministic (bucket = md5_mod(id, 97), tok = 't'||id%50), so
    // DuckDB replays it from range() — the oracle certifies the
    // connector serves exactly the declared table, across all slices,
    // no row lost or duplicated at partition boundaries.
    "q286_dsv2_scan" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .select(col("bucket"), col("tok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("n_tok"),
          min(col("tok")).as("min_tok"), max(col("tok")).as("max_tok"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // DSv2 FILTER PUSHDOWN (SupportsPushDownFilters): the id-range
    // predicates reach the connector and narrow partition PLANNING —
    // [50k,150k) is split into 8 slices covering only the kept range,
    // so the pruned half of the table is never planned, let alone read
    // (the partition-pruning shape: at 100 TB, `id >= X` skips
    // files/splits below X instead of scanning-then-filtering). The
    // `tok` predicate is NOT pushable and comes back as a residual
    // Spark evaluates post-scan — both paths in one query. DsV2Spec
    // asserts the mechanics (pushedFilters non-empty, planned
    // partitions shrink to the range); this oracle certifies values.
    "q290_dsv2_pushdown" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .filter(col("id") >= 50000L && col("id") < 150000L && col("tok") =!= "t7")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), countDistinct(col("tok")).as("n_tok"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // DSv2 AGGREGATE pushdown (SupportsPushDownAggregates on graftseq):
    // the global count/min/max/sum over a filter-narrowed id-range is
    // answered COMPLETELY by the source in one closed-form row — no
    // aggregate exec in the plan, one InputPartition, zero data rows
    // generated (DsV2Spec asserts all three). This is the metadata-only
    // query shape: at 100 TB, `SELECT count(*) ... WHERE id >= X` comes
    // from range/footer/manifest metadata, not a scan. The filter
    // pushdown (q290) composes: the range narrows FIRST, then the
    // aggregate collapses over the narrowed range.
    "q305_dsv2_agg_pushdown" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .filter(col("id") >= 50000L && col("id") < 150000L)
        .agg(expr("count(*)").as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), sum(col("id")).as("sum_id"))
    }),

    // ------------------------------------------------------------------
    // DSv2 LIMIT pushdown (SupportsPushDownLimit on graftseq): LIMIT n
    // truncates the planned id-range to [lo, lo+n) AFTER the pushed
    // filter narrows lo — so `filter(id >= X).limit(n)` plans exactly
    // n rows instead of scanning-then-discarding (a 100 TB "peek at
    // the data" query touches n rows, not the table). The sequence
    // source emits ids in range order so the truncated range IS the
    // limit's row set — the aggregate below it is deterministic. The
    // aggregate sits ABOVE the limit, so aggregate pushdown correctly
    // does NOT fire here (DsV2Spec pins planned span == n).
    "q306_dsv2_limit" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .filter(col("id") >= 50000L).limit(1000)
        .groupBy((col("id") % 10).as("m"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy(col("m"))
    }),

    // ------------------------------------------------------------------
    // DSv2 OFFSET pushdown (SupportsPushDownOffset on graftseq) — the
    // pagination shape completing the read-pushdown matrix: OFFSET o
    // advances the planned range head, so `filter.offset(o).limit(n)`
    // plans exactly the n-row page window [lo+o, lo+o+n) — keyset
    // pagination where page k never reads (or even plans) the skipped
    // prefix. Spark pushes LIMIT(o+n) first, then OFFSET(o) (removing
    // its Offset operator — offset pushdown has no partial mode), so
    // the window composes with the pushed `id >= 50000` filter. The
    // aggregate reads `bucket` so the md5 content of the page is
    // hashed, not just its ids; DsV2Spec pins the planned span.
    "q324_dsv2_offset" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .filter(col("id") >= 50000L).offset(20000).limit(1000)
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), sum(col("bucket")).as("sum_bucket"))
    }),

    // ------------------------------------------------------------------
    // DSv2 STREAMING read (MICRO_BATCH_READ on graftseq): the same
    // deterministic id-range consumed as an admission-controlled
    // microbatch stream — rowsPerBatch=25000 ids per trigger via
    // ReadLimit.maxRows, so Trigger.AvailableNow drains 100k rows in
    // exactly 4 batches (the Kafka-shaped source contract — offsets,
    // per-batch partition planning, commit — without a broker; at
    // 100 TB this is the backfill-then-stream path a V2 connector must
    // serve). Rows land in a memory sink and the batch rollup hashes
    // the per-bucket counts + id sums, so the oracle certifies no row
    // was lost or duplicated across batch boundaries; DsV2Spec
    // additionally pins the batch COUNT and kill-and-resume.
    "q325_dsv2_stream" -> ((s, dir) => {
      s.catalog.dropTempView("q325_mem")
      val q = s.readStream.format("graftseq")
        .option("rows", "100000").option("slices", "4")
        .option("rowsPerBatch", "25000").load()
        .writeStream.format("memory").queryName("q325_mem")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table("q325_mem")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          countDistinct(col("id")).as("n_distinct"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // DSv2 TOP-N pushdown (SupportsPushDownTopN on graftseq): ORDER BY
    // id DESC LIMIT n truncates the planned range to its TAIL
    // [hi−n, hi), so the "newest n rows" query PLANS n rows instead of
    // scanning and sorting the table (at 100 TB: the tail file/split,
    // not a table sort). Pushdown is PARTIAL per the interface
    // contract — Spark's TakeOrdered still runs above, but over
    // exactly the n planned rows (DsV2Spec pins the planned span to
    // the tail and the exact row set for both directions).
    "q311_dsv2_topn" -> ((s, dir) => {
      s.read.format("graftseq")
        .option("rows", "200000").option("slices", "8").load()
        .select(col("id"), col("tok"))
        .orderBy(col("id").desc).limit(500)
    }),

    // ------------------------------------------------------------------
    // DSv2 REPORTED STATISTICS (SupportsReportStatistics on graftseq):
    // both sides are graftseq scans, and the join picks its strategy
    // from the stats the CONNECTOR reports — the 1M-row side reports
    // ~32 MB (over the 10 MB auto-broadcast threshold), the 2000-row
    // side ~16 KB, so Catalyst auto-broadcasts the small side with NO
    // broadcast() hint. Without SupportsReportStatistics a V2 scan
    // defaults to "unknown = huge" and can never be auto-broadcast;
    // these stats are how a real connector steers a 100 TB plan away
    // from a shuffle join (DsV2Spec asserts the hint-free
    // BroadcastHashJoin with the SMALL scan on the build side).
    "q312_dsv2_stats_bcast" -> ((s, dir) => {
      val big = s.read.format("graftseq")
        .option("rows", "1000000").option("slices", "8").load()
        .select(col("id"), col("tok"))
      val small = s.read.format("graftseq")
        .option("rows", "2000").option("slices", "4").load()
        .select(col("id").as("sid"))
      big.join(small, col("id") % 2000 === col("sid"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"), min(col("sid")).as("min_sid"),
          max(col("sid")).as("max_sid"))
        .orderBy(col("tok"))
    }),

    // ------------------------------------------------------------------
    // DSv2 RUNTIME FILTERING (SupportsRuntimeV2Filtering on graftseq):
    // the selective dim filter (c_custkey % 7 = 3) triggers Spark's
    // dynamic partition pruning — after the broadcast side executes,
    // the scan receives the observed join keys as `id IN (...)` and
    // re-narrows its planned range to their envelope BEFORE partitions
    // are planned, so the 500k-row fact scan plans only the ≤|customer|
    // ids a dim row can actually match. This is DPP for a V2 source:
    // the mechanism that keeps a 100 TB fact scan from reading slices
    // the dim cannot join (DsV2Spec asserts the executed scan's
    // runtime range collapsed from 500000 to the dim envelope).
    "q313_dsv2_runtime_prune" -> ((s, dir) => {
      val fact = s.read.format("graftseq")
        .option("rows", "500000").option("slices", "16").load()
      val dim = Tables.customer(s, dir)
        .filter(col("c_custkey") % 7 === lit(3)).select(col("c_custkey"))
      fact.join(dim, col("id") === col("c_custkey"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // DSv2 WRITE surface (sources/GraftSinkSource.scala): customer is
    // pushed through the staged-commit sink twice — even keys via
    // OVERWRITE (SupportsTruncate), odd keys via APPEND (manifest
    // merge + schema check) — then read back through the sink's own
    // BATCH_READ and aggregated. The oracle computes the same result
    // straight from parquet, so any loss anywhere in the write path
    // (row encoding, null codec, tab/escape handling via the
    // deliberately tab-embedded `tagged` column, task commit, driver
    // rename, manifest merge) breaks the hash. Two-phase commit:
    // tasks stage under _staging/<queryId>/, driver renames then
    // publishes the manifest LAST — the atomic-publish idiom.
    "q291_dsv2_sink" -> ((s, dir) => {
      val stage = Stage.dir("sink291")
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
        concat_ws("\t", col("c_name"), col("c_mktsegment")).as("tagged"))
      c.filter(col("c_custkey") % 2 === 0)
        .write.format("graftsink").mode("overwrite").option("path", stage).save()
      c.filter(col("c_custkey") % 2 === 1)
        .write.format("graftsink").mode("append").option("path", stage).save()
      s.read.format("graftsink").option("path", stage).load()
        .groupBy(expr("coalesce(seg, 'OTHER')").as("segment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 6).as("sum_bal"),
          min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"),
          sum(length(col("tagged"))).as("sum_tag_len"))
        .orderBy(col("segment"))
    }),

    // ------------------------------------------------------------------
    // V2 sink with a CONNECTOR-REQUESTED write layout — the
    // RequiresDistributionAndOrdering half of the write contract q291's
    // staged commit leaves unexercised: the per-user rollup writes
    // through graftsink with clusterBy=user_id & shards=4, so the SINK
    // declares "hash-cluster by key into exactly 4 sorted files" and
    // SPARK inserts the shuffle+sort (the user never repartitions) —
    // the mechanism that gives a table format key-disjoint,
    // internally-sorted files at any scale (without it, every key is
    // sprayed across all writer tasks' files and read-side pruning is
    // impossible). DsV2Spec asserts the 4 published files are
    // key-disjoint and sorted; the oracle replays the rollup from
    // events so the hash certifies the written+read-back content.
    "q335_dsv2_clustered_sink" -> ((s, dir) => {
      val stage = Stage.dir("sink335")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("value").cast("decimal(18,2)")),
            lit(0).cast("decimal(18,2)")).cast("double").as("sum_val"))
        .write.format("graftsink").mode("overwrite")
        .option("path", stage).option("clusterBy", "user_id").option("shards", "4")
        .save()
      s.read.format("graftsink").option("path", stage).load()
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("n_events"),
          round(sum(col("sum_val").cast("decimal(18,2)")).cast("double"), 2).as("sum_val"))
        .orderBy(col("bucket"))
    }),

    // ------------------------------------------------------------------
    // STORAGE-PARTITIONED JOIN (SPJ) — the final DSv2 read surface:
    // with keyed=true the graftseq scan reports KeyGroupedPartitioning
    // on `grp` (one InputPartition per grp value, each carrying its key
    // via HasPartitionKey), so under spark.sql.sources.v2.bucketing
    // two co-keyed scans JOIN WITHOUT ANY SHUFFLE — the Iceberg/Hive-
    // bucketing mechanism that makes two 100 TB co-bucketed tables
    // joinable with zero exchange (without the interface, BOTH sides
    // pay a full shuffle on every join). Here: self-shaped tables a
    // (sum per id) ⋈ b on (grp, id) — partition keys ⊆ join keys, the
    // SPJ condition — then a per-grp rollup. DsV2Spec asserts the join
    // subtree is exchange-free; the oracle replays from range().
    "q350_dsv2_spj" -> ((s, dir) => {
      // SPJ confs are scoped to THIS query (snapshot/restore around the
      // eager build): requireAllClusterKeysForCoPartition=false relaxes
      // co-partitioning for every later join in the session, so leaking
      // it would make other queries' physical plans depend on whether
      // q350 ran first (ADVICE r9).
      val spjConfs = Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        // partition keys [grp] ⊂ join keys (grp, id): subset-key
        // co-partitioning is gated by this conf (default-on requires
        // ALL cluster keys, which would demand bucketing by id too)
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true")
      val saved = spjConfs.map { case (k, _) => k -> s.conf.getOption(k) }
      spjConfs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        def rd = s.read.format("graftseq")
          .option("rows", "100000").option("slices", "8").option("keyed", "true").load()
        val a = rd.select(col("grp"), col("id"), col("bucket").as("bucket_a"))
        val b = rd.select(col("grp"), col("id"), (col("id") % 50).as("m_b"))
        // merge hint: the reported post-pruning stats are under the
        // broadcast threshold at this fixture size; the hint forces the
        // shuffle-join path SPJ exists to fix (a broadcast would hide it)
        a.join(b.hint("merge"), Seq("grp", "id"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
            sum(col("bucket_a")).as("sum_bucket"), sum(col("m_b")).as("sum_m"))
          .orderBy(col("grp"))
          // materialize WHILE the SPJ confs hold (the exchange-free plan
          // is fixed here); downstream consumers re-read this plan-free
          .localCheckpoint()
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // ------------------------------------------------------------------
    // TIME TRAVEL on the V2 sink — the snapshot-isolation read surface
    // every real table format ships (Iceberg VERSION AS OF / Delta
    // versionAsOf): each graftsink commit publishes an immutable
    // `_manifest.vN` BEFORE updating the latest-pointer, so
    // option("version", N) reads snapshot N exactly as committed even
    // after later overwrites replaced the table. Here: v1 = the
    // mod-3 customer slice, v2 = a full overwrite with +50 balances;
    // both snapshots are read back THROUGH THE PINS and aggregated
    // side-by-side — the audit/repro query shape ("what did the table
    // say before the backfill?"). Oracle replays both versions from
    // the parquet originals; DsV2Spec additionally pins stale reads,
    // loud missing-version failure, and write-through-pin refusal.
    "q351_dsv2_time_travel" -> ((s, dir) => {
      val stage = Stage.dir("tt351")
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"))
      cust.filter(col("c_custkey") % 3 === 0)
        .write.format("graftsink").mode("overwrite").option("path", stage).save()
      cust.withColumn("bal",
          (col("bal").cast("decimal(18,2)") + lit(50)).cast("double"))
        .write.format("graftsink").mode("overwrite").option("path", stage).save()
      def snap(v: Int) = s.read.format("graftsink")
        .option("path", stage).option("version", v.toString).load()
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("bal").cast("decimal(18,2)")).cast("double"), 2).as("sum_bal"))
        .withColumn("version", lit(v))
      snap(1).unionByName(snap(2))
        .select(col("version"), col("c_mktsegment"), col("n"), col("sum_bal"))
        .orderBy(col("version"), col("c_mktsegment"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q351_dsv2_time_travel" ->
      ("WITH base AS (SELECT c_custkey, c_mktsegment, "
        + "CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal FROM customer), "
        + "v1 AS (SELECT 1 AS version, c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
        + "round(CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal "
        + "FROM base WHERE c_custkey % 3 = 0 GROUP BY c_mktsegment), "
        + "v2 AS (SELECT 2 AS version, c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
        + "round(CAST(sum(CAST(CAST(bal AS DECIMAL(18,2)) + 50 AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal "
        + "FROM base GROUP BY c_mktsegment) "
        + "SELECT version, c_mktsegment, n, sum_bal FROM v1 "
        + "UNION ALL SELECT version, c_mktsegment, n, sum_bal FROM v2 "
        + "ORDER BY version, c_mktsegment"),
    "q350_dsv2_spj" ->
      ("WITH t AS (SELECT id, id // 12500 AS grp, "
        + "CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 97 AS bucket, "
        + "id % 50 AS m FROM range(0, 100000) r(id)) "
        + "SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(id) AS BIGINT) AS sum_id, "
        + "CAST(sum(bucket) AS BIGINT) AS sum_bucket, CAST(sum(m) AS BIGINT) AS sum_m "
        + "FROM t GROUP BY grp ORDER BY grp"),
    "q335_dsv2_clustered_sink" ->
      ("WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        + "CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_val "
        + "FROM events GROUP BY user_id) "
        + "SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_users, "
        + "CAST(sum(n_events) AS BIGINT) AS n_events, "
        + "round(CAST(sum(CAST(sum_val AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_val "
        + "FROM per GROUP BY 1 ORDER BY 1"),
    "q94_orc_roundtrip" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, "
        + "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_qty, "
        + "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_price, "
        + "min(l_shipdate) AS first_ship FROM lineitem "
        + "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q88_sink_partitioned" ->
      ("SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
        + "min(doc_id) AS first_doc FROM documents WHERE lang IN ('en', 'de') "
        + "GROUP BY lang, source ORDER BY lang, source"),
    "q184_schema_evolution" ->
      ("SELECT lang, count(*) AS n_docs, "
        + "CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy_rows, "
        + "count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END) AS n_sources, "
        + "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
        + "FROM documents GROUP BY lang ORDER BY lang"),
    "q74_sources" ->
      ("SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders, "
        + "round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS revenue, "
        + "min(o_orderdate) AS first_order FROM orders JOIN customer ON o_custkey = c_custkey "
        + "GROUP BY c_mktsegment, o_orderstatus ORDER BY c_mktsegment, o_orderstatus"),
    "q278_merge_upsert" ->
      ("WITH upserts AS ("
        + "SELECT c_custkey, c_name, c_nationkey, "
        + "CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE) AS c_acctbal, c_mktsegment "
        + "FROM customer WHERE c_custkey % 10 = 1 "
        + "UNION ALL SELECT c_custkey + 1000000, 'new|' || c_name, c_nationkey, c_acctbal, c_mktsegment "
        + "FROM customer WHERE c_custkey % 10 = 3), "
        + "merged AS ("
        + "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer "
        + "WHERE c_custkey % 10 <> 1 AND c_custkey % 10 <> 2 "
        + "UNION ALL SELECT * FROM upserts) "
        + "SELECT c_mktsegment, count(*) AS n_cust, "
        + "round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_bal, "
        + "min(c_custkey) AS min_key, max(c_custkey) AS max_key, "
        + "CAST(sum(CASE WHEN c_name LIKE 'new|%' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted "
        + "FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // q286: DuckDB replays the synthetic table from range() + the
    // portable md5 chain (bit-identical to the connector's Md5Mod).
    "q286_dsv2_scan" ->
      ("WITH t AS (SELECT CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 97 AS bucket, "
        + "'t' || CAST(i % 50 AS VARCHAR) AS tok FROM (SELECT unnest(range(0, 200000)) AS i)) "
        + "SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT tok) AS BIGINT) AS n_tok, "
        + "min(tok) AS min_tok, max(tok) AS max_tok FROM t GROUP BY 1 ORDER BY 1"),
    // q290: the pushed-down range + residual tok filter, replayed from
    // the narrowed range() directly.
    // q306: the limit-truncated range is exactly [50000, 51000).
    "q306_dsv2_limit" ->
      ("SELECT i % 10 AS m, CAST(count(*) AS BIGINT) AS n, min(i) AS min_id, max(i) AS max_id "
        + "FROM (SELECT unnest(range(50000, 51000)) AS i) GROUP BY 1 ORDER BY 1"),
    // q324: the page after skipping 20000 of the filtered range is
    // exactly [70000, 71000); the bucket column replays the portable
    // md5 chain.
    "q324_dsv2_offset" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n, min(i) AS min_id, max(i) AS max_id, "
        + "CAST(sum(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 97) AS BIGINT) AS sum_bucket "
        + "FROM (SELECT unnest(range(70000, 71000)) AS i)"),
    // q325: the streamed union of the 4 microbatches is exactly
    // range(100000); per-bucket counts/sums replay the md5 chain.
    "q325_dsv2_stream" ->
      ("SELECT CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 97 AS bucket, "
        + "CAST(count(*) AS BIGINT) AS n, CAST(sum(i) AS BIGINT) AS sum_id, "
        + "CAST(count(DISTINCT i) AS BIGINT) AS n_distinct "
        + "FROM (SELECT unnest(range(100000)) AS i) GROUP BY 1 ORDER BY 1"),
    // q311: the top-500 under id DESC is exactly the range tail.
    "q311_dsv2_topn" ->
      ("SELECT i AS id, 't' || CAST(i % 50 AS VARCHAR) AS tok "
        + "FROM (SELECT unnest(range(199500, 200000)) AS i)"),
    // q312: replay both synthetic ranges and the stats-broadcast join —
    // values must match whichever join strategy Spark picked (the
    // strategy itself is asserted separately in DsV2Spec).
    "q312_dsv2_stats_bcast" ->
      ("WITH big AS (SELECT i AS id, 't' || CAST(i % 50 AS VARCHAR) AS tok "
        + "FROM (SELECT unnest(range(0, 1000000)) AS i)), "
        + "small AS (SELECT i AS sid FROM (SELECT unnest(range(0, 2000)) AS i)) "
        + "SELECT tok, CAST(count(*) AS BIGINT) AS n, min(sid) AS min_sid, max(sid) AS max_sid "
        + "FROM big JOIN small ON id % 2000 = sid GROUP BY 1 ORDER BY 1"),
    // q313: replay the runtime-pruned join — the envelope narrowing is
    // an optimization, so the values equal the plain join.
    "q313_dsv2_runtime_prune" ->
      ("WITH t AS (SELECT i AS id, CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 97 AS bucket "
        + "FROM (SELECT unnest(range(0, 500000)) AS i)), "
        + "d AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 3) "
        + "SELECT bucket, CAST(count(*) AS BIGINT) AS n, min(id) AS min_id, max(id) AS max_id "
        + "FROM t JOIN d ON id = c_custkey GROUP BY 1 ORDER BY 1"),
    // q305: the pushed aggregate must equal the same aggregate over the
    // materialized range — any error in the closed forms breaks the hash.
    "q305_dsv2_agg_pushdown" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n, min(i) AS min_id, max(i) AS max_id, "
        + "CAST(sum(i) AS BIGINT) AS sum_id FROM (SELECT unnest(range(50000, 150000)) AS i)"),
    "q290_dsv2_pushdown" ->
      ("WITH t AS (SELECT i AS id, CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 97 AS bucket, "
        + "'t' || CAST(i % 50 AS VARCHAR) AS tok FROM (SELECT unnest(range(50000, 150000)) AS i)) "
        + "SELECT bucket, CAST(count(*) AS BIGINT) AS n, min(id) AS min_id, max(id) AS max_id, "
        + "CAST(count(DISTINCT tok) AS BIGINT) AS n_tok FROM t WHERE tok <> 't7' GROUP BY 1 ORDER BY 1"),
    // q291: the sink round-trip must equal the same aggregate straight
    // off parquet; chr(9) rebuilds the tab-embedded tagged column.
    "q291_dsv2_sink" ->
      ("WITH c AS (SELECT c_custkey, c_acctbal, nullif(c_mktsegment, 'BUILDING') AS seg, "
        + "c_name || chr(9) || c_mktsegment AS tagged FROM customer) "
        + "SELECT coalesce(seg, 'OTHER') AS segment, CAST(count(*) AS BIGINT) AS n, "
        + "round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_bal, "
        + "min(c_custkey) AS min_key, max(c_custkey) AS max_key, "
        + "CAST(sum(length(tagged)) AS BIGINT) AS sum_tag_len "
        + "FROM c GROUP BY 1 ORDER BY 1"),
  )
}
