package graft

import graft.catalog.DistributionCatalog
import graft.plans.PlanChecks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-model layer: colocated bucket joins must not shuffle (the
  * LOCAL_PARTITION_JOIN guarantee), reference joins must broadcast
  * (REFERENCE_JOIN) — plan-shape tests in the spirit of the reference's
  * EXPLAIN-diff suite. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val setup: Unit = {
    DistributionCatalog.reset()
    val orders = Tables(spark, TestSpark.sf, "orders")
    val lineitem = Tables(spark, TestSpark.sf, "lineitem")
    val nation = Tables(spark, TestSpark.sf, "nation")
    DistributionCatalog.createDistributedTable(
      spark, orders, "d_orders", "o_orderkey", buckets = 8)
    DistributionCatalog.createDistributedTable(
      spark, lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "d_lineitem", "o_orderkey", buckets = 8,
      colocateWith = Some("d_orders"))
    DistributionCatalog.createReferenceTable(spark, nation, "d_nation")
  }

  test("colocated join on the distribution column plans without shuffle") {
    setup
    assert(DistributionCatalog.colocated("d_orders", "d_lineitem"))
    val joined = DistributionCatalog.table(spark, "d_orders")
      .join(DistributionCatalog.table(spark, "d_lineitem"), "o_orderkey")
      .select(col("o_orderkey"), col("l_quantity"), col("o_totalprice"))
    assert(PlanChecks.countShuffles(joined) === 0,
      "bucket join must not introduce a ShuffleExchange")
    assert(joined.count() > 0)
  }

  test("group-by on the distribution column aggregates without shuffle " +
      "(citus full aggregate pushdown: groupedByDisjointPartitionColumn)") {
    setup
    val agg = DistributionCatalog.table(spark, "d_orders")
      .groupBy(col("o_orderkey"))
      .agg(sum(col("o_totalprice")).as("t"), count(lit(1)).as("n"))
    assert(PlanChecks.countShuffles(agg) === 0,
      "bucketed-by-group-key aggregate must run one-phase, no Exchange")
    assert(agg.count() > 0)
  }

  test("non-distribution-key join does shuffle (dual partition join)") {
    setup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = DistributionCatalog.table(spark, "d_orders")
        .join(DistributionCatalog.table(spark, "d_lineitem")
            .withColumnRenamed("o_orderkey", "lk"),
          col("o_custkey") === col("lk"))
      assert(PlanChecks.countShuffles(j) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("reference table join is a broadcast hash join, no shuffle of the fact") {
    setup
    val j = DistributionCatalog.table(spark, "d_orders")
      .join(DistributionCatalog.table(spark, "d_nation"),
        col("o_custkey") % 25 === col("n_nationkey"))
    assert(PlanChecks.hasBroadcastHashJoin(j))
  }

  test("colocation bookkeeping mirrors pg_dist_partition") {
    setup
    val rows = DistributionCatalog.listTables(spark)
      .orderBy("logicalrelid").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("d_lineitem", "d_nation", "d_orders"))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("d_orders").getString(1) === "h")
    assert(byName("d_nation").getString(1) === "n")
    assert(byName("d_orders").getInt(4) === byName("d_lineitem").getInt(4))
  }

  test("refusing colocation with mismatched bucket counts") {
    setup
    val ex = intercept[IllegalArgumentException] {
      DistributionCatalog.createDistributedTable(
        spark, Tables(spark, TestSpark.sf, "customer"),
        "d_customer_bad", "c_custkey", buckets = 4,
        colocateWith = Some("d_orders"))
    }
    assert(ex.getMessage.contains("cannot colocate"))
  }

  test("filter pushdown reaches the parquet scan") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    val pushed = PlanChecks.pushedFilters(li)
    assert(pushed.exists(_.contains("l_quantity")),
      s"expected l_quantity in PushedFilters, got: $pushed")
  }

  test("citus_shards-style size view: per-bucket bytes and rows") {
    setup
    val sizes = DistributionCatalog.shardSizes(spark, "d_orders").collect()
    assert(sizes.length === 8)
    val totalRows = sizes.map(_.getLong(3)).sum
    assert(totalRows === Tables(spark, TestSpark.sf, "orders").count())
    // hash distribution actually spread the data: no empty bucket, and
    // every bucket has a real file behind it
    assert(sizes.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0))
  }

  test("dist-column equality prunes to one bucket (shard pruning)") {
    setup
    // the router-planner read path (multi_hash_pruning.sql): an
    // equality filter on the distribution column must touch ONE shard —
    // Spark's bucket pruning is the same behavior on bucketed layout
    // autoBucketedScan only weighs shuffle savings, not pruning — turn
    // it off so the scan keeps its bucket identity (a router layer
    // would pin this for dist-col point reads)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val one = spark.table("d_orders").filter(col("o_orderkey") === 1L)
      val planStr = one.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan, plan:\n$planStr")
      assert(one.count() <= 1)
    } finally spark.conf.unset(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("materialized view stores the result; refresh recomputes it") {
    setup
    spark.sql("DROP TABLE IF EXISTS mv_source")
    Tables(spark, TestSpark.sf, "orders").limit(100)
      .write.mode("overwrite").saveAsTable("mv_source")
    DistributionCatalog.createMaterializedView(spark, "mv_daily",
      s => s.table("mv_source").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")))
    val before = spark.table("mv_daily").agg(sum(col("n"))).collect()(0).getLong(0)
    assert(before === 100)
    // source changes; the matview is stale until refreshed
    Tables(spark, TestSpark.sf, "orders").limit(150)
      .write.mode("overwrite").saveAsTable("mv_source")
    assert(spark.table("mv_daily").agg(sum(col("n")))
      .collect()(0).getLong(0) === 100)
    DistributionCatalog.refreshMaterializedView(spark, "mv_daily")
    assert(spark.table("mv_daily").agg(sum(col("n")))
      .collect()(0).getLong(0) === 150)
    // distributed matview: result lands bucketed + cataloged
    DistributionCatalog.createMaterializedView(spark, "mv_dist",
      s => s.table("mv_source").select(col("o_orderkey"), col("o_custkey")),
      distColumn = Some("o_orderkey"), buckets = 4)
    val spec = DistributionCatalog.spec("mv_dist").get
    assert(spec.bucketCount === 4 && spec.distColumn.contains("o_orderkey"))
    assert(spark.table("mv_dist").count() === 150)
  }

  test("alter_distributed_table rewrites distribution; undistribute drops it") {
    setup
    val cust = Tables(spark, TestSpark.sf, "customer")
    DistributionCatalog.createDistributedTable(
      spark, cust, "d_alter_cust", "c_custkey", buckets = 4)
    val n = spark.table("d_alter_cust").count()

    // re-distribute on a different column with a different bucket count
    val spec = DistributionCatalog.alterDistributedTable(
      spark, "d_alter_cust", distColumn = Some("c_nationkey"),
      buckets = Some(8))
    assert(spec.distColumn.contains("c_nationkey") && spec.bucketCount === 8)
    assert(spark.table("d_alter_cust").count() === n, "data survives rewrite")
    // now colocatable with the 8-bucket fact tables on the same key type
    DistributionCatalog.createDistributedTable(spark,
      Tables(spark, TestSpark.sf, "orders")
        .withColumn("c_nationkey", col("o_custkey") % 25),
      "d_alter_ord", "c_nationkey", buckets = 8,
      colocateWith = Some("d_alter_cust"))
    assert(DistributionCatalog.colocated("d_alter_cust", "d_alter_ord"))

    // undistribute: rows intact, catalog entry gone
    DistributionCatalog.undistributeTable(spark, "d_alter_cust")
    assert(DistributionCatalog.spec("d_alter_cust").isEmpty)
    assert(spark.table("d_alter_cust").count() === n)
  }

  test("isolate_tenant_to_new_shard: hot key gets its own files; " +
      "whole-table reads still see every row") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createDistributedTable(
      spark, orders, "d_iso_orders", "o_custkey", buckets = 8)
    val total = orders.count()
    val hotKey = orders.groupBy("o_custkey").count()
      .orderBy(col("count").desc).first().getLong(0)
    val hotRows = orders.filter(col("o_custkey") === hotKey).count()

    DistributionCatalog.isolateTenant(spark, "d_iso_orders", hotKey)

    // routed single-tenant read hits only the dedicated table
    val routed = DistributionCatalog.tenantShard(spark, "d_iso_orders", hotKey)
    assert(routed.count() === hotRows)
    assert(routed.inputFiles.forall(_.contains("__tenant_")),
      "isolated tenant must read only its own files")
    // base table no longer holds the tenant; the union view sees all rows
    assert(spark.table("d_iso_orders")
      .filter(col("o_custkey") === hotKey).count() === 0)
    assert(DistributionCatalog.table(spark, "d_iso_orders").count() === total)
    // a non-isolated tenant routes to the pruned base table
    val otherKey = hotKey + 1
    val expected = orders.filter(col("o_custkey") === otherKey).count()
    assert(DistributionCatalog.tenantShard(spark, "d_iso_orders", otherKey)
      .count() === expected)
    // layout rewrite re-absorbs the isolated tenant: no rows lost
    DistributionCatalog.undistributeTable(spark, "d_iso_orders")
    assert(spark.table("d_iso_orders").count() === total,
      "undistribute must fold isolated tenant rows back in")
    assert(spark.table("d_iso_orders")
      .filter(col("o_custkey") === hotKey).count() === hotRows)
  }

  test("window partitioned by the distribution column runs without " +
      "shuffle on the bucketed layout (SafeToPushdownWindowFunction)") {
    setup
    // citus pushes a window to the shards only when PARTITION BY
    // includes the distribution column (query_pushdown_planning.c:
    // 428-472); Spark's equivalent: the bucketed scan already provides
    // the required hash distribution, so EnsureRequirements inserts
    // NO exchange
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(col("o_orderdate"))
      val df = spark.table("d_orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          sum(col("o_totalprice")).over(w).as("run_total"))
      assert(PlanChecks.countShuffles(df) === 0,
        "dist-column window must not shuffle a bucketed table")
      assert(df.count() > 0)
      // a window on a NON-distribution column still shuffles
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      val df2 = spark.table("d_orders")
        .select(col("o_custkey"), row_number().over(w2).as("rn"))
      assert(PlanChecks.countShuffles(df2) > 0)
    } finally spark.conf.unset(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("range-distributed table: interval pruning reads only overlapping " +
      "shard directories (DISTRIBUTE_BY_RANGE + PruneShards)") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createRangeDistributedTable(spark, orders,
      "d_range_orders", "o_custkey", splitPoints = Seq(40, 80, 120))
    // pg_dist_shard view: 4 shards with observed bounds
    val shards = DistributionCatalog.rangeShards(spark, "d_range_orders")
      .orderBy("shardid").collect()
    assert(shards.length === 4)
    assert(shards.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3))
    // no rows lost in the layout
    assert(spark.table("d_range_orders").count() === orders.count())
    // an interval read prunes: [0, 300] overlaps only shard 0
    val pruned = DistributionCatalog.rangeScan(spark, "d_range_orders",
      lo = Some(0), hi = Some(30))
    assert(pruned.inputFiles.forall(_.contains("__shard=0")),
      "scan must touch only the overlapping shard's directory")
    val expected = orders
      .filter(col("o_custkey") >= 0 && col("o_custkey") <= 30).count()
    assert(pruned.count() === expected)
    // the pruning shows up as a partition filter in the physical plan
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("__shard"), "expected __shard partition pruning")
  }

  test("append-distributed table: each batch is a new shard; pruning " +
      "uses per-shard min/max (DISTRIBUTE_BY_APPEND)") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    val b1 = orders.filter(col("o_custkey") < 50)
    val b2 = orders.filter(col("o_custkey") >= 50 && col("o_custkey") < 100)
    val b3 = orders.filter(col("o_custkey") >= 100)
    DistributionCatalog.createAppendTable(spark, b1, "d_append_orders",
      "o_custkey")
    DistributionCatalog.appendShard(spark, "d_append_orders", b2)
    DistributionCatalog.appendShard(spark, "d_append_orders", b3)
    val shards = DistributionCatalog.rangeShards(spark, "d_append_orders")
    assert(shards.count() === 3)
    assert(spark.table("d_append_orders").count() === orders.count())
    // a read over [600, 900] overlaps only batch 2's shard
    val pruned = DistributionCatalog.rangeScan(spark, "d_append_orders",
      lo = Some(60), hi = Some(90))
    assert(pruned.inputFiles.forall(_.contains("__shard=1")),
      "only the middle batch's shard overlaps [60,90]")
    val expected = orders
      .filter(col("o_custkey") >= 60 && col("o_custkey") <= 90).count()
    assert(pruned.count() === expected)
    // catalog lists both new tables with their partmethod chars
    val methods = DistributionCatalog.listTables(spark)
      .filter(col("logicalrelid").isin("d_range_orders", "d_append_orders"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(methods("d_range_orders") === "r")
    assert(methods("d_append_orders") === "a")
  }

  test("split shard: only the split shard rewrites; new shards get " +
      "fresh ids; pruning still exact (citus_split_shard_by_split_points)") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createRangeDistributedTable(spark, orders,
      "d_split_orders", "o_custkey", splitPoints = Seq(75))
    // remember the un-split shard's files: they must survive untouched
    val keepFiles = spark.table("d_split_orders")
      .filter(col("__shard") === 0).inputFiles.toSet
    // split shard 1 ([75, max]) at 110 -> new shards 2 ([75,110)) and
    // 3 ([110, max]); shard 1 retires
    DistributionCatalog.splitShard(spark, "d_split_orders", 1, Seq(110))
    val shards = DistributionCatalog.rangeShards(spark, "d_split_orders")
      .collect().map(_.getInt(1)).toSet
    assert(shards === Set(0, 2, 3), s"got $shards")
    assert(spark.table("d_split_orders").count() === orders.count(),
      "no rows lost in the split")
    assert(spark.table("d_split_orders")
      .filter(col("__shard") === 0).inputFiles.toSet === keepFiles,
      "the un-split shard's files must be untouched")
    // interval pruning over the new layout: [80,100] hits only shard 2
    val pruned = DistributionCatalog.rangeScan(spark, "d_split_orders",
      lo = Some(80), hi = Some(100))
    assert(pruned.inputFiles.forall(_.contains("__shard=2")))
    assert(pruned.count() === orders
      .filter(col("o_custkey") >= 80 && col("o_custkey") <= 100).count())
  }

  test("tenant read stats accumulate per (table, tenant) and drive " +
      "isolation decisions (citus_stat_tenants)") {
    setup
    DistributionCatalog.resetTenantStats()
    DistributionCatalog.tenantShard(spark, "d_orders", 7L).count()
    DistributionCatalog.tenantShard(spark, "d_orders", 7L).count()
    DistributionCatalog.tenantShard(spark, "d_orders", 9L).count()
    val stats = DistributionCatalog.statTenants(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(stats.head === (("d_orders", "7", 2L)), s"got ${stats.toSeq}")
    assert(stats.contains(("d_orders", "9", 1L)))
    DistributionCatalog.resetTenantStats()
    assert(DistributionCatalog.statTenants(spark).count() === 0)
  }

  test("analyze records row-count statistics for the planner " +
      "(citus_update_table_statistics)") {
    setup
    val n = DistributionCatalog.analyzeTable(spark, "d_orders")
    assert(n === spark.table("d_orders").count())
    // with CBO on, the recorded row count reaches the planner's stats
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try assert(spark.table("d_orders").queryExecution.optimizedPlan
      .stats.rowCount.contains(BigInt(n)))
    finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("rebalancer: by_disk_size plan balances bytes within one shard " +
      "of even; idempotent after apply (get_rebalance_table_shards_plan)") {
    import graft.catalog.Rebalancer
    // pathological placement: everything on node 0
    val sizes = Map(0 -> 100L, 1 -> 80L, 2 -> 60L, 3 -> 40L, 4 -> 20L,
      5 -> 10L)
    val current = sizes.keys.map(_ -> 0).toMap
    val moves = Rebalancer.plan(sizes, current, nodeCount = 3)
    assert(moves.nonEmpty)
    val after = moves.foldLeft(current)((p, m) => p.updated(m.shard, m.toNode))
    val loads = after.groupBy(_._2).view
      .mapValues(_.keys.map(sizes).sum).toMap
    val spread = loads.values.max - loads.values.min
    assert(spread <= sizes.values.max,
      s"spread $spread must be bounded by the largest shard")
    // planning the balanced placement again proposes nothing
    assert(Rebalancer.plan(sizes, after, 3).isEmpty)
    // determinism: same inputs, same plan
    assert(Rebalancer.plan(sizes, current, 3) === moves)
  }

  test("rebalancer: by_shard_count equalizes shard counts") {
    import graft.catalog.Rebalancer
    val sizes = (0 until 8).map(_ -> 1L).toMap
    val current = (0 until 8).map(_ -> 0).toMap // all on node 0
    val moves = Rebalancer.plan(sizes, current, 2, "by_shard_count")
    val after = moves.foldLeft(current)((p, m) => p.updated(m.shard, m.toNode))
    val counts = after.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts === Map(0 -> 4, 1 -> 4))
  }

  test("rebalancer: catalog round trip — citus_rebalance_start updates " +
      "pg_dist_placement") {
    import graft.catalog.Rebalancer
    setup
    val moves = Rebalancer.rebalance(spark, "d_orders", nodeCount = 3)
    // post-state is balanced: a second plan is empty
    assert(Rebalancer.planForTable(spark, "d_orders", 3).isEmpty)
    val placed = DistributionCatalog.shardPlacements(spark, "d_orders", 3)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(placed.size === 8)
    moves.foreach(m => assert(placed(m.shard) === m.toNode))
    // the plan view renders like get_rebalance_table_shards_plan
    val df = Rebalancer.planDF(spark, "d_orders", moves)
    assert(df.columns.toSeq === Seq("table_name", "shardid", "shard_size",
      "source_node", "target_node"))
  }

  test("columnar options rewrite the physical layout: codec + row-group " +
      "budget reach the parquet footer (alter_columnar_table_set)") {
    import scala.jdk.CollectionConverters._
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createDistributedTable(spark, orders,
      "d_col_orders", "o_orderkey", buckets = 2)
    DistributionCatalog.setColumnarOptions(spark, "d_col_orders",
      compression = Some("snappy"), stripeBytes = Some(16 * 1024L))
    assert(spark.table("d_col_orders").count() === orders.count())
    // inspect one data file's footer
    val f = spark.table("d_col_orders").inputFiles.head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f),
        spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val codecs = blocks.flatMap(_.getColumns.asScala)
        .map(_.getCodec.toString).toSet
      assert(codecs === Set("SNAPPY"), s"got $codecs")
      assert(blocks.size > 1,
        s"16KB stripe budget should yield multiple row groups, " +
          s"got ${blocks.size}")
      // chunk skipping's input exists: per-column min/max statistics
      assert(blocks.head.getColumns.asScala.head.getStatistics != null)
    } finally reader.close()
    // distribution survived the rewrite (bucketed join still shuffle-free)
    assert(DistributionCatalog.spec("d_col_orders").get.bucketCount === 2)
  }

  test("citus_tables view: type, distribution column, physical size, " +
      "shard count") {
    setup
    val rows = DistributionCatalog.citusTables(spark).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("d_orders").getString(1) === "distributed")
    assert(rows("d_orders").getString(2) === "o_orderkey")
    assert(rows("d_orders").getLong(4) > 0, "size from the filesystem")
    assert(rows("d_orders").getInt(5) === 8)
    assert(rows("d_nation").getString(1) === "reference")
    assert(DistributionCatalog.totalRelationSize(spark, "d_orders") ===
      rows("d_orders").getLong(4))
  }

  test("update colocation is metadata-only: join a group, then break " +
      "away (update_distributed_table_colocation)") {
    setup
    val cust = Tables(spark, TestSpark.sf, "customer")
    DistributionCatalog.createDistributedTable(spark, cust,
      "d_coloc_cust", "c_custkey", buckets = 8)
    assert(!DistributionCatalog.colocated("d_coloc_cust", "d_orders"))
    val filesBefore = spark.table("d_coloc_cust").inputFiles.toSet
    DistributionCatalog.updateDistributedTableColocation(spark,
      "d_coloc_cust", Some("d_orders"))
    assert(DistributionCatalog.colocated("d_coloc_cust", "d_orders"))
    assert(spark.table("d_coloc_cust").inputFiles.toSet === filesBefore,
      "no data may move")
    DistributionCatalog.updateDistributedTableColocation(spark,
      "d_coloc_cust", None)
    assert(!DistributionCatalog.colocated("d_coloc_cust", "d_orders"))
    // mismatched bucket counts refuse, like citus
    DistributionCatalog.createDistributedTable(spark, cust,
      "d_coloc_cust4", "c_custkey", buckets = 4)
    intercept[IllegalArgumentException] {
      DistributionCatalog.updateDistributedTableColocation(spark,
        "d_coloc_cust4", Some("d_orders"))
    }
  }

  test("explicit single placement move (citus_move_shard_placement)") {
    import graft.catalog.Rebalancer
    setup
    Rebalancer.moveShardPlacement(spark, "d_orders", shard = 5,
      toNode = 2, nodeCount = 3)
    val placed = DistributionCatalog.shardPlacements(spark, "d_orders", 3)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(placed(5) === 2)
    intercept[IllegalArgumentException] {
      Rebalancer.moveShardPlacement(spark, "d_orders", 99, 0, 3)
    }
  }

  test("rebalancer properties over 300 seeded random instances: " +
      "terminates, spread <= largest shard, idempotent, deterministic") {
    import graft.catalog.Rebalancer
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { i =>
      val nShards = 1 + rnd.nextInt(40)
      val nodes = 1 + rnd.nextInt(8)
      val sizes = (0 until nShards)
        .map(s => s -> (rnd.nextInt(1000000).toLong)).toMap
      val current = (0 until nShards)
        .map(s => s -> rnd.nextInt(nodes)).toMap
      val moves = Rebalancer.plan(sizes, current, nodes)
      val after = moves.foldLeft(current)((p, m) =>
        p.updated(m.shard, m.toNode))
      val loads = (0 until nodes).map(n =>
        after.collect { case (s, nn) if nn == n => sizes(s) }.sum)
      val spread = loads.max - loads.min
      assert(spread <= (sizes.values.maxOption.getOrElse(0L)),
        s"case $i: spread $spread > largest shard; sizes=$sizes " +
          s"current=$current moves=$moves")
      assert(Rebalancer.plan(sizes, after, nodes).isEmpty,
        s"case $i: plan must be idempotent after apply")
      assert(Rebalancer.plan(sizes, current, nodes) === moves,
        s"case $i: plan must be deterministic")
      assert(moves.map(_.shard).distinct.size === moves.size ||
        moves.size <= nShards * nodes, s"case $i: runaway move list")
    }
  }

  test("chunk skipping: row-group min/max prunes a selective range " +
      "scan on sorted data (ColumnChunkSkipNode ≙ parquet stats)") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    // sorted layout + small row groups = many skippable chunks
    orders.sort("o_orderkey").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (32 * 1024).toString)
      .saveAsTable("d_skip_orders")
    val total = orders.count()
    val narrow = spark.table("d_skip_orders")
      .filter(col("o_orderkey") >= 100 && col("o_orderkey") <= 200)
    val report = PlanChecks.explainAnalyze(narrow).collect()
    val scanRows = report
      .filter(_.getString(1).contains("FileSourceScan"))
      .map(_.getLong(2)).sum
    // the scan must emit far fewer rows than the table holds: the
    // filter is applied at the reader level against row-group stats
    assert(scanRows < total / 2,
      s"expected chunk skipping, scan emitted $scanRows of $total")
    assert(narrow.count() > 0)
  }

  test("drain node empties its placements onto the least-loaded rest " +
      "(citus_drain_node)") {
    import graft.catalog.Rebalancer
    setup
    Rebalancer.rebalance(spark, "d_orders", nodeCount = 3)
    val drains = Rebalancer.drainNode(spark, "d_orders", 0, nodeCount = 3)
    assert(drains.nonEmpty && drains.forall(_.fromNode === 0))
    val placed = DistributionCatalog.shardPlacements(spark, "d_orders", 3)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(placed.size === 8, "every shard still placed")
    assert(!placed.values.exists(_ == 0), "node 0 must end empty")
  }

  test("columnar rewrite of a range-distributed table keeps the __shard " +
      "layout and a fresh shard map") {
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createRangeDistributedTable(spark, orders,
      "d_col_range", "o_custkey", splitPoints = Seq(40, 80, 120))
    DistributionCatalog.setColumnarOptions(spark, "d_col_range",
      compression = Some("snappy"))
    assert(spark.table("d_col_range").count() === orders.count())
    // physical layout survived: interval reads still prune by directory
    val pruned = DistributionCatalog.rangeScan(spark, "d_col_range",
      lo = Some(0), hi = Some(30))
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains("__shard=0")),
      "rangeScan must still prune to the overlapping shard directory")
    assert(pruned.count() === orders
      .filter(col("o_custkey") >= 0 && col("o_custkey") <= 30).count())
    // user-facing reads still hide the shard column
    assert(!DistributionCatalog.table(spark, "d_col_range")
      .columns.contains("__shard"))
  }

  test("placements reconcile against the live shard set after " +
      "alter_distributed_table; drainNode survives stale placement ids " +
      "and refuses nodeCount=1") {
    import graft.catalog.Rebalancer
    setup
    val orders = Tables(spark, TestSpark.sf, "orders")
    DistributionCatalog.createDistributedTable(spark, orders,
      "d_stale_orders", "o_orderkey", buckets = 8)
    // store a placement over the 8-shard layout
    Rebalancer.rebalance(spark, "d_stale_orders", nodeCount = 3)
    // shrink to 4 shards: stored placements for shards 4..7 are stale
    DistributionCatalog.alterDistributedTable(spark, "d_stale_orders",
      buckets = Some(4))
    val placed = DistributionCatalog.shardPlacements(
      spark, "d_stale_orders", 3).collect()
      .map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(placed.keySet === Set(0, 1, 2, 3),
      s"stale shards 4..7 must drop: $placed")
    // drainNode plans over the reconciled set instead of throwing
    val drains = Rebalancer.drainNode(spark, "d_stale_orders", 0,
      nodeCount = 3)
    val after = DistributionCatalog.shardPlacements(
      spark, "d_stale_orders", 3).collect().map(_.getInt(2))
    assert(!after.contains(0), "node 0 must end empty")
    assert(drains.forall(_.fromNode == 0))
    intercept[IllegalArgumentException] {
      Rebalancer.drainNode(spark, "d_stale_orders", 0, nodeCount = 1)
    }
  }
}
