package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

import scala.collection.concurrent.TrieMap

/** The engine's data-model API — the Spark-native analogue of the
  * reference's distributed-table catalog:
  *
  *   - `pg_dist_partition` (logicalrelid, partmethod, partkey,
  *     colocationid, repmodel — citus
  *     `src/include/distributed/pg_dist_partition.h:22-59`) becomes
  *     [[DistributionSpec]] rows in this catalog;
  *   - `create_distributed_table(rel, dist_col, shard_count,
  *     colocate_with)` (`commands/create_distributed_table.c:201`)
  *     becomes [[createDistributedTable]]: a bucketed Parquet table —
  *     bucket ≙ shard, bucket count ≙ `citus.shard_count` (default 32,
  *     `shared_library_init.c:2518`);
  *   - colocation groups (`colocation_utils.c:598`) become "same bucket
  *     count + same key type": Spark's EnsureRequirements then plans
  *     joins between colocated tables WITHOUT a shuffle exchange — the
  *     LOCAL_PARTITION_JOIN rule (`multi_join_order.h:35`) for free;
  *   - `create_reference_table` becomes a broadcast-hinted table: every
  *     join against it is a BroadcastHashJoin on every "shard" — the
  *     REFERENCE_JOIN rule (`multi_join_order.h:33`).
  *
  * At 100 TB: bucketed layout means the recurring fact-to-fact joins
  * (orders ⋈ lineitem on orderkey) never re-shuffle — the dominant cost
  * of repartition joins disappears for every colocated query, exactly
  * the reason citus colocates shards. Bucket counts should be sized so
  * a bucket's largest table slice fits an executor's memory
  * (e.g. 100 TB / 32768 buckets ≈ 3 GB).
  */
object DistributionCatalog {

  sealed trait PartMethod
  case object Hash extends PartMethod      // DISTRIBUTE_BY_HASH 'h'
  case object Reference extends PartMethod // DISTRIBUTE_BY_NONE 'n'
  case object RangeDist extends PartMethod // DISTRIBUTE_BY_RANGE 'r'
  case object AppendDist extends PartMethod // DISTRIBUTE_BY_APPEND 'a'

  final case class DistributionSpec(
      table: String,
      method: PartMethod,
      distColumn: Option[String],
      bucketCount: Int,
      colocationId: Int)

  private val specs = TrieMap.empty[String, DistributionSpec]
  private val nextColocation = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Default bucket count ≙ citus.shard_count default of 32. */
  val DefaultBuckets = 32

  /** Write `df` as a hash-distributed (bucketed, sorted) Parquet table.
    * `colocateWith` joins an existing colocation group (bucket counts
    * must match — same rule citus enforces); otherwise a new group is
    * created. */
  def createDistributedTable(spark: SparkSession, df: DataFrame,
      name: String, distColumn: String,
      buckets: Int = DefaultBuckets,
      colocateWith: Option[String] = None): DistributionSpec = {
    val coloc = colocateWith match {
      case Some(other) =>
        val o = specs.getOrElse(other,
          throw new IllegalArgumentException(s"no such table: $other"))
        require(o.bucketCount == buckets,
          s"cannot colocate: $other has ${o.bucketCount} buckets, want $buckets")
        o.colocationId
      case None => nextColocation.getAndIncrement()
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, distColumn)
      .sortBy(distColumn)
      .option("path", warehousePath(spark, name))
      // zstd ≙ the reference columnar store's default compression
      // (columnar/README.md:93-101)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(name)
    val spec = DistributionSpec(name, Hash, Some(distColumn), buckets, coloc)
    specs.put(name, spec)
    spec
  }

  /** Reference table: stored once, broadcast to every join site. */
  def createReferenceTable(spark: SparkSession, df: DataFrame,
      name: String): DistributionSpec = {
    df.write.mode("overwrite")
      .option("path", warehousePath(spark, name))
      .format("parquet").saveAsTable(name)
    val spec = DistributionSpec(name, Reference, None, 1, 0)
    specs.put(name, spec)
    spec
  }

  /** Read a catalog table; reference tables come back broadcast-hinted
    * so every join applies the REFERENCE_JOIN strategy. A table with
    * isolated tenants ([[isolateTenant]]) reads as base ∪ tenant parts,
    * so whole-table analytics see every row. */
  def table(spark: SparkSession, name: String): DataFrame = {
    val base = spark.table(name)
    val df = isolatedTenants.get(name) match {
      case Some(parts) =>
        parts.values.foldLeft(base)((acc, t) => acc.unionByName(spark.table(t)))
      case None => base
    }
    specs.get(name) match {
      case Some(s) if s.method == Reference => broadcast(df)
      // the shard id is physical layout, not user schema
      case Some(s) if s.method == RangeDist || s.method == AppendDist =>
        df.drop("__shard")
      case _ => df
    }
  }

  /** True when two tables are in the same colocation group — a join on
    * their distribution columns needs no exchange. */
  def colocated(a: String, b: String): Boolean =
    (specs.get(a), specs.get(b)) match {
      case (Some(x), Some(y)) =>
        x.method == Hash && y.method == Hash && x.colocationId == y.colocationId
      case _ => false
    }

  def spec(name: String): Option[DistributionSpec] = specs.get(name)

  /** The `pg_dist_partition` view of this catalog. */
  def listTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    specs.values.toSeq
      .map(s => (s.table,
        s.method match { case Hash => "h"; case Reference => "n"
          case RangeDist => "r"; case AppendDist => "a" },
        s.distColumn.getOrElse(""), s.bucketCount, s.colocationId))
      .toDF("logicalrelid", "partmethod", "partkey", "bucketcount",
        "colocationid")
  }

  /** The `citus_tables` user-facing view (`sql/udfs/citus_tables/` —
    * table, citus_table_type, distribution column, colocation id,
    * table size, shard count): [[listTables]] enriched with physical
    * size ≙ `citus_total_relation_size`. Sizes come from the file
    * system, not a scan. */
  def citusTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    specs.values.toSeq.sortBy(_.table).map { s =>
      val kind = s.method match {
        case Hash => "distributed"
        case Reference => "reference"
        case RangeDist => "range-distributed"
        case AppendDist => "append-distributed"
      }
      val bytes = totalRelationSize(spark, s.table)
      (s.table, kind, s.distColumn.getOrElse(""), s.colocationId,
        bytes, s.bucketCount)
    }.toDF("table_name", "citus_table_type", "distribution_column",
      "colocation_id", "table_size", "shard_count")
  }

  /** `citus_total_relation_size(rel)`: physical bytes of a cataloged
    * table (all shards + isolated tenant parts). */
  def totalRelationSize(spark: SparkSession, name: String): Long = {
    def dirBytes(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty).map(f =>
        if (f.isDirectory) dirBytes(f)
        else if (f.getName.startsWith("_")) 0L else f.length()).sum
    val tenantBytes = isolatedTenants.getOrElse(name, Map.empty).values
      .map(t => dirBytes(new java.io.File(warehousePath(spark, t)))).sum
    dirBytes(new java.io.File(warehousePath(spark, name))) + tenantBytes
  }

  /** `update_distributed_table_colocation(rel, colocate_with)`
    * (`sql/udfs/update_distributed_table_colocation/` — metadata-only
    * colocation change; citus requires identical distribution column
    * type + shard count): join another table's colocation group, or
    * pass None to break away into a fresh group. No data moves —
    * with matching bucket counts the physical layout is already
    * compatible, which is exactly the citus precondition. */
  def updateDistributedTableColocation(spark: SparkSession, name: String,
      colocateWith: Option[String]): DistributionSpec = {
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == Hash, s"$name is not hash-distributed")
    val newId = colocateWith match {
      case Some(other) =>
        val o = specs.getOrElse(other,
          throw new IllegalArgumentException(s"no such table: $other"))
        require(o.method == Hash && o.bucketCount == s.bucketCount,
          s"cannot colocate: $other has ${o.bucketCount} buckets, " +
            s"$name has ${s.bucketCount}")
        o.colocationId
      case None => nextColocation.getAndIncrement()
    }
    val spec = s.copy(colocationId = newId)
    specs.put(name, spec)
    spec
  }

  /** Time-partitioned table (the reference's `create_time_partitions`
    * UDF family, `sql/udfs/create_time_partitions/` — range-partition
    * management) ≙ date-partitioned Parquet directories: partition
    * pruning on the truncated column replaces shard-interval pruning. */
  def createTimePartitionedTable(spark: SparkSession, df: DataFrame,
      name: String, tsColumn: String, granularity: String): DistributionSpec = {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val partCol = s"__${granularity}_part"
    df.withColumn(partCol,
        date_trunc(granularity, col(tsColumn)).cast("date"))
      .write.mode("overwrite")
      .partitionBy(partCol)
      .option("path", warehousePath(spark, name))
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(name)
    val spec = DistributionSpec(name, Hash, Some(partCol), 0, 0)
    specs.put(name, spec)
    spec
  }

  /** The `time_partitions` view (`sql/udfs/time_partitions/` —
    * partition name, from/to range, access method): one row per
    * partition of a time-partitioned table with its value, row count
    * and bytes. Row counts come from one grouped metadata-cheap scan
    * over the partition column only. */
  def timePartitions(spark: SparkSession, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a cataloged table: $name"))
    val partCol = s.distColumn.filter(_.startsWith("__")).getOrElse(
      throw new IllegalArgumentException(s"$name is not time-partitioned"))
    val counts = spark.table(name).groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"))
    val bytes = Option(new java.io.File(warehousePath(spark, name))
        .listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(d => d.getName.split("=", 2)(1) ->
        Option(d.listFiles()).getOrElse(Array.empty)
          .filterNot(_.getName.startsWith("_")).map(_.length()).sum)
      .toMap
    import spark.implicits._
    counts.collect()
      .map(r => (name, r.get(0).toString, r.getLong(1),
        bytes.getOrElse(r.get(0).toString, 0L)))
      .sortBy(_._2).toSeq
      .toDF("table_name", "partition_value", "n_rows", "size_bytes")
  }

  /** `get_missing_time_partition_ranges(table, interval, to, from)`:
    * the month starts in [from, to] that have NO partition yet — the
    * planning input `create_time_partitions` consumes. */
  def getMissingTimePartitionRanges(spark: SparkSession, name: String,
      from: java.sql.Date, to: java.sql.Date): Seq[String] = {
    val existing = timePartitions(spark, name)
      .collect().map(_.getString(1)).toSet
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    cal.setTime(from)
    cal.set(java.util.Calendar.DAY_OF_MONTH, 1)
    val out = Seq.newBuilder[String]
    while (!cal.getTime.after(to)) {
      val v = f"${cal.get(java.util.Calendar.YEAR)}%04d-" +
        f"${cal.get(java.util.Calendar.MONTH) + 1}%02d-01"
      if (!existing.contains(v)) out += v
      cal.add(java.util.Calendar.MONTH, 1)
    }
    out.result()
  }

  /** `alter_old_partitions_set_access_method(table, older_than,
    * 'columnar')` (`sql/udfs/alter_old_partitions_set_access_method/`
    * — the citus time-series pattern: recent partitions stay row/fast
    * storage, old partitions compress to columnar): rewrite ONLY the
    * partitions older than the cutoff under the given codec (dynamic
    * partition overwrite — untouched partitions keep their files).
    * Cost ∝ the old partitions being compressed, never the table. */
  def compressOldTimePartitions(spark: SparkSession, name: String,
      olderThan: java.sql.Date, codec: String = "zstd"): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a cataloged table: $name"))
    val partCol = s.distColumn.filter(_.startsWith("__")).getOrElse(
      throw new IllegalArgumentException(s"$name is not time-partitioned"))
    val old = spark.table(name).select(col(partCol)).distinct()
      .filter(col(partCol) < olderThan)
      .collect().map(_.get(0).toString).sorted.toSeq
    if (old.nonEmpty) {
      val prev = spark.conf.getOption(
        "spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        val rows = spark.table(name)
          .filter(col(partCol) < olderThan)
          .localCheckpoint(eager = true)
        // path write (not insertInto): the parquet writer honors the
        // codec option, and dynamic overwrite touches only the
        // partitions present in `rows`
        rows.write.mode("overwrite").partitionBy(partCol)
          .option("compression", codec)
          .parquet(warehousePath(spark, name))
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset(
          "spark.sql.sources.partitionOverwriteMode")
      }
      spark.catalog.refreshTable(name)
    }
    old
  }

  /** `drop_old_time_partitions(table, older_than)` (`sql/udfs/
    * drop_old_time_partitions/` — retention maintenance for
    * time-partitioned tables): drop every partition strictly older
    * than the cutoff, files included. Partition pruning makes the
    * enumeration free; the drop is a metadata + file operation, no
    * data rewrite — the same reason the citus UDF is cheap. Returns
    * the dropped partition values. */
  def dropOldTimePartitions(spark: SparkSession, name: String,
      olderThan: java.sql.Date): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a cataloged table: $name"))
    val partCol = s.distColumn.getOrElse(
      throw new IllegalArgumentException(s"$name has no partition column"))
    require(partCol.startsWith("__"),
      s"$name is not time-partitioned (partition column $partCol)")
    val old = spark.table(name).select(col(partCol)).distinct()
      .filter(col(partCol) < olderThan)
      .collect().map(_.get(0).toString).sorted.toSeq
    old.foreach { v =>
      spark.sql(s"ALTER TABLE $name DROP PARTITION ($partCol='$v')")
      val dir = new java.io.File(warehousePath(spark, name),
        s"$partCol=$v")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    spark.catalog.refreshTable(name)
    old
  }

  /** The FIXTURES.md layout in one call — the exact distribution the
    * reference's regression schema declares (multi_create_table.sql:
    * lineitem+orders hash-distributed on the order key and COLOCATED;
    * customer/part/nation/region/supplier reference tables). */
  def setupTpchLayout(spark: SparkSession, loadTable: String => DataFrame,
      buckets: Int = DefaultBuckets): Unit = {
    createDistributedTable(spark, loadTable("lineitem"), "g_lineitem",
      "l_orderkey", buckets)
    createDistributedTable(spark, loadTable("orders"),
      "g_orders", "o_orderkey", buckets, colocateWith = Some("g_lineitem"))
    Seq("customer", "part", "nation", "region", "supplier").foreach(n =>
      createReferenceTable(spark, loadTable(n), s"g_$n"))
  }

  /** `alter_distributed_table(rel, distribution_column, shard_count,
    * colocate_with)` (`commands/alter_table.c:219` — recreates the table
    * with the new distribution and moves the data): rewrite the bucketed
    * layout with a new distribution column and/or bucket count. Data is
    * re-read from the existing table and re-bucketed in one shuffle-write
    * stage — the Spark analogue of citus's shard-move data copy. */
  def alterDistributedTable(spark: SparkSession, name: String,
      distColumn: Option[String] = None, buckets: Option[Int] = None,
      colocateWith: Option[String] = None): DistributionSpec = {
    val old = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(old.method == Hash, s"$name is not hash-distributed")
    val newCol = distColumn.orElse(old.distColumn).get
    val newBuckets = buckets.getOrElse(old.bucketCount)
    // materialize the FULL table (incl. isolated tenant parts) before
    // the overwrite drops the old files; the rewrite re-absorbs
    // isolated tenants into the new layout
    val data = table(spark, name).localCheckpoint(eager = true)
    dropTenantParts(spark, name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    specs.remove(name)
    createDistributedTable(spark, data, name, newCol, newBuckets,
      colocateWith)
  }

  /** `undistribute_table(rel)` (`commands/alter_table.c:180`): convert a
    * distributed table back to a plain (non-bucketed) local table and
    * drop it from the distribution catalog. */
  def undistributeTable(spark: SparkSession, name: String): Unit = {
    require(specs.contains(name), s"not a distributed table: $name")
    // full view: isolated tenant parts fold back into the plain table
    val data = table(spark, name).localCheckpoint(eager = true)
    dropTenantParts(spark, name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    specs.remove(name)
    data.write.mode("overwrite")
      .option("path", warehousePath(spark, name))
      .option("compression", "zstd")
      .format("parquet").saveAsTable(name)
  }

  /** Drop a table's isolated-tenant side tables + bookkeeping (used by
    * the layout rewrites, which re-absorb those rows). */
  private def dropTenantParts(spark: SparkSession, name: String): Unit = {
    isolatedTenants.remove(name).foreach(_.values.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")))
  }

  /** The `citus_shards` size view (`sql/udfs/citus_shards/` — shard
    * name, size, placement): per-bucket bytes and row counts of a
    * hash-distributed table. Bucket file sizes come from the
    * filesystem (shard ≙ bucket files `*_NNNNN.*`), row counts from
    * one grouped scan. The skew this surfaces is the decision input
    * for [[alterDistributedTable]] (re-bucket) or a salted join —
    * the rebalancer's diagnosis step. */
  def shardSizes(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == Hash && s.bucketCount > 0,
      s"$name is not hash-bucketed")
    val bucketRe = "_(\\d{5})[_.]".r
    val bytes = Option(new java.io.File(warehousePath(spark, name))
        .listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_"))
      .flatMap(f => bucketRe.findFirstMatchIn(f.getName)
        .map(m => m.group(1).toInt -> f.length()))
      .groupBy(_._1).map { case (b, fs) => b -> fs.map(_._2).sum }
    // bucket id comes from the file name (file-splits ≠ buckets: tiny
    // files pack many-per-partition, so spark_partition_id won't do)
    import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
    val rows = spark.table(name)
      .groupBy(regexp_extract(input_file_name(), "_(\\d{5})[_.]", 1)
        .cast("int").as("bucket"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val base = (0 until s.bucketCount).map { b =>
      (name, b, bytes.getOrElse(b, 0L), rows.getOrElse(b, 0L))
    }
    // isolated tenants show as their own "shards" (shard = -1), the way
    // citus_shards lists an isolated tenant's dedicated shard
    val tenantRows = isolatedTenants.getOrElse(name, Map.empty).values
      .toSeq.sorted.map { t =>
        val sz = Option(new java.io.File(warehousePath(spark, t))
            .listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && !f.getName.startsWith("_"))
          .map(_.length()).sum
        (t, -1, sz, spark.table(t).count())
      }
    (base ++ tenantRows)
      .toDF("table_name", "shard", "size_bytes", "n_rows")
  }

  private val isolatedTenants =
    TrieMap.empty[String, Map[String, String]] // base -> value -> table

  /** `isolate_tenant_to_new_shard(table, tenant_id, 'CASCADE')`
    * (`operations/isolate_shards.c:48-57` — split the shard holding a
    * hot tenant so that tenant gets a shard of its own): the hot key's
    * rows move to a dedicated single-bucket table and the remainder is
    * re-bucketed in place. [[table]] transparently unions the parts, so
    * whole-table analytics are unchanged; [[tenantShard]] routes a
    * single-tenant query straight to the dedicated files — the
    * isolated tenant's scan cost becomes proportional to ITS data, not
    * its former bucket's, which is the entire point of the citus UDF.
    * At 100 TB this is the skew remedy for the multi-tenant case where
    * one tenant is 1000× the median: [[shardSizes]] diagnoses,
    * isolateTenant cures.
    * READ CONTRACT after isolation: whole-table reads must go through
    * [[table]] (a raw `spark.table(name)` sees only the remainder);
    * [[shardSizes]] lists tenant parts as their own shards; the layout
    * rewrites (alter/undistribute) re-absorb them. */
  def isolateTenant(spark: SparkSession, name: String,
      tenantValue: Any): DistributionSpec = {
    import org.apache.spark.sql.functions.{col, lit}
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == Hash && s.bucketCount > 0,
      s"$name is not hash-bucketed (tenant isolation needs a bucketed " +
        "layout; time-partitioned and reference tables have none)")
    val distCol = s.distColumn.get
    val tenantTable =
      s"${name}__tenant_${tenantValue.toString.replaceAll("\\W", "_")}"
    val data = spark.table(name).localCheckpoint(eager = true)
    val hot = data.filter(col(distCol) === lit(tenantValue))
    val rest = data.filter(col(distCol) =!= lit(tenantValue) ||
      col(distCol).isNull)
    hot.write.mode("overwrite")
      .bucketBy(1, distCol).sortBy(distCol)
      .option("path", warehousePath(spark, tenantTable))
      .option("compression", "zstd")
      .format("parquet").saveAsTable(tenantTable)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    specs.remove(name)
    val rebuilt = createDistributedTable(spark, rest, name, distCol,
      s.bucketCount)
    // the physical bucketing is unchanged, so the table KEEPS its
    // colocation group (citus's CASCADE isolation does the same for
    // all colocated tables at once)
    val spec = rebuilt.copy(colocationId = s.colocationId)
    specs.put(name, spec)
    isolatedTenants.updateWith(name) {
      case Some(m) => Some(m + (tenantValue.toString -> tenantTable))
      case None => Some(Map(tenantValue.toString -> tenantTable))
    }
    spec
  }

  private val tenantReads = TrieMap.empty[(String, String), Long]

  /** The `citus_stat_tenants` view (`src/backend/distributed/utils/
    * citus_stat_tenants.c` — per-tenant query counts for spotting hot
    * tenants): routed single-tenant reads are counted per (table,
    * tenant); the hot tenants this surfaces are [[isolateTenant]]'s
    * input, closing the diagnose→cure loop the citus feature exists
    * for. */
  def statTenants(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tenantReads.toSeq
      .map { case ((tbl, tv), n) => (tbl, tv, n) }
      .sortBy { case (tbl, tv, n) => (-n, tbl, tv) }
      .toDF("table_name", "tenant", "read_count")
  }

  /** `citus_stat_tenants_reset()`. */
  def resetTenantStats(): Unit = tenantReads.clear()

  /** Route a single-tenant read: the dedicated table if the tenant is
    * isolated (scan = just its files), else the base table with a
    * distribution-column point filter (scan = one pruned bucket — the
    * router path the reference plans for non-isolated tenants). */
  def tenantShard(spark: SparkSession, name: String,
      tenantValue: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    tenantReads.updateWith((name, tenantValue.toString)) {
      case Some(n) => Some(n + 1); case None => Some(1L)
    }
    isolatedTenants.get(name).flatMap(_.get(tenantValue.toString)) match {
      case Some(t) => spark.table(t)
      case None =>
        val s = specs.getOrElse(name,
          throw new IllegalArgumentException(s"not a distributed table: $name"))
        require(s.method == Hash && s.distColumn.nonEmpty,
          s"$name has no distribution column to route on")
        spark.table(name).filter(col(s.distColumn.get) === lit(tenantValue))
    }
  }

  private val matviews =
    TrieMap.empty[String, SparkSession => DataFrame]

  /** Materialized view over distributed tables (`sql/materialized_view
    * .sql`, `columnar_matview.sql` — the reference supports matviews on
    * coordinator over distributed reads): the defining query runs once
    * and lands as a stored table; readers scan the materialization, not
    * the plan. Distribute the result by passing `distColumn` (≙ a
    * matview you then create_distributed_table on, a pattern the
    * reference's tests exercise). */
  def createMaterializedView(spark: SparkSession, name: String,
      definition: SparkSession => DataFrame,
      distColumn: Option[String] = None,
      buckets: Int = DefaultBuckets): Unit = {
    matviews.put(name, definition)
    materialize(spark, name, definition, distColumn, buckets)
  }

  /** `REFRESH MATERIALIZED VIEW` — recompute the stored result from the
    * current state of its inputs. */
  def refreshMaterializedView(spark: SparkSession, name: String): Unit = {
    val defn = matviews.getOrElse(name,
      throw new IllegalArgumentException(s"no such materialized view: $name"))
    val spec = specs.get(name)
    materialize(spark, name, defn,
      spec.filter(_.method == Hash).flatMap(_.distColumn),
      spec.map(_.bucketCount).filter(_ > 0).getOrElse(DefaultBuckets))
  }

  private def materialize(spark: SparkSession, name: String,
      definition: SparkSession => DataFrame, distColumn: Option[String],
      buckets: Int): Unit = {
    // evaluate BEFORE dropping the old materialization (the definition
    // may read it, and refresh must not see its own target mid-write)
    val data = definition(spark).localCheckpoint(eager = true)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    specs.remove(name)
    distColumn match {
      case Some(c) => createDistributedTable(spark, data, name, c, buckets)
      case None =>
        data.write.mode("overwrite")
          .option("path", warehousePath(spark, name))
          .option("compression", "zstd")
          .format("parquet").saveAsTable(name)
    }
  }

  // ---- shard placements (pg_dist_placement) ---------------------------

  private val placementMap = TrieMap.empty[String, Map[Int, Int]]

  /** Current shard→node placement ≙ `pg_dist_placement`. Never-placed
    * tables get citus's create-time default: round-robin across the
    * node set. */
  def placements(table: String, nodeCount: Int,
      shards: Set[Int]): Map[Int, Int] =
    placementMap.get(table) match {
      // Reconcile against the live shard set: splitShard /
      // alterDistributedTable can change it under a stored placement,
      // so drop entries for shards that no longer exist and give new
      // shards the default round-robin home.
      case Some(p) => shards.map(s => s -> p.getOrElse(s, s % nodeCount)).toMap
      case None => shards.map(s => s -> (s % nodeCount)).toMap
    }

  private[catalog] def setPlacements(table: String,
      p: Map[Int, Int]): Unit = placementMap.put(table, p)

  /** The `pg_dist_placement` view (shardid, nodeid) for one table. */
  def shardPlacements(spark: SparkSession, table: String,
      nodeCount: Int): DataFrame = {
    import spark.implicits._
    val s = specs.getOrElse(table,
      throw new IllegalArgumentException(s"not a distributed table: $table"))
    placements(table, nodeCount, (0 until s.bucketCount).toSet)
      .toSeq.sorted.map { case (sh, n) => (table, sh, n) }
      .toDF("logicalrelid", "shardid", "nodeid")
  }

  // ---- range / append distribution (DISTRIBUTE_BY_RANGE 'r',
  // DISTRIBUTE_BY_APPEND 'a') -------------------------------------------

  /** One shard's interval ≙ a `pg_dist_shard` row (shardid,
    * shardminvalue, shardmaxvalue —
    * `src/include/distributed/pg_dist_shard.h:22-33`). min/max are the
    * ACTUAL observed bounds of the shard's rows, the way citus records
    * them for append tables and uses them for pruning. */
  final case class ShardInterval(shard: Int, min: Any, max: Any)

  private val shardIntervals = TrieMap.empty[String, Seq[ShardInterval]]

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    // numbers compare across widths (stored bounds are often Long while
    // the caller passes Int literals)
    case (x: Number, y: Number) =>
      BigDecimal(x.toString).compare(BigDecimal(y.toString))
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** Range-distributed table (`DISTRIBUTE_BY_RANGE 'r'`,
    * `pg_dist_partition.h:56`): rows land in the shard whose interval
    * covers their distribution-column value. Split points define N+1
    * shards; shard i takes `splitPoints(i-1) <= v < splitPoints(i)`.
    * Physically a `__shard`-partitioned Parquet directory tree — the
    * directory IS the shard, so [[rangeScan]]'s interval pruning turns
    * into Spark partition pruning (only overlapping directories are
    * listed/read; at 100 TB an interval query touches only its shards'
    * files, exactly citus's `PruneShards` on `shardminvalue/maxvalue`).
    * Shard assignment is a branch-free sum of comparisons — codegen'd,
    * no UDF, one write-stage shuffle. */
  def createRangeDistributedTable(spark: SparkSession, df: DataFrame,
      name: String, distColumn: String,
      splitPoints: Seq[Any]): DistributionSpec = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    require(splitPoints.nonEmpty, "need at least one split point")
    val shardExpr = splitPoints
      .map(p => when(col(distColumn) >= lit(p), 1).otherwise(0))
      .reduce(_ + _)
    writeShardPartitioned(spark, name,
      df.withColumn("__shard", coalesce(shardExpr, lit(0))))
    recordIntervals(spark, name, distColumn, replace = true)
    val spec = DistributionSpec(name, RangeDist, Some(distColumn),
      splitPoints.size + 1, 0)
    specs.put(name, spec)
    spec
  }

  /** Append-distributed table (`DISTRIBUTE_BY_APPEND 'a'`,
    * `pg_dist_partition.h:54`; loader
    * `worker/worker_data_fetch_protocol.c:76`): every ingested batch
    * becomes a brand-new shard with recorded min/max — the legacy
    * citus bulk-append model (`master_create_empty_shard` +
    * `worker_append_table_to_shard`). Batches may overlap in key
    * space; pruning still works off each shard's observed bounds. */
  def createAppendTable(spark: SparkSession, firstBatch: DataFrame,
      name: String, distColumn: String): DistributionSpec = {
    import org.apache.spark.sql.functions.lit
    writeShardPartitioned(spark, name,
      firstBatch.withColumn("__shard", lit(0)))
    recordIntervals(spark, name, distColumn, replace = true)
    val spec = DistributionSpec(name, AppendDist, Some(distColumn), 1, 0)
    specs.put(name, spec)
    spec
  }

  /** Append one more batch as a new shard (shard id = previous max + 1). */
  def appendShard(spark: SparkSession, name: String,
      batch: DataFrame): DistributionSpec = {
    import org.apache.spark.sql.functions.lit
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == AppendDist, s"$name is not append-distributed")
    val next = shardIntervals(name).map(_.shard).max + 1
    // append into the existing table (location/partitioning come from
    // the catalog entry; specifying path again on append is rejected)
    batch.withColumn("__shard", lit(next))
      .write.mode("append").partitionBy("__shard")
      .option("compression", "zstd")
      .format("parquet").saveAsTable(name)
    spark.catalog.refreshTable(name)
    recordIntervals(spark, name, s.distColumn.get, replace = true)
    val spec = s.copy(bucketCount = next + 1)
    specs.put(name, spec)
    spec
  }

  /** The `pg_dist_shard` view: one row per shard with its interval. */
  def rangeShards(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    shardIntervals.getOrElse(name,
        throw new IllegalArgumentException(s"no shard intervals for $name"))
      .map(i => (name, i.shard, String.valueOf(i.min), String.valueOf(i.max)))
      .toDF("logicalrelid", "shardid", "shardminvalue", "shardmaxvalue")
  }

  /** Interval-pruned read: shards whose [min,max] overlaps [lo,hi] are
    * scanned, the rest are never listed (`PruneShards`,
    * `planner/shard_pruning.c:1-67` → Spark partition pruning on
    * `__shard`), with the exact range kept as a residual predicate.
    * Pass `lo`/`hi` = None for a half-open interval. */
  def rangeScan(spark: SparkSession, name: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == RangeDist || s.method == AppendDist,
      s"$name is not range/append-distributed")
    val keep = shardIntervals(name).filter(i =>
        lo.forall(l => cmp(i.max, l) >= 0) &&
        hi.forall(h => cmp(i.min, h) <= 0))
      .map(_.shard)
    val dc = col(s.distColumn.get)
    val residual = (lo.map(l => dc >= lit(l)) ++ hi.map(h => dc <= lit(h)))
      .reduceOption(_ && _).getOrElse(lit(true))
    spark.table(name)
      .filter(col("__shard").isin(keep: _*))
      .filter(residual)
      .drop("__shard")
  }

  /** `citus_split_shard_by_split_points(shard, points, ...)`
    * (`operations/shard_split.c` — split one shard at given points;
    * the new shards get FRESH ids and the old shard is retired): only
    * the target shard's rows are rewritten — the sub-shards land as
    * new partition directories and the old directory is dropped, the
    * other shards' files are untouched. That locality is the point of
    * the citus UDF (split a hot/oversized shard without touching the
    * rest of the table) and it holds here at any scale: cost is
    * proportional to the SPLIT shard, not the table. */
  def splitShard(spark: SparkSession, name: String, shard: Int,
      points: Seq[Any]): DistributionSpec = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a distributed table: $name"))
    require(s.method == RangeDist || s.method == AppendDist,
      s"$name is not range/append-distributed")
    require(points.nonEmpty, "need at least one split point")
    val ivs = shardIntervals(name)
    require(ivs.exists(_.shard == shard), s"no such shard: $shard")
    val distCol = s.distColumn.get
    val base = ivs.map(_.shard).max + 1
    val subExpr = points
      .map(p => when(col(distCol) >= lit(p), 1).otherwise(0))
      .reduce(_ + _) + base
    // rewrite ONLY the split shard's rows under their new shard ids
    // (materialized first: the write appends to the table being read)
    spark.table(name).filter(col("__shard") === shard).drop("__shard")
      .localCheckpoint(eager = true)
      .withColumn("__shard", subExpr)
      .write.mode("append").partitionBy("__shard")
      .option("compression", "zstd")
      .format("parquet").saveAsTable(name)
    // retire the old shard: drop its partition (files included)
    spark.sql(s"ALTER TABLE $name DROP PARTITION (__shard=$shard)")
    val dir = new java.io.File(warehousePath(spark, name),
      s"__shard=$shard")
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    spark.catalog.refreshTable(name)
    recordIntervals(spark, name, distCol, replace = true)
    val spec = s.copy(bucketCount = shardIntervals(name).size)
    specs.put(name, spec)
    spec
  }

  private def writeShardPartitioned(spark: SparkSession, name: String,
      df: DataFrame): Unit = {
    df.write.mode("overwrite").partitionBy("__shard")
      .option("path", warehousePath(spark, name))
      .option("compression", "zstd")
      .format("parquet").saveAsTable(name)
  }

  /** Record per-shard observed min/max (one small grouped scan — N
    * shards rows to the driver, never data rows). */
  private def recordIntervals(spark: SparkSession, name: String,
      distColumn: String, replace: Boolean): Unit = {
    import org.apache.spark.sql.functions.{col, max, min}
    val ivs = spark.table(name)
      .groupBy(col("__shard")).agg(min(distColumn), max(distColumn))
      .collect()
      .map(r => ShardInterval(
        r.get(0).toString.toInt, r.get(1), r.get(2)))
      .sortBy(_.shard).toSeq
    shardIntervals.put(name, ivs)
  }

  /** `alter_columnar_table_set(rel, chunk_group_row_limit,
    * stripe_row_limit, compression, compression_level)`
    * (`src/backend/columnar/README.md:100-114`; columnar.h:75-81):
    * the reference's columnar knobs map 1:1 onto Parquet's physical
    * layout — stripe ≙ row group (`parquet.block.size`, a bytes
    * budget), chunk group ≙ page (`parquet.page.row.count.limit`,
    * a row budget), compression ≙ the Parquet codec
    * (none|snappy|zstd|lz4 — zstd is both defaults). The table
    * rewrites once under the new layout, preserving its distribution
    * (bucketed stays bucketed). Chunk skipping ≙ row-group/page
    * min-max statistics, which Parquet writes unconditionally. */
  def setColumnarOptions(spark: SparkSession, name: String,
      compression: Option[String] = None,
      stripeBytes: Option[Long] = None,
      chunkRows: Option[Int] = None): Unit = {
    val s = specs.getOrElse(name,
      throw new IllegalArgumentException(s"not a cataloged table: $name"))
    val sharded = s.method == RangeDist || s.method == AppendDist
    // Range/append layouts live in the __shard partition column, which
    // table() strips as non-user schema — read the raw catalog table so
    // the rewrite keeps it and the shard map stays valid.
    val raw = if (sharded) spark.table(name)
              else table(spark, name)
    val data = raw.localCheckpoint(eager = true)
    dropTenantParts(spark, name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var w = data.write.mode("overwrite")
      .option("path", warehousePath(spark, name))
      .option("compression", compression.getOrElse("zstd"))
      .format("parquet")
    stripeBytes.foreach(b => w = w.option("parquet.block.size", b.toString))
    chunkRows.foreach(r =>
      w = w.option("parquet.page.row.count.limit", r.toString))
    s match {
      case DistributionSpec(_, Hash, Some(dc), b, _) if b > 0 =>
        w.bucketBy(b, dc).sortBy(dc).saveAsTable(name)
      case _ if sharded => w.partitionBy("__shard").saveAsTable(name)
      case _ => w.saveAsTable(name)
    }
    specs.put(name, s)
    if (sharded) s.distColumn.foreach(dc =>
      recordIntervals(spark, name, dc, replace = true))
  }

  /** `citus_update_table_statistics(rel)` (`sql/udfs/
    * citus_update_table_statistics/` — refresh shard size/stat
    * metadata) ≙ ANALYZE: compute table + column stats so the
    * cost-based planner (broadcast decisions, join reorder under
    * `spark.sql.cbo.enabled`) sees real row counts instead of file
    * sizes. Returns the recorded row count. */
  def analyzeTable(spark: SparkSession, name: String): Long = {
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
    spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      .stats.flatMap(_.rowCount).map(_.toLong)
      .getOrElse(spark.table(name).count())
  }

  def reset(): Unit =
    { specs.clear(); matviews.clear(); isolatedTenants.clear()
      shardIntervals.clear(); placementMap.clear(); tenantReads.clear() }

  private def warehousePath(spark: SparkSession, name: String): String =
    new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      name).getAbsolutePath
}
