package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — the storage-side half of shuffle elimination.
  *
  * A join between two tables bucketed on their join keys with the SAME
  * bucket count is co-located: each scan reports
  * `HashPartitioning(bucketCol, n)` and Catalyst drops both exchanges, so
  * the join moves ZERO bytes over the network regardless of table size.
  * This is the layout discipline a 100 TB silver store lives by: fact
  * tables bucketed on their natural join key (orders/lineitem on the
  * order key, entity tables on the account key) pay the partitioning
  * cost ONCE at write time and every downstream merge/join reuses it —
  * the at-rest analogue of the reference's Postgres indexes
  * (donations/models.py's FK indexes), but eliminating data movement
  * rather than page reads.
  *
  * Mechanics: rows are repartitioned to the bucket spec BEFORE the write
  * (Spark's bucket hash is the same Murmur3 the exchange uses), so each
  * task holds exactly one bucket and each bucket lands in ONE file —
  * which also lets the scan expose the within-bucket sort order and skip
  * the sort in front of a sort-merge join. Tables are EXTERNAL (explicit
  * path): the files are the durable artifact; the catalog entry is
  * session-local metadata.
  */
object BucketedLayout {

  /** Write `df` as an external bucketed+sorted parquet table at `path`,
    * registered as `table` in the session catalog (replacing any prior
    * registration). One file per bucket. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keyCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // The name is interpolated into SQL below — refuse anything but a
    // plain identifier rather than trusting callers forever.
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed: table name '$table' is not a plain identifier")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(keyCol))
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Register (or refresh) an EXTERNAL bucketed parquet table over an
    * existing directory laid out by [[writeBucketed]] /
    * MergeWriter.mergeBucketed — the read-side half of the layout: a
    * fresh session holds no catalog state, so readers re-declare the
    * bucket metadata over the durable files (metadata-only DDL; the
    * files are untouched). Scans of the registered table then report
    * `HashPartitioning(keyCol, buckets)` and joins on the key drop their
    * exchanges. */
  def registerExternal(spark: SparkSession, table: String, path: String,
      schema: org.apache.spark.sql.types.StructType, keyCol: String,
      buckets: Int): Unit = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"registerExternal: table name '$table' is not a plain identifier")
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"registerExternal: key column '$keyCol' is not a plain identifier")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table (${schema.toDDL}) USING PARQUET " +
      s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS " +
      s"LOCATION '$path'")
  }

  /** [[registerExternal]] for a PARTITIONED bucketed table: the schema's
    * `partitionCol` moves into the PARTITIONED BY clause and the on-disk
    * partition directories are recovered into the catalog, so the scan
    * gets BOTH partition pruning and the bucket HashPartitioning.
    * Re-run after out-of-band partition mutations (the merge writer
    * swaps partition dirs directly). */
  def registerExternalPartitioned(spark: SparkSession, table: String,
      path: String, schema: org.apache.spark.sql.types.StructType,
      partitionCol: String, keyCol: String, buckets: Int): Unit = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"registerExternalPartitioned: table name '$table' is not a plain identifier")
    require(keyCol.matches("[A-Za-z0-9_]+") &&
      partitionCol.matches("[A-Za-z0-9_]+"),
      s"registerExternalPartitioned: '$keyCol'/'$partitionCol' must be plain identifiers")
    // Partition column last, per datasource-table convention.
    val dataDdl = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == partitionCol)).toDDL
    val pType = schema.fields.find(_.name == partitionCol)
      .map(_.dataType.sql).getOrElse("STRING")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table ($dataDdl, $partitionCol $pType) " +
      s"USING PARQUET PARTITIONED BY ($partitionCol) " +
      s"CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $buckets BUCKETS " +
      s"LOCATION '$path'")
    spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS"): Unit
  }

  /** Whether the files at `path` carry bucket ids in their names
    * (`part-…_00003.…parquet`) — i.e. were written through a bucketed
    * writer. Registering bucket metadata over NON-bucketed files would
    * make every read fail ("invalid bucket file"), so readers probe this
    * before declaring the layout (a flat bootstrap table reads as plain
    * parquet until its first bucketed merge rewrites it). */
  def looksBucketed(path: String): Boolean = {
    // Through the TableIO seam (not java.io.File): the probe must answer
    // the same on every deployment the store runs on — a local-FS-only
    // probe would return false over s3a/HDFS and silently downgrade every
    // bucketed read to a plain (exchange-paying) parquet scan.
    val parts = MergeWriter.io.fileSizes(path).map(_._1)
      .filter(_.startsWith("part-"))
    parts.nonEmpty && parts.forall(_.matches("part-.*_\\d{5}\\..*"))
  }

  /** Equi-join of two registered bucketed tables on their bucket keys.
    * With matching bucket counts this plans WITHOUT an exchange on
    * either side (asserted by PlanAudit/spec — the property this whole
    * file exists for). Merge-hinted: both sides are fact-scale by
    * contract (that is why they were bucketed), so the plan must be the
    * one a 100 TB run gets — at toy scale the optimizer would otherwise
    * broadcast the smaller fact and the audit would be measuring a plan
    * that cannot exist in production. */
  def cooperativeJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
