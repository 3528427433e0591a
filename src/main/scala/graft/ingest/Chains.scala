package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Amounts

/** The `chains` dimension (reference chains/models.py:5-48): one row per
  * blockchain, keyed by unique name, with the EVM CHECK constraint —
  * `evm_compat = true ⟺ evm_chain_id IS NOT NULL` — enforced at ingest
  * (the reference enforces it as a DB CheckConstraint, so a violating row
  * must fail the load, not slip through).
  *
  * The reference seeds rows out-of-band (admin/migrations); the engine
  * consumes a JSON dump the same way the other lookup dimensions load
  * (SnapshotBackfill.tokenMetadata), and SilverStore.applyBatch seeds
  * [[defaultRows]] (the NEAR row every deployment needs —
  * accounts/models.py:141-143 defaults account chains to NEAR when unset)
  * the first time a silver store materializes.
  */
object Chains {

  private val payload = EntityTransforms.ddl(
    """name STRING, rpc_url STRING, explorer_url STRING,
      |evm_compat BOOLEAN, evm_chain_id INT""".stripMargin)

  /** Parse a chains dump into dimension rows: slug derived from name
    * (AutoSlugField parity), CHECK constraint validated fail-loud. Reads
    * through [[SnapshotBackfill.readSnapshot]] so both dump shapes parse —
    * JSONL and pretty-printed array (a line-mode-only read would turn an
    * array dump into all-null corrupt records and silently load nothing). */
  def fromJson(spark: SparkSession, path: String): DataFrame =
    validated(SnapshotBackfill.readSnapshot(spark, path, payload, "name"))

  /** Apply the evm CHECK and derive name_slug. Public so tests and other
    * loaders share the one validation. */
  def validated(rows: DataFrame): DataFrame = {
    val out = rows.select(
      col("name"),
      Amounts.slugify(col("name")).as("name_slug"),
      col("rpc_url"),
      col("explorer_url"),
      coalesce(col("evm_compat"), lit(false)).as("evm_compat"),
      col("evm_chain_id").cast("int").as("evm_chain_id"))
    val bad = out.filter(
      (col("evm_compat") && col("evm_chain_id").isNull) ||
        (!col("evm_compat") && col("evm_chain_id").isNotNull))
      .select("name").limit(5).collect().map(_.getString(0))
    require(bad.isEmpty,
      s"chains CHECK violation (evm_compat ⟺ evm_chain_id): ${bad.mkString(", ")}")
    out
  }

  /** The NEAR row the reference's account default depends on
    * (accounts/models.py:141-143). */
  def defaultRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    validated(Seq(
      ("NEAR", "https://rpc.mainnet.near.org", "https://nearblocks.io",
        false, null.asInstanceOf[java.lang.Integer]))
      .toDF("name", "rpc_url", "explorer_url", "evm_compat", "evm_chain_id"))
  }

  /** Merge chain rows into silver (keyed by unique name). Chains are a
    * tiny dimension; the LWW merge makes reloads idempotent. Each load
    * stamps a strictly increasing generation into `receipt_index` (max of
    * the existing table + 1 — a trivial probe on a handful of rows), so a
    * reload at the same `atHeight` deterministically wins over earlier
    * loads; with a flat seq the tie would pick a shuffle-order winner and
    * the same reload could flip table contents between runs. */
  def mergeInto(spark: SparkSession, silverDir: String, rows: DataFrame,
      atHeight: Long = 0L): Long = {
    val path = s"$silverDir/chains"
    // Missing table → generation 0; any OTHER probe failure propagates.
    // A broad catch here would silently reset gen on a transient read
    // error, and the reload's rows would lose LWW to the standing ones —
    // a no-op reload with no error surfaced.
    val gen =
      if (!graft.operators.MergeWriter.io.exists(path)) 0
      else {
        val r = spark.read.parquet(path).agg(max(col("receipt_index"))).head()
        if (r.isNullAt(0)) 0 else r.getInt(0) + 1
      }
    graft.operators.MergeWriter.merge(spark,
      rows.withColumn("block_height", lit(atHeight))
        .withColumn("shard_index", lit(-1L))
        .withColumn("receipt_index", lit(gen))
        .withColumn("action_index", lit(0)),
      path, Seq("name"),
      Seq("block_height", "shard_index", "receipt_index", "action_index"))
  }

  /** Resolve each account's chain row — the engine form of the Account →
    * Chain FK (accounts/models.py:21-28): a null chain string means NEAR
    * (the reference's save() default). Broadcast: the dimension is a
    * handful of rows. The account JSON serializer is unchanged — it keeps
    * the bare string, exactly like the reference's serializer exposes no
    * chain object. */
  def withChain(accounts: DataFrame, chains: DataFrame): DataFrame = {
    val dim = broadcast(chains.select(
      col("name").as("__chain_name"),
      struct(col("name"), col("name_slug"), col("rpc_url"),
        col("explorer_url"), col("evm_compat"), col("evm_chain_id")).as("chain_obj")))
    accounts
      .withColumn("__chain_key", coalesce(col("chain"), lit("NEAR")))
      .join(dim, col("__chain_key") === col("__chain_name"), "left")
      .drop("__chain_key", "__chain_name")
  }
}
