package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chains dimension (chains/models.py:5-48): slug parity, the EVM CHECK
  * constraint at ingest, and the account→chain FK resolution with the NEAR
  * default. */
class ChainsSpec extends SparkSpec {
  import spark.implicits._

  test("chains load: slug derived, CHECK constraint enforced at ingest") {
    val dir = tmpDir("chains-json")
    Files.write(Paths.get(dir, "chains.json"),
      ("""{"name": "NEAR Protocol", "rpc_url": "https://rpc.mainnet.near.org", "explorer_url": "https://nearblocks.io", "evm_compat": false}""" + "\n" +
        """{"name": "Base", "rpc_url": "https://mainnet.base.org", "explorer_url": "https://basescan.org", "evm_compat": true, "evm_chain_id": 8453}""").getBytes)
    val rows = Chains.fromJson(spark, s"$dir/chains.json").orderBy("name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("name") == "Base" &&
      rows(0).getAs[Int]("evm_chain_id") == 8453)
    assert(rows(1).getAs[String]("name_slug") == "near-protocol")
    assert(rows(1).isNullAt(rows(1).fieldIndex("evm_chain_id")))

    // evm_compat=true without chain id violates the CHECK (models.py:37-44)
    val bad1 = Seq(("Ethereum", "u", "e", true, null.asInstanceOf[java.lang.Integer]))
      .toDF("name", "rpc_url", "explorer_url", "evm_compat", "evm_chain_id")
    val e1 = intercept[IllegalArgumentException](Chains.validated(bad1))
    assert(e1.getMessage.contains("Ethereum"))
    // …and a chain id on a non-EVM chain violates the other arm
    val bad2 = Seq(("Solana", "u", "e", false, Integer.valueOf(7)))
      .toDF("name", "rpc_url", "explorer_url", "evm_compat", "evm_chain_id")
    intercept[IllegalArgumentException](Chains.validated(bad2))
  }

  test("pretty-printed array dump parses (multiLine fallback)") {
    val dir = tmpDir("chains-json-arr")
    Files.write(Paths.get(dir, "chains.json"),
      """[
        |  {"name": "NEAR Protocol", "rpc_url": "https://rpc.mainnet.near.org",
        |   "explorer_url": "https://nearblocks.io", "evm_compat": false},
        |  {"name": "Base", "rpc_url": "https://mainnet.base.org",
        |   "explorer_url": "https://basescan.org", "evm_compat": true,
        |   "evm_chain_id": 8453}
        |]""".stripMargin.getBytes)
    // a line-mode-only read would yield all-null corrupt records here and
    // silently load an empty dimension
    assert(Chains.fromJson(spark, s"$dir/chains.json").count() == 2)
  }

  test("reload at the same height deterministically wins (load generation)") {
    val silverDir = tmpDir("chains-reload")
    Chains.mergeInto(spark, silverDir, Chains.defaultRows(spark))
    val updated = Chains.validated(Seq(
      ("NEAR", "https://rpc.other.example", "https://nearblocks.io",
        false, null.asInstanceOf[java.lang.Integer]))
      .toDF("name", "rpc_url", "explorer_url", "evm_compat", "evm_chain_id"))
    assert(Chains.mergeInto(spark, silverDir, updated) == 1)
    val row = spark.read.parquet(s"$silverDir/chains").head()
    // same (height, shard, action) seq as the seed — only the per-load
    // generation in receipt_index breaks the tie, so the reload's value
    // must win every run, not per shuffle order
    assert(row.getAs[String]("rpc_url") == "https://rpc.other.example")
    assert(row.getAs[Int]("receipt_index") == 1)
  }

  test("seed + merge idempotent; account.chain resolves with NEAR default") {
    val silverDir = tmpDir("chains-silver")
    assert(Chains.mergeInto(spark, silverDir, Chains.defaultRows(spark)) == 1)
    assert(Chains.mergeInto(spark, silverDir, Chains.defaultRows(spark)) == 1)
    val chains = spark.read.parquet(s"$silverDir/chains")
    assert(chains.head().getAs[String]("name_slug") == "near")

    // accounts carry a bare chain string, null = NEAR (accounts/models.py:141-143)
    val accounts = Seq(
      ("a.near", null.asInstanceOf[String]),
      ("b.near", "NEAR")).toDF("id", "chain")
    val resolved = Chains.withChain(accounts, chains)
    assert(resolved.filter(col("chain_obj.name") === "NEAR").count() == 2)
    // serializer surface unchanged: the bare string column is still there
    assert(resolved.columns.contains("chain"))
  }
}
