package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze layer: NEAR-Lake streamer messages → flat receipt/action/event
  * rows, reproducing the reference's stream router
  * (indexer_app/handler.py:46-196) as declarative Spark transforms:
  * explode shards → explode receipt outcomes → success filter (P9) →
  * contract-pattern filter (P8) → two branches: FunctionCall actions with
  * base64-decoded args (P11) and EVENT_JSON logs (P10).
  *
  * Everything is a narrow transform over the exploded stream — no shuffle
  * until the per-entity merge, so at 100 TB this scales linearly with
  * input splits.
  */
object BlockIngest {

  /** Contract addresses/patterns (reference base/settings.py:61-66,
    * pots/utils.py:5-21, nadabot/utils.py:5-16). */
  final case class Contracts(
      donate: String = "donate.potlock.near",
      lists: String = "lists.potlock.near",
      social: String = "social.near",
      potFactoryPattern: String = """^v\d+\.potfactory\.potlock\.near$""",
      potSubPattern: String = """^[a-zA-Z0-9_-]+\.v\d+\.potfactory\.potlock\.near$""",
      nadabotPattern: String = """^v\d+(new)?\.nadabot\.near$""",
      nadabotSubPattern: String = """^[a-zA-Z0-9_-]+\.v\d+(new)?\.nadabot\.near$""")

  val contracts: Contracts = Contracts()

  /** One row per receipt-execution outcome, success-only, contract-scoped.
    * Carries the full ingest sequence (block_height, shard_index,
    * receipt_index) that defines last-writer-wins order (SURVEY §2.9). */
  def receipts(blocks: DataFrame, c: Contracts = contracts): DataFrame = {
    val exploded = blocks
      .select(
        col("block.header.height").as("block_height"),
        timestamp_micros(call_function("div", col("block.header.timestamp"), lit(1000L)).cast("long"))
          .as("block_timestamp"),
        posexplode(col("shards")).as(Seq("shard_index", "shard")))
      .select(
        col("block_height"), col("block_timestamp"), col("shard_index"),
        posexplode_outer(col("shard.receipt_execution_outcomes"))
          .as(Seq("receipt_index", "ro")))
      .select(
        col("block_height"), col("block_timestamp"),
        // LONG to match Schemas.ingestSeq — the snapshot/backfill writers
        // stamp lit(-1L); a mixed int32/int64 physical type across files
        // of one scoped-merged table breaks later schema-by-footer reads.
        col("shard_index").cast("long").as("shard_index"),
        col("receipt_index").cast("int").as("receipt_index"),
        col("ro.receipt.receipt_id").as("receipt_id"),
        col("ro.receipt.receiver_id").as("receiver_id"),
        col("ro.receipt.predecessor_id").as("predecessor_id"),
        col("ro.receipt.receipt.Action.signer_id").as("signer_id"),
        col("ro.receipt.receipt.Action.actions").as("actions"),
        col("ro.execution_outcome.outcome.status.SuccessValue").as("success_value_b64"),
        col("ro.execution_outcome.outcome.status.SuccessReceiptId").as("success_receipt_id"),
        col("ro.execution_outcome.outcome.logs").as("logs"))

    // P9: only successful outcomes (handler.py:75-82).
    val success = exploded.filter(
      col("success_value_b64").isNotNull || col("success_receipt_id").isNotNull)

    // P8: contract dispatch guard (handler.py:83-90).
    success.filter(matchedReceiver(col("receiver_id"), c))
  }

  def matchedReceiver(r: Column, c: Contracts = contracts): Column =
    r === c.social ||
      r.endsWith("potlock.near") ||
      r.endsWith("nadabot.near")

  /** One row per FunctionCall action, with base64-decoded JSON `args` and
    * decoded receipt result (`SuccessValue`) — reference
    * handler.py:171-196, 294-309. Decode failures null out gracefully
    * (`try_to_binary`: a malformed payload quarantines that record — the
    * per-receipt try/except of handler.py:446-447 — instead of failing
    * the job, which plain `unbase64` would under Spark 4). */
  def actions(receipts: DataFrame): DataFrame =
    receipts
      .select(
        col("*"),
        posexplode_outer(col("actions")).as(Seq("action_index", "action")))
      .filter(col("action.FunctionCall").isNotNull)
      .select(
        col("block_height"), col("block_timestamp"),
        col("shard_index"), col("receipt_index"),
        col("action_index").cast("int").as("action_index"),
        col("receipt_id"), col("receiver_id"), col("predecessor_id"),
        col("signer_id"),
        col("action.FunctionCall.method_name").as("method_name"),
        try_to_binary(col("action.FunctionCall.args"), lit("base64"))
          .cast("string").as("args_json"),
        try_to_binary(col("success_value_b64"), lit("base64"))
          .cast("string").as("result_json"))

  /** Records whose payloads failed to decode/parse — the per-record
    * quarantine promised by SURVEY §2.9 (the reference silently swallows
    * per-receipt errors, handler.py:446-447; we keep them inspectable).
    * A row lands here when base64 decode of args/result failed, or the
    * decoded bytes are not valid JSON where JSON is expected. */
  def quarantine(receipts: DataFrame): DataFrame = {
    val actionQ = receipts
      .select(col("*"),
        posexplode_outer(col("actions")).as(Seq("action_index", "action")))
      .filter(col("action.FunctionCall").isNotNull)
      .withColumn("raw_args", col("action.FunctionCall.args"))
      .withColumn("args_json",
        try_to_binary(col("raw_args"), lit("base64")).cast("string"))
      .withColumn("result_json",
        try_to_binary(col("success_value_b64"), lit("base64")).cast("string"))
      .filter(
        (col("args_json").isNull && col("raw_args").isNotNull) ||
          // result present but base64-undecodable
          (col("result_json").isNull && col("success_value_b64").isNotNull) ||
          (col("args_json").isNotNull && length(trim(col("args_json"))) > 0 &&
            try_parse_json(col("args_json")).isNull) ||
          (col("result_json").isNotNull &&
            trim(col("result_json")) =!= "null" &&
            try_parse_json(col("result_json")).isNull))
      .select(
        col("block_height"), col("shard_index"), col("receipt_index"),
        col("action_index").cast("int").as("action_index"),
        lit("action").as("kind"),
        col("receipt_id"), col("receiver_id"),
        col("action.FunctionCall.method_name").as("method_name"),
        col("args_json"), col("result_json"))

    // EVENT_JSON logs whose payload is not valid JSON would otherwise be
    // dropped by events() with no trace.
    val prefix = "EVENT_JSON:"
    val logQ = receipts
      .select(col("*"),
        posexplode_outer(col("logs")).as(Seq("log_index", "log")))
      .filter(col("log").startsWith(prefix) &&
        try_parse_json(expr(s"substring(log, ${prefix.length + 1})")).isNull)
      .select(
        col("block_height"), col("shard_index"), col("receipt_index"),
        // Actions and logs index INDEPENDENTLY: a receipt with a bad
        // action 0 AND a bad EVENT_JSON log 0 must quarantine BOTH rows,
        // so `kind` joins the keep-first key (one shared keyspace would
        // silently drop one of them).
        col("log_index").cast("int").as("action_index"),
        lit("log").as("kind"),
        col("receipt_id"), col("receiver_id"),
        lit(null).cast("string").as("method_name"),
        col("log").as("args_json"),
        lit(null).cast("string").as("result_json"))

    actionQ.unionByName(logQ)
  }

  /** One row per EVENT_JSON log, with event name and data payload —
    * reference handler.py:97-139 (P10). */
  def events(receipts: DataFrame): DataFrame = {
    val prefix = "EVENT_JSON:"
    receipts
      .select(
        col("block_height"), col("block_timestamp"),
        col("shard_index"), col("receipt_index"),
        col("receipt_id"), col("receiver_id"), col("predecessor_id"),
        col("signer_id"),
        posexplode_outer(col("logs")).as(Seq("log_index", "log")))
      .filter(col("log").startsWith(prefix))
      .withColumn("event_json", expr(s"substring(log, ${prefix.length + 1})"))
      .withColumn("event_name", get_json_object(col("event_json"), "$.event"))
      .withColumn("event_data", get_json_object(col("event_json"), "$.data"))
      .withColumn("action_index", col("log_index").cast("int"))
      .drop("log_index", "log")
  }
}
