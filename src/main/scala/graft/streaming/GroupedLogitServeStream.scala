package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LogitText

/** Per-source logistic quality gate at ingest — the SERVING half of the
  * grouped logistic family (x209 trains it, [[GroupedLogitStream]]
  * retrains it online, this stream applies it): fit the per-source
  * model ONCE on a standing labeled corpus — the sources-bounded
  * (key, c1, c2, b0, b1, b2) table from
  * [[graft.operators.Learn.logisticModelFromHistBy]], frozen and
  * broadcast — then gate every arriving micro-batch: each document
  * joins its source's model, features are centered with the TRAINING
  * means (c1, c2 — serving must center exactly like training or the
  * intercept is wrong), and the verdict is the same once-rounded
  * linear-score sign the batch confusion uses
  * ([[LogitText.t]] ≥ 0 ⇒ keep). The classifier analog of the
  * frozen-index serving streams (NbServeStream for the generative
  * family; this for the calibrated discriminative family).
  *
  * Verdicts are BIT-IDENTICAL to scoring the same rows in batch under
  * the same frozen model by construction: the scoring expression is the
  * shared [[LogitText]] text over the same doubles, and the join only
  * attaches constants (GroupedLogitServeStreamSpec pins verdict
  * equality per document and the per-source keep accounting against
  * x209's confusion). Documents from sources the model never saw get
  * `pred = NULL` (ungated — route to a default policy downstream),
  * never a silent wrong-model score; sources whose model row carries
  * NULL centers or betas (the grouped IRLS emits those for a key whose
  * features were all NULL in training) are dropped at freeze time and
  * serve through the same ungated path.
  *
  * Scale shape: the model is sources-bounded and BROADCAST once per
  * batch; per-batch work is one scan of the batch plus a broadcast
  * hash join — no shuffle, no state, no history. Verdicts land under
  * `verdictsPath/batch_id=<id>` (overwrite into the batch's own
  * partition — idempotent replay, the DedupStream layout contract).
  */
object GroupedLogitServeStream {

  /** Start the gate. `model` is the frozen (key, c1, c2, b0, b1, b2)
    * frame — collected here once (sources-bounded by contract) so the
    * quantizer-freeze discipline of the serving family holds for the
    * life of the query. `key`/`x1`/`x2` are expression strings over
    * the stream's columns; `idCol` names the passthrough id. */
  def startGroupedLogitGate(
      newDocs: DataFrame,
      model: DataFrame,
      verdictsPath: String,
      checkpoint: String,
      idCol: String, key: String, x1: String, x2: String): StreamingQuery = {
    // A DEGENERATE source (all-NULL features in training → NULL
    // centers/betas from the grouped IRLS) has no usable model: drop
    // its row here so its documents take the unseen-source path
    // (pred = NULL, ungated) instead of dying in getLong below with an
    // opaque NPE at query start. Null keys are equally unusable (a
    // left join can never match them).
    val modelRows: Array[Row] = model
      .select(col("key").cast("string"), col("c1").cast("long"),
        col("c2").cast("long"), col("b0").cast("double"),
        col("b1").cast("double"), col("b2").cast("double"))
      .na.drop("any")
      .collect()
    val t = LogitText.t("b0", "b1", "b2")
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val m = modelRows.toSeq.map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
          .toDF("key", "c1", "c2", "b0", "b1", "b2")
        batch
          .selectExpr(s"$idCol AS doc_id", s"CAST($key AS STRING) AS key",
            s"CAST($x1 AS BIGINT) AS r1", s"CAST($x2 AS BIGINT) AS r2")
          .join(broadcast(m), Seq("key"), "left")
          // center with the TRAINING means, score with the shared text
          .selectExpr("doc_id", "key",
            "r1 - c1 AS x1", "r2 - c2 AS x2", "b0", "b1", "b2")
          .selectExpr("doc_id", "key",
            s"CASE WHEN b0 IS NULL THEN CAST(NULL AS BOOLEAN) " +
              s"WHEN $t >= 0 THEN true ELSE false END AS pred")
          .write.mode("overwrite")
          .parquet(s"$verdictsPath/batch_id=$batchId")
      }
      .start()
  }
}
