package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Incremental connected components over a stream of near-dup pairs —
  * ONLINE maintenance of the canonical cluster mapping (and therefore
  * the dedup keep-list `node == cluster_root`) as edges arrive, without
  * ever re-reading historical edges.
  *
  * The mergeable artifact is the STAR-EDGE form of the standing
  * mapping: a (node, cluster_root) table IS its own spanning structure
  * — re-expressed as edges (node — root), one edge per node INCLUDING
  * the root's own (root, root) self-edge, it preserves exactly the
  * connectivity AND the node set of every edge processed so far (the
  * self-edge is what keeps singleton clusters — born from self-pairs
  * (a, a) — alive across batches). Per micro-batch:
  *
  *  - the standing mapping (the PREVIOUS batch's labels, read under a
  *    pinned schema from `labelsPath/batch_id=<id−…>` — the latest
  *    partition strictly before this batch, so a REPLAYED batch ignores
  *    its own earlier attempt and recomputes from the same standing
  *    state: idempotent, the DedupStream layout contract) is unioned
  *    as star edges with the batch's new pairs;
  *  - one [[Dedup.connectedComponents]] run over that union (standing
  *    nodes + batch edges — NEVER the historical edge set) yields the
  *    new mapping, landed under `labelsPath/batch_id=<id>`.
  *
  * Correctness is structural, not approximate: star edges preserve
  * connectivity and node sets, and batch CC labels every class with its
  * MINIMUM member id — the minimum of a merged class is the minimum
  * over the original members, which all survive as star-edge nodes — so
  * after every batch the streamed mapping is ROW-IDENTICAL to batch CC
  * over the concatenation of all edges so far (CcStreamSpec pins
  * prefix equality, the cross-batch cluster-merge case, and replay
  * idempotence). Clusters formed in earlier batches merge correctly
  * when a later edge bridges them: both stars join into one class and
  * the smaller root wins.
  *
  * Scale shape: per-batch work is |standing near-dup nodes| + |batch
  * edges| — the mapping is near-dup-corpus-sized (tiny whenever dedup
  * is worth running), historical edges are never re-read, and the CC
  * solve inherits the adaptive local/distributed path (driver
  * union-find under `localSolveMaxEdges`, pointer-jumping label
  * propagation above it).
  */
object CcStream {

  /** Start incremental CC over a streaming frame carrying two long
    * columns `aCol`/`bCol` (a near-dup pair per row). The mapping after
    * batch `i` lands under `labelsPath/batch_id=i`; seed a pre-existing
    * mapping under `batch_id=-1` to continue from a batch run. */
  def startIncrementalCc(
      newPairs: DataFrame,
      labelsPath: String,
      checkpoint: String,
      aCol: String, bCol: String): StreamingQuery =
    newPairs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(labelsPath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // the latest standing state strictly BEFORE this batch — a
        // replay's own earlier attempt is excluded, so the recompute
        // starts from the same standing mapping (one dir listing, no
        // scan of historical partitions)
        val prior: Option[Long] =
          if (fs.exists(root))
            fs.listStatus(root).map(_.getPath.getName)
              .filter(_.startsWith("batch_id="))
              .map(_.stripPrefix("batch_id=").toLong)
              .filter(_ < batchId)
              .reduceOption(_ max _)
          else None
        val newEdges = batch
          .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
        val edges = prior.fold(newEdges) { p =>
          // EVERY standing row becomes an edge — including root rows
          // (root, root), which re-enter as self-edges. Filtering those
          // out would drop singleton clusters (a self-pair (a,a) in an
          // earlier batch yields the lone row (a,a)) from the next
          // mapping; self-edges are harmless to connectedComponents
          // (both solve paths add both endpoints unconditionally), so
          // the one-extra-edge-per-cluster cost buys exact node-set
          // preservation.
          val starEdges = spark.read
            .schema("node BIGINT, cluster_root BIGINT")
            .parquet(s"$labelsPath/batch_id=$p")
            .select(col("node").as("a"), col("cluster_root").as("b"))
          newEdges.unionAll(starEdges)
        }
        Dedup.connectedComponents(edges, "a", "b")
          .coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$labelsPath/batch_id=$batchId")
      }
      .start()
}
