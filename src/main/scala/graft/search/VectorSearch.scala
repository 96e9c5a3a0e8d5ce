package graft.search

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid vector search operators, Spark-first.
  *
  * Scores are rounded to 6 dp BEFORE ranking, with the id as tiebreak —
  * this makes every ranking fully deterministic and immune to last-ulp
  * summation differences across engines (oracle parity), while 1e-6
  * resolution is far below any meaningful similarity gap.
  *
  * Scale notes: `orderBy(...).limit(k)` plans as TakeOrderedAndProject —
  * a per-partition heap + O(k) driver merge, never a global sort. Query
  * vectors enter the plan as literals (broadcast with the closure); the
  * embedding side streams through whole-stage-codegen'd scoring.
  */
object VectorSearch {

  /** Add a 6dp-rounded IP score column against a fixed query vector. */
  def withScore(emb: DataFrame, qv: Array[Float]): DataFrame =
    emb.withColumn("score", round(dot(col("embedding"), typedlit(qv.toSeq)), 6))

  /** Brute-force top-K inner product, optionally within a filtered subset.
    * The reference's `exact` / `pre_filter` backends
    * (src/eval/oracle.py:36, src/baselines/pre_filter.py:7): filter first,
    * score only survivors — the filter reaches the parquet scan.
    */
  def topK(emb: DataFrame, qv: Array[Float], k: Int, pred: Option[Column] = None): DataFrame = {
    val base = pred.map(emb.where).getOrElse(emb)
    withScore(base, qv)
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** [[topK]] plus the scanned-row count in ONE pass: per-partition
    * bounded heap + row counter, O(P·k) driver merge — for callers that
    * must record |scanned| beside the top-K (the harness's ivf/lsh
    * `scored_vectors`). The separate `count()` job those callers ran
    * re-scanned the candidate set per query, doubling the probe I/O at
    * scale (the IvfPqBackend list-size argument, applied to the filtered
    * case the metadata cannot answer). Ranking contract identical to
    * [[topK]]: double-accumulated float dot, round-6-before-rank,
    * ascending-id ties (VecMath doc — the RamCorpus parity contract). */
  def topKWithCount(emb: DataFrame, qv: Array[Float], k: Int,
                    pred: Option[Column] = None): (Seq[(Long, Double)], Long) = {
    val base = pred.map(emb.where).getOrElse(emb)
    val spark = base.sparkSession
    import spark.implicits._
    val rows = base.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val partials = spark.sparkContext.runJob(rows.rdd,
      (it: Iterator[(Long, Array[Float])]) => {
        // head = worst kept entry (same ordering as RamCorpus.candidates)
        val worstFirst: Ordering[(Double, Long)] = Ordering.fromLessThan {
          (a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
        }
        val heap = collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
        var n = 0L
        it.foreach { case (id, v) =>
          n += 1
          val s = VecMath.round6(VecMath.dot(v, qv))
          if (heap.size < k) heap.enqueue((s, id))
          else {
            val (ws, wid) = heap.head
            if (s > ws || (s == ws && id < wid)) { heap.dequeue(); heap.enqueue((s, id)) }
          }
        }
        (n, heap.toArray)
      })
    val top = partials.iterator.flatMap(_._2).toArray
      .sortBy { case (s, id) => (-s, id) }
      .take(k)
      .map { case (s, id) => (id, s) }.toSeq
    (top, partials.iterator.map(_._1).sum)
  }

  /** Post-filter baseline (reference src/baselines/post_filter.py:17):
    * rank ALL vectors by similarity, take the top K′ candidates, apply the
    * filter, and widen K′ up the ladder until ≥K survive (or the ladder is
    * exhausted); return the top-K survivors.
    *
    * Scale shape: ONE distributed job — a TakeOrderedAndProject of the
    * max rung (O(K′ₘₐₓ) rows to the driver, per-partition heaps, no cache,
    * no global sort). The ladder logic then runs driver-side over those
    * ≤K′ₘₐₓ rows, which is semantically identical to the reference's retry
    * loop (top-200 ⊆ top-500 ⊆ top-1000) without re-scanning per rung.
    */
  def postFilterLadder(
      emb: DataFrame,
      qv: Array[Float],
      pred: Column,
      k: Int,
      ladder: Seq[Int] = Seq(200, 500, 1000)): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val maxRung = ladder.max
    val cand = withScore(emb, qv)
      .withColumn("pass", coalesce(pred, lit(false)))
      .select(col("vec_id").cast("long"), col("score"), col("pass"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(maxRung)
      .as[(Long, Double, Boolean)]
      .collect() // ≤ maxRung rows by contract — the one driver-side hop
    val chosen = ladder.sorted
      .find(kp => cand.take(kp).count(_._3) >= k)
      .getOrElse(maxRung)
    val kept = cand.take(chosen).filter(_._3).take(k).map { case (id, s, _) => (id, s) }
    spark.createDataset(kept.toSeq).toDF("vec_id", "score")
  }

  /** Batch kNN join: top-k neighbors per query, all queries in one pass.
    *
    * Two-stage top-K (the scale-safe shape): stage 1 is a mapPartitions
    * with one bounded k-heap per query — each input partition emits at
    * most Q×k rows and the N×Q scored candidates are never shuffled;
    * stage 2 ranks the surviving Q×P×k rows with a tiny window. Compared
    * to a single `Window.partitionBy(qid)` over all scored rows this
    * shrinks the shuffle by ~N/(P·k) and removes the low-cardinality-qid
    * skew (every partition would otherwise land on Q reducers).
    *
    * `allowedLists` restricts each query to rows whose `listCol` value is
    * in its set (the batched-IVF shape: ONE scan pruned to the UNION of
    * all probed lists, per-query membership enforced row-locally — no
    * per-query scans, no cross-query recall leakage). None = every query
    * scores every row.
    */
  def knnJoin(emb: DataFrame, queries: Seq[(Long, Array[Float])], k: Int,
              allowedLists: Option[Map[Long, Set[Int]]] = None,
              listCol: String = "list_id"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qArr = queries.toArray
    // aligned with qArr; null = unrestricted (kept off the row-loop's hot
    // path by a single reference check)
    val allowArr: Array[Set[Int]] =
      allowedLists.map(m => qArr.map { case (qid, _) => m.getOrElse(qid, Set.empty[Int]) }).orNull
    val qB = spark.sparkContext.broadcast((qArr, allowArr))

    val src =
      if (allowedLists.isDefined)
        emb.select(col("vec_id").cast("long"), col("embedding"), col(listCol).cast("int"))
      else // constant list id folds away in codegen; keeps one typed shape
        emb.select(col("vec_id").cast("long"), col("embedding"), lit(-1).as("list_id"))

    val partial = src
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val (qs, allow) = qB.value
        // per-query bounded heap; head = current worst of the kept k
        val worstFirst: Ordering[(Double, Long)] = Ordering.fromLessThan {
          (a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
        }
        val heaps = Array.fill(qs.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        it.foreach { case (id, vec, listId) =>
          var q = 0
          while (q < qs.length) {
            if (allow == null || allow(q).contains(listId)) {
              val s = VecMath.round6(VecMath.dot(vec, qs(q)._2))
              val h = heaps(q)
              if (h.size < k) h.enqueue((s, id))
              else {
                val (ws, wid) = h.head
                if (s > ws || (s == ws && id < wid)) { h.dequeue(); h.enqueue((s, id)) }
              }
            }
            q += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, q) =>
          h.iterator.map { case (s, id) => (qs(q)._1, id, s) }
        }
      }
      .toDF("qid", "vec_id", "score")

    // survivors via the custom TopKPerKey operator (bounded per-key heaps
    // after the clustered shuffle — no sort of doomed rows), then ranks
    // over the ≤Q×k winners
    val survivors = org.apache.spark.sql.graft.TopKPerKey(
      partial, Seq(col("qid")), Seq(desc("score"), col("vec_id")), k)
    val w = Window.partitionBy("qid").orderBy(desc("score"), col("vec_id"))
    survivors
      .withColumn("rank", row_number().over(w))
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Range search: EVERY vector with score ≥ tau (radius search — the
    * "all near-duplicates of this embedding" / FAISS range_search shape),
    * optionally within a filtered subset. Unlike top-K there is no result
    * bound, so the plan is a pure scan+filter (both predicates reach the
    * scan) with the tiny survivor set globally ordered at the end; tau
    * controls the output volume, the corpus size doesn't. */
  def rangeSearch(emb: DataFrame, qv: Array[Float], tau: Double,
                  pred: Option[Column] = None): DataFrame = {
    val base = pred.map(emb.where).getOrElse(emb)
    withScore(base, qv)
      .select(col("vec_id"), col("score"))
      .where(col("score") >= tau)
      .orderBy(desc("score"), col("vec_id"))
  }

  /** Random baseline (reference src/backends/random.py): K ids drawn
    * uniformly without replacement, deterministic under the seed — the
    * recall floor every real backend must beat. Distributed shape: hash
    * ranking + TakeOrdered, no RNG state on executors. */
  def randomK(emb: DataFrame, k: Int, seed: Long = 0L): DataFrame =
    emb.select(col("vec_id"))
      // engine-portable seeded selection: the sample_* md5-hex discipline
      // (both engines derive the identical hex string, so the rule — and
      // the DuckDB oracle — pick the same k ids)
      .orderBy(md5(concat_ws(":", lit(seed), col("vec_id"))), col("vec_id"))
      .limit(k)

  /** recall@K (reference src/eval/metrics.py): |pred ∩ truth| / K per qid.
    * Both inputs carry (qid, vec_id). */
  def recallAtK(pred: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val hits = pred.join(truth, Seq("qid", "vec_id"), "inner")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    truth.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 6).as("recall"))
      .orderBy("qid")
  }
}
