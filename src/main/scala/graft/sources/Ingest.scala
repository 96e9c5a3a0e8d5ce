package graft.sources

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's artifact build pipeline (artifacts/artifacts.py),
  * Spark-first: raw JSON-lines → typed metadata parquet with schema
  * validation and contiguous ids; embedding normalization
  * (ensure_unit_l2); queries.parquet writer.
  *
  * Scale notes: the JSON read is a plain distributed scan; dtype coercion
  * and null filtering are column expressions; contiguous 0..N-1 id
  * assignment uses `zipWithIndex` (two narrow passes — one count per
  * partition, one map — no shuffle, unlike a global row_number window).
  */
object Ingest {

  final class SchemaError(msg: String) extends IllegalArgumentException(msg)

  /** Required metadata columns and their target Spark types
    * (reference artifacts.py MUST + dtype table). */
  val RequiredColumns: Seq[(String, DataType)] = Seq(
    "state" -> StringType,
    "city" -> StringType,
    "stars" -> FloatType,
    "review_count" -> IntegerType,
    "price_range" -> ByteType)

  val OptionalColumns: Seq[(String, DataType)] = Seq(
    "categories" -> StringType,
    "latitude" -> FloatType,
    "longitude" -> FloatType,
    "is_open" -> ByteType)

  /** Raw business JSON-lines → typed, validated metadata frame with
    * contiguous ids. Mirrors artifacts.py build_metadata_artifacts:
    * derive price from the nested attributes object, coerce dtypes
    * (bad values → null), drop rows with null required fields, assign
    * id 0..N-1. */
  def buildMetadata(spark: SparkSession, jsonPath: String): DataFrame = {
    val raw = spark.read.json(jsonPath)
    // attributes may be inferred as a struct (clean JSON) or carried as a
    // raw string (reference data uses python-ish dict strings)
    val price = raw.schema.fields.find(_.name == "attributes").map(_.dataType) match {
      case Some(s: StructType) if s.fieldNames.contains("RestaurantsPriceRange2") =>
        col("attributes.RestaurantsPriceRange2").cast(StringType)
      case Some(StringType) =>
        get_json_object(col("attributes"), "$.RestaurantsPriceRange2")
      case _ => lit(null).cast(StringType)
    }
    val typed = raw.select(
      col("state").cast(StringType).as("state"),
      col("city").cast(StringType).as("city"),
      col("stars").cast(FloatType).as("stars"),
      col("review_count").cast(IntegerType).as("review_count"),
      when(price.isin("", "None"), lit(null)).otherwise(price)
        .cast(ByteType).as("price_range"),
      (if (raw.columns.contains("categories")) col("categories").cast(StringType)
       else lit(null).cast(StringType)).as("categories"),
      (if (raw.columns.contains("latitude")) col("latitude").cast(FloatType)
       else lit(null).cast(FloatType)).as("latitude"),
      (if (raw.columns.contains("longitude")) col("longitude").cast(FloatType)
       else lit(null).cast(FloatType)).as("longitude"),
      (if (raw.columns.contains("is_open")) col("is_open").cast(ByteType)
       else lit(null).cast(ByteType)).as("is_open"))
      .where(col("state").isNotNull && col("stars").isNotNull &&
             col("review_count").isNotNull)
    withContiguousId(typed, "id")
  }

  /** Assign a contiguous 0..N-1 id without a global sort: zipWithIndex
    * counts rows per partition (one lightweight job) then maps each row
    * to offset+position — deterministic for a deterministic input order,
    * no shuffle. */
  def withContiguousId(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val fields = StructField(idCol, LongType, nullable = false) +: df.schema.fields
    val rows = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: r.toSeq)
    }
    spark.createDataFrame(rows, StructType(fields))
  }

  /** Schema gate (reference artifacts.py validate_schema): required
    * columns present with exact types, required fields non-null, id
    * contiguous 0..N-1. Throws SchemaError. Runs in ONE aggregate job. */
  def validateMetadata(df: DataFrame, idCol: String = "id"): Unit = {
    val schema = df.schema
    (Seq(idCol -> (LongType: DataType)) ++ RequiredColumns).foreach { case (name, dt) =>
      val f = schema.fields.find(_.name == name)
        .getOrElse(throw new SchemaError(s"Missing required column: $name"))
      if (f.dataType != dt)
        throw new SchemaError(s"Column $name has type ${f.dataType}, expected $dt")
    }
    val required = Seq(idCol, "state", "stars", "review_count")
    val aggs = required.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
      Seq(count(lit(1)).as("n"), min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        count_distinct(col(idCol)).as("distinct_id"))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    required.zipWithIndex.foreach { case (c, i) =>
      if (r.getLong(i) > 0) throw new SchemaError(s"Column $c has nulls; required non-null.")
    }
    val n = r.getLong(required.length)
    if (n > 0) {
      val (minId, maxId, distinct) =
        (r.getLong(required.length + 1), r.getLong(required.length + 2), r.getLong(required.length + 3))
      if (minId != 0 || maxId != n - 1 || distinct != n)
        throw new SchemaError(s"id must be contiguous 0..${n - 1}: min=$minId max=$maxId distinct=$distinct")
    }
  }

  /** ensure_unit_l2 (reference validators.py:38): if any norm is off by
    * more than `tol`, rescale every vector to unit length (0-norm rows
    * become null). Pure column expression — no shuffle. */
  def normalized(emb: DataFrame, vecCol: String = "embedding", tol: Double = 1e-3): DataFrame = {
    val n = l2Norm(col(vecCol))
    emb.withColumn(vecCol,
      when(abs(n - 1.0) <= tol, col(vecCol))
        .otherwise(when(n > 0.0,
          transform(col(vecCol), x => (x / n).cast(FloatType)))))
  }

  /** Load the reference's canonical vector artifact — a NumPy `.npy`
    * float matrix (reference loaders.py:73-80 memory-maps vectors.npy) —
    * into the embeddings schema (vec_id = row index, the reference's id
    * convention; embedding float32). The read is distributed byte-range
    * tasks over the Hadoop FS (NpyIO.loadMatrix), so the reference's own
    * published artifacts load without an external conversion step. */
  def loadVectorsNpy(spark: SparkSession, path: String): DataFrame =
    NpyIO.loadMatrix(spark, path, idCol = "vec_id", vecCol = "embedding")

  /** Write an embeddings frame as the reference's vectors.npy artifact.
    * Driver-side sequential by format (a .npy is one stream); rows pulled
    * ordered by id via toLocalIterator — memory O(one partition). For
    * corpus-scale data the parquet table IS the artifact; this exists for
    * reference interop. */
  def writeVectorsNpy(emb: DataFrame, path: String,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.Row
    val r = emb.agg(count(lit(1)), first(size(col(vecCol)))).collect()(0)
    val (n, d) = (r.getLong(0), r.getInt(1))
    val it = emb.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .toLocalIterator().asInstanceOf[java.util.Iterator[Row]]
    val rows = new Iterator[Array[Float]] {
      def hasNext: Boolean = it.hasNext
      def next(): Array[Float] = it.next().getSeq[Float](1).toArray
    }
    NpyIO.write(path, rows, n, d)
  }

  /** vectors.meta.json (reference artifacts.py writes N/D/normalized/
    * model/seed alongside the vectors): one aggregate over the embedding
    * table, hand-rolled JSON (stable key order). */
  def writeVectorsMeta(emb: DataFrame, path: String, model: String,
                       seed: Long = 42L, tol: Double = 1e-3): Unit = {
    val r = emb.agg(
      count(lit(1)).as("n"),
      first(size(col("embedding"))).as("d"),
      max(abs(l2Norm(col("embedding")) - 1.0)).as("maxdev")).collect()(0)
    val json =
      s"""{"N": ${r.getLong(0)}, "D": ${r.getInt(1)}, "normalized": ${r.getDouble(2) <= tol}, "model": "$model", "seed": $seed}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** queries.parquet writer (reference artifacts.py write_queries —
    * schema: qid / qtext / filters / K, plus the derived qvec):
    * persists the deterministic hybrid query set. */
  def writeQueries(spark: SparkSession, path: String,
                   qs: Seq[graft.search.HybridQuery] = graft.search.QuerySet.default): Unit = {
    import spark.implicits._
    qs.map(q => (q.qid, q.qtext, q.qvec.toSeq, q.filters, q.k))
      .toDF("qid", "qtext", "qvec", "filters", "k")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a queries.parquet back into HybridQuery form (sqlWhere is not
    * persisted — oracle SQL is a test-harness concern, not data). qtext
    * rides along so a harness run can resolve it through the encode seam
    * (RunHarness rule: qvec > qtext > vectors[qid]); files written before
    * the column existed read back with empty qtext. */
  def readQueries(spark: SparkSession, path: String): Seq[graft.search.HybridQuery] = {
    import spark.implicits._
    val raw = spark.read.parquet(path)
    val withText =
      if (raw.columns.contains("qtext")) raw
      else raw.withColumn("qtext", lit(""))
    withText
      .select(col("qid"), col("qtext"), col("qvec"), col("filters"), col("k"))
      .as[(Long, String, Array[Float], String, Int)]
      .collect()
      .map { case (qid, qt, v, f, k) => graft.search.HybridQuery(qid, v, f, "", k, qt) }
      .toIndexedSeq
      .sortBy(_.qid)
  }
}
