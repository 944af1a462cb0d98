package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Transcript source formats beyond parquet. The reference's inference
  * stage writes JSONL (one record per line, flows/inference.py:617-643) and
  * its fixtures use a legacy JSON-array encoding; production tables would be
  * Iceberg. Every reader enforces the canonical transcripts schema with an
  * EXPLICIT schema (never schema inference — at 100 TB an inference pass is
  * a full extra scan) and returns columns in contract order. */
object Sources {

  val transcriptsSchema: StructType = StructType(
    Seq(
      StructField("conv_id", StringType, nullable = false),
      StructField("turn_idx", IntegerType, nullable = false),
      StructField("role", StringType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("tool", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = true)
    )
  )

  private def normalize(df: DataFrame): DataFrame =
    df.select(
      col("conv_id").cast("string"),
      col("turn_idx").cast("int"),
      col("role").cast("string"),
      col("text").cast("string"),
      col("tool").cast("string"),
      col("ts").cast("timestamp")
    )

  def parquet(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.schema(transcriptsSchema).parquet(path))

  /** JSONL: one transcript turn per line. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.schema(transcriptsSchema).json(path))

  /** CSV with header, RFC-4180 quoting. */
  def csv(spark: SparkSession, path: String): DataFrame =
    normalize(
      spark.read
        .schema(transcriptsSchema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )

  /** ORC (native spark-sql reader): the other columnar lake format —
    * predicate pushdown and column pruning work exactly as for parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.schema(transcriptsSchema).orc(path))
}
