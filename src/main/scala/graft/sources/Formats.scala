package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink format coverage beyond the reference's text-manifest
  * source and letter-file sink: CSV and JSON-lines read/write with
  * explicit schemas (a streaming-or-batch ingest path always declares
  * its schema — inference is a scan you don't want at 100 TB).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.option("header", "true")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)).json(path)
}
