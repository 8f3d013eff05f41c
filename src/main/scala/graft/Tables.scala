package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md and SURVEY.md §1.2).
  *
  * Design notes (100 TB north star):
  *  - Plain `spark.read.parquet` keeps the scan declarative so Catalyst
  *    pushes filters/projections into the parquet reader (row-group skip +
  *    column pruning). Never cache here — callers decide materialization.
  *  - `events.ts` is INT64 TIMESTAMP(NANOS) which Spark 4 refuses to read;
  *    `nanosAsLong` + µs truncation matches DuckDB's own ns→µs truncation
  *    (verified: min(ts) identical to the microsecond in both engines).
  *  - Timestamps are kept as TimestampNTZ everywhere so Spark parquet
  *    output and DuckDB's naive TIMESTAMP compare bit-identically.
  */
object Tables {
  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = rd(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = rd(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = rd(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = rd(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = rd(s, dir, "embeddings")

  /** `ts` has shipped in two generations of the driver testdata: INT64
    * TIMESTAMP(NANOS) (read as ns-long under `nanosAsLong`, truncated to
    * µs exactly like DuckDB truncates the same file) and, since the
    * 2026-08-13 regeneration, plain TIMESTAMP(MICROS). Sniff the loaded
    * dtype and normalize both to µs TimestampNTZ so every downstream
    * query sees one stable type regardless of which generation is on
    * disk. The footer-only schema read is driver-side and O(1).
    * The conf set is idempotent and only widens readability, so it is
    * safe under the shared driver-built session (SURVEY.md §4.3.5).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = rd(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // old generation: INT64 TIMESTAMP(NANOS) read as ns-long
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => // current generation: TIMESTAMP(MICROS, utc=false)
        raw
      case TimestampType =>
        // TIMESTAMP(MICROS, adjustedToUTC=true): the NTZ cast reads the
        // session timezone — exact only because every shipped entrypoint
        // pins UTC (build.sbt / Verify / Bench / Smoke)
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case other => // genuine schema drift must fail loudly, not coerce
        throw new IllegalStateException(
          s"unexpected events.ts parquet type $other in $dir — known generations are " +
            "INT64 TIMESTAMP(NANOS) and TIMESTAMP(MICROS); see TESTDATA.md")
    }
  }

  /** SURVEY.md §2.1 (formats): csv/json ingestion with an explicit
    * schema — inference is a full extra pass over the data and yields
    * driver-version-dependent types, so it is never used. Roundtrips
    * exercised in SourcesSpec (driver testdata itself is parquet).
    */
  def readCsv(s: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.option("header", "true").schema(schema).csv(path)

  def readJson(s: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(schema).json(path)
}
