package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions._

/**
 * CSV/TSV record source with the reference's semantics
 * (/root/reference/internal/csv.go:15-124) expressed as a declarative plan:
 *
 *  - `#` comments, lenient quotes, comma or tab delimiter
 *  - 2 or 3 fields: client_ip, domain[, query_count]
 *  - gzip transparently (Spark decodes `.gz` by extension — the reference
 *    sniffs magic bytes, same effect for file inputs)
 *  - count semantics: missing/empty -> 1; 0 -> row dropped; negative or
 *    non-numeric -> invalid row (the reference hard-errors the whole file;
 *    in a distributed engine we surface them via the `invalid` flag so the
 *    caller can fail or count them — matching the collector's
 *    invalidRecordCount path)
 *  - header-row heuristic: a FIRST line whose IP or count doesn't parse is
 *    silently dropped (/root/reference/internal/csv.go:98-110). Spark has
 *    no "first line" in a distributed file; we replicate it per-file, which
 *    matches the reference's per-file loop.
 *  - domain escapes decoded (`\DDD`, `\xHH`), then normalized downstream.
 *
 * Output columns: client_ip, domain_raw (unescaped), cnt, invalid
 * (true where the row must not contribute), plus the derived `hash` and
 * `domain` columns the magnitude pipeline needs.
 */
object RecordsCsv {

  val schema: StructType = StructType(Seq(
    StructField("client_ip", StringType),
    StructField("domain_field", StringType),
    StructField("count_field", StringType)))

  def read(spark: SparkSession, path: String, tsv: Boolean = false): DataFrame = {
    val raw = spark.read
      .schema(schema)
      .option("comment", "#")
      .option("sep", if (tsv) "\t" else ",")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

    val cntStr = trim(col("count_field"))
    // ANSI mode: guard the cast so non-numeric counts yield NULL, not error
    val parsedCnt = when(cntStr.rlike("^-?[0-9]+$"), cntStr.cast("long"))
      .otherwise(lit(null).cast("long"))
    val headerRow =
      // The reference drops only a FILE'S FIRST line when it looks like a
      // header. A distributed CSV scan has no row position, so the proxy is
      // deliberately narrow: the ip field must contain NO digit at all
      // (header names like "ip"/"client_ip" qualify; corrupt real
      // addresses virtually always contain digits and stay visible via the
      // `invalid` flag instead of vanishing). Documented divergence: an
      // all-alphabetic garbage ip row mid-file is dropped like a header.
      !trim(col("client_ip")).rlike("[0-9]") &&
        truncate_ip(trim(col("client_ip"))).isNull &&
        (cntStr.isNull || parsedCnt.isNull)

    raw
      .withColumn("cnt",
        when(col("count_field").isNull || cntStr === "", lit(1L))
          .otherwise(parsedCnt))
      .withColumn("invalid",
        col("client_ip").isNull ||
        truncate_ip(trim(col("client_ip"))).isNull ||
        col("cnt").isNull || col("cnt") < 0)
      .filter(!(col("invalid") && headerRow)) // drop header-shaped rows
      .filter(col("cnt").isNull || col("cnt") =!= 0) // zero-count rows vanish
      .withColumn("domain_raw", unescape_domain(trim(col("domain_field"))))
      .withColumn("hash", xxh3_64(truncate_ip(trim(col("client_ip")))))
      .withColumn("domain", normalize_domain(col("domain_raw")))
      .select(trim(col("client_ip")).as("client_ip"), col("domain_raw"),
        col("cnt"), col("invalid"), col("hash"), col("domain"))
  }
}
