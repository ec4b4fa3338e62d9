package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.core.net.PcapDns

/**
 * PCAP record source — the reference CLI's primary input
 * (/root/reference/internal/pcap.go): one record per DNS question, source
 * IP from the IP layer, count 1. Produces the same columns as
 * [[RecordsCsv.read]] (client_ip, domain_raw, cnt, invalid, hash, domain)
 * plus `ts` (the packet timestamp — the reference derives the dataset date
 * from the first packet when none is given).
 *
 * Scale shape: pcap is not splittable (records aren't self-synchronizing),
 * so parallelism is per FILE — `binaryFile` hands each capture file to one
 * task, which is exactly how multi-file capture archives are laid out. The
 * decode loop streams one file's bytes; gzip is sniffed by magic.
 */
object RecordsPcap {

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val recs = spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(bytes => PcapDns.decode(bytes))
      .toDF()
      .select(
        (col("tsMicros").cast("double") / 1e6).cast("timestamp").as("ts"),
        col("srcIp").as("client_ip"),
        col("qname"))
    recs
      // no unescaping: backslash escapes are a CSV-encoding artifact
      // (csv.go:85,126-129); pcap names are the raw label bytes already
      .withColumn("domain_raw", col("qname"))
      .withColumn("cnt", lit(1L))
      .withColumn("invalid", col("client_ip").isNull ||
        truncate_ip(col("client_ip")).isNull)
      .withColumn("hash", xxh3_64(truncate_ip(col("client_ip"))))
      .withColumn("domain", normalize_domain(col("domain_raw")))
      .select(col("ts"), col("client_ip"), col("domain_raw"), col("cnt"),
        col("invalid"), col("hash"), col("domain"))
  }
}
