package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shims.{column, expression}
import graft.functions.DomainSuffixes
import graft.functions.GraftFunctions.host_of_url

/** URL/domain blocklist filtering — the CCNet/RefinedWeb "UT1 blocklist"
  * step: drop every document whose host falls under a blocked domain,
  * where blocking `example.com` must catch `a.b.example.com`.
  *
  * Mechanics: explode each doc's host into its dot-suffix chain
  * ([[DomainSuffixes]], ≤ label-count rows per doc) and semi-join the
  * blocklist on exact string equality. That turns subdomain matching into
  * a plain hash equi-join: no LIKE scans, no per-pattern regex, and the
  * blocklist side (unique domains) is the natural broadcast/build side at
  * any realistic blocklist size (UT1 is ~4M entries — megabytes). A doc
  * with any blocked suffix is dropped exactly once (semi join on the
  * distinct doc ids, then anti join back), so the explode never inflates
  * the output. */
object UrlFilter {

  def domain_suffixes(c: Column): Column = column(DomainSuffixes(expression(c)))

  /** Ids of docs whose `urlCol` host has a suffix in `blocklist`
    * (`domainCol`, lowercase exact labels). */
  def blockedDocs(docs: DataFrame, blocklist: DataFrame,
                  urlCol: String = "url", idCol: String = "doc_id",
                  domainCol: String = "domain"): DataFrame = {
    val bl = blocklist.select(col(domainCol).as("suffix")).distinct()
    docs.select(col(idCol),
        explode(domain_suffixes(host_of_url(col(urlCol)))).as("suffix"))
      .join(bl, Seq("suffix"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The filter: docs minus [[blockedDocs]] (one anti join). */
  def dropBlockedHosts(docs: DataFrame, blocklist: DataFrame,
                       urlCol: String = "url", idCol: String = "doc_id",
                       domainCol: String = "domain"): DataFrame =
    docs.join(blockedDocs(docs, blocklist, urlCol, idCol, domainCol),
      Seq(idCol), "left_anti")
}
