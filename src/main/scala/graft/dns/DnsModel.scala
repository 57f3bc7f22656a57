package graft.dns

import org.apache.spark.sql.types._

/** Data model of the DNS-analytics engine (SURVEY §1; reference
  * BeanObj.scala:17-21 and the raw JSON shape parsed at DnsRptCH.scala:866-975).
  *
  * One immutable case class per record shape; Spark `Encoder`s derive from
  * these, so every operator below stays in Tungsten rows.
  */

/** A parsed, cleaned, enriched DNS response (reference `DnsBean`,
  * BeanObj.scala:17-21). Field defaults follow the reference:
  * clientName=5 (unknown), aip="0.0.0.0", responseType="other",
  * inNet=0, error derived (DnsRptCH.scala:914-917, 964).
  */
final case class DnsRecord(
    requestType: String,    // DNS query type: A/AAAA/CNAME/PTR/...
    responseCode: Int,      // RCODE: 0=NOERROR, 2=SERVFAIL, 3=NXDOMAIN...
    domain: String,         // queried name, protocol-stripped
    dnsIp: String,          // resolving server IP
    clientIp: String,       // querying client IP
    ts: java.sql.Timestamp, // event time (epoch ms in raw log)
    aip: String,            // resolved A-record address ("0.0.0.0" if none)
    responseType: String,   // last answer's Type, "other" if none
    error: Long,            // 1 if failed (rcode!=0 | no answers | aip=0.0.0.0)
    resolver: Long,         // resolution count weight (1 per record)
    clientName: Int)        // client-type id from IP-range dim, default 5

/** One answer in the raw JSON `Answers` array. */
final case class DnsAnswer(Type: String, Value: String)

/** Geo attributes from the interval geo DB (reference IpSearch.java:188-209
  * returns 11 `|`-separated attrs; we model the ones reports consume plus
  * coordinates). */
final case class GeoInfo(
    continent: String, country: String, province: String, city: String,
    county: String, operator: String, adcode: String, lon: Double, lat: Double)

object DnsModel {

  /** Schema of one raw JSON log line (reference field extraction,
    * DnsRptCH.scala:875-952). Unused raw fields are omitted — Catalyst
    * prunes the JSON parse to exactly these. */
  val rawSchema: StructType = StructType(Seq(
    StructField("Type", StringType),          // request type
    StructField("ResponseCode", IntegerType),
    StructField("Domain", StringType),
    StructField("ServerIP", StringType),      // dns server
    StructField("ClientIP", StringType),
    StructField("Timestamp", LongType),       // epoch millis
    StructField("QR", BooleanType),           // true = response
    StructField("Answers", ArrayType(StructType(Seq(
      StructField("Type", StringType),
      StructField("Value", StringType)))))))

  /** Client-IP rule dimension (reference `dns_client_detail`,
    * DnsRptCH.scala:830-841): [minIp,maxIp] → clientTypeId. */
  val clientRuleSchema: StructType = StructType(Seq(
    StructField("min_long_ip", LongType, nullable = false),
    StructField("max_long_ip", LongType, nullable = false),
    StructField("client_type_id", IntegerType, nullable = false)))

  /** Business-resource rule dimension (reference `dns_ip_segment_detail`,
    * DnsRptCH.scala:796-809). */
  val businessRuleSchema: StructType = StructType(Seq(
    StructField("min_long_ip", LongType, nullable = false),
    StructField("max_long_ip", LongType, nullable = false),
    StructField("resource_name", StringType),
    StructField("resource_type", StringType),
    StructField("resource_props", StringType)))

  /** In-net media ranges (reference `dns_media`, DnsRptCH.scala:814-825). */
  val mediaRuleSchema: StructType = StructType(Seq(
    StructField("min_long_ip", LongType, nullable = false),
    StructField("max_long_ip", LongType, nullable = false),
    StructField("media_type", StringType)))

  /** Authoritative-domain company metadata (reference Redis hash
    * `dns:dns-authDomain` → authDomainMsg, DnsRptCH.scala:146-200). */
  val authDomainSchema: StructType = StructType(Seq(
    StructField("authorityDomain", StringType, nullable = false),
    StructField("companyName", StringType),
    StructField("companyType", StringType),
    StructField("websiteName", StringType),
    StructField("websiteType", StringType),
    StructField("soft", StringType)))

  /** Geo interval dimension (replaces the binary qqzeng-ip-utf8.dat,
    * IpSearch.java:41-105): [minIp,maxIp] → geo attributes. */
  val geoRuleSchema: StructType = StructType(Seq(
    StructField("min_long_ip", LongType, nullable = false),
    StructField("max_long_ip", LongType, nullable = false),
    StructField("continent", StringType), StructField("country", StringType),
    StructField("province", StringType), StructField("city", StringType),
    StructField("county", StringType), StructField("operator", StringType),
    StructField("adcode", StringType),
    StructField("lon", DoubleType), StructField("lat", DoubleType)))
}
