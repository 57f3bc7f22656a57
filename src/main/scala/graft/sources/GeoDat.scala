package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Codec for the reference's binary IP-geolocation database format
  * (qqzeng-ip style, IpSearch.java:41-177):
  *
  * {{{
  * header  16 B : firstIndexOffset u32LE | lastIndexOffset u32LE
  *                | prefixStartOffset u32LE | prefixEndOffset u32LE
  * content      : UTF-8 region strings, attributes '|'-separated
  *                (offsets are ABSOLUTE u24 → content must sit < 16 MiB)
  * index        : 12 B records — startIp u32LE | endIp u32LE
  *                | contentOffset u24LE | contentLength u8 — sorted by startIp
  * prefix       : 9 B groups — firstOctet u8 | firstIndex u32LE | lastIndex
  *                u32LE — the reference's first-octet jump table
  * }}}
  *
  * [[write]] produces a conforming file (content deduplicated, prefix table
  * derived); the scan path lives in [[GeoDatSource]]. The reference ships
  * this file as an opaque blob and linear-loads it per executor; here it is
  * a first-class table.
  */
object GeoDat {

  /** (start_ip, end_ip, 11 region attributes — [[graft.dns.Dims.geoAttrs]]
    * order: continent, country, province, city, district, operator,
    * admin_code, en_name, iso_code, lon, lat). */
  val attrNames: Seq[String] = graft.dns.Dims.geoAttrs

  val schema: StructType = StructType(
    StructField("start_ip", LongType, nullable = false) +:
    StructField("end_ip", LongType, nullable = false) +:
    attrNames.map(StructField(_, StringType, nullable = true)))

  final case class Header(firstIndex: Long, lastIndex: Long,
                          prefixStart: Long, prefixEnd: Long) {
    def recordCount: Int = ((lastIndex - firstIndex) / 12 + 1).toInt
  }

  def readHeader(buf: ByteBuffer): Header = {
    def u32(pos: Int): Long = {
      val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      b.getInt(pos) & 0xFFFFFFFFL
    }
    Header(u32(0), u32(4), u32(8), u32(12))
  }

  /** Record `i` (0-based) of the index area: (startIp, endIp, contentOffset,
    * contentLength). */
  def record(buf: ByteBuffer, header: Header, i: Int): (Long, Long, Int, Int) = {
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val off = header.firstIndex.toInt + i * 12
    val start = b.getInt(off) & 0xFFFFFFFFL
    val end = b.getInt(off + 4) & 0xFFFFFFFFL
    val cOff = (b.get(off + 8) & 0xFF) | ((b.get(off + 9) & 0xFF) << 8) |
      ((b.get(off + 10) & 0xFF) << 16)
    val cLen = b.get(off + 11) & 0xFF
    (start, end, cOff, cLen)
  }

  def content(buf: ByteBuffer, offset: Int, length: Int): String = {
    val bytes = new Array[Byte](length)
    val b = buf.duplicate()
    b.position(offset); b.get(bytes)
    new String(bytes, StandardCharsets.UTF_8)
  }

  /** Write `rows` = (startIp, endIp, attrs) as one .dat file. Rows are
    * sorted by startIp; identical attr tuples share one content entry. */
  def write(rows: Seq[(Long, Long, Seq[String])], path: String): Unit = {
    val sorted = rows.sortBy(_._1)
    val contents = new java.util.LinkedHashMap[String, Integer]()
    var contentLen = 0
    val encoded = sorted.map { case (s, e, attrs) =>
      val str = attrs.mkString("|")
      val bytes = str.getBytes(StandardCharsets.UTF_8)
      require(bytes.length <= 255, s"region string too long: $str")
      val off = contents.computeIfAbsent(str, { _ =>
        val o = 16 + contentLen; contentLen += bytes.length; Integer.valueOf(o)
      })
      (s, e, off.intValue(), bytes.length)
    }
    require(16 + contentLen < (1 << 24),
      "content area exceeds the format's 16 MiB u24 offset space")
    val firstIndex = 16 + contentLen
    val n = encoded.length
    val prefixGroups = encoded.zipWithIndex
      .flatMap { case ((s, e, _, _), i) => ((s >> 24).toInt to (e >> 24).toInt).map(p => (p, i)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, is) => (p, is.map(_._2).min, is.map(_._2).max) }
    val prefixStart = firstIndex + 12 * n
    val total = prefixStart + 9 * prefixGroups.length
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, firstIndex)
    buf.putInt(4, firstIndex + 12 * (n - 1))
    buf.putInt(8, prefixStart)
    buf.putInt(12, prefixStart + 9 * (prefixGroups.length - 1))
    contents.forEach { (str, off) =>
      val bytes = str.getBytes(StandardCharsets.UTF_8)
      buf.position(off.intValue()); buf.put(bytes); ()
    }
    encoded.zipWithIndex.foreach { case ((s, e, cOff, cLen), i) =>
      val off = firstIndex + i * 12
      buf.putInt(off, s.toInt)
      buf.putInt(off + 4, e.toInt)
      buf.put(off + 8, (cOff & 0xFF).toByte)
      buf.put(off + 9, ((cOff >> 8) & 0xFF).toByte)
      buf.put(off + 10, ((cOff >> 16) & 0xFF).toByte)
      buf.put(off + 11, cLen.toByte)
    }
    prefixGroups.zipWithIndex.foreach { case ((p, lo, hi), k) =>
      val off = prefixStart + k * 9
      buf.put(off, p.toByte)
      buf.putInt(off + 1, lo)
      buf.putInt(off + 5, hi)
    }
    Files.write(Paths.get(path), buf.array())
    ()
  }

  /** Memory-map a .dat file read-only. */
  def mmap(path: String): ByteBuffer = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
    finally ch.close()
  }
}
