package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.roaringbitmap.longlong.Roaring64NavigableMap

/**
 * Minimal native reader/writer for the Puffin file format (the Iceberg
 * project's sidecar format for stats and deletion vectors;
 * https://iceberg.apache.org/puffin-spec/) and the format-v3
 * `deletion-vector-v1` blob type (Iceberg table spec v3, "Position
 * Delete Vectors"). Zero external jars: the bitmap is
 * `org.roaringbitmap.longlong.Roaring64NavigableMap` (already on
 * Spark's classpath) in its PORTABLE serialization — the exact layout
 * the Iceberg spec mandates (little-endian 8-byte bitmap count, then
 * per 32-bit bucket a 4-byte key + standard roaring serialization).
 *
 * Puffin layout (all we need of v1):
 *   Magic | Blob_1 … Blob_n | Footer
 *   Footer = Magic | FooterPayload (UTF-8 JSON) |
 *            FooterPayloadSize (4 bytes LE) | Flags (4 bytes) | Magic
 * We always write UNCOMPRESSED footer payloads (flags = 0) and reject
 * the compressed flag on read (fail-fast — this writer never produces
 * it, and a foreign lz4-framed footer would need an lz4 codec).
 *
 * `deletion-vector-v1` blob layout (spec v3):
 *   length of magic+vector (4 bytes BIG-endian) |
 *   magic 0xD1 0xD3 0x39 0x64 | portable Roaring64 vector |
 *   CRC-32 of magic+vector (4 bytes BIG-endian)
 * Blob metadata carries `referenced-data-file` and `cardinality`
 * properties; its snapshot-id / sequence-number are -1 (the commit they
 * belong to is unknown at blob-write time — the manifest entry, not the
 * puffin footer, is authoritative).
 */
object PuffinIO {

  private val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // "PFA1"
  private val DvMagic: Array[Byte] = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)
  val DvBlobType = "deletion-vector-v1"

  private val mapper = new ObjectMapper()

  final case class BlobMeta(blobType: String, offset: Long, length: Long,
                            properties: Map[String, String],
                            fields: Seq[Int] = Nil)

  /** One blob to write: type + payload bytes + footer properties +
    * the schema field ids the blob describes (spec blob metadata
    * `fields` — empty for deletion vectors, the stats-blob convention
    * is one source field per NDV blob). */
  final case class Blob(blobType: String, payload: Array[Byte],
                        properties: Map[String, String],
                        fields: Seq[Int] = Nil)

  /** graft's exact-NDV statistics blob (custom type — the spec lets
    * readers skip unknown blob types; the standard theta-sketch type
    * requires the DataSketches library, which a zero-dependency engine
    * deliberately avoids): payload = 8-byte LITTLE-ENDIAN distinct
    * count + CRC-32 (BE) over those 8 bytes, `ndv` repeated in the blob
    * properties (the spec's convention for stats consumers that never
    * open payloads). */
  val NdvBlobType = "graft-ndv-exact-v1"

  def ndvPayload(ndv: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12)
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(ndv)
    val crc = new java.util.zip.CRC32()
    crc.update(bb.array(), 0, 8)
    bb.order(java.nio.ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt)
    bb.array()
  }

  def parseNdvPayload(bytes: Array[Byte]): Long = {
    require(bytes.length == 12, s"ndv blob must be 12 bytes, got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ndv = bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val stored = bb.order(java.nio.ByteOrder.BIG_ENDIAN).getInt(8)
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 0, 8)
    require(crc.getValue.toInt == stored,
      f"ndv blob CRC mismatch: stored $stored%08x != computed ${crc.getValue.toInt}%08x")
    ndv
  }

  /** Serialize a position bitmap as a `deletion-vector-v1` blob payload
    * (length + magic + portable vector + crc). */
  def dvPayload(bitmap: Roaring64NavigableMap): Array[Byte] = {
    bitmap.runOptimize()
    val vec = new ByteArrayOutputStream()
    bitmap.serializePortable(new DataOutputStream(vec))
    val vecBytes = vec.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic)
    crc.update(vecBytes)
    val out = java.nio.ByteBuffer.allocate(4 + 4 + vecBytes.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putInt(4 + vecBytes.length) // length of magic + vector
    out.put(DvMagic)
    out.put(vecBytes)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Parse a `deletion-vector-v1` blob payload, validating the length
    * prefix, magic and CRC — corruption fails loudly, never reads as an
    * empty vector. */
  def parseDvPayload(bytes: Array[Byte]): Roaring64NavigableMap = {
    require(bytes.length >= 12, s"deletion-vector blob too short: ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == bytes.length - 8,
      s"deletion-vector length prefix $len != payload ${bytes.length - 8}")
    val magic = new Array[Byte](4); bb.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"bad deletion-vector magic: ${magic.map("%02x".format(_)).mkString}")
    val vecBytes = new Array[Byte](len - 4); bb.get(vecBytes)
    val storedCrc = bb.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vecBytes)
    require(crc.getValue.toInt == storedCrc,
      f"deletion-vector CRC mismatch: stored $storedCrc%08x != computed ${crc.getValue.toInt}%08x")
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(vecBytes)))
    bm
  }

  /** Write a Puffin file holding `blobs`; returns per-blob
    * (offset, length) aligned with the input (offset = the blob's first
    * byte in the file — what the manifest's `content_offset` records). */
  def writePuffin(path: String, blobs: Seq[Blob],
                  snapshotId: Long, seq: Long): Seq[(Long, Long)] = {
    val out = GraftFs.create(path)
    try {
      out.write(Magic)
      var pos = Magic.length.toLong
      val located = blobs.map { b =>
        val off = pos
        out.write(b.payload)
        pos += b.payload.length
        (off, b.payload.length.toLong)
      }
      val payload = mapper.createObjectNode()
      val arr = payload.putArray("blobs")
      blobs.zip(located).foreach { case (b, (off, len)) =>
        val n = arr.addObject()
        n.put("type", b.blobType)
        val fieldsArr = n.putArray("fields")
        b.fields.foreach(fieldsArr.add)
        // DV blobs: the owning commit is the manifest's business
        n.put("snapshot-id", if (b.blobType == DvBlobType) -1L else snapshotId)
        n.put("sequence-number", if (b.blobType == DvBlobType) -1L else seq)
        n.put("offset", off)
        n.put("length", len)
        val props = n.putObject("properties")
        b.properties.foreach { case (k, v) => props.put(k, v) }
      }
      payload.putObject("properties").put("created-by", "graft")
      val payloadBytes = payload.toString.getBytes(UTF_8)
      out.write(Magic)
      out.write(payloadBytes)
      val tail = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payloadBytes.length)
      tail.putInt(0) // flags: footer payload uncompressed
      out.write(tail.array())
      out.write(Magic)
      located
    } finally out.close()
  }

  /** Read the footer's blob metadata. */
  def readFooter(path: String,
                 conf: org.apache.hadoop.conf.Configuration = GraftFs.conf())
      : Seq[BlobMeta] = {
    val len = GraftFs.status(path, conf).map(_.getLen).getOrElse(
      throw new java.io.FileNotFoundException(path))
    val in = GraftFs.openSeekable(path, conf)
    try {
      def readAt(off: Long, n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        in.seek(off)
        var got = 0
        while (got < n) {
          val r = in.read(b, got, n - got)
          require(r >= 0, s"unexpected EOF reading $path at $off")
          got += r
        }
        b
      }
      val tail = readAt(len - 12, 12)
      val bb = java.nio.ByteBuffer.wrap(tail).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      val magic = java.util.Arrays.copyOfRange(tail, 8, 12)
      require(java.util.Arrays.equals(magic, Magic),
        s"not a Puffin file (bad trailing magic): $path")
      require((flags & 1) == 0,
        s"compressed Puffin footer payload not supported: $path")
      val head = readAt(0, 4)
      require(java.util.Arrays.equals(head, Magic),
        s"not a Puffin file (bad leading magic): $path")
      val payload = readAt(len - 12 - payloadSize, payloadSize)
      val root = mapper.readTree(new String(payload, UTF_8))
      import scala.jdk.CollectionConverters._
      Option(root.get("blobs")).toSeq
        .flatMap(_.elements().asScala)
        .map { n =>
          val props = Option(n.get("properties")).map { p =>
            p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty[String, String])
          val fields = Option(n.get("fields")).toSeq
            .flatMap(_.elements().asScala).map(_.asInt()).toSeq
          BlobMeta(n.get("type").asText(), n.get("offset").asLong(),
            n.get("length").asLong(), props, fields)
        }.toSeq
    } finally in.close()
  }

  /** Byte size of the file's FOOTER (FooterMagic + payload + size +
    * flags + Magic) — what the table metadata's statistics entry records
    * as `file-footer-size-in-bytes`. */
  def footerSize(path: String,
                 conf: org.apache.hadoop.conf.Configuration = GraftFs.conf())
      : Long = {
    val len = GraftFs.status(path, conf).map(_.getLen).getOrElse(
      throw new java.io.FileNotFoundException(path))
    val in = GraftFs.openSeekable(path, conf)
    try {
      val b = new Array[Byte](4)
      in.seek(len - 12)
      var got = 0
      while (got < 4) {
        val r = in.read(b, got, 4 - got)
        require(r >= 0, s"unexpected EOF reading $path"); got += r
      }
      val payloadSize = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      payloadSize.toLong + 16L // Magic + payload + size(4) + flags(4) + Magic
    } finally in.close()
  }

  /** Read `length` raw blob bytes at `offset` — the manifest-driven
    * access path (content_offset / content_size_in_bytes), no footer
    * parse needed. */
  def readBlobBytes(path: String, offset: Long, length: Long,
                    conf: org.apache.hadoop.conf.Configuration = GraftFs.conf())
      : Array[Byte] = {
    require(length <= Int.MaxValue, s"blob too large: $length")
    val in = GraftFs.openSeekable(path, conf)
    try {
      val b = new Array[Byte](length.toInt)
      in.seek(offset)
      var got = 0
      while (got < length.toInt) {
        val r = in.read(b, got, length.toInt - got)
        require(r >= 0, s"unexpected EOF reading $path at $offset")
        got += r
      }
      b
    } finally in.close()
  }

  /** Executor-side per-file bitmap build: fold one file's positions
    * into a portable-serialized bitmap (object-level so Dataset lambdas
    * calling it capture nothing). Returns (key, portable bytes,
    * cardinality). */
  def bitmapBytesOf(key: String, positions: Iterator[Long])
      : (String, Array[Byte], Long) = {
    val bm = new Roaring64NavigableMap()
    positions.foreach(bm.addLong)
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serializePortable(new DataOutputStream(bos))
    (key, bos.toByteArray, bm.getLongCardinality)
  }

  def bitmapFromPortable(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** Convenience: the deletion vector for one manifest entry. */
  def readDv(path: String, offset: Long, length: Long,
             conf: org.apache.hadoop.conf.Configuration = GraftFs.conf())
      : Roaring64NavigableMap =
    parseDvPayload(readBlobBytes(path, offset, length, conf))
}
