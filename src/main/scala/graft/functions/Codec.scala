package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Wire codec for the ingest path (reference semantics S2/F1).
  *
  * The producer writes newline-delimited `base64(gzip(json))`
  * (`wifi-scan-ingestion/.../service/MessageTransformationService.java:64-103`);
  * the transformer decodes with failures dropped, never failing the batch
  * (`wifi-measurements-transformer-service/.../service/DataDecodingService.java:47-51,76-108`).
  *
  * base64 enc/dec are Spark built-ins (codegen'd); gzip needs a UDF — the one
  * non-codegen hop in the ingest chain. It is applied once per raw line
  * immediately after the scan, before any shuffle, so at scale its cost is
  * bounded by source I/O, not by data movement.
  */
object Codec {
  private def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def gunzipBytes(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Driver-side helper for building test fixtures: json -> base64(gzip(json)). */
  def encodeLine(json: String): String =
    java.util.Base64.getEncoder.encodeToString(gzipBytes(json.getBytes(StandardCharsets.UTF_8)))

  private val encodeUdf = udf { (json: String) =>
    if (json == null) null else encodeLine(json)
  }

  /** S2 producer side as a column: json -> base64(gzip(json)). */
  def encodeLineCol(json: Column): Column = encodeUdf(json)

  private val decodeUdf = udf { (line: String) =>
    if (line == null) null
    else
      try {
        // Base64 decoded inside the UDF: Spark's `unbase64` raises on
        // malformed input, but F1 semantics are drop-not-fail.
        val bytes = java.util.Base64.getDecoder.decode(line)
        new String(gunzipBytes(bytes), StandardCharsets.UTF_8)
      } catch { case _: Exception => null } // F1: malformed input dropped, not fatal
  }

  /** base64(gzip(utf8)) line -> json string, or NULL on any decode failure. */
  def decodeLine(line: Column): Column = decodeUdf(line)
}
