package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Extension → MIME type inference (reference: `fs.rs:55-58`, `s3.rs:110-112`
  * use the `mime_guess` crate; our table is the common subset of the
  * de-facto-standard Apache httpd mime.types mapping).
  *
  * Implemented as a literal map column (`typedlit`) + `element_at` lookup —
  * pure Catalyst expressions, codegen-friendly, no UDF. The map is embedded
  * in the plan (equivalent to a broadcast of a ~40-entry dim), so the lookup
  * costs a hash probe per row with zero shuffle at any scale.
  */
object Mime {
  val byExt: Map[String, String] = Map(
    "txt" -> "text/plain", "text" -> "text/plain", "log" -> "text/plain",
    "html" -> "text/html", "htm" -> "text/html", "css" -> "text/css",
    "csv" -> "text/csv", "md" -> "text/markdown", "xml" -> "application/xml",
    "json" -> "application/json", "jsonl" -> "application/json",
    "yaml" -> "application/yaml", "yml" -> "application/yaml",
    "pdf" -> "application/pdf", "zip" -> "application/zip",
    "gz" -> "application/gzip", "tar" -> "application/x-tar",
    "bz2" -> "application/x-bzip2", "xz" -> "application/x-xz",
    "7z" -> "application/x-7z-compressed",
    "js" -> "text/javascript", "mjs" -> "text/javascript",
    "wasm" -> "application/wasm", "bin" -> "application/octet-stream",
    "exe" -> "application/x-msdownload",
    "doc" -> "application/msword",
    "xls" -> "application/vnd.ms-excel",
    "ppt" -> "application/vnd.ms-powerpoint",
    "png" -> "image/png", "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg",
    "gif" -> "image/gif", "webp" -> "image/webp", "svg" -> "image/svg+xml",
    "bmp" -> "image/bmp", "tif" -> "image/tiff", "tiff" -> "image/tiff",
    "mp3" -> "audio/mpeg", "wav" -> "audio/wav", "flac" -> "audio/flac",
    "ogg" -> "audio/ogg", "mp4" -> "video/mp4", "webm" -> "video/webm",
    "avi" -> "video/x-msvideo", "mov" -> "video/quicktime",
    "woff" -> "font/woff", "woff2" -> "font/woff2", "ttf" -> "font/ttf",
  )

  /** Lowercased final extension, null when the name has no dot (matching
    * `mime_guess::from_path(...).first()` returning None). */
  def extOf(filename: Column): Column =
    when(filename.contains("."), lower(substring_index(filename, ".", -1)))

  /** MIME type or null for unknown/missing extensions. */
  def mimeOf(filename: Column): Column = {
    val e = extOf(filename)
    when(e.isNotNull, element_at(typedlit(byExt), e))
  }

  /** Scala-side lookup for use outside a plan (e.g. listing enrichment). */
  def lookup(filename: String): Option[String] = {
    val i = filename.lastIndexOf('.')
    if (i < 0) None else byExt.get(filename.substring(i + 1).toLowerCase)
  }
}
