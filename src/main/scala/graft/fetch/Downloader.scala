package graft.fetch

import java.io.{File, FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S6: per-row fetch source (reference `utils.py:76-131`) re-expressed as a
  * partition-parallel `mapPartitions` operator.
  *
  * Scale design (R1): the reference fans out a 24-thread pool on one
  * machine; here each Spark task downloads its partition's rows with a
  * reused connection budget, so fan-out = number of partitions × executors
  * — `repartition(n)` is the knob, and no driver-side coordination exists.
  *
  * Fault model (R4): every failure — bad URL, HTTP error, IO error — yields
  * a null `image_path`, never an exception, so task retries are idempotent
  * and the downstream null-drop (F3, `wikicaps_etl_pipeline.py:93-97`)
  * keeps counts correct. Existing target files are skipped
  * (`utils.py:84-86`), making re-runs incremental.
  *
  * Two-tier URL fallback mirrors `utils.py:106-117`: try the md5-sharded
  * upload URL, then the Special:FilePath redirect. Tests run with `file://`
  * fixture URLs — no network in CI.
  */
object Downloader {

  val UserAgent =
    "graft-etl/0.1 (research pipeline; polite per-partition fetching)"

  /** Build the two candidate URLs for a wikimedia file name
    * (`utils.py:46-61`): normalized name, md5 shard `a/ab/`. */
  def candidateUrls(wikimediaFile: String): Seq[String] = {
    val stripped = wikimediaFile.replaceFirst("^(File|Image):", "")
      .replace(' ', '_')
    val name =
      if (stripped.isEmpty) stripped
      else stripped.substring(0, 1).toUpperCase(java.util.Locale.ROOT) +
        stripped.substring(1)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val enc = java.net.URLEncoder.encode(name, "UTF-8")
      .replace("+", "%20")
    Seq(
      s"https://upload.wikimedia.org/wikipedia/commons/" +
        s"${digest.substring(0, 1)}/${digest.substring(0, 2)}/$enc",
      s"https://commons.wikimedia.org/wiki/Special:FilePath/$enc")
  }

  private def fetchOne(url: String, dest: File): Boolean = {
    var in: InputStream = null
    try {
      val uri = new URI(url)
      if (uri.getScheme == "file") {
        in = uri.toURL.openStream()
      } else {
        val conn = uri.toURL.openConnection()
          .asInstanceOf[HttpURLConnection]
        conn.setRequestProperty("User-Agent", UserAgent)
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        conn.setInstanceFollowRedirects(true)
        if (conn.getResponseCode >= 400) return false
        in = conn.getInputStream
      }
      val out = new FileOutputStream(dest)
      try in.transferTo(out) finally out.close()
      true
    } catch {
      case _: Exception =>
        if (dest.exists()) dest.delete()
        false
    } finally if (in != null) in.close()
  }

  /** Attach `image_path` (null on failure) by downloading each row's file.
    *
    * @param urlsFor  row's file name → candidate URLs in priority order
    *                 (injectable so tests use `file://` fixtures)
    */
  def withImagePath(df: DataFrame, idCol: String, fileCol: String,
                    destDir: String, fmt: String = "jpg",
                    urlsFor: String => Seq[String] = candidateUrls)
  : DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("image_path", StringType, nullable = true))
    val idIdx = df.schema.fieldIndex(idCol)
    val fileIdx = df.schema.fieldIndex(fileCol)
    val fetcher = urlsFor // serialize the function, not this object graph
    val fmtLocal = fmt
    val destLocal = destDir
    val rdd = df.rdd.mapPartitions { it =>
      // one task = one partition = one polite sequential fetcher (R1);
      // JVM-level connection keep-alive is reused across rows in the task
      val dir = new File(destLocal)
      dir.mkdirs()
      it.map { row =>
        val id = row.get(idIdx)
        val name = if (row.isNullAt(fileIdx)) null else row.getString(fileIdx)
        // filename pattern wikicaps_{id}.{fmt} (utils.py:83)
        val dest = new File(dir, s"wikicaps_$id.$fmtLocal")
        val path: String =
          if (name == null) null
          else if (dest.exists()) dest.getAbsolutePath // skip-if-exists R3
          else if (fetcher(name).exists(u => fetchOne(u, dest)))
            dest.getAbsolutePath
          else null
        Row.fromSeq(row.toSeq :+ path)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
