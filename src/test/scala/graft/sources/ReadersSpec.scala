package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class ReadersSpec extends SparkSpec {

  test("S1: wikicaps delimited scan with ||| separator, unicode intact") {
    val dir = Files.createTempDirectory("wikicaps").toFile
    val f = new java.io.File(dir, "raw.txt")
    Files.writeString(f.toPath,
      "1|||File:Malham Cove (5841).jpg|||Malham Cove\n" +
        "4|||File:Ulme Schöneiche.JPG|||Elm at Schöneiche; more than 100 " +
        "years old avenue tree.\n" +
        "9|||File:x.png|||Two sentences here. Second one!\n")
    val df = Readers.wikicaps(spark, f.getAbsolutePath)
    df.columns shouldBe Array("wikicaps_id", "wikimedia_file", "caption")
    val rows = df.orderBy("wikicaps_id").collect()
    rows.length shouldBe 3
    rows(0).getLong(0) shouldBe 1L
    rows(1).getString(2) should include("Schöneiche")
    rows(2).getString(1) shouldBe "File:x.png"
  }

  test("S3: single-char-sep CSV with header (f30k shape)") {
    val dir = Files.createTempDirectory("f30k").toFile
    val f = new java.io.File(dir, "captions.csv")
    Files.writeString(f.toPath,
      "image_id|caption_id|caption\nimg1.jpg|0|A dog runs\nimg1.jpg|1|A dog\n")
    val df = Readers.csv(spark, f.getAbsolutePath, "|")
    df.count() shouldBe 2
    df.columns shouldBe Array("image_id", "caption_id", "caption")
  }

  test("S4: COCO nested JSON flattened to one row per annotation") {
    val dir = Files.createTempDirectory("coco").toFile
    val f = new java.io.File(dir, "captions.json")
    Files.writeString(f.toPath,
      """{"info": {"year": 2014}, "annotations": [
        {"image_id": 10, "id": 100, "caption": "a cat"},
        {"image_id": 10, "id": 101, "caption": "a black cat"},
        {"image_id": 11, "id": 102, "caption": "a dog"}]}""")
    val df = Readers.cocoCaptions(spark, f.getAbsolutePath, "val_2014")
    df.columns shouldBe Array("image_id", "caption_id", "caption", "origin")
    df.count() shouldBe 3
    df.select("origin").distinct().head().getString(0) shouldBe "val_2014"
  }

  test("S1 fault tolerance: short rows yield nulls, not errors (R4)") {
    val dir = Files.createTempDirectory("short").toFile
    val f = new java.io.File(dir, "raw.txt")
    Files.writeString(f.toPath, "1|||only-two-fields\n")
    val rows = Readers.wikicaps(spark, f.getAbsolutePath).collect()
    rows.length shouldBe 1
    rows(0).isNullAt(2) shouldBe true
  }

  test("binaryFiles: opaque payloads byte-exact, glob filters, no driver " +
    "decode") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("binfiles").toFile
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)
    val txt = "not an image".getBytes("UTF-8")
    Files.write(new java.io.File(dir, "a.png").toPath, png)
    Files.write(new java.io.File(dir, "b.png").toPath, png ++ png)
    Files.write(new java.io.File(dir, "c.txt").toPath, txt)
    val all = Readers.binaryFiles(spark, dir.getAbsolutePath)
    all.count() shouldBe 3
    all.schema.fieldNames should contain allOf ("path", "length", "content")
    // glob: only the image payloads, lengths match the file bytes
    val pngs = Readers.binaryFiles(spark, dir.getAbsolutePath,
      Some("*.png")).orderBy("length").collect()
    pngs.length shouldBe 2
    pngs(0).getAs[Array[Byte]]("content") shouldBe png
    pngs(1).getLong(pngs(1).fieldIndex("length")) shouldBe 2L * png.length
    // pairs with ImageOps-style per-row work without collecting payloads
    Readers.binaryFiles(spark, dir.getAbsolutePath, Some("*.png"))
      .select(sum(org.apache.spark.sql.functions.length(col("content"))))
      .head().getLong(0) shouldBe
      3L * png.length
  }

  test("schema evolution: mergeSchema unifies parquet written over time " +
    "with added columns (missing values null, not errors)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    // month 1: two columns; month 2: a quality column was added
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/part1")
    Seq((3L, "c", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/part2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/part1", s"$dir/part2")
    merged.schema.fieldNames.sorted shouldBe
      Array("doc_id", "quality", "text")
    merged.count() shouldBe 3
    merged.filter(col("quality").isNull).count() shouldBe 2 // old rows
    // without mergeSchema the first-listed footer wins: quality invisible
    spark.read.parquet(s"$dir/part1", s"$dir/part2")
      .schema.fieldNames should not contain "quality"
  }

  test("jsonl ingestion: PERMISSIVE mode quarantines malformed lines in " +
    "_corrupt_record instead of failing or dropping (R4 for json)") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      ("""{"doc_id": 1, "text": "fine"}""" + "\n" +
        """{"doc_id": 2 "text": "missing comma"}""" + "\n" +
        """not json at all""" + "\n" +
        """{"doc_id": 4, "text": "also fine"}""" + "\n").getBytes)
    val schema = "doc_id LONG, text STRING, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/docs.jsonl")
      .cache() // corrupt-record queries need the full row materialized
    df.count() shouldBe 4 // nothing dropped, nothing thrown
    df.filter(col("_corrupt_record").isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 4L)
    // the quarantined rows carry the raw line for forensic replay
    df.filter(col("_corrupt_record").isNotNull).count() shouldBe 2
    df.filter(col("_corrupt_record") === "not json at all")
      .count() shouldBe 1
    // FAILFAST is the loud alternative when corruption must halt the run
    intercept[org.apache.spark.SparkException] {
      spark.read.schema("doc_id LONG, text STRING")
        .option("mode", "FAILFAST").json(s"$dir/docs.jsonl").count()
    }
  }

  test("corrupt-file tolerance: ignoreCorruptFiles skips garbage files " +
    "instead of failing the job (R4 at the file level)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corrupt").toString
    Seq((1L, "ok"), (2L, "fine")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    // drop a non-parquet file where the reader will pick it up
    Files.write(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      "this is not parquet".getBytes)
    val saved = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      spark.read.parquet(dir).count() shouldBe 2 // junk skipped
    } finally
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", saved)
    // default posture: corruption is LOUD (fail, don't silently drop)
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
  }

  test("gzip CSV roundtrip: .csv.gz files, exact row-level equality " +
    "incl. quoted commas and embedded quotes (S8 codec path)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gzcsv").toString
    val rows = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "trailing space ")).toDF("id", "text")
    // univocity's WRITER trims leading/trailing field whitespace by
    // default — byte-exact roundtrip needs the preserve options on write
    rows.write.mode("overwrite")
      .option("compression", "gzip").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(dir)
    val parts = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).map(_.getName)
    parts should not be empty
    all(parts) should endWith(".csv.gz")
    val back = spark.read.option("header", "true")
      .schema("id LONG, text STRING").csv(dir)
      .as[(Long, String)].collect().sortBy(_._1)
    back shouldBe rows.as[(Long, String)].collect().sortBy(_._1)
  }
}
