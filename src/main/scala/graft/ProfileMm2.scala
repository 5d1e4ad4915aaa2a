package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interleaved same-JVM A/B for the r17 mm2 codec change — OLD = the
  * pre-r17 render/decode inlined verbatim (per-pixel setRGB fill, JDK
  * default disk-backed ImageIO stream cache), NEW = the library path
  * (bulk raster fill + memory stream cache). Both arms run the full mm2
  * shape (render solid PNGs from `documents`, decode them back) and print
  * a value fingerprint beside the seconds. The OLD arm restores
  * `ImageIO.setUseCache(true)` before each rep because the library path
  * flips the JVM-global flag off. */
object ProfileMm2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d)
    def inputs: DataFrame = docs.select(
      col("doc_id").cast("long"),
      (col("n_chars") % 32 + 1).cast("int").as("w"),
      (col("n_chars") % 16 + 1).cast("int").as("h"),
      ((col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256 +
        col("doc_id") * 13 % 256).cast("int").as("rgb"))

    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))

    // pre-r17 form, inlined: setRGB pixel loop + default disk stream cache
    def oldForm: DataFrame = {
      val rdd = inputs.rdd.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(true) // the JDK default
        it.map { r =>
          val (w, h, rgb) = (math.max(1, r.getInt(1)), math.max(1, r.getInt(2)),
            r.getInt(3))
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val bytes = bos.toByteArray
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val rowBuf = new Array[Int](dec.getWidth)
          var sum = 0.0
          var yy = 0
          while (yy < dec.getHeight) {
            dec.getRGB(0, yy, dec.getWidth, 1, rowBuf, 0, dec.getWidth)
            var xx = 0
            while (xx < dec.getWidth) {
              val p = rowBuf(xx)
              sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
                0.114 * (p & 0xff)
              xx += 1
            }
            yy += 1
          }
          Row(r.getLong(0), dec.getWidth, dec.getHeight,
            sum / math.max(1, dec.getWidth * dec.getHeight))
        }
      }
      spark.createDataFrame(rdd, outSchema)
    }

    // the library path (r17): renderSolidPng + decodeImageFeatures
    def newForm: DataFrame = {
      import graft.operators.Multimodal
      val media = Multimodal.renderSolidPng(docs,
        col("doc_id"),
        col("n_chars") % 32 + 1,
        col("n_chars") % 16 + 1,
        (col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256 +
          col("doc_id") * 13 % 256)
      Multimodal.decodeImageFeatures(media)
        .filter(col("decode_ok"))
        .select(col("media_id"), col("width"), col("height"), col("mean_luma"))
    }

    def fingerprint(df: DataFrame): String = {
      val r = df.agg(count(lit(1)), sum(col("width")), sum(col("height")),
        sum(round(col("mean_luma"), 6))).collect()(0)
      s"n=${r.get(0)} w=${r.get(1)} h=${r.get(2)} luma=${r.get(3)}"
    }

    def run(tag: String, f: => DataFrame): Unit = {
      System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[prof] $tag%-6s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    println("[prof] parity OLD: " + fingerprint(oldForm))
    println("[prof] parity NEW: " + fingerprint(newForm))
    run("warmO", oldForm); run("warmN", newForm)
    (1 to 4).foreach { i => run(s"old$i", oldForm); run(s"new$i", newForm) }
    spark.stop()
  }
}
