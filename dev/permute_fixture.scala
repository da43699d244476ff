import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
val outDir = "/root/repo/target/permuted_sf001"
Files.createDirectories(Paths.get(outDir))
val tables = Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
for (t <- tables) {
  val raw = spark.read.parquet(s"/root/testdata/sf0.01/$t.parquet")
  val df =
    if (t == "events" && raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)"))
    else raw
  val key = xxhash64(concat_ws("|", df.columns.map(c => col(c).cast("string")).toSeq: _*))
  val tmp = s"$outDir/__tmp_$t"
  df.orderBy(key).coalesce(1).write.mode("overwrite").parquet(tmp)
  val part = Files.list(Paths.get(tmp)).iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
  Files.move(part, Paths.get(outDir, s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
  Files.walk(Paths.get(tmp)).iterator().asScala.toVector.reverse.foreach(Files.deleteIfExists(_))
  println(s"PERMUTED $t")
}
sys.exit(0)
