package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Temp-dir CSV fixtures for the ingestion queries: the testdata is
  * parquet, so the CSV operators (S1/S2/U1) exercise a parquet→CSV→ingest
  * round trip. Everything is derived from the driver tables, so the DuckDB
  * oracle can state the expected result straight off the parquet.
  */
object Fixtures {
  private def tmpRoot: Path = {
    val p = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fixtures")
    Files.createDirectories(p)
    p
  }

  private def freshDir(tag: String, sfDir: String): Path = {
    val p = tmpRoot.resolve(tag + "_" + Integer.toHexString(sfDir.hashCode))
    if (Files.exists(p)) { // clear previous contents
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(p)
    p
  }

  /** Write df as a single named CSV file (header) inside a fresh dir;
    * returns the file path. Uses Spark's CSV writer then renames the
    * single part file — fixture-sized data only.
    */
  def csvFile(df: DataFrame, tag: String, sfDir: String, fileName: String): String = {
    val dir = freshDir(tag, sfDir)
    val stage = dir.resolve("_stage")
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".csv"))
      .getOrElse(sys.error(s"no csv part written under $stage"))
    val target = dir.resolve(fileName)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.walk(stage).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    target.toString
  }

  /** A directory of CSV files (one per (name, frame)), plus a hidden
    * `.junk.csv` that the tolerant dir scan must skip. Returns the dir.
    */
  def csvDir(tag: String, sfDir: String, parts: Seq[(String, DataFrame)]): String = {
    val dir = freshDir(tag, sfDir)
    parts.foreach { case (name, df) =>
      val f = csvFile(df, tag + "_part_" + name, sfDir, name)
      Files.move(Paths.get(f), dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    Files.writeString(dir.resolve(".junk.csv"), "this,is\nnot,read\n")
    dir.toString
  }

  /** A directory with fixed-content files for the file-listing query —
    * byte sizes are deterministic so the oracle can be literal VALUES. */
  def listingDir(sfDir: String): String = {
    val dir = freshDir("listing", sfDir)
    Files.writeString(dir.resolve("a.csv"), "x" * 100)
    Files.writeString(dir.resolve("b.csv"), "y" * 2048)
    Files.writeString(dir.resolve("notes.txt"), "ignored")
    dir.toString
  }
}
