package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5: the API's startup synthetic products generator
  * (`/root/reference/api.py:589-607`): 100 rows —
  * id 1..100, name "Product i", price round(10+0.5i, 2),
  * category by i%3 (0→Electronics, 1→Books, else Clothing),
  * in_stock = i even. Declarative `spark.range` — generation itself is
  * distributed and scales to arbitrary row counts for test fixtures.
  */
object Synthetic {
  def products(spark: SparkSession, n: Long = 100): DataFrame =
    spark.range(1, n + 1).toDF("id").select(
      col("id"),
      concat(lit("Product "), col("id")).as("name"),
      round(lit(10.0) + col("id") * 0.5, 2).as("price"),
      when(col("id") % 3 === 0, "Electronics")
        .when(col("id") % 3 === 1, "Books")
        .otherwise("Clothing").as("category"),
      (col("id") % 2 === 0).as("in_stock"))

  /** Startup hook shape (api.py:592-607): write CSV only if absent. */
  def ensureProductsCsv(spark: SparkSession, path: String): Unit = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Load.writeCsv(products(spark), path, singleFile = true)
  }
}
