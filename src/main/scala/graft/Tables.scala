package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loader over a scale-factor directory.
  *
  * The reference's equivalent is the persistent catalog of Arrow tables
  * (reference src/catalog/Catalog.cpp, include/lingodb/runtime/storage/LingoDBTable.h:12-40);
  * on Spark the idiomatic form is a columnar datasource scan — Catalyst pushes
  * filters and prunes columns into the parquet reader, which is the moral
  * equivalent of LingoDB's scan-with-restriction
  * (relalg.basetable, reference include/lingodb/compiler/Dialect/RelAlg/IR/RelAlgOps.td:120-130).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table of a scale-factor dir as a temp view (for the
    * SQL-entry surface, mirroring the reference's `Connection.sql`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
