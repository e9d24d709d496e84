package graft

import graft.tables.{CatalogOps, TableSpec}

class CatalogSpec extends SparkSpec {

  test("namespace create/use + spec'd DDL + managed table round trip") {
    import spark.implicits._
    CatalogOps.ensureNamespace(spark, "graft_test_ns")
    try {
      // DDL emission executes against the session catalog
      CatalogOps.createTable(spark, TableSpec.salesCurrent)
      assert(spark.catalog.tableExists("graft_test_ns.sales_current"))
      assert(spark.table("sales_current").schema == TableSpec.salesCurrent.schema)
      // idempotent (IF NOT EXISTS)
      CatalogOps.createTable(spark, TableSpec.salesCurrent)
      // the partitioned SCD2 spec's DDL must also execute
      CatalogOps.createTable(spark, TableSpec.salesScd2)
      assert(spark.catalog.tableExists("graft_test_ns.sales_scd2"))

      val back = CatalogOps.saveAndRead(spark,
        Seq((1, "x"), (2, "y")).toDF("id", "v"), "graft_test_ns.roundtrip")
      assert(back.count() == 2)
    } finally {
      spark.sql("DROP NAMESPACE IF EXISTS graft_test_ns CASCADE")
      spark.sql("USE default")
    }
  }
}
