package object graft {
  /** A declared operator query: (session, sf-dir) => result.
    * The driver hash-compares the result against `oracleSql` run by DuckDB
    * over the same parquet (SURVEY §0 "verification contract").
    */
  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame
}
