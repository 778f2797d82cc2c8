package object graft {
  /** Signature of every graded query: (session, scale-factor dir) => result.
    * The driver calls these with sf0.001 (smoke), sf0.01 (oracle), sf0.1
    * (bench) — implementations must read only from `sfDir`. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
