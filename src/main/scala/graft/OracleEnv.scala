package graft

/** The sfDir whose per-sfDir persisted index stores the deterministic
  * ANN replay oracles reference ([[graft.queries.VectorQueries]]):
  * given materialized centroids and a cell-assigned store, an IVF
  * probe is DETERMINISTIC — cell ranking + within-cell exact top-k —
  * so the DuckDB oracle can replay it over the same parquet the
  * engine wrote (the store carries `centroid_id`; the packed sidecars
  * carry bit-exact binary16/SQ8 codes).
  *
  * [[Verify]] sets this from its CLI arg BEFORE dumping
  * oracle_sql.json, so the emitted SQL's read_parquet paths point at
  * the stores the just-run queries built. Oracle SQL is rebuilt on
  * every [[SparkEntry.oracleSql]] call (the defs maps are defs, not
  * vals), so the assignment order is the only contract.
  */
object OracleEnv {
  @volatile var sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
}
