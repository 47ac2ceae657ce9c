package graft.plans

/** Side-channel for oracle-checkable queries whose inputs are seeded
  * (generated) rather than read from the sf tables: the query materializes
  * an auxiliary parquet table here, and its DuckDB oracle reads the
  * table's part files back with an absolute-path `read_parquet` glob.
  *
  * Both the query functions and the oracle SQL strings are produced in the
  * same JVM (graft.Verify dumps `SparkEntry.oracleSql` right after running
  * the queries), so resolving the directory once at class-load time
  * guarantees writer and reader agree on the absolute path.
  *
  * This is what makes the extraction/eval pipeline driver-checkable: the
  * aux table carries the INDEPENDENT second opinion (generator-side golden
  * spans / planted-defect counts), and the driver's hash compare does the
  * verdict — the same role the reference's golden JSON files play in its
  * eval scripts (eval_script_field_level.py:100-102).
  */
object OracleAux {

  val Dir: String = sys.env.getOrElse(
    "GRAFT_AUX_DIR",
    new java.io.File(sys.props("user.dir"), "target/oracle_aux").getAbsolutePath)

  /** Where a query writes aux table `name`. */
  def path(name: String): String = s"$Dir/$name"

  /** How the oracle SQL reads aux table `name` back. */
  def sqlFrom(name: String): String = s"read_parquet('$Dir/$name/*.parquet')"
}
