package graft

import org.apache.spark.sql.DataFrame

/** Side-channel inputs for the DuckDB correctness oracle.
  *
  * The driver's compare registers only the sfDir parquet files as views, but
  * SQL can `read_parquet()` absolute paths. Queries whose inputs are
  * synthesized inside the query (the crawl pipeline, the mutated near-dup
  * corpora) dump those inputs here during Verify, and their oracle SQL
  * recomputes the result from the SAME bytes — closing the `no_oracle` gap
  * without the driver needing write access to the testdata dir.
  *
  * The dir lives under the repo's target/ (never the read-only testdata).
  */
object OracleAux {

  val dir: String = "/root/repo/target/verify_aux"

  /** Overwrite-dump a DataFrame as parquet under dir/name; returns path. */
  def dump(df: DataFrame, name: String): String = {
    val path = s"$dir/$name"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  /** DuckDB table expression for a dumped input. */
  def rp(name: String): String = s"read_parquet('$dir/$name/*.parquet')"
}
