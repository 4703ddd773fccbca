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

  /** Overwrite-dump a DataFrame as parquet under dir/name; returns path.
    *
    * `repartition(1)` (not `coalesce(1)`): coalesce folds the ENTIRE
    * upstream computation into the single writing task — the dumped
    * pipelines (simhash, k-gram hashing, PNG/WAV synthesis) were running
    * one-core. A repartition keeps the upstream at full parallelism and
    * only the (small) write is single-task; the oracle reads a `*.parquet`
    * glob and always re-orders, so file layout is free to change.
    */
  def dump(df: DataFrame, name: String): String = {
    val path = s"$dir/$name"
    df.repartition(1).write.mode("overwrite").parquet(path)
    path
  }

  /** DuckDB table expression for a dumped input. */
  def rp(name: String): String = s"read_parquet('$dir/$name/*.parquet')"
}
