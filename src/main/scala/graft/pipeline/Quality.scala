package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/dbt-test
  * shape): assert row-level predicates and key uniqueness over a
  * table, get back one row per constraint with exact violation counts
  * — the contract gate a training-data pipeline runs before
  * publishing a snapshot.
  *
  * Scale shape: ALL row-level assertions evaluate in ONE scan and one
  * wide aggregation (a column per check — the q121 profiling
  * discipline); each uniqueness check adds one count-distinct
  * aggregate over its key struct. Output is stacked from the single
  * aggregated row, so nothing after the scan is data-sized.
  */
object Quality {

  /** Run `assertions` (name → boolean SQL over the row; NULL counts as
    * a violation — a null-valued predicate cannot certify the row) and
    * `uniqueKeys` (name → key columns whose combinations must be
    * unique; violations = rows − distinct keys). Output:
    * (check, n_rows, violations, pass) per constraint.
    */
  def checkConstraints(df: DataFrame, assertions: Seq[(String, String)],
                       uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    val n = count(lit(1)).as("__n")
    val vioAggs = assertions.map { case (name, sql) =>
      sum(when(expr(sql) === true, 0L).otherwise(1L)).as(s"__v_$name")
    }
    val uniqAggs = uniqueKeys.map { case (name, cols) =>
      countDistinct(struct(cols.map(col): _*)).as(s"__u_$name")
    }
    val row = df.agg(n, vioAggs ++ uniqAggs: _*)
    val stacked = assertions.map { case (name, _) =>
      (name, col(s"__v_$name"))
    } ++ uniqueKeys.map { case (name, _) =>
      (name, col("__n") - col(s"__u_$name"))
    }
    val pairs = stacked.map { case (name, vio) =>
      struct(lit(name).as("check"), vio.cast("long").as("violations"))
    }
    row.select(col("__n"), explode(array(pairs: _*)).as("c"))
      .select(col("c.check").as("check"), col("__n").as("n_rows"),
        col("c.violations").as("violations"),
        (col("c.violations") === 0L).as("pass"))
  }
}
