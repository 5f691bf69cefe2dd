package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward (most-recent-prior) as-of join — the time-series join Spark has
  * no built-in operator for: each left row picks up the payload of the right
  * row with the greatest `rightTs <= leftTs` in the same key group.
  *
  * Implemented as the union-marker trick, NOT a range join:
  * both sides are unioned with a side marker, one window pass per key group
  * (ordered by timestamp, right rows sorting before left rows at equal
  * timestamps so the bound is inclusive) forward-fills the right payload with
  * `last(_, ignoreNulls = true)`, and the left rows are filtered back out.
  *
  * Scale shape (the 100 TB contract): exactly ONE shuffle (hash on `keys`)
  * plus a per-partition sort — the same cost as a plain equi-join of the two
  * sides. The naive formulations are strictly worse: a theta-join on
  * `l.ts >= r.ts` is a per-key cartesian (|L|·|R| comparisons per key), and a
  * "max timestamp per left row" correlated aggregate is a second shuffle plus
  * a re-join. Key skew (one giant key group) is the same skew a groupBy on
  * `keys` would have — AQE or salting applies unchanged.
  *
  * Contract: `right` must be unique per (`keys`, `rightTs`) — pre-aggregate
  * it otherwise (two right rows at the identical timestamp have no "latest"
  * and would be picked by partition order). Left rows with a NULL timestamp
  * sort before every right row and emit NULL payloads; right rows with a
  * NULL timestamp are dropped (they satisfy no `rightTs <= leftTs`).
  * Payload names (and their `prefix`ed forms) must not collide with left
  * columns — enforced by `require`. A NULL in a right
  * payload column reads as "no value here" — the fill skips it and carries
  * the previous non-null (coalesce payloads on the right side first if NULL
  * must be a real value).
  */
object AsOfJoin {

  /** `left` with `payload` columns (renamed `prefix`+name) copied from the
    * latest `right` row at-or-before each left row's `leftTs`; left rows with
    * no prior right row keep NULL payloads (left-outer semantics).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload columns")
    val leftCols = left.columns.toSeq
    // name-collision guards: a payload name already on the left would give
    // the union schema duplicate columns, and an existing `prefix+payload`
    // column would be silently overwritten by the fill — both corrupt
    // output with no error (e.g. re-running backward() on its own output).
    payload.foreach { p =>
      require(!leftCols.contains(p),
        s"payload column '$p' already exists on the left side")
      require(!leftCols.contains(prefix + p),
        s"output column '$prefix$p' already exists on the left side")
    }
    (Seq("__t", "__side") ++ payload.map(prefix + _)).foreach { c =>
      require(!keys.contains(c), s"key column '$c' collides with internals")
    }
    // the union schema: keys ++ __t ++ __side ++ left-only cols ++ payload
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    require(!leftOnly.contains("__t") && !leftOnly.contains("__side"),
      "left columns '__t'/'__side' collide with as-of internals")
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side")) ++
        leftOnly.map(col) ++
        payload.map(p => lit(null).as(p)): _*)
    // a right row with a NULL timestamp satisfies no `rightTs <= leftTs`
    // predicate — but unfiltered it would sort FIRST (nulls-first, side 0)
    // and its payload would forward-fill as the "earliest known" value,
    // fabricating matches the theta-join semantics (and DuckDB ASOF JOIN)
    // would drop
    val rSide = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__t"), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).as(c)) ++
        payload.map(col): _*)
    // right (side 0) sorts before left (side 1) at equal __t, so a right row
    // AT the left row's timestamp is visible: inclusive backward as-of
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(lSide.unionByName(rSide)) { (df, p) =>
      df.withColumn(prefix + p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTs)) ++
        leftOnly.map(col) ++ payload.map(p => col(prefix + p)): _*)
  }

  /** Forward (earliest-following) as-of join: each left row picks up the
    * payload of the right row with the SMALLEST `rightTs >= leftTs` in the
    * same key group — "what is the next scheduled event after me". Same
    * union-marker shape and ONE-shuffle contract as [[backward]], with the
    * window reversed: left rows sort BEFORE right rows at equal timestamps
    * (inclusive bound) and `first(_, ignoreNulls)` over
    * [currentRow, unboundedFollowing) backward-fills the next payload.
    *
    * Null handling mirrors [[backward]]'s fabrication guards: right rows
    * with NULL timestamps are dropped (they satisfy no `rightTs >= leftTs`),
    * and left NULL-timestamp rows sort LAST (`asc_nulls_last`) so their
    * following frame contains no right row — NULL payloads, exactly the
    * theta-join semantics. Same uniqueness contract on (`keys`, `rightTs`).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload columns")
    val leftCols = left.columns.toSeq
    payload.foreach { p =>
      require(!leftCols.contains(p),
        s"payload column '$p' already exists on the left side")
      require(!leftCols.contains(prefix + p),
        s"output column '$prefix$p' already exists on the left side")
    }
    (Seq("__t", "__side") ++ payload.map(prefix + _)).foreach { c =>
      require(!keys.contains(c), s"key column '$c' collides with internals")
    }
    val leftOnly = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    require(!leftOnly.contains("__t") && !leftOnly.contains("__side"),
      "left columns '__t'/'__side' collide with as-of internals")
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__t"), lit(0).as("__side")) ++
        leftOnly.map(col) ++
        payload.map(p => lit(null).as(p)): _*)
    val rSide = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__t"), lit(1).as("__side")) ++
        leftOnly.map(c => lit(null).as(c)) ++
        payload.map(col): _*)
    // left (side 0) sorts before right (side 1) at equal __t: a right row
    // AT the left row's timestamp is in the following frame — inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc_nulls_last, col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payload.foldLeft(lSide.unionByName(rSide)) { (df, p) =>
      df.withColumn(prefix + p, first(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTs)) ++
        leftOnly.map(col) ++ payload.map(p => col(prefix + p)): _*)
  }
}
