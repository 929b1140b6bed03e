package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a sync
  * pipeline runs BEFORE committing a batch (the reference validates
  * per-record as it converts, `lib/DataProcessor.py` type dispatch;
  * this is the set-level form: named rules, violation counts, a
  * pass/fail verdict per rule).
  *
  * Scale shape: every row-level rule compiles into one conditional sum
  * inside a SINGLE aggregation pass — checking 50 rules over 100 TB
  * costs one scan and a 1-row reduce, not 50 queries. The per-rule
  * long-format report is a driver-trivial explode of that one row.
  */
object Quality {

  /** Evaluate named row-level expectations in one pass. A row violates
    * a rule when the predicate is FALSE or NULL (an unevaluable
    * expectation is a failing one — NULL-tolerant rules must say so
    * with isNull/coalesce). Returns one row per rule:
    * (rule, n_rows, n_violations, pass), in the given rule order. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val vCols = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v_$name")
    }
    val one = df.agg(count(lit(1)).as("_n"), vCols: _*)
    val perRule = array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"_v_$name").as("n_violations"))
    }: _*)
    one.select(col("_n"), explode(perRule).as("_r"))
      .select(col("_r.rule").as("rule"), col("_n").as("n_rows"),
        coalesce(col("_r.n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** k-anonymity audit of quasi-identifier columns: a row whose QI
    * combination is shared by fewer than `k` rows is re-identifiable by
    * anyone who knows those attributes — the privacy gate a dataset
    * must pass before QI columns ship. NULL QI values form their own
    * group (grouping semantics), which is the conservative read: an
    * absent attribute is still an attribute. Two aggregation passes,
    * the second over group-count rows only. Returns 1 row:
    * (n_rows, n_groups, min_group, n_groups_below_k, n_rows_below_k). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs quasi-identifier columns")
    require(k > 1, s"k $k must exceed 1")
    val sizes = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("sz"))
    sizes.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("sz")).as("min_group"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("n_rows_below_k"))
  }

  /** l-DIVERSITY audit — [[kAnonymity]]'s complement: a QI group of
    * comfortable SIZE still leaks when every row in it shares one
    * sensitive value (the homogeneity attack k-anonymity cannot see).
    * Per QI group, the number of DISTINCT sensitive values must reach
    * `l`. NULL QI values form their own group (same conservative read
    * as kAnonymity); NULL sensitive values do not count as a value, so
    * an all-NULL-sensitive group scores diversity 0 — unknown is not
    * diverse. Two aggregation passes, the second over group rows only.
    * Returns 1 row:
    * (n_rows, n_groups, min_diversity, n_groups_below_l, n_rows_below_l). */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty, "l-diversity needs quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l > 1, s"l $l must exceed 1")
    val groups = df.groupBy(qiCols.map(col): _*).agg(
      count(lit(1)).as("sz"),
      countDistinct(col(sensitiveCol)).as("lv"))
    groups.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("lv")).as("min_diversity"),
      sum(when(col("lv") < l, 1L).otherwise(0L)).as("n_groups_below_l"),
      sum(when(col("lv") < l, col("sz")).otherwise(0L)).as("n_rows_below_l"))
  }

  /** Deterministic KEYED PSEUDONYMIZATION token — the tokenization half
    * of a PII release: `u_` + the first 12 hex chars (48 bits) of
    * md5(salt # key...). Same key → same token (joins and group-bys
    * keep working across tables pseudonymized with the same salt — the
    * referential-integrity property a release audit checks), while
    * recovering the key needs the salt. Pure codegen'd built-ins, no
    * UDF; portable to any engine for the audit's oracle. 48 bits keeps
    * birthday collisions ~2⁻²⁰ at 16M keys — pass more chars for
    * larger key spaces, and AUDIT the release (distinct tokens ==
    * distinct keys) rather than assuming. */
  def pseudonym(salt: String, keys: Seq[Column]): Column = {
    require(keys.nonEmpty, "pseudonym needs at least one key column")
    concat(lit("u_"), substring(
      md5(concat_ws("#", lit(salt) +: keys.map(_.cast("string")): _*)), 1, 12))
  }

  /** t-CLOSENESS per QI group — the third rung of the release-audit
    * ladder ([[kAnonymity]]: groups big enough; [[lDiversity]]: groups
    * varied enough; here: each group's sensitive-attribute DISTRIBUTION
    * close enough to the global one, so group membership leaks no
    * skewed posterior). Distance is total-variation:
    *   TVD(group) = ½ Σ_v |c_v/n_g − g_v/N|
    * computed in EXACT integer arithmetic via the common-denominator
    * form |c_v·N − g_v·n_g| / (n_g·N); sensitive values ABSENT from a
    * group contribute (N − Σ_present g_v)·n_g to the numerator — the
    * complement identity, so the plan never materializes the
    * groups×values cross product, only the observed cells. Products
    * route through DECIMAL(38,0) (c·N overflows a long at petabyte
    * cardinalities); ONE double divide per group at the end, on the
    * 1e-6 lattice.
    *
    * Scale shape: one cells aggregation (the only data-sized shuffle),
    * two derived aggregations over cell rows, a broadcast of the
    * |sensitive| frame and the 1-row total. Returns one row per QI
    * group: (qiCols..., n_g, tvd). */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "t-closeness needs quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    val qi = qiCols.map(col)
    val cells = df.filter(col(sensitiveCol).isNotNull)
      .groupBy(qi :+ col(sensitiveCol).as("_s"): _*)
      .agg(count(lit(1)).as("_c"))
    val grp = cells.groupBy(qi: _*).agg(sum(col("_c")).as("_ng"))
    val gtot = cells.groupBy(col("_s")).agg(sum(col("_c")).as("_g"))
    val ntot = gtot.agg(sum(col("_g")).as("_n"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    cells.join(grp, qiCols).join(broadcast(gtot), "_s")
      .crossJoin(broadcast(ntot))
      .groupBy(qi: _*)
      .agg(
        sum(abs(dec(col("_c")) * dec(col("_n")) -
          dec(col("_g")) * dec(col("_ng")))).as("_pres"),
        sum(dec(col("_g"))).as("_presg"),
        max(col("_ng")).as("n_g"),
        max(col("_n")).as("_nn"))
      .select(qi ++ Seq(col("n_g"),
        (floor((col("_pres") + (dec(col("_nn")) - col("_presg")) * dec(col("n_g")))
          .cast("double") /
          (lit(2.0) * col("n_g").cast("double") * col("_nn").cast("double"))
          * 1000000 + 0.5) / 1000000).as("tvd")): _*)
  }

  /** Functional-dependency audit: does `lhsCols` determine `rhsCol`?
    * One row per rule: group count, violating-group count (groups
    * seeing >1 distinct rhs value), violation share (lattice), and the
    * worst group's distinct count — the schema-inference /
    * normalization check a warehouse runs before declaring a key or
    * collapsing a dimension. ONE partial-aggregated pass to the
    * (lhs, distinct-rhs) frame, then a second pass over group rows
    * only. NULL rhs values are not values (unknown is not a
    * determination conflict); a NULL lhs forms its own group — the
    * k-anonymity convention. */
  def functionalDependency(df: DataFrame, lhsCols: Seq[String],
      rhsCol: String, rule: String): DataFrame = {
    require(lhsCols.nonEmpty, "FD audit needs left-hand-side columns")
    val groups = df.groupBy(lhsCols.map(col): _*)
      .agg(countDistinct(col(rhsCol)).as("_nd"))
    groups.agg(count(lit(1)).as("n_groups"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("_nd")).as("max_distinct"))
      .select(lit(rule).as("rule"), col("n_groups"), col("n_violating"),
        (floor(col("n_violating").cast("double") /
          col("n_groups").cast("double") * 1000000 + 0.5) / 1000000)
          .as("violation_share"),
        col("max_distinct"),
        (col("n_violating") === 0L).as("holds"))
  }

  /** Benford's-law expected first-digit shares, log10(1 + 1/d) for
    * d = 1..9, as the EXACT double literals both engines parse to the
    * same IEEE values — hardcoded so no libm log10 call sits on an
    * oracle path. */
  val BenfordShares: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** Benford first-significant-digit audit — the classic fabricated-
    * numbers / unit-mix / truncation detector for numeric columns:
    * observed share of each leading digit 1-9 against the Benford
    * expectation, with a per-digit chi-square term
    * `(n_d − N·p_d)² / (N·p_d)`. Values below 1 (and NULLs) are
    * excluded — the law speaks to positive magnitudes; the leading
    * digit comes from the integer part's decimal string, so no log10
    * touches data. ONE partial-aggregated pass collapses the column to
    * ≤ 9 digit-count rows before anything else runs; every reported
    * ratio is lattice-snapped (1e-6) so the audit reproduces
    * bit-for-bit in any engine. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(floor(col(valueCol)).cast("long").cast("string"),
      1, 1).cast("int")
    val counts = df.filter(col(valueCol) >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = BenfordShares.map { case (d, p) =>
      struct(lit(d).as("digit"), lit(p).as("p")) }
    val exp = counts.sparkSession.range(1)
      .select(explode(array(expected: _*)).as("e"))
      .select(col("e.digit").as("digit"), col("e.p").as("expected_share"))
    val total = counts.agg(sum(col("n")).as("_tot"))
    def snap(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000
    // left join from the expectation frame: a digit the data never
    // produces still contributes its full N·p_d term — absence is
    // evidence too
    exp.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(Seq(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        snap(coalesce(col("n"), lit(0L)).cast("double") /
          col("_tot").cast("double")).as("share"),
        col("expected_share"),
        snap((coalesce(col("n"), lit(0L)).cast("double") -
            col("_tot").cast("double") * col("expected_share")) *
          (coalesce(col("n"), lit(0L)).cast("double") -
            col("_tot").cast("double") * col("expected_share")) /
          (col("_tot").cast("double") * col("expected_share")))
          .as("chi2_term")): _*)
  }

  /** Referential-integrity expectation: rows of `child` whose `keyCol`
    * has no match in `parent` (NULL keys are orphans too — a NULL FK
    * cannot reference anything). One left-anti join, partial-aggregated
    * count; the parent side deduplicates before the join so a hot
    * parent key cannot skew it. Returns 1 row: (rule, n_rows,
    * n_violations, pass) — unionable with [[checkRules]] output. */
  def checkForeignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, rule: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("_pk")).distinct()
    // plain === (not <=>): a NULL child key never matches, so NULL FKs
    // are counted as orphans even when the parent has NULL keys
    val orphans = child.select(col(childKey).as("_ck"))
      .join(keys, col("_ck") === col("_pk"), "left_anti")
    val n = child.agg(count(lit(1)).as("_n"))
    val v = orphans.agg(count(lit(1)).as("_v"))
    n.crossJoin(v).select(lit(rule).as("rule"), col("_n").as("n_rows"),
      col("_v").as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }
}
