package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.NewtonBoost
import graft.sources.Tables

/**
 * Oracle-checked NewtonBoost APPLICATION (COVERAGE M4/M10): model
 * TRAINING is spec-gated (NewtonBoostSpec, per SURVEY §5), but a fitted
 * additive tree model is piecewise-constant arithmetic — fully
 * SQL-expressible — so scoring AND per-feature path-attribution are
 * hash-gated here against DuckDB. The fixture model below was trained
 * once in-engine (4 trees, depth 3, lr 0.3, hist bins) on sf0.01
 * lineitem with label `l_returnflag = 'R'`, then frozen as JSON; the
 * oracle SQL is COMPILED FROM THE SAME JSON (`Model.marginSql` /
 * `contributionSql` mirror the Column expression tree node for node,
 * same literals, same association order), so both engines evaluate
 * bit-identical doubles — the round(6) is belt only.
 *
 * Scale shape: scoring is one codegen projection over the scan — no
 * shuffle, no broadcast (the model is constant-folded into the plan);
 * the contributions add 4 more piecewise-constant projections fused
 * into the same WholeStageCodegen. This is the 100 TB serving path:
 * model application at scan speed.
 */
object BoostQueries {

  /** Frozen fixture (trained by NewtonBoost.fit, seed-deterministic;
    * regenerating with the same inputs reproduces it bit-for-bit). */
  val modelJson: String =
    """{"features":["l_quantity","l_extendedprice","l_discount","l_tax"],"lr":0.3,"base":0.5,"trees":[{"f":1,"b":12,"t":85555.27125,"dl":true,"v":-0.6635557629491368,"l":{"f":0,"b":0,"t":4.0,"dl":true,"v":-0.670221930508266,"l":{"f":2,"b":7,"t":0.08,"dl":true,"v":-0.616140350877193,"l":{"w":-0.6851940584571155},"r":{"w":-0.42503259452411996}},"r":{"f":1,"b":11,"t":79194.095,"dl":true,"v":-0.673520954953385,"l":{"w":-0.6695280994269274},"r":{"w":-0.7210031347962382}}},"r":{"f":2,"b":5,"t":0.06,"dl":true,"v":-0.6344410876132931,"l":{"f":3,"b":4,"t":0.04,"dl":true,"v":-0.6703385711971489,"l":{"w":-0.6292466765140325},"r":{"w":-0.7016431248198328}},"r":{"f":3,"b":6,"t":0.06,"dl":true,"v":-0.5903638151425762,"l":{"w":-0.6124785346307956},"r":{"w":-0.5404388714733542}}}},{"f":3,"b":6,"t":0.06,"dl":true,"v":-0.4698864902327091,"l":{"f":1,"b":14,"t":98461.299375,"dl":true,"v":-0.47665701896348156,"l":{"f":1,"b":9,"t":66366.74,"dl":true,"v":-0.48097481049350876,"l":{"w":-0.48954158503676115},"r":{"w":-0.46358291382757894}},"r":{"f":0,"b":14,"t":47.0,"dl":true,"v":-0.41131244502076547,"l":{"w":-0.39275273469554517},"r":{"w":-0.6271996393060444}}},"r":{"f":1,"b":0,"t":7506.844375000001,"dl":true,"v":-0.4548127412279275,"l":{"f":0,"b":13,"t":44.0,"dl":true,"v":-0.3277042419906231,"l":{"w":-0.39069579149941386},"r":{"w":0.02213791462330904}},"r":{"f":2,"b":8,"t":0.09,"dl":true,"v":-0.46328074296828026,"l":{"w":-0.4724403079896353},"r":{"w":-0.4088483286256075}}}},{"f":0,"b":0,"t":4.0,"dl":true,"v":-0.3365026461910362,"l":{"f":2,"b":7,"t":0.08,"dl":true,"v":-0.29909410767308653,"l":{"f":3,"b":1,"t":0.01,"dl":true,"v":-0.34657227973578597,"l":{"w":-0.6305359249642468},"r":{"w":-0.3271187446203232}},"r":{"f":3,"b":3,"t":0.03,"dl":true,"v":-0.16897296895783737,"l":{"w":-0.32885209096608764},"r":{"w":-0.09916705893093007}}},"r":{"f":2,"b":0,"t":0.01,"dl":true,"v":-0.3388444610244147,"l":{"f":0,"b":10,"t":35.0,"dl":true,"v":-0.2898489561428273,"l":{"w":-0.3634160484472566},"r":{"w":-0.1389951521091624}},"r":{"f":3,"b":1,"t":0.01,"dl":true,"v":-0.34133795475745143,"l":{"w":-0.30926028711044684},"r":{"w":-0.34348020427692694}}}},{"f":1,"b":12,"t":85555.27125,"dl":true,"v":-0.24121036228283835,"l":{"f":2,"b":5,"t":0.06,"dl":true,"v":-0.24508079143891146,"l":{"f":1,"b":8,"t":59701.800625,"dl":true,"v":-0.2355638343273148,"l":{"w":-0.22248029026519578},"r":{"w":-0.26537020185298105}},"r":{"f":0,"b":3,"t":13.0,"dl":true,"v":-0.25681009224214724,"l":{"w":-0.21253301392763724},"r":{"w":-0.27101943740690276}}},"r":{"f":2,"b":6,"t":0.07,"dl":true,"v":-0.22441634268141958,"l":{"f":0,"b":10,"t":35.0,"dl":true,"v":-0.24570134081532152,"l":{"w":-0.27035191797425234},"r":{"w":-0.1942003799413572}},"r":{"f":0,"b":10,"t":35.0,"dl":true,"v":-0.1844294537682898,"l":{"w":-0.14563458826135622},"r":{"w":-0.2707101802185973}}}}]}"""

  def model: NewtonBoost.Model = NewtonBoost.fromJson(modelJson)

  private val contribNames =
    Seq("c_quantity", "c_price", "c_discount", "c_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q193_boost_score" -> ((s, dir) => {
      // Frozen-model margin, per-feature path attributions, and score
      // for every lineitem row. STAGED evaluation: the 4 contribution
      // walks compute once per row AFTER the range-sort (so the sort's
      // sampling pass touches only the slim scan), and margin/score
      // derive from them via the telescoping identity — the model is
      // applied exactly once per row (measured 1.4 s vs 5.3 s for the
      // sort-last form at sf0.1; plan: Scan → Exchange(range) → Sort →
      // one Project). The oracle mirrors the staged association order
      // node for node, so doubles stay bit-identical engine-to-engine.
      val m = model
      val raw = m.contributions.map(_._2).zipWithIndex
        .map { case (c, i) => c.as(s"_r$i") }
      val marginRaw = contribNames.indices
        .map(i => col(s"_r$i")).foldLeft(m.bias)(_ + _)
      val rounded = contribNames.zipWithIndex
        .map { case (n, i) => round(col(s"_r$i"), 6).as(n) }
      Tables.load(s, dir, "lineitem")
        .select(Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax")): _*)
        .orderBy("l_orderkey", "l_linenumber")
        .select(Seq(col("l_orderkey"), col("l_linenumber")) ++ raw: _*)
        .withColumn("_margin_raw", marginRaw)
        .select(Seq(col("l_orderkey"), col("l_linenumber"),
          round(col("_margin_raw"), 6).as("margin")) ++ rounded :+
          round(lit(1.0) / (lit(1.0) + exp(-col("_margin_raw"))), 6)
            .as("score"): _*)
    }))

  val oracleSql: Map[String, String] = {
    val m = model
    val raws = contribNames.indices
      .map(i => s"${m.contributionSql(i)} AS _r$i").mkString(",\n         ")
    val marginRaw = contribNames.indices
      .map(i => s"_r$i").foldLeft(m.biasSql)((acc, r) => s"($acc + $r)")
    val rounded = contribNames.zipWithIndex
      .map { case (n, i) => s"ROUND(_r$i, 6) AS $n" }.mkString(", ")
    Map(
      "q193_boost_score" ->
        s"""SELECT l_orderkey, l_linenumber,
           |       ROUND(_margin_raw, 6) AS margin,
           |       $rounded,
           |       ROUND((1.0E0 / (1.0E0 + exp(-_margin_raw))), 6) AS score
           |FROM (
           |  SELECT l_orderkey, l_linenumber, _r0, _r1, _r2, _r3,
           |         $marginRaw AS _margin_raw
           |  FROM (
           |    SELECT l_orderkey, l_linenumber,
           |         $raws
           |    FROM lineitem
           |  )
           |)
           |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }
}
