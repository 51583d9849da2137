package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `robots_allowed(robots_txt, agent, path)` -> BOOLEAN: RFC 9309
  * Robots Exclusion Protocol evaluation — may `agent` fetch `path`
  * under this host's robots.txt? Group selection (exact product token,
  * else `*`, else allow-all), longest-match precedence with Allow
  * winning ties, `*`/`$` wildcards, 500 KiB parse cap — all in
  * [[graft.operators.Robots]], which this expression fronts.
  *
  * Scale shape: robots.txt is host-grain (a tiny dim table next to a
  * 100 TB URL stream), so the intended plan is broadcast-join robots
  * onto the URLs and run this map-only scalar over the joined rows;
  * the parse is memoized per task thread on the rules text, so a
  * host-clustered stream parses each robots once. Codegen'd via the
  * static-call pattern (same as `hrw_shard`/`url_normalize`).
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING robots, STRING agent, STRING path), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BooleanType

  override def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    graft.operators.Robots.allowed(
      robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a, p) =>
      s"${ev.value} = graft.operators.Robots$$.MODULE$$.allowed(" +
        s"$r.toString(), $a.toString(), $p.toString());")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RobotsAllowed =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "robots_allowed"
}
