package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + the allow decision — the missing INPUT
  * producer of the crawl shelf: E100 canonicalizes URLs, E222
  * evaluates a policy rule table, E239 schedules politely; this is
  * where the rule table comes FROM on a real crawl (one fetched
  * robots.txt per host). Original 1994 robots-exclusion semantics
  * with RFC 9309's group/precedence model; `*`/`$` path wildcards
  * are STATED out of scope (plain prefix match — the 1994 rule;
  * wildcard support would slot into the match predicate).
  *
  * Parse model (RFC 9309 §2.2): lines are `key: value` records;
  * `#` starts a comment; keys are case-insensitive. CONSECUTIVE
  * `user-agent` lines form a group head; the allow/disallow/
  * crawl-delay records after them belong to every agent in that
  * head, until the next user-agent line that FOLLOWS a rule line
  * starts a new group. Rules before any user-agent line belong to no
  * group and are dropped (the RFC requires rules inside groups).
  * Everything is one line explode + two windows per host — linear,
  * partitioned by host, no text wider than a line shuffles.
  *
  * Decision model ([[robotsAllowed]], RFC 9309 §2.2.1/§5.1): the
  * group for a crawler is the EXACT agent-token match if the host's
  * file has one, else the `*` group; within the group the MOST
  * SPECIFIC (longest-path) matching rule wins, allow winning ties;
  * no matching rule (or no group at all) means allowed. Empty-path
  * rules ("Disallow:" = allow-all idiom) match nothing, stated. */
object Robots {

  /** Parse one robots.txt per row into its grouped rule table.
    * @return (hostCol, group_id, user_agent, rule, path, line_no) —
    *         one row per (agent-in-head × rule); `rule` ∈
    *         allow/disallow/crawl-delay (value kept in `path`). */
  def parseRobots(df: DataFrame, hostCol: String = "host",
                  txtCol: String = "robots_txt"): DataFrame = {
    val byLine = Window.partitionBy(col(hostCol)).orderBy(col("line_no"))
    val lines = df
      .select(col(hostCol),
        posexplode(split(col(txtCol), "\n")).as(Seq("line_no", "__raw")))
      .select(col(hostCol), col("line_no"),
        trim(regexp_replace(col("__raw"), "#.*", "")).as("__l"))
      .filter(col("__l").contains(":"))
      .select(col(hostCol), col("line_no"),
        lower(trim(substring_index(col("__l"), ":", 1))).as("__k"),
        trim(expr("substring(__l, instr(__l, ':') + 1)")).as("__v"))
      .filter(col("__k").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
      .withColumn("__is_ua", col("__k") === "user-agent")
    // a user-agent line opens a NEW group iff the previous kept line
    // wasn't one (consecutive UA lines share a head)
    val grouped = lines
      .withColumn("__new_head",
        col("__is_ua") &&
          !coalesce(lag(col("__is_ua"), 1).over(byLine), lit(false)))
      .withColumn("group_id",
        sum(when(col("__new_head"), 1L).otherwise(0L)).over(byLine))
    val heads = grouped.filter(col("__is_ua"))
      .select(col(hostCol), col("group_id"),
        lower(col("__v")).as("user_agent"))
    val rules = grouped.filter(!col("__is_ua") && col("group_id") > 0)
      .select(col(hostCol), col("group_id"), col("__k").as("rule"),
        col("__v").as("path"), col("line_no"))
    heads.join(rules, Seq(hostCol, "group_id"))
      .select(col(hostCol), col("group_id"), col("user_agent"),
        col("rule"), col("path"), col("line_no"))
  }

  /** Allow/deny verdict for `agent` over (host, path) rows, against
    * [[parseRobots]] output. Join volume = urls × the matched group's
    * rules (robots files are small — the rule side broadcasts at any
    * corpus scale; the URL side never re-shuffles). */
  def robotsAllowed(urls: DataFrame, rules: DataFrame, agent: String,
                    hostCol: String = "host",
                    pathCol: String = "path"): DataFrame = {
    val a = agent.toLowerCase
    // per host: the exact-agent group if one exists, else the * group
    val withPick = rules.filter(col("rule").isin("allow", "disallow"))
      .withColumn("__has_exact",
        max(when(col("user_agent") === a, true).otherwise(false))
          .over(Window.partitionBy(col(hostCol))))
      .filter(when(col("__has_exact"), col("user_agent") === a)
        .otherwise(col("user_agent") === "*"))
      .select(col(hostCol).as("__h"), col("rule"),
        col("path").as("__rp"), col("line_no"))
    val matched = urls
      .join(broadcast(withPick),
        urls(hostCol) === col("__h") &&
          length(col("__rp")) > 0 &&
          urls(pathCol).startsWith(col("__rp")),
        "left")
    // most specific (longest) path wins; allow wins length ties;
    // line_no makes duplicate rules deterministic
    val best = struct(length(col("__rp")).as("l"),
      (col("rule") === "allow").as("a"), col("line_no").as("ln"))
    matched
      .groupBy(urls.columns.map(urls(_)): _*)
      .agg(max(when(col("__rp").isNotNull, best)).as("__w"))
      .select((urls.columns.map(col) :+
        (col("__w").isNull || col("__w.a")).as("allowed") :+
        col("__w.l").cast("long").as("winner_len")): _*)
  }
}
