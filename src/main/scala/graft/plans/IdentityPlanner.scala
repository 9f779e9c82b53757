package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The provisioning planner — reference parity with `isilon_create_users`
  * in `--dry` mode (identities.py:162-198, _scripts.py:81-131), Spark-first.
  *
  * Everything is a pure DataFrame program producing an ordered *plan*
  * (phase, seq, action, name, arg, id, shell_line); applying it is a sink
  * (script text / REST calls), mirroring the reference's plan/effect
  * separation via callback injection (identities.py:162-186). The existing
  * users/groups tables arrive as DataFrames: at scale they are parquet
  * snapshots of cluster state; the catalog side is literal and tiny, so
  * every join against existing state broadcasts the catalog, never
  * shuffling the state table.
  *
  * ID allocation = the collision-avoiding rank-join (candidate pool ⟶
  * anti-join taken ids ⟶ rank-to-rank join against ranked demand), proven
  * equivalent to the reference's burn-in-encounter-order while-loop
  * (identities.py:126-139, 233-254) in AllocationSpec.
  */
object IdentityPlanner {

  /** Resolve ids for one entity kind: existing names keep their id
    * (create-or-lookup, identities.py:137-149, 251-263); new names get
    * contiguous ids from `start`, skipping any id already taken.
    *
    * @param demand   (name, seq) creation demand, seq = creation order
    * @param existing (name, id) current state
    * @param kind     entity kind for error messages ("user"/"group")
    * @return (name, seq, id, existed)
    *
    * Fails with [[graft.DuplicateIdentityError]] when an existing name maps
    * to more than one id — the reference's "duplicate users (e.g. local and
    * LDAP)?" uniqueness assertion (onefs.py:1079-1082, 1274-1277); a silent
    * left join would duplicate demand rows instead.
    */
  def resolveIds(
      demand: DataFrame,
      existing: DataFrame,
      start: Long,
      kind: String = "identity",
  ): DataFrame = {
    val ex = existing.select(col("name"), col("id").cast("long").as("eid"))
    if (ex.groupBy("name").count().filter(col("count") > 1).limit(1).count() > 0)
      throw new graft.DuplicateIdentityError(kind)
    val joined = demand.join(broadcast(ex), Seq("name"), "left")
    val newNames = joined.filter(col("eid").isNull)
    val hi = demand
      .agg(count(lit(1)).as("nd"))
      .crossJoin(ex.agg(count(lit(1)).as("ne")))
      .select((lit(start) + col("nd") + col("ne")).as("hi"))
    val pool = hi.select(explode(sequence(lit(start), col("hi"))).as("id"))
    val free = pool
      .join(ex.select(col("eid").as("id")), Seq("id"), "left_anti")
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    val ranked = newNames.withColumn("rn", row_number().over(Window.orderBy("seq")))
    val allocated = ranked
      .join(free, Seq("rn"))
      .select(col("name"), col("seq"), col("id"), lit(false).as("existed"))
    val kept = joined
      .filter(col("eid").isNotNull)
      .select(col("name"), col("seq"), col("eid").as("id"), lit(true).as("existed"))
    allocated.unionByName(kept)
  }

  /** The 100 TB variant of resolveIds' allocation: each shard allocates
    * from its own disjoint id range `[start + shard·capacity, …)`, so the
    * ranking window partitions by shard and parallelizes — no global
    * sequence bottleneck. Contiguity holds within a shard (global
    * contiguity is the price of parallel allocation).
    *
    * @param demand (name, seq, shard) — shard ∈ [0, nShards)
    * @return (name, seq, shard, id)
    */
  def allocateIdsSharded(
      demand: DataFrame,
      taken: DataFrame, // id
      start: Long,
      capacity: Long,
  ): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("seq")
    val ranked = demand.withColumn("rn", row_number().over(w))
    // per-shard free list: shard-local candidate pool minus taken ids
    val perShard = demand.groupBy("shard").agg(count(lit(1)).as("nd"))
    val pool = perShard
      .select(
        col("shard"),
        explode(
          sequence(
            lit(start) + col("shard") * capacity,
            lit(start) + col("shard") * capacity + col("nd") + lit(64L),
          ),
        ).as("id"),
      )
    val free = pool
      .join(taken.select(col("id")), Seq("id"), "left_anti")
      .withColumn("rn", row_number().over(Window.partitionBy("shard").orderBy("id")))
    ranked
      .join(free, Seq("shard", "rn"))
      .select(col("name"), col("seq"), col("shard"), col("id"))
  }

  /** Full identity plan for a distribution. Output ordered by seq:
    * (phase, seq, action, name, arg, id, shell_line) — shell_line replays
    * the plan on Linux (identities.py:122, 159, 280); proxy users have no
    * shell analog and render as comments.
    */
  def planIdentities(
      spark: SparkSession,
      dist: String,
      zone: String,
      suffix: String,
      startUid: Long,
      startGid: Long,
      existingUsers: DataFrame, // name, id
      existingGroups: DataFrame, // name, id
  ): DataFrame = {
    import spark.implicits._
    val actions = Catalogs.actionsFor(dist, zone, suffix).toDF()

    val groupDemand = actions.filter($"action" === "create_group").select($"name", $"seq")
    val groups = resolveIds(groupDemand, existingGroups, startGid, "group")
      .select($"name", $"seq", $"id".as("gid"))

    val userDemand = actions.filter($"action" === "create_user").select($"name", $"seq")
    val users = resolveIds(userDemand, existingUsers, startUid, "user")
      .select($"name", $"seq", $"id".as("uid"))

    // useradd needs the (resolved) gid of the user's primary group
    // (identities.py:268-281; onefs.py primary_group_of_user lookup).
    val pgroups = groups.select($"name".as("pgname"), $"gid".as("pgid"))

    actions
      .join(groups.withColumnRenamed("gid", "g_id"), Seq("name", "seq"), "left")
      .join(users.withColumnRenamed("uid", "u_id"), Seq("name", "seq"), "left")
      .join(
        broadcast(pgroups),
        $"action" === "create_user" && $"arg" === $"pgname",
        "left",
      )
      .select(
        $"phase",
        $"seq",
        $"action",
        $"name",
        $"arg",
        when($"action" === "create_group", $"g_id")
          .when($"action" === "create_user", $"u_id")
          .cast("long")
          .as("id"),
        when($"action" === "create_group", format_string("groupadd --gid %d %s", $"g_id", $"name"))
          .when(
            $"action" === "create_user",
            format_string("useradd --uid %d --gid %d %s", $"u_id", $"pgid", $"name"),
          )
          .when($"action" === "add_member", format_string("usermod -a -G %s %s", $"arg", $"name"))
          .otherwise(concat(lit("# proxyuser "), $"name", lit(": "), $"arg"))
          .as("shell_line"),
      )
      .orderBy("seq")
  }

  /** Script sink (identities.py:224-229): header once, then the plan's
    * shell lines in creation order — the whole file is one deterministic
    * text artifact.
    */
  def scriptLines(plan: DataFrame): DataFrame = {
    val header = plan.sparkSession
      .createDataFrame(
        Seq((-3, "#!/usr/bin/env sh"), (-2, "set -o errexit"), (-1, "set -o xtrace")),
      )
      .toDF("seq", "shell_line")
    header
      .unionByName(plan.select(col("seq"), col("shell_line")))
      .orderBy("seq")
      .select("shell_line")
  }

  def writeScript(plan: DataFrame, path: String): Unit =
    scriptLines(plan).coalesce(1).write.mode("overwrite").text(path)
}
