package graft.plans

/** Literal identity/directory catalogs ported from the reference
  * (identities.py:350-538, directories.py:115-240) — data, not code.
  *
  * Determinism pinning (SURVEY.md §7 risk 4): the reference iterates
  * Python dicts (insertion order) and *sets* (hash order — nondeterministic
  * across runs for the per-user group-ensure step). This port makes every
  * order explicit data: users keep source order via `seq`; within-user
  * group sets are iterated in sorted(name) order.
  */
object Catalogs {

  final case class UserSpec(
      name: String,
      primaryGroup: String,
      secondaryGroups: Seq[String],
      seq: Int,
  )
  final case class ProxyMember(name: String, memberType: String)
  final case class ProxyUserSpec(name: String, members: Seq[ProxyMember], seq: Int)
  final case class DirectorySpec(path: String, owner: String, group: String, mode: Int, seq: Int)

  /** One creation-order action row (iterate_identities, identities.py:284-309). */
  final case class Action(
      phase: Int, // 1 bare groups, 2 per-user, 3 proxy users
      seq: Int, // global creation order
      action: String, // create_group | create_user | add_member | create_proxy_user
      name: String, // group/user/proxy name
      arg: String, // pgroup for create_user, group for add_member, members for proxy
  )

  private val HS = Seq("hadoop", "supergroup")

  private def users(specs: (String, Seq[String])*): Seq[UserSpec] =
    specs.zipWithIndex.map { case ((n, sg), i) => UserSpec(n, n, sg, i) }

  private def proxies(smoke: String, specs: (String, Boolean)*): Seq[ProxyUserSpec] =
    specs.zipWithIndex.map { case ((n, withHadoop), i) =>
      val members =
        if (withHadoop) Seq(ProxyMember(smoke, "user"), ProxyMember("hadoop", "group"))
        else Seq(ProxyMember(smoke, "user"))
      ProxyUserSpec(n, members, i)
    }

  /** identities.py:350-396 */
  def cdhUsers: Seq[UserSpec] = users(
    "accumulo" -> Nil, "anonymous" -> Nil, "apache" -> Nil, "cloudera-scm" -> Nil,
    "cmjobuser" -> Nil, "flume" -> Nil, "hbase" -> HS, "hdfs" -> HS, "hive" -> Nil,
    "HTTP" -> HS, "httpfs" -> Nil, "hue" -> Nil, "impala" -> Seq("hive"), "kafka" -> Nil,
    "keytrustee" -> Nil, "kms" -> Nil, "kudu" -> Nil, "llama" -> Nil, "mapred" -> HS,
    "oozie" -> Nil, "sentry" -> Nil, "solr" -> Nil, "spark" -> Nil,
    "sqoop" -> Seq("sqoop2"), "sqoop2" -> Seq("sqoop"), "yarn" -> HS, "zookeeper" -> Nil,
  )

  def cdhProxies: Seq[ProxyUserSpec] = proxies(
    "cloudera-scm",
    "flume" -> true, "hive" -> true, "HTTP" -> false, "hue" -> true,
    "impala" -> true, "mapred" -> true, "oozie" -> true,
  )

  /** identities.py:399-472 */
  def cdpUsers: Seq[UserSpec] = users(
    "accumulo" -> Nil, "anonymous" -> Nil, "apache" -> Nil, "atlas" -> HS,
    "cloudera-scm" -> Nil, "cmjobuser" -> Nil, "cruisecontrol" -> Nil, "druid" -> HS,
    "flume" -> Nil, "hbase" -> HS, "hdfs" -> HS, "hive" -> Nil, "HTTP" -> HS,
    "httpfs" -> Nil, "hue" -> Nil, "impala" -> Seq("hive"), "kafka" -> Nil,
    "keyadmin" -> Nil, "keytrustee" -> Nil, "kms" -> Nil, "knox" -> Nil, "knoxui" -> Nil,
    "kudu" -> Nil, "llama" -> Nil, "livy" -> Nil, "mapred" -> HS, "nifi" -> Nil,
    "nifiregistry" -> Nil, "oozie" -> Nil, "phoenix" -> Nil, "ranger" -> HS,
    "rangeradmin" -> Nil, "rangerlookup" -> Nil, "rangerraz" -> Nil, "rangerrms" -> Nil,
    "rangertagsync" -> Nil, "rangerusersync" -> Nil, "schemaregistry" -> Nil,
    "sentry" -> Nil, "solr" -> Nil, "spark" -> Nil, "sqoop" -> Seq("sqoop2"),
    "sqoop2" -> Seq("sqoop"), "streamsmsgmgr" -> Nil, "tez" -> Nil, "superset" -> Nil,
    "yarn" -> HS, "zeppelin" -> Nil, "zookeeper" -> Nil,
  )

  def cdpProxies: Seq[ProxyUserSpec] = proxies(
    "cloudera-scm",
    "flume" -> true, "hive" -> true, "hue" -> true, "impala" -> true, "mapred" -> true,
    "oozie" -> true, "phoenix" -> true, "yarn" -> true, "knox" -> true, "hdfs" -> true,
    "livy" -> true, "HTTP" -> false,
  )

  /** identities.py:478-538 */
  def hdpUsers: Seq[UserSpec] = {
    val h = Seq("hadoop")
    users(
      "accumulo" -> h, "activity_analyzer" -> h, "activity_explorer" -> h,
      "ambari-qa" -> h, "ambari-server" -> h, "ams" -> h, "anonymous" -> Nil,
      "atlas" -> h, "druid" -> h, "falcon" -> h, "flume" -> h, "gpadmin" -> h,
      "hadoopqa" -> h, "hbase" -> h, "hcat" -> h, "hdfs" -> h, "hive" -> h,
      "HTTP" -> h, "hue" -> h, "infra-solr" -> h, "kafka" -> h, "keyadmin" -> h,
      "kms" -> h, "knox" -> h, "livy" -> h, "logsearch" -> h, "mahout" -> h,
      "mapred" -> h, "oozie" -> h, "ranger" -> h, "rangerlookup" -> h, "spark" -> h,
      "sqoop" -> h, "storm" -> h, "tez" -> h, "tracer" -> h, "yarn" -> h,
      "yarn-ats" -> h, "yarn-ats-hbase" -> h, "zeppelin" -> h, "zookeeper" -> h,
    )
  }

  def hdpProxies: Seq[ProxyUserSpec] = proxies(
    "ambari-qa",
    "ambari-server" -> false, "flume" -> true, "hbase" -> true, "hcat" -> true,
    "hive" -> true, "HTTP" -> false, "knox" -> false, "livy" -> true,
    "oozie" -> true, "yarn" -> true,
  )

  def usersFor(dist: String, zone: String): Seq[UserSpec] = {
    val base = dist match {
      case "cdh" => cdhUsers
      case "cdp" => cdpUsers
      case "hdp" => hdpUsers
      case other => throw new IllegalArgumentException(s"unknown dist: $other")
    }
    // identities.py:394-396 et al: admin user added iff zone is not System.
    if (zone.toLowerCase != "system") base :+ UserSpec("admin", "admin", Nil, base.size)
    else base
  }

  def proxiesFor(dist: String): Seq[ProxyUserSpec] = dist match {
    case "cdh" => cdhProxies
    case "cdp" => cdpProxies
    case "hdp" => hdpProxies
    case other => throw new IllegalArgumentException(s"unknown dist: $other")
  }

  /** _scripts.py:106-113: suffix gets a "-" prefix iff missing. */
  def normalizeSuffix(suffix: String): String =
    if (suffix.isEmpty || suffix.startsWith("-")) suffix else s"-$suffix"

  /** identities.py:323-347: structure-preserving suffix application. */
  def withSuffix(specs: Seq[UserSpec], suffix: String): Seq[UserSpec] =
    specs.map(u =>
      u.copy(
        name = u.name + suffix,
        primaryGroup = u.primaryGroup + suffix,
        secondaryGroups = u.secondaryGroups.map(_ + suffix),
      ),
    )

  def proxiesWithSuffix(specs: Seq[ProxyUserSpec], suffix: String): Seq[ProxyUserSpec] =
    specs.map(p =>
      p.copy(
        name = p.name + suffix,
        members = p.members.map(m => m.copy(name = m.name + suffix)),
      ),
    )

  /** iterate_identities (identities.py:284-309): derive the creation-order
    * action list. Group creates are deduped across the bare-groups pass and
    * the per-user pass with one running set; within-user group ensures run
    * in sorted(name) order (see object doc).
    */
  def deriveActions(
      bareGroups: Seq[String],
      users: Seq[UserSpec],
      proxies: Seq[ProxyUserSpec],
  ): Seq[Action] = {
    val out = Seq.newBuilder[Action]
    var seq = 0
    def next(): Int = { val s0 = seq; seq += 1; s0 }
    val created = scala.collection.mutable.Set.empty[String]
    bareGroups.foreach { g =>
      if (created.add(g)) out += Action(1, next(), "create_group", g, "")
    }
    users.foreach { u =>
      (u.secondaryGroups.toSet + u.primaryGroup).toSeq.sorted.foreach { g =>
        if (created.add(g)) out += Action(2, next(), "create_group", g, "")
      }
      out += Action(2, next(), "create_user", u.name, u.primaryGroup)
      u.secondaryGroups.sorted.foreach { g =>
        out += Action(2, next(), "add_member", u.name, g)
      }
    }
    proxies.foreach { p =>
      val members = p.members
        .sortBy(m => (m.name, m.memberType))
        .map(m => s"${m.name}(${m.memberType})")
        .mkString(",")
      out += Action(3, next(), "create_proxy_user", p.name, members)
    }
    out.result()
  }

  def actionsFor(dist: String, zone: String, suffix: String): Seq[Action] = {
    val sfx = normalizeSuffix(suffix)
    deriveActions(
      Nil, // all three dists declare no bare groups (identities.py:354, 404, 482)
      withSuffix(usersFor(dist, zone), sfx),
      proxiesWithSuffix(proxiesFor(dist), sfx),
    )
  }

  /** directories.py:115-144 */
  def cdhDirectories: Seq[DirectorySpec] = dirs(
    ("/", "hdfs", "hadoop", o755 ),
    ("/hbase", "hbase", "hbase", o755 ),
    ("/solr", "solr", "solr", o775 ),
    ("/tmp", "hdfs", "supergroup", o1777 ),
    ("/tmp/hive", "hive", "supergroup", o777 ),
    ("/tmp/logs", "mapred", "hadoop", o1777 ),
    ("/user", "hdfs", "supergroup", o755 ),
    ("/user/flume", "flume", "flume", o775 ),
    ("/user/hdfs", "hdfs", "hdfs", o755 ),
    ("/user/history", "mapred", "hadoop", o777 ),
    ("/user/hive", "hive", "hive", o775 ),
    ("/user/hive/warehouse", "hive", "hive", o1777 ),
    ("/user/hue", "hue", "hue", o755 ),
    ("/user/hue/.cloudera_manager_hive_metastore_canary", "hue", "hue", o777 ),
    ("/user/impala", "impala", "impala", o775 ),
    ("/user/oozie", "oozie", "oozie", o775 ),
    ("/user/spark", "spark", "spark", o751 ),
    ("/user/spark/applicationHistory", "spark", "spark", o1777 ),
    ("/user/sqoop2", "sqoop2", "sqoop", o775 ),
    ("/user/yarn", "yarn", "yarn", o755 ),
  )

  /** directories.py:149-198 */
  def cdpDirectories: Seq[DirectorySpec] = dirs(
    ("/", "hdfs", "hadoop", o755 ),
    ("/hbase", "hbase", "hbase", o755 ),
    ("/ranger", "hdfs", "supergroup", o755 ),
    ("/ranger/audit", "hdfs", "supergroup", o755 ),
    ("/solr", "solr", "solr", o775 ),
    ("/tmp", "hdfs", "supergroup", o1777 ),
    ("/tmp/hive", "hive", "supergroup", o777 ),
    ("/tmp/logs", "yarn", "hadoop", o1777 ),
    ("/user", "hdfs", "supergroup", o755 ),
    ("/user/flume", "flume", "flume", o775 ),
    ("/user/hdfs", "hdfs", "hdfs", o755 ),
    ("/user/history", "mapred", "hadoop", o777 ),
    ("/user/history/done_intermediate", "mapred", "hadoop", o1777 ),
    ("/user/hive", "hive", "hive", o775 ),
    ("/user/hive/warehouse", "hive", "hive", o1777 ),
    ("/user/hue", "hue", "hue", o755 ),
    ("/user/hue/.cloudera_manager_hive_metastore_canary", "hue", "hue", o777 ),
    ("/user/impala", "impala", "impala", o775 ),
    ("/user/livy", "livy", "livy", o775 ),
    ("/user/oozie", "oozie", "oozie", o775 ),
    ("/user/spark", "spark", "spark", o751 ),
    ("/user/spark/applicationHistory", "spark", "spark", o1777 ),
    ("/user/spark/spark3ApplicationHistory", "spark", "spark", o1777 ),
    ("/user/spark/driverLogs", "spark", "spark", o1777 ),
    ("/user/spark/driver3Logs", "spark", "spark", o1777 ),
    ("/user/sqoop", "sqoop", "sqoop", o775 ),
    ("/user/sqoop2", "sqoop2", "sqoop", o775 ),
    ("/user/tez", "hdfs", "supergroup", o775 ),
    ("/user/yarn", "hdfs", "supergroup", o775 ),
    ("/user/yarn/mapreduce", "hdfs", "supergroup", o775 ),
    ("/user/yarn/mapreduce/mr-framework", "yarn", "hadoop", o775 ),
    ("/user/yarn/services", "hdfs", "supergroup", o775 ),
    ("/user/yarn/services/service-framework", "hdfs", "supergroup", o775 ),
    ("/user/zeppelin", "zeppelin", "zeppelin", o775 ),
    ("/warehouse", "hdfs", "supergroup", o775 ),
    ("/warehouse/tablespace", "hdfs", "supergroup", o775 ),
    ("/warehouse/tablespace/external", "hdfs", "supergroup", o775 ),
    ("/warehouse/tablespace/managed", "hdfs", "supergroup", o775 ),
    ("/warehouse/tablespace/external/hive", "hive", "hive", o1775 ),
    ("/warehouse/tablespace/managed/hive", "hive", "hive", o1775 ),
    ("/yarn", "yarn", "yarn", o700 ),
    ("/yarn/node-labels", "yarn", "yarn", o700 ),
  )

  /** directories.py:203-240 */
  def hdpDirectories: Seq[DirectorySpec] = dirs(
    ("/", "hdfs", "hadoop", o755 ),
    ("/app-logs", "yarn", "hadoop", o1777 ),
    ("/app-logs/ambari-qa", "ambari-qa", "hadoop", o770 ),
    ("/app-logs/ambari-qa/logs", "ambari-qa", "hadoop", o770 ),
    ("/apps", "hdfs", "hadoop", o755 ),
    ("/apps/accumulo", "accumulo", "hadoop", o750 ),
    ("/apps/falcon", "falcon", "hdfs", o777 ),
    ("/apps/hbase", "hdfs", "hadoop", o755 ),
    ("/apps/hbase/data", "hbase", "hadoop", o775 ),
    ("/apps/hbase/staging", "hbase", "hadoop", o711 ),
    ("/apps/hive", "hdfs", "hdfs", o755 ),
    ("/apps/hive/warehouse", "hive", "hdfs", o777 ),
    ("/apps/tez", "tez", "hdfs", o755 ),
    ("/apps/webhcat", "hcat", "hdfs", o755 ),
    ("/ats", "yarn", "hdfs", o755 ),
    ("/ats/done", "yarn", "hdfs", o775 ),
    ("/atsv2", "yarn-ats", "hadoop", o755 ),
    ("/mapred", "mapred", "hadoop", o755 ),
    ("/mapred/system", "mapred", "hadoop", o755 ),
    ("/system", "yarn", "hadoop", o755 ),
    ("/system/yarn", "yarn", "hadoop", o755 ),
    ("/system/yarn/node-labels", "yarn", "hadoop", o700 ),
    ("/tmp", "hdfs", "hdfs", o1777 ),
    ("/tmp/hive", "ambari-qa", "hdfs", o777 ),
    ("/user", "hdfs", "hdfs", o755 ),
    ("/user/ambari-qa", "ambari-qa", "hdfs", o770 ),
    ("/user/hcat", "hcat", "hdfs", o755 ),
    ("/user/hdfs", "hdfs", "hdfs", o755 ),
    ("/user/hive", "hive", "hdfs", o700 ),
    ("/user/hue", "hue", "hue", o755 ),
    ("/user/oozie", "oozie", "hdfs", o775 ),
    ("/user/yarn", "yarn", "hdfs", o755 ),
  )

  /** Scala has no octal literals; oNNN are parsed octal modes. */
  private val o755 = 493; private val o775 = 509; private val o1777 = 1023
  private val o777 = 511; private val o751 = 489; private val o700 = 448
  private val o1775 = 1021; private val o770 = 504; private val o750 = 488
  private val o711 = 457

  private def dirs(specs: (String, String, String, Int)*): Seq[DirectorySpec] =
    specs.zipWithIndex.map { case ((p, o, g, m), i) => DirectorySpec(p, o, g, m, i) }

  def directoriesFor(dist: String, identitySuffix: String): Seq[DirectorySpec] = {
    val base = dist match {
      case "cdh" => cdhDirectories
      case "cdp" => cdpDirectories
      case "hdp" => hdpDirectories
      case other => throw new IllegalArgumentException(s"unknown dist: $other")
    }
    // directories.py:109-112: suffix applies to owner and group, not path.
    if (identitySuffix.nonEmpty)
      base.map(d => d.copy(owner = d.owner + identitySuffix, group = d.group + identitySuffix))
    else base
  }
}
