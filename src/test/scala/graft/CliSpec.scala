package graft

import java.nio.file.{Files, Paths}

/** End-to-end console-script parity (reference tests/test__scripts.py:8-47:
  * both scripts × all three dists, dry-run) plus the live
  * create-directories apply and its no-op re-run.
  */
class CliSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  for (command <- Cli.Commands; dist <- Seq("cdh", "cdp", "hdp"))
    test(s"dry run: $command --dist $dist exits 0 and touches nothing") {
      val target = tmp("graft-cli-dry")
      val log = s"$target/cli.log"
      val rc = Cli.run(
        Seq(
          command,
          "--append-cluster-name", "cl9",
          "--dist", dist,
          "--dry",
          "--no-verify",
          "--onefs-password", "pw",
          "--onefs-user", "root",
          "--zone", "System",
          "--quiet",
          "--log-file", log,
          target,
        ),
        spark,
      )
      assert(rc == 0)
      // dry: the only artifact is the log itself; plan actions were logged
      assert(Files.list(Paths.get(target)).count() == 1)
      val lines = new String(Files.readAllBytes(Paths.get(log)), "UTF-8")
      assert(lines.contains("Had this been for real"))
      if (command == "create-users")
        assert(lines.contains("groupadd") && lines.contains("useradd"))
      else
        assert(lines.contains("mkdir") && lines.contains("chown"))
    }

  test("create-users writes the provisioning script artifact") {
    val target = tmp("graft-cli-users")
    val rc = Cli.run(
      Seq("create-users", "--dist", "cdh", "--zone", "z1", "--quiet", target),
      spark,
    )
    assert(rc == 0)
    import scala.jdk.CollectionConverters._
    val entries = Files.list(Paths.get(target)).iterator().asScala.toSeq
    val script = entries
      .find(_.getFileName.toString.endsWith("-z1-cdh.sh"))
      .getOrElse(fail(s"expected a .sh artifact among $entries"))
    val lines = spark.read.textFile(script.toString).collect()
    assert(lines.head == "#!/usr/bin/env sh")
    // non-dry also live-applies onto the user-db sidecar (IdentityApplier)
    val db = s"$target/userdb"
    assert(graft.sinks.IdentityApplier.groupsIn(db).nonEmpty, "userdb groups must be applied")
    assert(graft.sinks.IdentityApplier.usersIn(db).nonEmpty, "userdb users must be applied")
    // a second CLI run against the same target re-applies as a no-op (the
    // db keeps one record per name; epoch proves the flush still fired)
    val epoch = graft.sinks.IdentityApplier.authEpoch(db)
    val sizeBefore = graft.sinks.IdentityApplier.usersIn(db).size
    assert(
      Cli.run(Seq("create-users", "--dist", "cdh", "--zone", "z1", "--quiet", target), spark) == 0)
    assert(graft.sinks.IdentityApplier.usersIn(db).size == sizeBefore)
    assert(graft.sinks.IdentityApplier.authEpoch(db) == epoch + 1)
  }

  test("create-directories applies; second run is a no-op") {
    val target = tmp("graft-cli-dirs")
    val log = s"$target/../cli-dirs.log"
    def runOnce(): String = {
      Files.deleteIfExists(Paths.get(log))
      val rc = Cli.run(
        Seq("create-directories", "--dist", "hdp", "--zone", "z1",
          "--append-cluster-name", "cl1", "--quiet", "--log-file", log, target),
        spark,
      )
      assert(rc == 0)
      new String(Files.readAllBytes(Paths.get(log)), "UTF-8")
    }
    val first = runOnce()
    assert(first.contains("applied:") && !first.contains("chmods=0"), first)
    assert(Files.isDirectory(Paths.get(target, "hadoop")))
    val second = runOnce()
    assert(second.contains("applied: mkdirs=0 chmods=0 chowns=0"), second)
  }

  test("--version prints and exits 0 from anywhere in the argv") {
    assert(Cli.run(Seq("create-users", "--version"), spark) == 0)
    assert(Cli.run(Seq("--version"), spark) == 0)
  }

  test("usage errors exit 2; bad dist is rejected like argparse choices") {
    assert(Cli.run(Seq("create-users", "--zone", "z", "--dist", "nope", "t"), spark) == 2)
    assert(Cli.run(Seq("frobnicate"), spark) == 2)
    assert(Cli.run(Seq("create-users", "--zone", "z", "--dist", "cdh"), spark) == 2)
    assert(Cli.run(Seq("create-users", "--dist", "cdh", "t"), spark) == 2)
  }
}
