package graft

/** Engine error hierarchy — parity with the reference's exception tree
  * rooted at IsilonHadoopToolError (__init__.py:16-28, onefs.py:218-519,
  * directories.py:25-30), as a sealed Scala hierarchy.
  */
sealed abstract class GraftError(message: String) extends RuntimeException(message)

/** directories.py:29-30: refusing to manage /ifs. */
final class HdfsRootDirectoryError(root: String)
    extends GraftError(
      s"The HDFS root directory ($root) must not be /ifs (modifying /ifs can break NFS/SMB).",
    )

/** onefs.py:493-497 MixedModeError: nodes disagree on a revision. */
final class MixedModeError(distinct: Long)
    extends GraftError(s"Cluster nodes report $distinct distinct revisions; expected exactly 1.")

/** onefs.py:1079-1082 / 1274-1277: a name resolves to more than one id
  * ("duplicate users (e.g. local and LDAP)?").
  */
final class DuplicateIdentityError(kind: String)
    extends GraftError(s"Duplicate $kind name in existing state; name→id resolution is ambiguous.")

/** onefs.py:297-315 MalformedAPIError shape. */
final class MalformedStateError(what: String) extends GraftError(s"Malformed state: $what")

/** An iterative fixpoint (e.g. connected-components label propagation)
  * hit its round bound before converging — returning the unconverged
  * state would silently diverge from the declarative oracle, so this is
  * a typed error, never an `assert` (asserts elide under
  * `-Xdisable-assertions`).
  */
final class ConvergenceError(what: String, rounds: Int)
    extends GraftError(s"$what did not converge within $rounds rounds")
