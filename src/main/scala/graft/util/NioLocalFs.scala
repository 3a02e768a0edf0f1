package graft.util

import java.io.{FileNotFoundException, IOException}
import java.net.URI
import java.nio.file.{Files, LinkOption, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission => PP}
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem whose metadata operations are pure-JVM NIO
  * syscalls instead of forked shell commands.
  *
  * Hadoop's `RawLocalFileSystem` shells out for every metadata
  * operation whenever the libhadoop native library is not loaded (it
  * is not bundled with Spark's `hadoop-client-api`): `setPermission`
  * forks `/bin/chmod` (once per file CREATED — LocalFileSystem.create
  * passes an explicit permission), and permission/link status reads
  * fork `ls`/`readlink`/`stat`. A 120 s JFR window over the icelite
  * table benchmark counted 4,182 `jdk.ProcessStart` events — several
  * milliseconds of fork+exec each, all on the driver thread between
  * jobs. Every one of those operations has an exact `java.nio.file`
  * equivalent (one statx/chmod syscall), so this subclass overrides
  * the four forking entry points and leaves EVERYTHING else —
  * rename/create/delete semantics, checksum wrapping, working-dir
  * resolution — to the stock implementation. Rarely-representable
  * requests (setuid/setgid/sticky bits, non-POSIX stores) fall back
  * to the upstream path rather than approximating.
  *
  * Wired in via `spark.hadoop.fs.file.impl` (FileSystem API) and
  * `spark.hadoop.fs.AbstractFileSystem.file.impl` (FileContext API —
  * streaming checkpoint managers go through this one). On HDFS/object
  * stores these classes are simply never instantiated.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  private def nioPerms(p: FsPermission): java.util.Set[PP] = {
    val b = p.toShort.toInt
    val s = EnumSet.noneOf(classOf[PP])
    def add(bit: Int, pp: PP): Unit = if ((b & bit) != 0) { s.add(pp); () }
    add(0x100, PP.OWNER_READ); add(0x80, PP.OWNER_WRITE); add(0x40, PP.OWNER_EXECUTE)
    add(0x20, PP.GROUP_READ); add(0x10, PP.GROUP_WRITE); add(0x8, PP.GROUP_EXECUTE)
    add(0x4, PP.OTHERS_READ); add(0x2, PP.OTHERS_WRITE); add(0x1, PP.OTHERS_EXECUTE)
    s
  }

  private def fsPerm(s: java.util.Set[PP]): FsPermission = {
    var b = 0
    def has(pp: PP, bit: Int): Unit = if (s.contains(pp)) b |= bit
    has(PP.OWNER_READ, 0x100); has(PP.OWNER_WRITE, 0x80); has(PP.OWNER_EXECUTE, 0x40)
    has(PP.GROUP_READ, 0x20); has(PP.GROUP_WRITE, 0x10); has(PP.GROUP_EXECUTE, 0x8)
    has(PP.OTHERS_READ, 0x4); has(PP.OTHERS_WRITE, 0x2); has(PP.OTHERS_EXECUTE, 0x1)
    new FsPermission(b.toShort)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    // setuid/setgid/sticky are outside NIO's POSIX view — keep the
    // stock (forking) path for those rare requests instead of
    // silently dropping the bits
    if ((permission.toShort & 0xE00) != 0) super.setPermission(p, permission)
    else
      try { Files.setPosixFilePermissions(pathToFile(p).toPath, nioPerms(permission)); () }
      catch {
        case _: UnsupportedOperationException => super.setPermission(p, permission)
        case e: NoSuchFileException =>
          throw new FileNotFoundException(s"File $p does not exist: $e")
      }

  private def nioStatus(p: Path, nofollow: Boolean): FileStatus = {
    val jp = pathToFile(p).toPath
    try {
      val attrs =
        if (nofollow)
          Files.readAttributes(jp, classOf[PosixFileAttributes], LinkOption.NOFOLLOW_LINKS)
        else Files.readAttributes(jp, classOf[PosixFileAttributes])
      val link =
        if (nofollow && attrs.isSymbolicLink) new Path(Files.readSymbolicLink(jp).toString)
        else null
      new FileStatus(attrs.size(), attrs.isDirectory, 1, getDefaultBlockSize(p),
        attrs.lastModifiedTime.toMillis, attrs.lastAccessTime.toMillis,
        fsPerm(attrs.permissions), attrs.owner.getName, attrs.group.getName,
        link, p.makeQualified(getUri, getWorkingDirectory))
    } catch {
      case _: NoSuchFileException =>
        throw new FileNotFoundException(s"File $p does not exist")
      case _: UnsupportedOperationException => // non-POSIX store: stock path
        if (nofollow) super.getFileLinkStatus(p) else super.getFileStatus(p)
    }
  }

  override def getFileStatus(p: Path): FileStatus = nioStatus(p, nofollow = false)

  override def getFileLinkStatus(p: Path): FileStatus = nioStatus(p, nofollow = true)

  override def listStatus(p: Path): Array[FileStatus] = {
    val dir = pathToFile(p)
    if (!dir.exists) throw new FileNotFoundException(s"File $p does not exist")
    if (dir.isFile) Array(getFileStatus(p))
    else {
      val names = dir.list()
      if (names == null) throw new IOException(s"could not list directory $p")
      // a child deleted between list() and stat is skipped, matching
      // the stock implementation's tolerance of concurrent deletes
      names.flatMap { n =>
        try Some(getFileStatus(new Path(p, n)))
        catch { case _: FileNotFoundException => None }
      }
    }
  }
}

/** Checksummed `file://` FileSystem over [[NioRawLocalFileSystem]] —
  * drop-in for `org.apache.hadoop.fs.LocalFileSystem` (identical
  * .crc behavior; only the forked metadata ops are replaced).
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** FileContext (AbstractFileSystem) mirror of [[NioRawLocalFileSystem]]
  * — the shape of Hadoop's own `RawLocalFs`.
  */
class NioRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf, "file", false)

/** FileContext mirror of Hadoop's `LocalFs` (ChecksumFs over the raw
  * local fs), with the NIO raw layer underneath. Streaming checkpoint
  * managers resolve `file://` through this API.
  */
class NioLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))
