package graft.util

import java.io.FileNotFoundException
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The NIO local filesystem must be a drop-in for Hadoop's
  * LocalFileSystem: same statuses, same checksum behavior, same error
  * contract — just no forked chmod/ls/readlink per metadata op.
  */
class NioLocalFsSpec extends AnyFunSuite with SparkFixture {

  private def fs: FileSystem = {
    val conf = spark.sparkContext.hadoopConfiguration
    FileSystem.get(new java.net.URI("file:///"), conf)
  }

  test("session resolves file:// to the NIO filesystem") {
    assert(fs.isInstanceOf[NioLocalFileSystem])
  }

  test("status round-trip: size, dir flag, and permissions from NIO") {
    val dir = Files.createTempDirectory("niofs").toFile
    val f = new java.io.File(dir, "x.bin")
    Files.write(f.toPath, Array[Byte](1, 2, 3))
    val st = fs.getFileStatus(new Path(f.toString))
    assert(!st.isDirectory && st.getLen == 3)
    val dst = fs.getFileStatus(new Path(dir.toString))
    assert(dst.isDirectory)
    // setPermission lands real posix bits (no fork) and reads back
    fs.setPermission(new Path(f.toString), new FsPermission("600"))
    assert(fs.getFileStatus(new Path(f.toString)).getPermission.toShort == 0x180)
    fs.setPermission(new Path(f.toString), new FsPermission("644"))
    assert(fs.getFileStatus(new Path(f.toString)).getPermission.toShort == 0x1A4)
  }

  test("listStatus lists children; missing paths throw FileNotFound") {
    val dir = Files.createTempDirectory("niofs-ls").toFile
    Files.write(Paths.get(dir.toString, "a"), Array[Byte](1))
    Files.write(Paths.get(dir.toString, "b"), Array[Byte](1, 2))
    val names = fs.listStatus(new Path(dir.toString)).map(_.getPath.getName).sorted
    assert(names.toSeq == Seq("a", "b"))
    intercept[FileNotFoundException] {
      fs.getFileStatus(new Path(dir.toString, "missing"))
    }
    intercept[FileNotFoundException] {
      fs.listStatus(new Path(dir.toString, "missing-dir"))
    }
  }

  test("symlinks: getFileStatus follows, getFileLinkStatus does not") {
    val dir = Files.createTempDirectory("niofs-ln")
    val target = dir.resolve("target")
    Files.write(target, Array[Byte](1, 2, 3, 4))
    val link = dir.resolve("link")
    Files.createSymbolicLink(link, target)
    val followed = fs.getFileStatus(new Path(link.toString))
    assert(followed.getLen == 4 && !followed.isSymlink)
    val raw = fs.getFileLinkStatus(new Path(link.toString))
    assert(raw.isSymlink)
  }

  test("checksum wrapper preserved: fs-created files get a .crc sibling") {
    val dir = Files.createTempDirectory("niofs-crc").toFile
    val p = new Path(new java.io.File(dir, "data.bin").toString)
    val out = fs.create(p)
    out.write(Array[Byte](9, 9, 9)); out.close()
    assert(new java.io.File(dir, ".data.bin.crc").exists,
      "LocalFileSystem checksum behavior must be unchanged")
  }
}
