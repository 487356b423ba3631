package graft.sources

import java.io.FileNotFoundException
import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem answering for the `s3a` scheme, backed by
  * the local filesystem. There is no object store (or hadoop-aws jar) in
  * this environment, so SinksSpec maps `fs.s3a.impl` here: everything
  * above the FileSystem API — scheme resolution, output committer,
  * multi-file layout, read-back listing — runs against real `s3a://`
  * URIs; on a cluster the same URIs resolve to S3AFileSystem instead.
  *
  * Status calls are overridden because RawLocalFileSystem's deprecated
  * lazy-permission FileStatus re-parses its own path as a `file:` URI;
  * plain FileStatus objects (no permission shelling-out) keep the s3a
  * paths intact — which also matches S3A semantics, where permissions
  * are synthetic anyway.
  */
class S3AStubFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3a:///")
  override def getScheme: String = "s3a"

  private def status(f: Path): FileStatus = {
    val file = pathToFile(f)
    if (!file.exists()) throw new FileNotFoundException(s"File $f does not exist")
    new FileStatus(file.length, file.isDirectory, 1, getDefaultBlockSize(f),
      file.lastModified, makeQualified(f))
  }

  override def getFileStatus(f: Path): FileStatus = status(f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists()) throw new FileNotFoundException(s"File $f does not exist")
    if (file.isFile) Array(status(f))
    else file.listFiles().map(ch => status(new Path(f, ch.getName)))
  }
}
