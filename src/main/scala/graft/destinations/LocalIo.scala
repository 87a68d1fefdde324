package graft.destinations

import org.apache.hadoop.fs.{FileSystem, Path}

/** Small-file driver-side writes (commit JSON, manifests, checksums,
  * metadata jsons, version hints): on `file://` every Hadoop
  * `FileSystem.create` costs a PROCESS FORK — without native libhadoop,
  * applying the default file permission execs `chmod` once per created
  * file (`ProcessImpl.forkAndExec` under `writeCrcFile`/`publishCommit`/
  * `writeMetadata` in the r19 driver profile; the r18 round removed the
  * same fork from the staging LISTING path, guide §7.3 shape). Local
  * paths write through NIO instead: same bytes, same overwrite/exclusive
  * semantics (`FileAlreadyExistsException` is an `IOException`, like
  * Hadoop's), parent directories still created. Any non-local scheme
  * keeps the Hadoop stream — object stores never forked and carry their
  * own commit semantics.
  */
private[graft] object LocalIo {
  def create(fs: FileSystem, path: Path, overwrite: Boolean): java.io.OutputStream =
    if (fs.getUri.getScheme == "file") {
      import java.nio.file.{Files, Paths, StandardOpenOption => O}
      val p = Paths.get(fs.makeQualified(path).toUri.getPath)
      val parent = p.getParent
      if (parent != null) Files.createDirectories(parent)
      if (overwrite) Files.newOutputStream(p, O.CREATE, O.TRUNCATE_EXISTING, O.WRITE)
      else Files.newOutputStream(p, O.CREATE_NEW, O.WRITE)
    } else fs.create(path, overwrite)
}
